"""Micro-bench for dedup_minhash_banded at sf0.1: warm pass + N timed
passes into the noop sink, plus a stage/job count from the status tracker.
Used to iterate on the round-13 constant shave (VERDICT r12 task 1)."""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vat_etl_spark.queries import QUERIES  # noqa: E402
from vat_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("MHB_PASSES", "5"))


def main():
    spark = get_spark()
    sc = spark.sparkContext
    # warm
    QUERIES["dedup_minhash_banded"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    walls = []
    tracker = sc.statusTracker()
    j0 = max(tracker.getJobIdsForGroup() or [0])
    for _ in range(PASSES):
        t0 = time.time()
        QUERIES["dedup_minhash_banded"](spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    jobs = [j for j in tracker.getJobIdsForGroup() if j > j0]
    n_stages = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info:
            n_stages += len(info.stageIds)
    print(
        json.dumps(
            {
                "walls": walls,
                "median": round(statistics.median(walls), 3),
                "jobs_all_passes": len(jobs),
                "stages_all_passes": n_stages,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
