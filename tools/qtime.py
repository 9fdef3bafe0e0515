"""Single-query timing harness for optimization iteration: same
methodology as bench.py (cpu probe, warm pass, prepared plan, median of
N noop-sink passes) over just the named registered queries, so a change
can be measured without paying the full 26-key suite.

    python tools/qtime.py <query> [<query> ...]

Env: $SPARK_GRAFT_SF_DIR (default sf0.1), $SPARK_GRAFT_CPUS,
$QTIME_PASSES (default 5). Prints one JSON line
{"probe": s, "queries": {name: {"median": s, "min": s, "max": s}}}.
NOT the driver bench contract — iteration tooling only.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vat_etl_spark.queries import QUERIES  # noqa: E402
from vat_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_passes = int(os.environ.get("QTIME_PASSES", "5"))
    spark = get_spark("qtime")

    def _probe() -> float:
        t0 = time.perf_counter()
        spark.range(0, 400_000_000, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS s"
        ).collect()
        return time.perf_counter() - t0

    _probe()
    probe = round(statistics.median(_probe() for _ in range(3)), 3)

    from vat_etl_spark.sources.catalog import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.schema

    prepared = {n: QUERIES[n](spark, sf_dir) for n in names}
    for n in names:  # warm pass: codegen + file listing, untimed
        prepared[n].write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_passes):
        for n in names:
            spark.sparkContext.setJobDescription(f"qtime:{n}")
            t0 = time.perf_counter()
            prepared[n].write.format("noop").mode("overwrite").save()
            samples[n].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)

    out = {
        "probe": probe,
        "passes": n_passes,
        "sf_dir": sf_dir,
        "queries": {
            n: {
                "median": round(statistics.median(s), 3),
                "min": round(min(s), 3),
                "max": round(max(s), 3),
            }
            for n, s in samples.items()
        },
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
