"""Relational-family decade runner: times the relational/window/events
headliners at a given sf dir with the bench.py protocol (untimed warm
pass, then median of N prepared-plan executions into the noop sink) and
prints one JSON line — run at /root/testdata/sf0.1 and at the generated
testdata_sf1 (tools/gen_tpch.py) to measure the sf0.1 → sf1 decade
exponents for SCALE.md (verdict-r10 task 4; the LLM family got its
50 K → 500 K table in round 10).

Usage: python tools/relational_decade.py <sf_dir> [passes]
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

RELATIONAL = [
    "vat_summary",
    "q1_pricing_summary",
    "q5_region_revenue",
    "topk_customers",
    "agg_rollup_period",
    "window_top3_orders_per_customer",
    "events_sessionize",
    "events_tumbling_window",
]


def main() -> None:
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("relational-decade")
    # catalog + codegen warm pass (same rationale as bench.py)
    for name in RELATIONAL:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    prepared = {n: QUERIES[n](spark, sf_dir) for n in RELATIONAL}
    samples: dict[str, list[float]] = {n: [] for n in RELATIONAL}
    for _ in range(passes):
        for name in RELATIONAL:
            t0 = time.perf_counter()
            prepared[name].write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "passes": passes,
                "queries": timings,
                "spread": {
                    n: {"min": round(min(s), 3), "max": round(max(s), 3)}
                    for n, s in samples.items()
                },
                "total_sec": round(sum(timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
