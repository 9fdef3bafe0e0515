"""Round-13 re-measure at the third decade (500 K -> 5 M docs) for
dedup_minhash_banded, whose candidate generator changed this round (the
sf0.1 constant shave — verdict-r12 task 1): slim 4-column signature
frame, one narrow rep-election aggregate + one join-back, count-window
bucket cap riding the self-join's band-key shuffle, gsz>1-restricted
membership expansion. Targets: 5 M wall not regressed vs DECADE_r12
(234.9 s) and verified pair counts identical (6 651 / 66 650).

Same protocol as tools/decade_r12.py: seed-7 fuzzy corpus family, one
session, untimed 50 K warm pass, one timed noop-write per scale, both
scales timed same-session. Prints one JSON line; writes
artifacts/DECADE_r13.json.

Usage: python tools/decade_r13.py [WORK_DIR]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_TO_TIME = ["dedup_minhash_banded"]


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade_r10"
    os.makedirs(work, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    warm_dir = f"{work}/fuzzy50k"
    scales = [(500_000, f"{work}/fuzzy500k"), (5_000_000, f"{work}/fuzzy5m")]
    for n, out in [(50_000, warm_dir)] + scales:
        if not os.path.isdir(f"{out}/documents.parquet"):
            subprocess.run(
                [sys.executable, f"{here}/gen_fuzzy_corpus.py", out, str(n), "7"],
                check=True,
            )

    from vat_etl_spark.queries import QUERIES
    from vat_etl_spark.session import get_spark

    spark = get_spark("decade-r13")
    results: dict[str, dict] = {}
    for name in QUERIES_TO_TIME:
        QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    print("warm pass done", flush=True)
    for name in QUERIES_TO_TIME:
        row: dict[str, object] = {}
        for n, sf in scales:
            t0 = time.time()
            QUERIES[name](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            row[f"wall_{n}"] = round(time.time() - t0, 1)
            if name == "dedup_minhash_banded":
                row[f"pairs_{n}"] = QUERIES[name](spark, sf).count()
            print(f"{name} @ {n}: {row[f'wall_{n}']}s", flush=True)
        w0, w1 = row["wall_500000"], row["wall_5000000"]
        row["exponent"] = round(math.log10(w1 / w0), 2) if w0 > 0 else None
        results[name] = row
    with open(os.path.join(repo, "artifacts", "DECADE_r13.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
