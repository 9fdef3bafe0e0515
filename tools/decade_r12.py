"""Round-12 re-measure at the third decade (500 K -> 5 M docs) for the
two queries whose plans changed this round:

- text_kneser_ney_bigram (verdict-r11 task 4): every shuffle/join now
  keys on 64-bit token-id pairs instead of bigram strings
  (_kn_hashed_bigrams). Target: >= 1.5x at 5 M vs the round-11 wall
  (1 209 s, DECADE_r11_5M.json) with oracle hashes unchanged (re-proven
  by the round-12 full sweep).
- dedup_minhash_banded (round-12 ADVICE): banding now runs over
  signature-grain representatives with the cap counting distinct
  signatures. Re-measures the 5 M wall + verified-pair counts so the
  output-linearity receipt stays current.

Same protocol as tools/decade_r11.py: seed-7 fuzzy corpus family, one
session, untimed 50 K warm pass, one timed noop-write per scale,
both scales timed same-session. Prints one JSON line; writes
artifacts/DECADE_r12.json.

Usage: python tools/decade_r12.py [WORK_DIR]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_TO_TIME = ["text_kneser_ney_bigram", "dedup_minhash_banded"]


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

    spark = get_spark("decade-r12")
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
    with open(os.path.join(repo, "artifacts", "DECADE_r12.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
