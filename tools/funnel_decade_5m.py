"""Composed corpus funnel, THIRD decade: 500 K → 5 M docs end-to-end.

Extends tools/corpus_decade.py (50 K → 500 K, SCALE.md round-11 funnel
decade) one decade further on the same seeded gopherable corpus family —
the composed `build_corpus` (Gopher → classifier → perplexity → exact
dedup → line dedup → span removal → SimHash gate → leakage-safe split →
sharded write) is the single most expensive bench entry and the closest
thing in the repo to the 100 TB production shape, so its scaling gets a
third point like the standalone dedup/text claims did (decade_r11.py).

Protocol: one session, serial; untimed 50 K warm pass; ONE timed build
per scale into a fresh temp dir (500 K re-timed in-session so the
exponent is same-night); per-stage funnel counters + stage walls
recorded. Prints one JSON line.

Usage: python tools/funnel_decade_5m.py [WORK_DIR]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade_r11"
    os.makedirs(work, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    warm = (50_000, f"{work}/fuzzy50k_g")
    scales = [
        (500_000, f"{work}/fuzzy500k_g"),
        (5_000_000, f"{work}/fuzzy5m_g"),
    ]
    for n, out in [warm] + scales:
        if not os.path.isdir(f"{out}/documents.parquet"):
            t0 = time.time()
            subprocess.run(
                [
                    sys.executable,
                    f"{here}/gen_fuzzy_corpus.py",
                    out,
                    str(n),
                    "7",
                    "--gopherable",
                ],
                check=True,
            )
            print(
                f"generated {n} docs in {round(time.time() - t0, 1)}s",
                flush=True,
            )

    from vat_etl_spark.queries.llm_pipeline import build_corpus
    from vat_etl_spark.session import get_spark

    spark = get_spark("funnel-decade-5m")

    def one_build(sf_dir: str) -> dict:
        out = tempfile.mkdtemp(prefix="funnel_decade_")
        try:
            t0 = time.time()
            m = build_corpus(spark, sf_dir, f"{out}/corpus")
            wall = round(time.time() - t0, 1)
            docs = list(m["funnel"].values())
            assert docs[0] > 0 and docs[-1] > 0, m["funnel"]
            assert all(a >= b for a, b in zip(docs, docs[1:])), m["funnel"]
            return {
                "wall_sec": wall,
                "funnel": m["funnel"],
                "docs_written": m["docs_written"],
                "stage_walls": m.get("stage_walls"),
            }
        finally:
            shutil.rmtree(out, ignore_errors=True)

    one_build(warm[1])  # untimed warm pass (codegen, JVM, catalog)
    res = {}
    for n, sf_dir in scales:
        res[str(n)] = one_build(sf_dir)
        print(
            f"{n}: {res[str(n)]['wall_sec']}s", file=sys.stderr, flush=True
        )
    w0 = res["500000"]["wall_sec"]
    w1 = res["5000000"]["wall_sec"]
    res["exponent"] = round(math.log10(w1 / w0), 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
