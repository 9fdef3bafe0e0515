"""Full corpus-build funnel, one decade up: run the composed build_corpus
pipeline (Gopher → classifier → perplexity → exact dedup → line dedup →
span removal → SimHash gate → leakage-safe split → sharded write) END TO
END on the seeded realistic-vocabulary corpus at 50 K and 500 K docs
(verdict-r10 task 5: round 10 measured the funnel's STAGES at 500 K, but
the composed funnel itself had no measured number above sf0.1's 5 K).

Protocol: one session, serial, one untimed 50 K warm pass (codegen/JVM),
then one timed pass per scale into a fresh temp dir, per-stage funnel
counters recorded (the same monotone-nonincreasing sanity contract
bench.py asserts). Prints one JSON line.

Usage: python tools/corpus_decade.py [WORK_DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade_r10"
    os.makedirs(work, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    # the GOPHERABLE variant of the fuzzy corpus (separate dirs — the
    # plain seed-7 corpora stay reproducible for decade_r10.py's stage
    # tables): the default pseudo-word regime fails every Gopher rule and
    # the composed funnel zeroes at stage 1 (found by this tool's first
    # run), measuring nothing downstream.
    scales = [(50_000, f"{work}/fuzzy50k_g"), (500_000, f"{work}/fuzzy500k_g")]
    for n, out in scales:
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
            print(f"generated {n} docs in {round(time.time() - t0, 1)}s", flush=True)

    from vat_etl_spark.queries.llm_pipeline import build_corpus
    from vat_etl_spark.session import get_spark

    spark = get_spark("corpus-decade")

    def one_build(sf_dir: str) -> dict:
        out = tempfile.mkdtemp(prefix="corpus_decade_")
        try:
            t0 = time.time()
            m = build_corpus(spark, sf_dir, f"{out}/corpus")
            wall = round(time.time() - t0, 1)
            docs = list(m["funnel"].values())
            assert docs[0] > 0 and docs[-1] > 0, m["funnel"]
            assert all(a >= b for a, b in zip(docs, docs[1:])), m["funnel"]
            return {"wall_sec": wall, "funnel": m["funnel"],
                    "docs_written": m["docs_written"]}
        finally:
            shutil.rmtree(out, ignore_errors=True)

    one_build(scales[0][1])  # untimed warm pass (codegen, JVM, catalog)
    res = {}
    for n, sf_dir in scales:
        res[str(n)] = one_build(sf_dir)
        print(f"{n}: {res[str(n)]['wall_sec']}s", file=sys.stderr, flush=True)
    w50, w500 = res["50000"]["wall_sec"], res["500000"]["wall_sec"]
    import math

    res["exponent"] = round(math.log10(w500 / w50), 2) if w50 > 0 else None
    print(json.dumps(res))


if __name__ == "__main__":
    main()
