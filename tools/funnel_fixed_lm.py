"""Composed corpus funnel with the CCNet FIXED-LM perplexity stage
(verdict-r11 task 1 receipt): estimate the KN LM + bucket thresholds
ONCE from a fixed reference corpus, then time `build_corpus --lm-dir`
at 500 K and 5 M docs.

Round-11 finding (FUNNEL_r11_5M.json): the perplexity stage re-derived
the Kneser-Ney LM from the full input corpus on every build — 524.6 s
of the 766.8 s composed 5 M wall (68 %). CCNet (arXiv:1911.00359)
trains the LM once on a fixed reference corpus; scoring is then joins
against fixed tables. This harness measures that shape:

- one-time kn_write_lm from the 500 K gopherable corpus (the fixed
  reference, CCNet's Wikipedia stand-in) — timed, but AMORTIZED across
  every later build;
- untimed 50 K warm build, then ONE timed build per scale with
  --lm-dir, per-stage walls recorded (same protocol as
  tools/funnel_decade_5m.py so the two artifacts compare per-stage).

Prints one JSON line; writes artifacts/FUNNEL_FIXEDLM_r12.json.

Usage: python tools/funnel_fixed_lm.py [WORK_DIR]
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
    repo = os.path.dirname(here)
    warm = (50_000, f"{work}/fuzzy50k_g")
    ref_dir = f"{work}/fuzzy500k_g"
    scales = [
        (500_000, f"{work}/fuzzy500k_g"),
        (5_000_000, f"{work}/fuzzy5m_g"),
    ]
    for n, out in [warm] + scales:
        if not os.path.isdir(f"{out}/documents.parquet"):
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

    from vat_etl_spark.queries.llm_pipeline import build_corpus, kn_write_lm
    from vat_etl_spark.session import get_spark

    spark = get_spark("funnel-fixed-lm")

    lm_dir = f"{work}/knlm_ref500k"
    t0 = time.time()
    lm_stats = kn_write_lm(spark, ref_dir, lm_dir)
    estimate_wall = round(time.time() - t0, 1)
    print(
        json.dumps({"estimate_lm_sec": estimate_wall, **lm_stats}), flush=True
    )

    def one_build(sf_dir: str) -> dict:
        out = tempfile.mkdtemp(prefix="funnel_fixedlm_")
        try:
            t0 = time.time()
            m = build_corpus(spark, sf_dir, f"{out}/corpus", lm_dir=lm_dir)
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

    one_build(warm[1])  # untimed warm pass
    res: dict = {"estimate_lm_sec": estimate_wall, "lm_ref_docs": lm_stats["ref_docs"]}
    for n, sf_dir in scales:
        res[str(n)] = one_build(sf_dir)
        print(f"{n}: {res[str(n)]['wall_sec']}s", file=sys.stderr, flush=True)
    w0 = res["500000"]["wall_sec"]
    w1 = res["5000000"]["wall_sec"]
    res["exponent"] = round(math.log10(w1 / w0), 2)
    with open(
        os.path.join(repo, "artifacts", "FUNNEL_FIXEDLM_r12.json"), "w"
    ) as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
