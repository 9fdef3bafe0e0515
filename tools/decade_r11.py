"""Round-11 THIRD decade: 500 K -> 5 M docs for the core dedup/text claims.

Round 10 measured the heavy doc-corpus family across 50 K -> 500 K
(tools/decade_r10.py, SCALE.md round-10 table). This extends the claims
that matter most at 100 TB one decade further on the same seeded corpus
family (tools/gen_fuzzy_corpus.py, seed 7, plain pseudo-word regime):

- dedup_minhash_banded: the production b x r banded MinHash whose whole
  reason to exist is that the ml.feature path cliffs at 500 K — the
  output-linearity claim needs a third point.
- pipeline_line_dedup, pipeline_quality_classifier, text_bpe_apply_trie,
  corpus_neardup_admit_twin, text_kneser_ney_bigram: the round-10
  exponents (0.86 / 1.13 / 0.39 / 0.53 / 0.81) re-checked a decade up.

Deliberately NOT in the list:
- dedup_minhash_ml_reference: proven per-bucket-quadratic cliff at 500 K
  (aborted > 55 min, SCALE.md round-10); fenced as an A/B reference.
- pipeline_span_removal: hit-VOLUME-bound by construction (round-10
  adjudication: corpus-duplicated 5-gram occurrences grew x15.5 per doc
  decade on this corpus — Lee et al.'s observation), so the standalone
  number at 5 M is a ~30 min measurement of duplicate density, not of
  the plan; the COMPOSED-funnel 5 M run (where span sees only the ~15 %
  survivor set) is the production-shaped measurement and is recorded
  separately (SCALE.md round-11 funnel decade).

Protocol (same as decade_r10): one session, serial, local[32]; one
untimed warm pass per query at 50 K (codegen/JVM/Arrow init), then ONE
timed NOOP-WRITE pass per scale — count() is wrong for decade tables
(Catalyst prunes the expensive output columns under count). 500 K is
re-timed in-session so the exponent is same-night, not cross-night
drift.

Usage: python tools/decade_r11.py [WORK_DIR]   (prints one JSON line)
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_TO_TIME = [
    "dedup_minhash_banded",
    "pipeline_line_dedup",
    "pipeline_quality_classifier",
    "text_bpe_apply_trie",
    "corpus_neardup_admit_twin",
    "text_kneser_ney_bigram",
]


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade_r10"
    os.makedirs(work, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    warm_dir = f"{work}/fuzzy50k"
    scales = [(500_000, f"{work}/fuzzy500k"), (5_000_000, f"{work}/fuzzy5m")]
    for n, out in [(50_000, warm_dir)] + scales:
        if not os.path.isdir(f"{out}/documents.parquet"):
            t0 = time.time()
            subprocess.run(
                [sys.executable, f"{here}/gen_fuzzy_corpus.py", out, str(n), "7"],
                check=True,
            )
            print(
                f"generated {n} docs in {round(time.time() - t0, 1)}s",
                flush=True,
            )

    from vat_etl_spark.queries import QUERIES
    from vat_etl_spark.session import get_spark

    spark = get_spark("decade-r11")
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
                # output-linearity receipt: verified pair count per scale
                # (untimed recompute — the claim is pairs ∝ planted twins,
                # not the count's wall)
                row[f"pairs_{n}"] = QUERIES[name](spark, sf).count()
            print(f"{name} @ {n}: {row[f'wall_{n}']}s", flush=True)
        w0, w1 = row["wall_500000"], row["wall_5000000"]
        row["exponent"] = round(math.log10(w1 / w0), 2) if w0 > 0 else None
        results[name] = row
    print(json.dumps(results))


if __name__ == "__main__":
    main()
