"""Round-10 decade extension: 50 K -> 500 K docs for the heavy doc-corpus
family (verdict-r8 task 4 / verdict-r9 task 3).

Generates the seeded realistic-vocabulary corpus (tools/gen_fuzzy_corpus)
at 50 K and 500 K docs and times the heavy family one decade above the
round-7/8 tables. Protocol: one session, serial, local[32], per query one
untimed warm pass at 50 K (codegen/JVM) then ONE timed pass per scale —
medians-of-3 at 500 K would triple an ~hour-long session for exponents
that the single-pass spread (reported) already brackets.

ml.feature's dedup_minhash_ml_reference (pre-r11: dedup_minhash_lsh) is deliberately NOT in the 500 K list: its
single-hash OR-amplification bands collide at probability = raw Jaccard,
and at 500 K Zipfian docs the hot buckets go per-bucket-quadratic - the
join's 4-task straggler tail ran >55 min before being aborted (round-10
session). That cliff is the motivation for dedup_minhash_banded.

The serve-only ANN decade is embeddings-table-based and was re-measured
this round in SCALE.md (sf0.01 -> sf0.1, exponent 0.09); it cannot ride a
documents-only corpus, so it is not in this list.

Usage: python tools/decade_r10.py [WORK_DIR]   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_TO_TIME = [
    "corpus_neardup_admit_twin",   # SimHash admission gate, batch-twin shape
    "dedup_minhash_banded",        # b x r banded MinHash (scale-correct)
    "pipeline_line_dedup",         # global line index + keep-first + regroup
    "pipeline_span_removal",       # span index + interval merge + reconstruct
    "pipeline_quality_classifier", # map-only hashed-classifier inference
    "text_kneser_ney_bigram",      # bigram count tables + stream join
    "text_bpe_apply_trie",         # production-K BPE apply (heap encoder)
]


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decade_r10"
    os.makedirs(work, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    scales = [(50_000, f"{work}/fuzzy50k"), (500_000, f"{work}/fuzzy500k")]
    for n, out in scales:
        if not os.path.isdir(f"{out}/documents.parquet"):
            t0 = time.time()
            subprocess.run(
                [sys.executable, f"{here}/gen_fuzzy_corpus.py", out, str(n), "7"],
                check=True,
            )
            print(f"generated {n} docs in {round(time.time() - t0, 1)}s", flush=True)

    from vat_etl_spark.queries import QUERIES
    from vat_etl_spark.session import get_spark

    spark = get_spark("decade-r10")
    results: dict[str, dict] = {}

    # untimed warm pass at the small scale: codegen + Arrow init
    for name in QUERIES_TO_TIME:
        QUERIES[name](spark, scales[0][1]).write.format("noop").mode(
            "overwrite"
        ).save()
    print("warm pass done", flush=True)

    for name in QUERIES_TO_TIME:
        row: dict[str, object] = {}
        for n, sf in scales:
            # time a NOOP WRITE, not count(): count() lets Catalyst prune
            # the expensive output columns (span reconstruction, BPE token
            # counts, classifier scores never execute), which silently
            # reported map-only stages at 0.4 s for 500 K docs
            t0 = time.time()
            QUERIES[name](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.time() - t0, 1)
            cnt = QUERIES[name](spark, sf).count()  # untimed, sanity only
            row[f"n{n}"] = {"rows": cnt, "sec": wall}
            print(name, n, cnt, wall, flush=True)
        import math

        w1 = row["n50000"]["sec"]
        w2 = row["n500000"]["sec"]
        row["exponent"] = round(math.log10(max(w2, 0.001) / max(w1, 0.001)), 2)
        results[name] = row
    print(json.dumps(results))


if __name__ == "__main__":
    main()
