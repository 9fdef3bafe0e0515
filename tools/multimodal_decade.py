"""Round-13 multimodal decade (verdict-r12 task 3): the last §2.9 family
without a 10× receipt. Measures, over the seed-7 fuzzy corpus family at
500 K → 5 M docs (payloads = UTF-8 document bytes via attach_payload —
10× the binary byte volume):

- multimodal_dedup_phash: wall, band-join CANDIDATE volume (pairs
  sharing ≥1 exact 32-bit band word, pre-Hamming-verify), and verified pairs
  at tau=3 — the pigeonhole-lossless banding claim (hamming ≤ 7 ⇒ ≥1
  band equal) measured above sf0.1 for the first time.
- multimodal_shard_packing: wall and shard skew (max/mean shard bytes
  over the 8-shard manifest) — the two-pass-rank LPT stand-in's balance
  property at 10×.

Same protocol as tools/decade_r13.py: one session, untimed 50 K warm
pass, one timed noop-write per scale. Prints one JSON line; writes
artifacts/MULTIMODAL_DECADE_r13.json.

Usage: python tools/multimodal_decade.py [WORK_DIR]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _phash_candidates(spark, sf_dir: str):
    """HISTORICAL r13 accounting: the 32-bit-grain uncapped band-join
    candidate stream as it stood in round 13. Production moved to fused
    4x64-bit capped join bands in round 14 (queries/multimodal.py) —
    tools/multimodal_decade_r14.py measures THAT; this harness is kept
    for reproducing the r13 artifact's numbers only."""
    from vat_etl_spark.operators.multimodal import (
        attach_payload,
        perceptual_hash,
    )
    from vat_etl_spark.sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    sigs = perceptual_hash(attach_payload(docs)).select("doc_id", "bands")
    exploded = sigs.select(
        "doc_id", F.posexplode("bands").alias("band_no", "band_key")
    )
    a = exploded.select(F.col("doc_id").alias("doc_a"), "band_no", "band_key")
    b = exploded.select(F.col("doc_id").alias("doc_b"), "band_no", "band_key")
    return (
        a.join(b, ["band_no", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )


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

    spark = get_spark("multimodal-decade")
    for name in ("multimodal_dedup_phash", "multimodal_shard_packing"):
        QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    print("warm pass done", flush=True)

    results: dict[str, dict] = {
        "multimodal_dedup_phash": {},
        "multimodal_shard_packing": {},
    }
    for n, sf in scales:
        row = results["multimodal_dedup_phash"]
        t0 = time.time()
        QUERIES["multimodal_dedup_phash"](spark, sf).write.format(
            "noop"
        ).mode("overwrite").save()
        row[f"wall_{n}"] = round(time.time() - t0, 1)
        row[f"verified_pairs_{n}"] = QUERIES["multimodal_dedup_phash"](
            spark, sf
        ).count()
        row[f"band_candidates_{n}"] = _phash_candidates(spark, sf).count()
        print(f"phash @ {n}: {row[f'wall_{n}']}s "
              f"cands={row[f'band_candidates_{n}']}", flush=True)

        row = results["multimodal_shard_packing"]
        t0 = time.time()
        QUERIES["multimodal_shard_packing"](spark, sf).write.format(
            "noop"
        ).mode("overwrite").save()
        row[f"wall_{n}"] = round(time.time() - t0, 1)
        manifest = QUERIES["multimodal_shard_packing"](spark, sf).collect()
        sizes = [r.shard_bytes for r in manifest]
        row[f"shard_skew_{n}"] = round(
            max(sizes) / (sum(sizes) / len(sizes)), 6
        )
        row[f"n_shards_{n}"] = len(sizes)
        print(f"shards @ {n}: {row[f'wall_{n}']}s "
              f"skew={row[f'shard_skew_{n}']}", flush=True)

    for name, row in results.items():
        w0, w1 = row["wall_500000"], row["wall_5000000"]
        row["exponent"] = round(math.log10(w1 / w0), 2) if w0 > 0 else None
    with open(
        os.path.join(repo, "artifacts", "MULTIMODAL_DECADE_r13.json"), "w"
    ) as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
