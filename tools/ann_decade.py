"""ANN build/serve decade: 2 K (sf0.1) -> 20 K seeded synthetic vectors.

The testdata embeddings stop at 2 000 rows; this harness generates a
seeded 20 K x 64 corpus in the SAME near-iid regime (the hardest case
for graph navigation), builds the NN-Descent index one decade up, and
measures (a) build wall, (b) serve-only wall, (c) recall@10 and touched
fraction — the evidence that the serve budget's absolute-work claim
holds while recall stays HNSW-grade.

Usage: python tools/ann_decade.py [N]   (default 20000; prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    clustered = "--clustered" in sys.argv
    work = tempfile.mkdtemp(prefix="ann_decade_")
    rng = np.random.default_rng(20260815)
    if clustered:
        # realistic-embedding regime: points concentrate around cluster
        # centers (what trained text/image encoders produce), so the
        # K-NN graph has navigable neighborhood structure — the regime
        # graph ANN is designed for, vs the near-iid worst case below
        n_clusters = max(8, n // 100)
        centers = rng.standard_normal((n_clusters, 64))
        assign = rng.integers(0, n_clusters, n)
        vecs = (centers[assign] + 0.35 * rng.standard_normal((n, 64))).astype(
            np.float32
        )
    else:
        vecs = rng.standard_normal((n, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(map(list, vecs)), pa.list_(pa.float32())),
        }
    )
    os.makedirs(f"{work}/emb20k", exist_ok=True)
    pq.write_table(tbl, f"{work}/emb20k/embeddings.parquet")

    os.environ["VAT_ETL_INDEX_DIR"] = f"{work}/idx"
    from vat_etl_spark.queries import QUERIES
    from vat_etl_spark.queries.similarity import build_graph_index
    from vat_etl_spark.session import get_spark

    spark = get_spark("ann-decade")
    sf = f"{work}/emb20k"
    t0 = time.time()
    build_graph_index(spark, sf)
    build_wall = round(time.time() - t0, 1)
    t0 = time.time()
    rows = QUERIES["ann_graph_search"](spark, sf).collect()
    serve_cold = round(time.time() - t0, 1)
    t0 = time.time()
    rows2 = QUERIES["ann_graph_search"](spark, sf).collect()
    serve_warm = round(time.time() - t0, 1)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    mean = sum(r.recall_at_10 for r in rows) / len(rows)
    touched = max(r.n_scored / r.n_corpus for r in rows)
    print(
        json.dumps(
            {
                "n": n,
                "build_sec": build_wall,
                "serve_cold_sec": serve_cold,
                "serve_warm_sec": serve_warm,
                "recall_at_10": round(mean, 3),
                "per_query": [round(r.recall_at_10, 2) for r in rows],
                "max_touched_frac": round(touched, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
