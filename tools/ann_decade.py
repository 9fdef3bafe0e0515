"""ANN build/serve decade harness: seeded synthetic vector corpora one or
more decades above the testdata embeddings (2 K at sf0.1), in BOTH data
regimes:

- near-iid (default): the hardest case for graph navigation — the audit
  preset's worst-case sizing is measured here;
- --clustered: the realistic-trained-embedding regime (points concentrate
  around cluster centers) — the regime graph ANN is designed for, where
  the production ('clustered') preset is sized.

Measures (a) build wall, (b) serve-only wall (ann_graph_serve — no exact
pass, the thing the bench gate times), (c) recall@10 + touched fraction
under the chosen SERVE_PRESETS budget (graph_search_audit — the exact
pass is the evaluation harness and is timed separately).

Usage: python tools/ann_decade.py [N] [--clustered] [--preset audit|clustered]
(default N=20000, preset=audit; prints one JSON line)
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 20_000
    clustered = "--clustered" in sys.argv
    preset = (
        sys.argv[sys.argv.index("--preset") + 1]
        if "--preset" in sys.argv
        else "audit"
    )
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
    from vat_etl_spark.queries.similarity import (
        ann_graph_serve,
        build_graph_index,
        graph_search_audit,
    )
    from vat_etl_spark.session import get_spark

    spark = get_spark("ann-decade")
    sf = f"{work}/emb20k"
    t0 = time.time()
    build_graph_index(spark, sf)
    build_wall = round(time.time() - t0, 1)
    # serve-only wall (the benched path): cold then warm
    t0 = time.time()
    serve_rows = ann_graph_serve(spark, sf, preset=preset).collect()
    serve_cold = round(time.time() - t0, 1)
    t0 = time.time()
    serve_rows2 = ann_graph_serve(spark, sf, preset=preset).collect()
    serve_warm = round(time.time() - t0, 1)
    assert sorted(map(tuple, serve_rows)) == sorted(map(tuple, serve_rows2))
    # recall + touched fraction under the same preset (exact pass =
    # evaluation harness, timed separately so serve walls stay clean)
    t0 = time.time()
    rows = graph_search_audit(spark, sf, preset=preset).collect()
    audit_wall = round(time.time() - t0, 1)
    mean = sum(r.recall_at_10 for r in rows) / len(rows)
    touched = max(r.n_scored / r.n_corpus for r in rows)
    print(
        json.dumps(
            {
                "n": n,
                "regime": "clustered" if clustered else "near-iid",
                "preset": preset,
                "build_sec": build_wall,
                "serve_cold_sec": serve_cold,
                "serve_warm_sec": serve_warm,
                "audit_sec": audit_wall,
                "recall_at_10": round(mean, 3),
                "per_query": [round(r.recall_at_10, 2) for r in rows],
                "max_touched_frac": round(touched, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
