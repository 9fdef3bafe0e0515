"""Multi-executor correctness: the oracle gate re-run under
``local-cluster[2,4,1536]`` — real executor JVM separation, so closures
serialize over RPC, broadcasts actually transfer, and shuffles cross
process boundaries. ``local[32]`` shares one JVM and can hide
serialization and broadcast bugs; this is the closest local proxy to the
1000-executor deployment the engine is designed for.

Runs in a SUBPROCESS because a SparkContext's master is fixed per JVM —
the session-scoped ``local[32]`` fixture and this cluster session cannot
coexist in one process.
"""

from __future__ import annotations

import os
import subprocess
import sys

# A representative slice of every subsystem: flagship reshape, exact-decimal
# wide agg, broadcast dim join, two-pass rank family (cross-executor
# boundary/offset broadcasts), sessionization window, Arrow/pandas UDF
# exchange, postings-shuffle text ranking, hash-coin sampling, and the
# broadcast-eval decontamination join. The heavy-shuffle tier
# (shingle-explode LSH, iterative BPE with mid-lineage checkpoints,
# two-round PRF retrieval, composed IVF+PQ+rerank) exercises
# cross-executor broadcast of models/boundaries and multi-round jobs —
# exactly what single-JVM local[32] can hide.
CLUSTER_SET = [
    "vat_summary",
    "q1_pricing_summary",
    "q5_region_revenue",
    "agg_gini_concentration",
    "events_rfm_segmentation",
    "events_sessionize",
    "events_user_stats_pandas",
    "text_bm25_ranking",
    "pipeline_domain_mix",
    "pipeline_contamination_containment",
    "dedup_minhash_banded",
    "text_bpe_merges",
    "retrieval_prf_rm3",
    "ann_ivfpq_search",
    # round-7 additions: the span-index join + doc-partitioned interval
    # merge + map-only reconstruct (cross-executor span shuffle), the
    # bigram-type re-aggregation stack (KN), and the int64 Jacobi
    # iterations with per-round localCheckpoint lineage cuts
    "pipeline_span_removal",
    "text_kneser_ney_bigram",
    "graph_pagerank",
    "pipeline_line_dedup",
    "pipeline_perplexity_buckets",
    # map-only classifier inference (codegen-only plan must survive real
    # executor separation) and the min-count-pruned collocation joins
    "pipeline_quality_classifier",
    "text_collocation_pmi",
    # round-8 additions: the Arrow simhash vote (pandas_udf batches must
    # serialize over real RPC inside the banded admission gate) and the
    # serve-only beam search reading the persisted graph index from disk
    # across executor processes
    "corpus_neardup_admit_planted",
    "ann_graph_search",
]

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local-cluster[2,4,1536]")
    .appName("cluster-parity")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from vat_etl_spark.oracle import run_all
res = run_all(spark, {sf!r}, only={names!r})
bad = [m for ok, m in res.values() if not ok]
for name, (ok, msg) in sorted(res.items()):
    print(("PASS " if ok else "FAIL ") + msg, flush=True)
spark.stop()
assert len(res) == len({names!r}), (len(res), "queries missing from run")
assert not bad, bad
print("CLUSTER-PARITY-GREEN", flush=True)
"""


def test_oracle_parity_on_local_cluster(sf_smoke):
    """Every query in the slice must be rows+schema+hash identical to the
    DuckDB oracle when executed across two separate executor JVMs."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, sf=sf_smoke, names=CLUSTER_SET)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-25:])
    assert proc.returncode == 0, tail
    assert "CLUSTER-PARITY-GREEN" in proc.stdout, tail


def test_release_engine_caches_unpersists_lazy_query_caches(spark, sf_smoke):
    """ADVICE-r13 helper: registered lazy queries persist internal frames
    that accumulate across invocations; release_engine_caches must drop
    them all (CacheManager + straggler RDDs) and the query must still
    re-run correctly afterwards (caches rebuild lazily)."""
    from vat_etl_spark.queries import QUERIES
    from vat_etl_spark.session import release_engine_caches

    before = {
        tuple(sorted(r))
        for r in QUERIES["dedup_minhash_banded"](spark, sf_smoke).collect()
    }
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > 0
    release_engine_caches(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
    after = {
        tuple(sorted(r))
        for r in QUERIES["dedup_minhash_banded"](spark, sf_smoke).collect()
    }
    assert after == before and len(after) > 0
    release_engine_caches(spark)
