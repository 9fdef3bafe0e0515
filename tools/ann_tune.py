"""Ad-hoc graph-ANN serve recall probe (round-10 tuning harness).

Measures ann_graph_search mean recall@10 + n_scored at a given sf dir,
with a fresh index dir so tuning never poisons the repo's artifacts.

Usage: python tools/ann_tune.py [sf_dir]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VAT_ETL_INDEX_DIR", tempfile.mkdtemp(prefix="annidx_"))

from pyspark.sql import SparkSession

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from vat_etl_spark.queries import QUERIES  # noqa: E402

t0 = time.time()
rows = QUERIES["ann_graph_search"](spark, sf).collect()
t1 = time.time()
mean = sum(r.recall_at_10 for r in rows) / len(rows)
touched = max(r.n_scored / r.n_corpus for r in rows)
print(
    f"serve recall@10 mean={mean:.3f} "
    f"per-query={[round(r.recall_at_10, 2) for r in rows]} "
    f"max_touched={touched:.4f} n_corpus={rows[0].n_corpus} "
    f"wall={t1 - t0:.1f}s (incl. build)"
)
t2 = time.time()
rows2 = QUERIES["ann_graph_search"](spark, sf).collect()
t3 = time.time()
assert sorted(map(tuple, rows2)) == sorted(map(tuple, rows))
print(f"serve-only wall={t3 - t2:.1f}s (prebuilt index)")
b = QUERIES["ann_nndescent"](spark, sf).collect()
bi = sum(r.recall_init for r in b) / len(b)
bf = sum(r.recall_final for r in b) / len(b)
print(f"build graph recall: init={bi:.3f} final={bf:.3f} audited={len(b)}")
