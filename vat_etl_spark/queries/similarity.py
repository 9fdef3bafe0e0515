"""Similarity search over ``embeddings`` (north-star extension): brute-force
cosine top-k (the exact baseline, oracle-verified bit-for-bit) and an
LSH-bucketed approximate variant (the scale path).

Scale notes: brute force is O(Q·N) — fine when Q is small and N is sharded
(each partition scores its slice, TakeOrderedAndProject merges top-k). For
N×N all-pairs at 100 TB, bucket by random-projection signature so the join
is per-bucket (BucketedRandomProjectionLSH below), with AQE skew-split on
hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vat_etl_spark.queries import query
from vat_etl_spark.queries.dedup import cosine_expr, _dbl
from vat_etl_spark.sources.catalog import read_table as _t

_KNN_SQL = """
WITH q AS (SELECT vec_id AS qid, cast(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(q.qv, cast(e.embedding AS DOUBLE[])) AS cosine
  FROM q JOIN embeddings e ON e.vec_id != q.qid
)
SELECT qid, nid, cosine, rank FROM (
  SELECT qid, nid, cosine,
         cast(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 5
"""


@query("knn_bruteforce_cosine", oracle=_KNN_SQL)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors (vec_id < 5).
    Broadcast the tiny query side; per-partition scoring + windowed top-k."""
    em = _t(spark, sf_dir, "embeddings")
    q = (
        em.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("qid"), _dbl(F.col("embedding")).alias("qv"))
    )
    e = em.select(F.col("vec_id").alias("nid"), _dbl(F.col("embedding")).alias("ev"))
    scored = (
        e.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .select("qid", "nid", cosine_expr(F.col("qv"), F.col("ev")).alias("cosine"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.select("qid", "nid", "cosine", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 5)
    )


_CENTROID_SQL = """
SELECT label, count(*) AS n_vectors,
  avg(list_cosine_similarity(cast(embedding AS DOUBLE[]),
                             cast([1.0] || repeat([0.0], 63) AS DOUBLE[]))) AS avg_axis0_cos
FROM embeddings GROUP BY label
"""


@query("similarity_label_profile")  # rows-only: avg-of-floats is order-dependent
def similarity_label_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cohort profile (IVF-style coarse partition statistics)."""
    em = _t(spark, sf_dir, "embeddings")
    axis0 = F.array(*([F.lit(1.0)] + [F.lit(0.0)] * 63))
    cos = cosine_expr(_dbl(F.col("embedding")), axis0)
    return em.groupBy("label").agg(
        F.count("*").alias("n_vectors"), F.avg(cos).alias("avg_axis0_cos")
    )


@query("ann_lsh_bucketed")  # rows-only: BRP-LSH hashing is Spark-specific
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via BucketedRandomProjectionLSH:
    signature buckets make the candidate join per-bucket instead of N×N —
    the 100 TB scale path for similarity join."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    em = _t(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(_dbl(F.col("embedding"))).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=42,
    )
    model = lsh.fit(em)
    pairs = model.approxSimilarityJoin(em, em, 1.2, distCol="l2_dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.col("l2_dist"),
        )
    )
