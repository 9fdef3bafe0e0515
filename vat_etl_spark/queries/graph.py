"""Graph analytics over relationship edges derived from the star schema.

The reference has no graph surface; this is engine-class capability for the
entity-graph workloads a training-data pipeline meets (supplier/customer
linkage, near-dup clusters — see dedup_connected_components for the other
iterative graph op). Spark-first shape: edges and ranks are plain
DataFrames co-partitioned on the join key; each iteration is one
key-partitioned join + one aggregation, with lineage truncated per round so
the plan stays flat at any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vat_etl_spark.queries import query
from vat_etl_spark.sources.catalog import read_table as _t


@query("graph_pagerank")  # rows-only: iterative fixpoint is not one SQL query
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 Jacobi iterations, damping 0.85) on the customer-supplier
    trade graph: an undirected edge per distinct (custkey, suppkey) pair
    that co-occurs in an order, spelled as two directed edges.

    Each iteration: contributions = edges ⋈ ranks on src (both sides hash-
    partitioned on the key — one co-partitioned shuffle), then a sum per
    dst. ``localCheckpoint`` truncates lineage so iteration N's plan does
    not embed iterations 1..N-1 (the standard Spark iterative-algorithm
    discipline, same as dedup_connected_components). No dangling-node term
    is needed because the symmetric edge set gives every node out-degree
    ≥ 1. Determinism, rank positivity, and mass conservation are pinned in
    tests/test_graph.py; the op is rows-only because a bounded-iteration
    fixpoint is not expressible as one DuckDB query (the recursive-CTE
    escape is demonstrated by dedup_connected_components instead)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    ).localCheckpoint(eager=False)
    degree = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select("src").distinct()
    ranks = nodes.select("src", F.lit(1.0).alias("rank"))

    for _ in range(5):
        contribs = (
            edges.join(ranks, "src")
            .join(degree, "src")
            .select(F.col("dst").alias("src"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            nodes.join(
                contribs.groupBy("src").agg(F.sum("c").alias("inflow")), "src", "left"
            )
            .select(
                "src",
                (F.lit(0.15) + F.lit(0.85) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=False)
        )

    is_supplier = F.col("src") >= 1_000_000_000
    node_id = F.when(is_supplier, F.col("src") - 1_000_000_000).otherwise(F.col("src"))
    return ranks.select(
        node_id.alias("node_id"),
        F.when(is_supplier, "supplier").otherwise("customer").alias("node_type"),
        F.col("rank"),
    )
