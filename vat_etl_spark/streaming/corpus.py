"""Continuous corpus ingest: quality gate + incremental dedup as a
Structured Streaming ``foreachBatch`` job with a PERSISTENT content-key
index — the production path for building a training corpus from a feed
that never stops.

Per micro-batch: score arriving documents with the shared batch/stream
quality gate (queries/llm_pipeline.py:quality_flags), dedup them against
the accumulated key index (left-anti join — historical documents are
touched ONLY as their compact key index, same delta discipline as
``pipeline_incremental_dedup``) and within the batch itself (rank-1 per
key), then atomically append the admitted docs to the corpus and their
keys to the index. The engine's checkpoint makes the whole thing
exactly-once per micro-batch: on restart a replayed batch re-runs the same
deterministic admit logic.

At 100 TB the index is a bucketed table on the 16-byte fingerprint and the
anti-join co-locates on the bucket key; here the content key is the 2-token
prefix (this corpus has no exact duplicates — see
pipeline_cross_source_dedup)."""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vat_etl_spark.queries.llm_pipeline import quality_flags
from vat_etl_spark.queries.text import tokens_expr


def _content_key():
    return F.concat_ws(" ", F.slice(tokens_expr(F.col("text")), 1, 2))


def admit_batch(batch: DataFrame, out_dir: str) -> None:
    """Deterministic per-micro-batch admit step (also directly unit-testable
    without a stream): quality gate → anti-join vs persisted index →
    in-batch rank-1 per key → append corpus + index."""
    spark = batch.sparkSession
    keyed = (
        batch.withColumn("content_key", _content_key())
        .join(
            quality_flags(batch).filter(F.col("passes")).select("doc_id"),
            "doc_id",
        )
    )
    idx_path = f"{out_dir}/key_index"
    if pathlib.Path(idx_path).exists():
        existing = spark.read.parquet(idx_path).select("content_key").distinct()
        fresh = keyed.join(existing, "content_key", "left_anti")
    else:
        fresh = keyed
    w = W.partitionBy("content_key").orderBy("doc_id")
    admitted = (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # persist via a stable snapshot: both writes below re-execute `admitted`,
    # and the second must not observe the index rows the first just added
    admitted = admitted.localCheckpoint(eager=True)
    admitted.write.mode("append").parquet(f"{out_dir}/docs")
    admitted.select("content_key").write.mode("append").parquet(idx_path)


def corpus_ingest_stream(
    spark: SparkSession, src_dir: str, out_dir: str, schema=None
):
    """Wire :func:`admit_batch` into a file-source stream. Returns the
    started query; drain with ``availableNow`` triggers in tests."""
    if schema is None:
        schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, epoch_id: admit_batch(df, out_dir)
        )
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
