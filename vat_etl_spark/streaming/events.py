"""Streaming event-time operators: the batch queries in
vat_etl_spark/queries/events.py re-expressed over an unbounded source.

Design: the *same aggregation expressions* serve batch and streaming — the
builders below take any events-shaped DataFrame (batch or stream). Batch
twins are oracle-verified (queries/events.py); the streaming-specific
behavior (watermark eviction, incremental state) is covered by pytest
micro-batch runs (availableNow trigger → memory sink) asserting stream
results equal the batch plan over the same files.

Scale notes: windowed aggregations keep state per (window, key) — watermarks
bound that state; sessionization state is per active session; dedup state is
bounded by dropDuplicatesWithinWatermark. Shuffle partitioning follows the
grouping keys exactly as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vat_etl_spark.functions.numeric import dsum

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events-shaped parquet directory (µs
    timestamps — see sources.catalog.read_events for the ns conversion when
    staging from the raw testdata). ``max_files_per_trigger`` caps each
    micro-batch — the knob that makes a finite directory replay as MANY
    batches so event-time watermarks actually advance during a test or
    backfill run."""
    r = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def windowed_totals(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window totals per event_type. On a stream the watermark
    bounds state and admits late data up to the threshold."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value")
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (inactivity gap); stateful session merge on a
    stream, plain session_window aggregate in batch."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_last", "n_events")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once-per-event_id dedup with bounded state (streaming) /
    plain dropDuplicates (batch)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain the stream with an availableNow trigger into a memory sink and
    return the materialized result (micro-batch test harness). Use
    ``output_mode="complete"`` for aggregations, ``"append"`` for row-wise
    operators (dedup emits rows immediately and keeps state for future
    duplicates)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def user_running_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, total_cents), emitting the updated totals every
    micro-batch the user appears in. This is the engine's escape hatch for
    stateful logic session_window/dropDuplicates can't express (counters,
    custom sessionization policies, online features).

    State is one small tuple per user — bounded, mergeable, checkpointed by
    the streaming engine; at scale the shuffle partitions on user_id exactly
    like the equivalent batch aggregate. Money is integer cents
    (floor(x*100+0.5)) so totals are order- and batching-independent.

    Note: Spark 4's successor API (transformWithStateInPandas — typed
    ValueState/ListState/MapState, timers, TTL) requires the python
    ``protobuf`` package, which this container lacks; probed and gated.
    This operator covers the same per-key-state contract.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_cents", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("cents", T.LongType())]
    )

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def purchases_with_recent_clicks(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same user's
    clicks within the preceding ``horizon``. On streams both sides carry
    watermarks and the interval condition bounds the buffered state (clicks
    older than the horizon past the watermark are evicted); in batch the
    same plan is a plain range join. One shuffle on user_id either way.

    ``how="left_outer"`` keeps click-less purchases (right side of the
    select order): on a stream the NULL-padded rows can only be emitted
    once the watermark passes the purchase's join window — matches still
    emit immediately, so an outer stream-stream join trades tail latency
    on the unmatched rows for exactly-once correctness, and rows still
    inside the final watermark when the stream ends are withheld (the
    batch twin has no such cutoff — tests account for it).

    Only ``inner`` and ``left_outer`` are defined for this operator: the
    select order fixes purchases as the preserved side, so e.g.
    ``right_outer`` would silently preserve unmatched *clicks* and a semi
    join would drop the click columns the select needs."""
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"how={how!r} unsupported: purchases_with_recent_clicks defines "
            "'inner' and 'left_outer' (purchases preserved) only"
        )
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"), F.col("value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", horizon)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", horizon)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    joined = c.join(p, cond, how) if how == "inner" else p.join(c, cond, how)
    return joined.select(
        F.col("p_user").alias("user_id"), "purchase_id", "purchase_ts",
        "click_id", "click_ts", "value",
    )


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: a streaming fact side against a static (batch)
    dimension — planned as a broadcast hash join per micro-batch, no
    streaming state at all. The pattern for joining a 100 TB event stream
    to reference data."""
    return events.join(F.broadcast(dim), "event_type", "left")
