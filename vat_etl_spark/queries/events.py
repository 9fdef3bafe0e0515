"""Event-time operators over the ``events`` table — the batch twins of the
structured-streaming surface (vat_etl_spark/streaming/). Tumbling / sliding /
session windows and keep-earliest dedup, all oracle-verified; the streaming
module reuses the same builders over ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vat_etl_spark.functions.numeric import dsum, dsum_sql
from vat_etl_spark.queries import query
from vat_etl_spark.sources.catalog import read_table as _t


_TUMBLING_SQL = f"""
SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start, event_type,
  count(*) AS n_events, {dsum_sql("value")} AS total_value
FROM events GROUP BY 1, 2
"""


@query("events_tumbling_window", oracle=_TUMBLING_SQL)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows (batch form of the streaming
    windowed aggregation; add withWatermark on a stream)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value")
    )


_SLIDING_SQL = f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS w, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS w, value
  FROM events
)
SELECT w AS win_start, count(*) AS n_events, {dsum_sql("value")} AS total_value
FROM assigned GROUP BY w
"""


@query("events_sliding_window", oracle=_SLIDING_SQL)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): each event lands in two
    windows; the SQL twin materializes the same assignment via UNION ALL."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
    )


_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL '30 minutes'
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_last, count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
"""


@query("events_sessionize", oracle=_SESSION_SQL)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user, via the native
    session_window operator — on a stream this becomes stateful session
    aggregation with watermark-driven eviction."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_last", "n_events")
    )


_DEDUP_SQL = """
SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
FROM (
  SELECT user_id, event_type, event_id, ts,
    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


@query("events_dedup_earliest", oracle=_DEDUP_SQL)
def events_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-earliest dedup per (user, event_type) — deterministic alternative
    to dropDuplicates (which keeps an arbitrary row); the streaming twin is
    dropDuplicatesWithinWatermark."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id", "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- applyInPandas per-group operator -----------------------------------------

_USER_STATS_SQL = """
SELECT user_id, count(*) AS n_events,
       cast(sum(cast(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM events GROUP BY user_id
"""


@query("events_user_stats_pandas", oracle=_USER_STATS_SQL)
def events_user_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stats via ``groupBy(...).applyInPandas`` — the engine's
    custom-group-operator surface (Arrow-batched, one pandas frame per key
    group). Money is fixed-point (integer cents via floor(x*100+0.5), the
    same expression the oracle runs) so the result is order-independent and
    engine-exact. The plan shuffles once on user_id, identical to the
    equivalent built-in aggregate; at 100 TB the same code runs with
    per-group memory bounded by the largest single user."""
    import pandas as pd

    e = _t(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100 + 0.5).cast("long")
    )

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_cents": [int(pdf["cents"].sum())],
                "first_ts": [pdf["ts"].min()],
                "last_ts": [pdf["ts"].max()],
            }
        )

    out_schema = (
        "user_id bigint, n_events bigint, total_cents bigint, "
        "first_ts timestamp, last_ts timestamp"
    )
    return e.groupBy("user_id").applyInPandas(stats, out_schema)


_GAPS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_last,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_seq
"""


@query("events_gaps_islands", oracle=_GAPS_SQL)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: lag to mark gap starts, running sum
    to number sessions, group — the windowed-SQL form of session_window
    (pytest asserts both produce identical sessions). One shuffle on
    user_id shared by the window and the aggregate."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = e.select(
        "user_id", "ts",
        F.when(gap > 30 * 60, 1).otherwise(0).alias("new_session"),
    )
    wrun = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
    numbered = marked.select(
        "user_id", "ts", F.sum("new_session").over(wrun).alias("session_seq")
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_last"),
        F.count("*").alias("n_events"),
    )
