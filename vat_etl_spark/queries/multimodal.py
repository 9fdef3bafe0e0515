"""Multimodal + as-of join query registrations (rows-only for the Arrow
mapInPandas featureizer; DuckDB's native ASOF JOIN verifies the as-of
operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vat_etl_spark.operators.asof import asof_join
from vat_etl_spark.operators.multimodal import attach_payload, extract_features
from vat_etl_spark.queries import query
from vat_etl_spark.sources.catalog import read_table as _t


@query("multimodal_features")  # rows-only: mapInPandas featureizer
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload column convention + Arrow-batched feature extraction
    (the deterministic stand-in for image/audio decode — see
    operators/multimodal.py)."""
    docs = _t(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


_ASOF_SQL = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.event_id AS event_id_matched, c.ts AS ts_matched
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@query("asof_purchase_to_click", oracle=_ASOF_SQL)
def asof_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior (or
    simultaneous) click — verified against DuckDB's native ASOF JOIN."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    return asof_join(
        purchases, clicks, on="ts", by=["user_id"], value_cols=["event_id", "ts"]
    )


_FRAMES_SQL = """
WITH mm AS (SELECT doc_id, hex(encode(text)) AS payload_hex,
                   octet_length(encode(text)) AS n_bytes FROM documents),
idx AS (SELECT unnest(generate_series(0, 1023, 2)) AS frame_idx)
SELECT doc_id, frame_idx,
       substring(payload_hex, cast(frame_idx * 128 + 1 AS BIGINT), 128) AS frame_hex,
       cast(len(substring(payload_hex, cast(frame_idx * 128 + 1 AS BIGINT), 128)) / 2 AS BIGINT) AS frame_len
FROM mm CROSS JOIN idx
WHERE frame_idx * 64 < n_bytes
"""


@query("multimodal_frame_sample", oracle=_FRAMES_SQL)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd 64-byte frame from each payload — byte-exact against the
    DuckDB oracle (frames compared as hex; DuckDB slices the hex string
    since it cannot byte-slice blobs)."""
    from vat_etl_spark.operators.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs), frame_bytes=64, every_nth=2)
