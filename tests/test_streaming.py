"""Structured Streaming micro-batch tests: stream results must equal the
batch plan over the same files (same builders, different source)."""

from __future__ import annotations

import pytest

from vat_etl_spark.sources.catalog import read_events
from vat_etl_spark.streaming import (
    dedup_within_watermark,
    run_available_now,
    sessionize_stream,
    stream_events,
    windowed_totals,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # stage sf0.001 events (ns→µs converted) as a stream-readable directory
    path = str(tmp_path_factory.mktemp("events_stream"))
    read_events(spark, "/root/testdata/sf0.001").write.mode("overwrite").parquet(path)
    return path


def _rows(df, keys):
    return sorted(tuple(r[k] for k in keys) for r in df.collect())


def test_windowed_totals_stream_equals_batch(spark, events_dir):
    batch = windowed_totals(spark.read.parquet(events_dir))
    stream = windowed_totals(stream_events(spark, events_dir))
    assert stream.isStreaming
    got = run_available_now(stream, "wt_test", "complete")
    keys = ["win_start", "event_type", "n_events", "total_value"]
    assert _rows(got, keys) == _rows(batch, keys)


def test_sessionize_stream_equals_batch(spark, events_dir):
    batch = sessionize_stream(spark.read.parquet(events_dir))
    stream = sessionize_stream(stream_events(spark, events_dir))
    got = run_available_now(stream, "sess_test", "complete")
    keys = ["user_id", "session_start", "session_last", "n_events"]
    assert _rows(got, keys) == _rows(batch, keys)


def test_dedup_within_watermark_stream(spark, events_dir):
    stream = dedup_within_watermark(stream_events(spark, events_dir))
    got = run_available_now(stream, "dedup_test", "append")
    batch = spark.read.parquet(events_dir)
    # event_ids are unique in the source → dedup is a no-op row-wise pass
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()
