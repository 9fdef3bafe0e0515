"""Structured Streaming surface (SURVEY.md §7 tier 5). The reference is
upload-triggered batch (its re-execution model is Streamlit's whole-script
rerun, fianl2.py:198-259); the engine's streaming tier maps the same
event-time operators onto readStream/writeStream with watermarks.
"""

from vat_etl_spark.streaming.events import (
    dedup_within_watermark,
    enrich_stream_with_dim,
    purchases_with_recent_clicks,
    run_available_now,
    sessionize_stream,
    stream_events,
    user_running_totals_stateful,
    windowed_totals,
)

__all__ = [
    "stream_events",
    "windowed_totals",
    "sessionize_stream",
    "dedup_within_watermark",
    "run_available_now",
    "user_running_totals_stateful",
    "purchases_with_recent_clicks",
    "enrich_stream_with_dim",
]
