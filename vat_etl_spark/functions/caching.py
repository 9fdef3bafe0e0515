"""Latest-call-only persistence: bound repeated query invocations to ONE
live cached copy per site.

Several queries persist an intermediate frame that multiple downstream
branches (or the two-pass rank helpers' driver jobs) consume. A bare
``persist()`` with no unpersist leaks one cached copy PER INVOCATION —
bench passes rebuild queries 6× per run and the oracle/plan gates build
every registered query per session, so the leak compounds into storage
pressure that skews exactly the timings being measured.

``cache_latest(key, *dfs)`` persists the given frames and unpersists
whatever the previous call with the same key persisted. A previous
invocation's returned DataFrame stays VALID — unpersist only drops cached
blocks; re-collecting it recomputes from lineage (all sites here persist
purely as an intra-invocation optimization, never for correctness)."""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LATEST: dict[str, list[DataFrame]] = {}
_LOCK = threading.Lock()


def cache_latest(key: str, *dfs: DataFrame) -> tuple[DataFrame, ...]:
    # ORDER MATTERS: unpersist the previous invocation's handles BEFORE
    # persisting the new ones. A repeat invocation produces the same
    # analyzed plan, so persist-then-unpersist would no-op the persist
    # ("already cached") and then drop the SHARED cache entry — leaving
    # the frame uncached.
    with _LOCK:
        for old in _LATEST.pop(key, []):
            try:
                old.unpersist()
            except Exception:
                pass  # a stopped/replaced session invalidates old handles
        out = [df.persist() for df in dfs]
        _LATEST[key] = out
    return tuple(out)


def clear_cache(key: str | None = None) -> None:
    """Drop cached handles (all keys, or one) — call on session stop so the
    registry does not pin DataFrames (and their SparkSession) for the
    process lifetime."""
    with _LOCK:
        keys = [key] if key is not None else list(_LATEST)
        old_dfs = [df for k in keys for df in _LATEST.pop(k, [])]
    for old in old_dfs:
        try:
            old.unpersist()
        except Exception:
            pass
