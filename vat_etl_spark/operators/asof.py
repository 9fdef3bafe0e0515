"""As-of join — a custom operator Spark's DataFrame API lacks natively,
composed from built-in ops (union + last_value window), per the engine's
custom-operator policy (SURVEY.md §2.9 mapping strategy (a)).

For each left row, find the most recent right row with
``right.ts <= left.ts`` within the same ``by`` key (direction="backward").

Implementation: tag and union both sides on aligned schemas, sort each key
partition by (ts, tag, tiebreak), and carry the right side's attributes
forward with last_value(ignoreNulls) — ONE shuffle on the by-key, no range
explosion, no per-key loop. This is the scalable pattern: a naive non-equi
join (l.ts >= r.ts) explodes to O(n·m) pairs per key before aggregation;
the union-window form is O((n+m) log(n+m)) per key and streams through a
single sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str],
    value_cols: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of join: left rows + last preceding right row's
    ``value_cols`` (NULL when no right row precedes). ``on`` is the ordering
    (time) column present in both sides; ``by`` the equality keys.

    Right rows at exactly ``left.ts`` match (<=), mirroring the usual
    as-of convention.
    """
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.struct(*lcols).alias("__l"),
    )
    tagged_right = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(
            tagged_left.schema["__l"].dataType
        ).alias("__l"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at equal ts (tag 0 < 1) → <= semantics
    w = (
        W.partitionBy(*by)
        .orderBy("__ts", "__tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"{c}{suffix}") for c in value_cols],
    )
    return out
