"""Physical-plan inspection over the formatted explain output."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning evidence)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in (
        formatted_plan(df)
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the physical plan
    (excludes BroadcastExchange, which moves dim-sized data only)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\n\s*(?:\+-|:-)?\s*Exchange ", plan)) + plan.startswith("Exchange")


def _top_level_groups(line: str) -> int:
    """Count top-level [...] groups in a formatted-plan Arguments line."""
    depth = 0
    groups = 0
    for ch in line:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth -= 1
    return groups


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of WindowExec nodes with an EMPTY partition spec — the
    single-partition global windows that serialize at scale. In the
    formatted plan a Window node's Arguments line is
    ``[exprs], [partitionSpec], [orderSpec]`` (3 groups) when partitioned
    and ``[exprs], [orderSpec]`` (2 groups) when global."""
    plan = formatted_plan(df)
    lines = plan.splitlines()
    count = 0
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            for j in range(i + 1, min(i + 6, len(lines))):
                if lines[j].startswith("Arguments:"):
                    if _top_level_groups(lines[j]) < 3:
                        count += 1
                    break
    return count
