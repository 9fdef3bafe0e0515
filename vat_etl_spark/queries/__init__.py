"""Query registry: every operator the engine claims (SURVEY.md §2 + §2.9
extensions) registers a ``(spark, sf_dir) -> DataFrame`` callable here, plus
a DuckDB-runnable ANSI-SQL oracle twin where the semantics are
SQL-expressible. ``__spark_entry__`` re-exports this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` ⇒ rows-only check (non-SQL ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Import for registration side effects — order defines driver run order.
from vat_etl_spark.queries import vat  # noqa: E402,F401
from vat_etl_spark.queries import relational  # noqa: E402,F401
from vat_etl_spark.queries import tpch  # noqa: E402,F401
from vat_etl_spark.queries import windows  # noqa: E402,F401
from vat_etl_spark.queries import functions_lib  # noqa: E402,F401
from vat_etl_spark.queries import events  # noqa: E402,F401
from vat_etl_spark.queries import timeseries  # noqa: E402,F401
from vat_etl_spark.queries import text  # noqa: E402,F401
from vat_etl_spark.queries import dedup  # noqa: E402,F401
from vat_etl_spark.queries import graph  # noqa: E402,F401
from vat_etl_spark.queries import similarity  # noqa: E402,F401
from vat_etl_spark.queries import multimodal  # noqa: E402,F401
from vat_etl_spark.queries import quality  # noqa: E402,F401
from vat_etl_spark.queries import finance  # noqa: E402,F401
