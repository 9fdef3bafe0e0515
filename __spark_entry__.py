"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship VAT box summary on sf0.001 (smoke).
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin for each query; the driver
compares row-count + schema + order-insensitive value-hash at sf=0.01.

Cross-engine float policy: every money aggregate goes through exact
DECIMAL(30,6) sums (see vat_etl_spark/functions/numeric.py) so Spark and
DuckDB produce bit-identical doubles after round(·, 2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vat_etl_spark.queries import QUERIES, ORACLE_SQL


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["vat_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
