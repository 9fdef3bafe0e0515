"""Testdata catalog: parquet readers for the driver tables (TESTDATA.md).

Parquet is the engine's primary scale format — columnar, statistics for
row-group skipping, splittable. Readers are plain ``spark.read.parquet`` so
Catalyst gets full pushdown/pruning; no schema override is needed because the
footers carry exact types (FIXTURES.md §B).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from vat_etl_spark.schemas import TESTDATA_TABLES


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver parquet tables as lazy DataFrames."""
    return {
        name: spark.read.parquet(table_path(sf_dir, name))
        for name in (names or TESTDATA_TABLES)
        if os.path.exists(table_path(sf_dir, name))
    }


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register each table as a temp view for the SQL surface."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
