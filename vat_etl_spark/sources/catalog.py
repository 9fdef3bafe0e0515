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


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS). Spark
    version behavior differs, so branch on the inferred schema:

    - Spark ≥4.1 reads NANOS natively as ``timestamp_ntz`` truncated to
      microseconds — verified identical to DuckDB's ``epoch_us(cast(ts AS
      TIMESTAMP))`` down to the microsecond. Cast NTZ→LTZ (identity under
      the UTC session timezone) so downstream ``unix_micros``/window
      functions accept it.
    - Older Sparks reject NANOS unless ``nanosAsLong`` is set, in which
      case ``ts`` arrives as a long of epoch-nanos: integral-divide to
      micros (double division loses precision above 2^53 ns) — the same
      truncation DuckDB applies casting ns→µs, so oracle comparisons agree.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type in ("bigint", "long"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized per (session, sf_dir, table): DataFrames are immutable lazy
    plans, so reuse is safe, and it avoids re-running footer/schema
    inference and file listing on every query that touches the same table —
    the same role a catalog plays on a real cluster.

    Split-granularity note: the testdata ships each table as one parquet
    file with ONE row group, so scan stages run on a single task (the row
    group is Spark's minimum split unit; maxPartitionBytes cannot divide
    it). A measured A/B of hash-repartitioning large tables post-scan showed
    the extra exchange costs MORE than the single-task scan at every bench
    size (e.g. q1 0.27s → 0.55s), so no rescue shuffle is inserted. At real
    scale the layout has many files × many row groups and scan parallelism
    comes from the layout itself — writers here emit 128 MB row groups
    (write_parquet in sinks.py) for exactly that reason."""
    key = (id(spark), sf_dir, name)
    if key not in _TABLE_CACHE:
        if name == "events":
            _TABLE_CACHE[key] = read_events(spark, sf_dir)
        else:
            _TABLE_CACHE[key] = spark.read.parquet(table_path(sf_dir, name))
    return _TABLE_CACHE[key]


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver parquet tables as lazy DataFrames."""
    return {
        name: read_table(spark, sf_dir, name)
        for name in (names or TESTDATA_TABLES)
        if os.path.exists(table_path(sf_dir, name))
    }


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register each table as a temp view for the SQL surface."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV source with an explicit schema (no inference job at scale —
    schema inference reads the data twice). Compression-splittability and
    lack of column statistics make CSV a landing format only; convert to
    parquet before heavy queries."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Same policy as CSV: explicit schema, landing
    format only; nested structs map to StructType/ArrayType columns."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
) -> None:
    """Persist a bucketed + sorted external table: joins/aggregations on the
    bucket columns between co-bucketed tables need NO shuffle (the scan
    reports the hash partitioning). This is the 100 TB strategy for repeated
    fact-fact joins — pay the shuffle once at write time."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC source — the other columnar container Spark reads natively, with
    the same pushdown/pruning/split machinery as parquet (PushedFilters show
    in .explain). Kept for interop with Hive-era warehouses; parquet remains
    the engine's primary format."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_json_tolerant(
    spark: SparkSession, path: str, schema, corrupt_col: str = "_corrupt_record"
) -> DataFrame:
    """JSON-lines source with malformed-record capture: PERMISSIVE mode
    parses what it can and lands the raw text of any unparseable line in
    ``corrupt_col`` instead of failing the job — at scale a single bad line
    in TB of logs must not kill the pipeline. Callers split the result on
    ``corrupt_col IS NULL`` into clean rows and a quarantine sink. (Use
    mode=DROPMALFORMED to silently drop instead; FAILFAST to abort.)"""
    from pyspark.sql import types as T

    full = T.StructType(schema.fields + [T.StructField(corrupt_col, T.StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
