"""Sinks: parquet (scale path), SQLite (reference S6 parity,
fianl2.py:253-258), xlsx (reference S5 parity, fianl2.py:241-250).

The reference's two export sinks operate on the tiny summary frame (4 rows
per period), so collect-to-driver is correct there; anything row-scale goes
through ``df.write`` (partitioned parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink. Row groups are capped at 128 MB (explicit here, also
    the parquet-mr default): the row group is Spark's minimum scan-split
    unit, so the write-side cap is what guarantees read-side parallelism —
    a reader gets ≥ ceil(bytes / 128 MB) tasks per file regardless of how
    the file count maps to cores."""
    w = df.write.mode("overwrite").option("parquet.block.size", str(128 * 1024 * 1024))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_sqlite(df: DataFrame, db_path: str, table: str = "vat_summary") -> None:
    """Full-replace SQLite table (compat with ``to_sql(if_exists="replace")``).

    Collect-and-insert via the stdlib driver — the summary is tiny by
    construction; large frames should use parquet or a real JDBC warehouse.
    """
    import sqlite3

    rows = df.collect()
    cols = df.columns
    conn = sqlite3.connect(db_path)
    try:
        qcols = ", ".join(f'"{c}"' for c in cols)
        conn.execute(f'DROP TABLE IF EXISTS "{table}"')
        defs = ", ".join(f'"{c}"' for c in cols)
        conn.execute(f'CREATE TABLE "{table}" ({defs})')
        ph = ", ".join("?" for _ in cols)
        conn.executemany(
            f'INSERT INTO "{table}" ({qcols}) VALUES ({ph})',
            [tuple(r[c] for c in cols) for r in rows],
        )
        conn.commit()
    finally:
        conn.close()


def write_xlsx(df: DataFrame, path: str, sheet_name: str = "VAT_Summary") -> None:
    """Excel export of a small result frame (reference S5)."""
    pdf = df.toPandas()
    try:
        pdf.to_excel(path, sheet_name=sheet_name, index=False)
    except (ImportError, ModuleNotFoundError) as e:  # engine not in container
        raise NotImplementedError("xlsx writer engine not installed") from e


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (native, columnar, splittable — same stripe-size reasoning
    as write_parquet's row-group cap)."""
    w = df.write.mode("overwrite").option("orc.stripe.size", str(64 * 1024 * 1024))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    row_group_bytes: int | None = None,
) -> None:
    """Range-clustered parquet: repartitionByRange on the cluster keys +
    sortWithinPartitions before writing, so each output file — and each row
    group inside it — covers a NARROW, non-overlapping key range. Parquet
    stores per-row-group min/max statistics; a clustered layout is what
    turns those stats (and any engine's row-group/file skipping) from
    no-ops into near-partition-pruning: a point or range predicate on the
    cluster key then touches O(selectivity) row groups instead of all of
    them. This is the poor-man's Z-order for 1-D keys — the right default
    for a 100 TB fact table's sort key. Verified by
    tests/test_sinks.py::test_clustered_write_narrows_row_group_stats via
    pyarrow row-group metadata.
    """
    out = df.repartitionByRange(*([n_files] if n_files else []), *cluster_by)
    out = out.sortWithinPartitions(*cluster_by)
    w = out.write.mode("overwrite")
    if row_group_bytes:
        w = w.option("parquet.block.size", str(row_group_bytes))
    w.parquet(path)


def compact_parquet_dir(
    spark, src: str, dst: str, target_file_bytes: int = 512 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory into
    ⌈total_bytes / target⌉ right-sized files. The small-files problem is
    quadratic at 100 TB — a million 1 MB files cost a scheduler wave and a
    footer fetch each per query; nightly compaction into ~512 MB files (a
    few row groups each) keeps scan task counts proportional to data, not
    to ingest batch count. Returns the output file count. Coalesce, not
    repartition: merging files needs no shuffle.

    Flat directories only: a hive-partitioned source would both defeat the
    top-level size estimate and lose its partition-column layout through a
    plain read→coalesce→write, so it is rejected explicitly (compact each
    leaf partition directory instead)."""
    import pathlib

    root = pathlib.Path(src)
    subdirs = [p for p in root.iterdir() if p.is_dir()]
    if any("=" in p.name for p in subdirs):
        raise ValueError(
            f"{src} is hive-partitioned; compact each leaf partition "
            "directory separately to preserve the partition layout"
        )
    if subdirs:
        # any other nested dir would be counted by the rglob size estimate
        # yet skipped by the non-recursive spark.read.parquet — reject
        # rather than silently mis-size or drop data
        raise ValueError(
            f"{src} contains subdirectories {sorted(p.name for p in subdirs)[:3]}; "
            "compact_parquet_dir only accepts flat parquet directories"
        )
    total = sum(f.stat().st_size for f in root.rglob("*.parquet"))
    n = max(1, -(-total // target_file_bytes))
    spark.read.parquet(src).coalesce(n).write.mode("overwrite").parquet(dst)
    return n
