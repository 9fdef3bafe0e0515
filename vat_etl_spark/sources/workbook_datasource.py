"""A custom Python DataSource (Spark 4 DataSource API) for sheet-per-file
workbooks: a directory of per-sheet CSVs (the openpyxl-free stand-in for an
xlsx workbook — swap the per-partition reader body for openpyxl row
iteration when the library is present and the distribution story is
identical).

This is the distributed alternative to the driver-side pandas bridge
(sources/excel.py, reference S1-S3): each SHEET becomes one input partition,
so sheet reads parallelize across executors, and the sheet name rides along
as the ``SourceSheet`` lineage column exactly as the reference retains it
(fianl2.py:161). Header handling per partition mirrors the reference:
detect the header row within the first 30 rows (≥2 keyword hits), normalize
NFKD/NBSP, rename through the exact alias map.

Usage:

    spark.dataSource.register(WorkbookDataSource)
    df = spark.read.format("vat_workbook").load("/path/to/workbook_dir")
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

from vat_etl_spark.functions.headers import (
    canonical_rename,
    detect_header_row,
)
from vat_etl_spark.schemas import VAT_REQUIRED_COLUMNS

WORKBOOK_SCHEMA = StructType(
    [StructField(c, StringType()) for c in VAT_REQUIRED_COLUMNS]
    + [StructField("SourceSheet", StringType())]
)


class SheetPartition(InputPartition):
    def __init__(self, path: str, sheet: str):
        self.path = path
        self.sheet = sheet


class WorkbookReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("vat_workbook requires a path (directory of sheet CSVs)")

    def partitions(self):
        import os

        sheets = sorted(
            f for f in os.listdir(self.dir) if f.lower().endswith(".csv")
        )
        if not sheets:
            raise ValueError(f"no sheets (*.csv) found in {self.dir!r}")
        return [
            SheetPartition(os.path.join(self.dir, f), os.path.splitext(f)[0])
            for f in sheets
        ]

    def read(self, partition: SheetPartition):
        # runs ON THE EXECUTOR — one sheet per task. csv.reader stands in
        # for openpyxl's row iterator; everything else is format-agnostic.
        import csv

        with open(partition.path, newline="", encoding="utf-8") as fh:
            rows = list(csv.reader(fh))
        if not rows:
            return
        header_row = detect_header_row(rows)
        header = canonical_rename(rows[header_row])
        idx = {name: i for i, name in enumerate(header)}
        for raw in rows[header_row + 1 :]:
            yield tuple(
                raw[idx[c]] if c in idx and idx[c] < len(raw) and raw[idx[c]] != "" else None
                for c in VAT_REQUIRED_COLUMNS
            ) + (partition.sheet,)


class WorkbookDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vat_workbook"

    def schema(self) -> StructType:
        return WORKBOOK_SCHEMA

    def reader(self, schema: StructType) -> WorkbookReader:
        return WorkbookReader(self.options)
