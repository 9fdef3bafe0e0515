"""Sources & sinks: parquet/csv/json readers (the scale path), the Excel
workbook driver-side bridge (reference parity, SURVEY.md §2.1 S1-S3), and
JDBC/SQLite/xlsx sinks (S5-S6).
"""

from vat_etl_spark.sources.catalog import load_tables, register_views

__all__ = ["load_tables", "register_views"]
