"""Driver-local rows as a JVM-local relation, not a pickled-Python RDD.

``spark.createDataFrame(rows, ddl)`` over a plain Python list builds a
pickled RDD whose partitions are materialized by Python workers at
EXECUTION time — every action over the frame pays the JVM→Python worker
handshake. Two measured pathologies at local[32] (OPTIMIZATION_r14.md,
guide §4):

- ``.coalesce(1).write`` over such a frame collapses its
  default-parallelism partitions into ONE task that iterates every
  (mostly empty) parent partition through the Python-worker handshake
  serially: 5.7-8.5 s to write ONE metadata row, vs 0.3-0.5 s for the
  same rows shipped as a JVM local relation.
- As a small join/broadcast side inside a registered query, the Python
  materialization re-runs on every pass (0.3-0.8 s per execution of a
  4-row dimension).

``local_rows_df`` ships the rows through one Arrow record batch into the
JVM (`spark.sql.execution.arrow.pyspark.enabled` is on in session.py), so
downstream actions never touch a Python worker. Same (rows, DDL schema)
contract as ``createDataFrame`` — drop-in at every call site, identical
data, types pinned by the caller's DDL. Falls back to plain
``createDataFrame`` if the Arrow/pandas path is unavailable (exotic
types), so callers never have to care.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_rows_df(
    spark: SparkSession, rows: Iterable[tuple], ddl_schema: str
) -> DataFrame:
    rows = list(rows)
    try:
        import pandas as pd

        names = [f.name for f in StructType.fromDDL(ddl_schema).fields]
        pdf = pd.DataFrame.from_records(rows, columns=names)
        return spark.createDataFrame(pdf, schema=ddl_schema)
    except Exception:
        return spark.createDataFrame(rows, ddl_schema)
