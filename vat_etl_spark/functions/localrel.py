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
data, types pinned by the caller's DDL.

Two drop-in-strictness details (r14 review findings):

- ``createDataFrame`` REJECTS mistyped values ("LongType can not accept
  object 0.97") where the pandas→Arrow path would silently cast-truncate
  (the unsafe Arrow cast). ``_check_types`` reproduces the loud failure
  for the scalar types the call sites use, so a float sneaking into a
  long column raises instead of writing a truncated metric.
- The Arrow path falling over must not SILENTLY revive the slow pickled
  path the helper exists to kill: the fallback logs a warning.
"""

from __future__ import annotations

import logging
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

_LOG = logging.getLogger(__name__)

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_FRACTIONAL = (FloatType, DoubleType)


def _check_types(rows: list[tuple], schema: StructType) -> None:
    """Raise the same way createDataFrame would on mistyped scalars —
    rows are metadata-sized by contract, so the O(rows × fields) pass is
    free. Types outside the audited set are left to Spark."""
    for row in rows:
        if len(row) != len(schema.fields):
            raise TypeError(
                f"row has {len(row)} values for {len(schema.fields)} fields"
            )
        for v, f in zip(row, schema.fields):
            if v is None:
                continue
            t = f.dataType
            if isinstance(t, BooleanType) and not isinstance(v, bool):
                raise TypeError(f"{t} can not accept object {v!r} ({f.name})")
            if isinstance(t, _INTEGRAL) and (
                isinstance(v, bool) or not isinstance(v, int)
            ):
                raise TypeError(f"{t} can not accept object {v!r} ({f.name})")
            if isinstance(t, _FRACTIONAL) and not isinstance(v, float):
                raise TypeError(f"{t} can not accept object {v!r} ({f.name})")
            if isinstance(t, StringType) and not isinstance(v, str):
                raise TypeError(f"{t} can not accept object {v!r} ({f.name})")


def local_rows_df(
    spark: SparkSession, rows: Iterable[tuple], ddl_schema: str
) -> DataFrame:
    rows = [tuple(r) for r in rows]
    schema = StructType.fromDDL(ddl_schema)
    if not rows:
        # empty relations are cold-path; the Arrow batch path rejects
        # them, and a 0-row pickled RDD costs nothing to execute
        return spark.createDataFrame(rows, schema)
    _check_types(rows, schema)
    try:
        import pandas as pd

        pdf = pd.DataFrame.from_records(
            rows, columns=[f.name for f in schema.fields]
        )
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        # the slow path still produces correct results — but it must not
        # return silently, or the Python-worker write pathology creeps
        # back with no signal
        _LOG.warning(
            "local_rows_df: Arrow local-relation path failed for schema "
            "%r — falling back to the pickled-RDD createDataFrame path",
            ddl_schema,
            exc_info=True,
        )
        return spark.createDataFrame(rows, schema)
