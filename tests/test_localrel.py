"""local_rows_df (functions/localrel.py): the optimization contract.

The r14 optimization round replaced pickled-RDD `createDataFrame(list)`
frames with Arrow-shipped JVM LocalRelations at every small-literal /
metadata call site (OPTIMIZATION_r14.md §1). These tests pin the two
halves of that change:

1. EQUIVALENCE — same schema (incl. nullability) and same values as the
   `createDataFrame` spelling it replaced, across the row shapes the
   call sites use (ints/longs, doubles, strings incl. NULL, booleans,
   multi-row, empty).
2. PLAN SHAPE — the result is a JVM-local relation (LocalRelation /
   LocalTableScan), NOT a Python-backed LogicalRDD, so no action over it
   ever launches a Python worker (the 5.7 s-per-tiny-write pathology).
"""

from __future__ import annotations

from vat_etl_spark.functions.localrel import local_rows_df

CASES = [
    ([(1, 2)], "a long, b long"),
    (
        [("small", 0.0, 15.0), ("medium", 15.0, 30.0), ("jumbo", 45.0, 1e9)],
        "band string, lo double, hi double",
    ),
    ([(5, 4, 3, True)], "n_truth long, n_candidates long, n_hits long, ok boolean"),
    ([(1, "x", 2.5)], "i int, s string, d double"),
    ([("w", 2, 0.5), (None, 3, 1.0)], "w string, term_rank long, wgt double"),
]


def _key(t):
    return tuple((v is None, v) for v in t)


def test_matches_createdataframe_schema_and_values(spark):
    for rows, ddl in CASES:
        old = spark.createDataFrame(rows, ddl)
        new = local_rows_df(spark, rows, ddl)
        assert old.schema == new.schema, ddl
        assert sorted(map(tuple, old.collect()), key=_key) == sorted(
            map(tuple, new.collect()), key=_key
        ), ddl


def test_plan_is_jvm_local_relation(spark):
    for rows, ddl in CASES:
        df = local_rows_df(spark, rows, ddl)
        node = df._jdf.queryExecution().optimizedPlan().nodeName()
        assert node == "LocalRelation", (ddl, node)


def test_empty_rows_falls_back_but_stays_correct(spark):
    ddl = "rank long, left string, right string, pair_count long"
    df = local_rows_df(spark, [], ddl)
    assert df.schema == spark.createDataFrame([], ddl).schema
    assert df.count() == 0


def test_mistyped_values_raise_like_createdataframe(spark):
    """createDataFrame rejects mistyped scalars loudly; the Arrow path
    would silently cast-truncate (0.97 -> 0 in a long column). Pin the
    loud failure (r14 review finding)."""
    import pytest

    for rows, ddl in [
        ([(0.97,)], "n_hits long"),  # float into integral: truncation risk
        ([(1,)], "recall double"),  # int into double: old path raised
        ([(1,)], "ok boolean"),  # int into boolean: Arrow would cast
        ([(True,)], "n long"),  # bool is not a count
        ([(7,)], "name string"),
        ([(1, 2, 3)], "a long, b long"),  # arity mismatch
    ]:
        with pytest.raises(TypeError):
            local_rows_df(spark, rows, ddl)
