"""Hypothesis property tests for the F4 date cascade: the compat parser must
agree with the reference model (pandas ``to_datetime(dayfirst=True)``) on
the format families real workbooks contain (quirks Q4: dayfirst mangles
ISO). Batched — one Spark job per property run."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vat_etl_spark.functions.dates import parse_date_compat


def model(text):
    """Reference semantics: pandas to_datetime(dayfirst=True) per value."""
    try:
        ts = pd.to_datetime(text, dayfirst=True)
        return None if pd.isna(ts) else ts.to_pydatetime().replace(tzinfo=None)
    except Exception:
        return None


def spark_parse(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [
        r.out for r in df.select(parse_date_compat(F.col("raw")).alias("out")).collect()
    ]


dates = st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2099, 12, 31))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(dates, st.sampled_from(["dmy_slash", "dmy_dash", "iso"])),
                min_size=1, max_size=25))
def test_compat_matches_pandas_dayfirst(spark, cases):
    def fmt(d, kind):
        if kind == "dmy_slash":
            return f"{d.day:02d}/{d.month:02d}/{d.year}"
        if kind == "dmy_dash":
            return f"{d.day:02d}-{d.month:02d}-{d.year}"
        return d.isoformat()  # ISO — quirk Q4 territory

    values = [fmt(d, k) for d, k in cases]
    got = spark_parse(spark, values)
    expected = [model(v) for v in values]
    assert got == expected, list(zip(values, got, expected))


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="0123456789/-. ", max_size=12), min_size=1, max_size=20))
def test_garbage_never_raises_and_nulls_match_contract(spark, texts):
    # unparseable → NULL (never an exception, even under ANSI mode)
    got = spark_parse(spark, texts)
    assert len(got) == len(texts)
