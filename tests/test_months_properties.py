"""Hypothesis property tests for F3 month-from-sheet-name: the Spark
expression must agree with a pure-Python model of the reference's
``extract_month_from_sheet`` (fianl2.py:89-100) on arbitrary sheet names —
including quirk Q8 false positives ('mayhem' → May, numeric fallback)."""

from __future__ import annotations

import re
import unicodedata

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vat_etl_spark.functions.months import MONTHS_MAP, month_expr


def model(name):
    """Reference semantics (verified against the live function, SURVEY §2.3 F3)."""
    s = unicodedata.normalize("NFKD", str(name))
    s = re.sub(r"[^a-zA-Z0-9]", " ", s).lower()
    for token, num in MONTHS_MAP.items():
        if token in s:
            return (token.title(), num)
    m = re.search(r"\b(0?[1-9]|1[0-2])\b", s)
    if m:
        num = int(m.group(1))
        import datetime as dt

        return (dt.date(2000, num, 1).strftime("%b"), num)
    return ("Unknown", 0)


def spark_extract(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "raw string")
    mname, mnum = month_expr(F.col("raw"))
    return [
        (r.mn, r.mm)
        for r in df.select(mname.alias("mn"), mnum.cast("int").alias("mm")).collect()
    ]


name_strategy = st.one_of(
    st.text(max_size=20),
    st.sampled_from(
        ["mayhem", "VAT 7", "Sheet1", "sept-2024", "März", "decadence",
         "Q1 13", "0", "13", "ápril", "JUNE!!", "jul/aug"]
    ),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(name_strategy, min_size=1, max_size=30))
def test_month_expr_matches_reference_model(spark, names):
    # the COLUMN form has no NFKD (no Spark builtin — SURVEY §2.3 F2): it
    # covers NFKD-stable names; compatibility-decomposing names ('²'→'2')
    # go through the driver-side path, tested without restriction below
    names = [
        n.encode("utf-8", "replace").decode("utf-8")
        for n in names
        if unicodedata.normalize("NFKD", n) == n
    ] or ["Jan"]
    got = spark_extract(spark, names)
    expected = [model(n) for n in names]
    assert got == expected, list(zip(names, got, expected))


@settings(max_examples=50, deadline=None)
@given(name_strategy)
def test_driver_side_extraction_matches_reference_model(name):
    from vat_etl_spark.functions.months import extract_month_from_name

    assert extract_month_from_name(name) == model(name)
