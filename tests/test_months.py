"""F3 month extraction — quirk Q8 false positives, driver-side and
column-expression forms must agree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vat_etl_spark.functions.months import extract_month_from_name, month_expr

CASES = [
    ("March 2024", ("Mar", 3)),
    ("Jan", ("Jan", 1)),
    ("mayhem", ("May", 5)),        # substring false positive (Q8)
    ("VAT 7", ("Jul", 7)),         # numeric fallback
    ("03-2024", ("Mar", 3)),
    ("Sheet1", ("Unknown", 0)),    # no word boundary before the digit
    ("sept data", ("Sep", 9)),     # 'sep' matches before 'sept' — same month
    ("Q4 report", ("Unknown", 0)), # 'q4' has no word boundary → no fallback hit
    ("totals", ("Unknown", 0)),
]


@pytest.mark.parametrize("name,want", CASES)
def test_driver_side(name, want):
    assert extract_month_from_name(name) == want


def test_column_expr_matches_driver_side(spark):
    df = spark.createDataFrame([(n,) for n, _ in CASES], "name string")
    mname, mnum = month_expr(F.col("name"))
    got = [
        (r.mn, r.mm)
        for r in df.select(mname.alias("mn"), mnum.cast("int").alias("mm")).collect()
    ]
    assert got == [want for _, want in CASES]
