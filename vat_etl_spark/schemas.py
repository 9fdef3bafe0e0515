"""Schema contracts: the canonical VAT transaction/summary schemas (from the
reference's required-column contract, fianl2.py:144-150 and the golden SQLite
output fianl2.py:184-195) and the driver testdata schemas (TESTDATA.md).

The reference infers schema dynamically per sheet then coerces to this fixed
contract; in this engine dynamic inference is a driver-side ingest utility
(:mod:`vat_etl_spark.sources.excel`) that always lands on these StructTypes,
so every downstream plan is fully typed and Catalyst-optimizable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical per-row VAT transaction schema after normalization
# (reference contract: fianl2.py:144-147 required columns + lineage/metadata
# columns appended at fianl2.py:161-163).
VAT_REQUIRED_COLUMNS = [
    "Supply Type",
    "Invoice Number",
    "Date",
    "Customer/supplier Name",
    "Supply/Purchase Value",
    "VAT Value",
    "Invoice Value",
    "Recoverable",
    "Box",
]

VAT_TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("Supply Type", T.StringType()),
        T.StructField("Invoice Number", T.StringType()),
        T.StructField("Date", T.StringType()),  # polymorphic at ingest; parsed via functions.dates
        T.StructField("Customer/supplier Name", T.StringType()),
        T.StructField("Supply/Purchase Value", T.DoubleType()),  # AED, post currency-parse
        T.StructField("VAT Value", T.DoubleType()),
        T.StructField("Invoice Value", T.DoubleType()),
        T.StructField("Recoverable", T.StringType()),
        T.StructField("Box", T.StringType()),
        T.StructField("Month", T.StringType()),
        T.StructField("MonthNum", T.IntegerType()),
        T.StructField("Year", T.IntegerType()),
        T.StructField("SourceSheet", T.StringType()),
        T.StructField("BoxLetter", T.StringType()),
    ]
)

# Golden output shape (vat_summary.db table `vat_summary`; fianl2.py:184-195).
VAT_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("Period", T.StringType()),
        T.StructField("FTA Box", T.StringType()),
        T.StructField("Description", T.StringType()),
        T.StructField("Net Value", T.DoubleType()),
        T.StructField("VAT Value", T.DoubleType()),
        T.StructField("Net VAT Payable", T.DoubleType()),
    ]
)

# Driver testdata schemas (/root/testdata/sf*/; TESTDATA.md, FIXTURES.md §B).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
