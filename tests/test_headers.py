"""Header inference + normalization (reference fianl2.py:51-81 semantics)."""

from __future__ import annotations

from vat_etl_spark.functions.headers import (
    canonical_rename,
    detect_header_row,
    normalize_header,
)


def test_normalize_nbsp_and_strip():
    assert normalize_header("  Net Value  ") == "Net Value"
    assert normalize_header(None) == ""


def test_detect_header_row_needs_two_keywords():
    rows = [
        ["junk", "junk"],
        ["only net here", "x"],          # 1 keyword → not a header
        ["Supply Type", "Tax", "Box"],   # 3 keywords → header
    ]
    assert detect_header_row(rows) == 2


def test_detect_header_row_defaults_to_zero():
    assert detect_header_row([["a", "b"], ["c", "d"]]) == 0


def test_detect_header_row_caps_scan_at_30():
    rows = [["x"]] * 31 + [["net", "tax"]]
    assert detect_header_row(rows) == 0


def test_canonical_rename_aliases():
    cols = ["Invoice #", "Net", "Tax", "Gross", "Customer Name", "Box", "Extra"]
    assert canonical_rename(cols) == [
        "Invoice Number",
        "Supply/Purchase Value",
        "VAT Value",
        "Invoice Value",
        "Customer/supplier Name",
        "Box",
        "Extra",
    ]


def test_xlsx_bridge_gated_when_openpyxl_missing(spark, tmp_path):
    """The Excel source must fail with a clear gate, not a random crash,
    in containers without openpyxl."""
    import pytest as _pytest

    from vat_etl_spark.sources.excel import read_workbook

    fake = tmp_path / "wb.xlsx"
    fake.write_bytes(b"PK\x03\x04 not a real workbook")
    with _pytest.raises((NotImplementedError, ValueError)):
        read_workbook(spark, str(fake))
