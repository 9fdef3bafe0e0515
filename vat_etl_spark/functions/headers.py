"""Header normalization + alias mapping (reference
``/root/reference/fianl2.py:51-81``).

Headers are per-sheet metadata (a handful of strings), so this runs
driver-side during ingest; the result is a fixed, typed StructType so every
downstream plan is statically schema'd (SURVEY.md §1.2).
"""

from __future__ import annotations

import unicodedata

EXACT_HEADER_MAP: dict[str, str] = {
    "Supply Type": "Supply Type",
    "#": "Invoice Number",
    "Invoice #": "Invoice Number",
    "Invoice No.": "Invoice Number",
    "Date": "Date",
    "Recoverable": "Recoverable",
    "Customer/supplier Name": "Customer/supplier Name",
    "Customer Name": "Customer/supplier Name",
    "Supplier Name": "Customer/supplier Name",
    "Net": "Supply/Purchase Value",
    "Tax": "VAT Value",
    "Gross": "Invoice Value",
    "Box": "Box",
}

HEADER_KEYWORDS = ["supply", "box", "date", "tax", "gross", "net"]


def normalize_header(h: object) -> str:
    """NFKD-normalize, NBSP→space, strip (compat with fianl2.py:67-72)."""
    if h is None:
        return ""
    s = unicodedata.normalize("NFKD", str(h)).replace(" ", " ")
    return s.strip()


def detect_header_row(rows: list[list[object]], max_scan: int = 30) -> int:
    """Scan the first ``max_scan`` rows for one containing ≥2 of the keyword
    set (case-insensitive substring over cell text); default row 0.

    Operates on plain row lists so it works on any source's sampled head
    (pandas, openpyxl, or a Spark ``limit(30).collect()``).
    """
    for i, row in enumerate(rows[:max_scan]):
        cells = [str(c).lower() for c in row]
        hits = sum(any(k in c for c in cells) for k in HEADER_KEYWORDS)
        if hits >= 2:
            return i
    return 0


def canonical_rename(columns: list[object]) -> list[str]:
    """Normalize then alias-map a header list to canonical names."""
    out = []
    for c in columns:
        n = normalize_header(c)
        out.append(EXACT_HEADER_MAP.get(n, n))
    return out
