"""Z-order (Morton) clustering key as a native column expression.

1-D range clustering (``write_clustered_parquet``) narrows row-group min/max
stats on ONE key; sorting by the bit-interleaved Z-value of two keys narrows
BOTH — each row group covers a small square of the key plane instead of a
thin full-width stripe, so parquet row-group skipping works for predicates
on either dimension. This is the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, expressed here as ~30 pure bit operations that stay inside
whole-stage codegen — no UDF, no external format support needed.

Scale notes: Z-ordering is a WRITE-side cost (one range shuffle + sort, the
same as any clustered write) paid once per compaction cycle; the read-side
win multiplies across every query that filters on either key. Inputs are
first rank-normalized to 16/21/32-bit grids (interleaving raw skewed values
wastes high bits on empty space — normalize unless the domain is already
dense-uniform).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Morton "spread" masks: step i spaces the low 2^(5-i)-bit blocks apart.
_SPREAD_STEPS: list[tuple[int, int]] = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits(col: Column) -> Column:
    """Spread the low 32 bits of a long into the even bit positions of a
    64-bit long (Morton encoding half): b31..b0 → 0b..0b31..0b1 0b0."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """Interleaved Z-value of two non-negative **≤31-bit** ints:
    ``z = spread(a) | spread(b) << 1``. Rows sorted by z traverse the
    (a, b) plane along the Z curve — locality in z ⇒ locality in BOTH a
    and b (each 2k-bit z prefix pins a 2^k × 2^k square).

    Domain bound: if b has bit 31 set, ``spread`` places it at bit 62 and
    the ``<<1`` pushes it into the long's SIGN bit — those rows would sort
    before all others and break Z-curve locality. Inputs wider than 31
    bits must be grid-normalized first (``grid_normalize`` enforces
    bits ≤ 31)."""
    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))


def grid_normalize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Affine-map a numeric column from [lo, hi] onto the dense integer
    grid [0, 2^bits): the rank-normalization step that makes interleaving
    meaningful for skewed/sparse domains. Driver supplies lo/hi (from
    stats or a sample); values outside clamp to the grid edges.

    ``bits`` caps at 31 (zorder_key's sign-bit-safe domain); ``hi`` must
    exceed ``lo`` (a degenerate range would divide by zero and emit
    Infinity/NaN grid cells instead of a clear error)."""
    if bits > 31:
        raise ValueError(f"bits={bits} exceeds zorder_key's 31-bit domain")
    if not float(hi) > float(lo):
        raise ValueError(f"grid_normalize requires hi > lo, got [{lo}, {hi}]")
    cells = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(cells + 1))
    ).cast("long")
    return F.least(F.lit(cells).cast("long"), F.greatest(F.lit(0).cast("long"), scaled))
