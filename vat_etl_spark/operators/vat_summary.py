"""The flagship query: per-period VAT box summary.

Reference: ``/root/reference/fianl2.py:167-195`` (``calculate_summary``) — a
Python loop over distinct periods × 3 re-filtered ``.sum()`` passes, i.e.
O(periods × rows) with full re-scans. Here it is ONE hash aggregate:

    groupBy(Year, MonthNum, Month)
      → 6 conditional sums (sum(when(box-pred, value)))
      → derived Box D = vatA − vatC
      → inline-explode to the 4-row (A/B/C/D) output shape
      → orderBy(Year, MonthNum)

One shuffle, linear scan, map-side partial aggregation; at 100 TB the only
cost is the scan plus a tiny per-period shuffle (group cardinality = number
of periods, a few thousand at most).

Compat quirks reproduced (SURVEY.md §8): substring box matching (Q1), NULL
box → "NAN" string → matches "A" (Q2), all-NULL sums → 0.0 not NULL (Q9),
round-to-2dp on output (Q10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vat_etl_spark.functions.numeric import hsum_merge, micros

def _month_abbrevs() -> Column:
    # built lazily: Column construction needs a live SparkContext, and this
    # module must import before any session exists (bench/driver import order)
    return F.array(
        *[F.lit(m) for m in ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                             "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]]
    )

BOX_DESCRIPTIONS: dict[str, str] = {
    "Box A": "Standard Rated Supplies (5%)",
    "Box B": "Zero Rated Supplies (0%)",
    "Box C": "Recoverable Input VAT",
    "Box D": "Net VAT Payable (BoxA_VAT - BoxC_VAT)",
}


def box_pred_compat(box_col: Column, letter: str) -> Column:
    """Compat box selector: substring containment over the stringified,
    upper-cased box value, with NULL → "NAN" (quirks Q1+Q2: a NULL box
    contains "A"; "BOX C" matches B and C)."""
    s = F.upper(F.trim(F.coalesce(box_col.cast("string"), F.lit("nan"))))
    return s.contains(F.lit(letter))


def box_pred_sane(box_col: Column, letter: str) -> Column:
    """Sane box selector: exact standalone-letter match."""
    return F.regexp_extract(F.upper(F.trim(box_col.cast("string"))), r"\b([A-D])\b", 1) == letter


def vat_box_summary(
    df: DataFrame,
    *,
    net_col: str = "Supply/Purchase Value",
    vat_col: str = "VAT Value",
    box_col: str = "Box",
    month_col: str | None = "Month",
    monthnum_col: str = "MonthNum",
    year_col: str = "Year",
    compat: bool = True,
) -> DataFrame:
    """Compute the 4-rows-per-period VAT summary from a normalized
    transaction DataFrame. Output schema = the golden ``vat_summary`` table
    (FIXTURES.md §A2): Period, FTA Box, Description, Net Value, VAT Value,
    Net VAT Payable.

    ``month_col=None`` derives the month label from ``monthnum_col`` AFTER
    aggregation instead of carrying a per-row string through the group
    keys — measured ~2× on the whole aggregate at sf0.1 (string hashing in
    a hot group key is not free). Use it whenever the label is a function
    of the month number; sheet-derived labels (which can be "Unknown"-like
    free text) keep the explicit column.
    """
    net, vat, box = F.col(net_col), F.col(vat_col), F.col(box_col)

    # Pre-project per-row work ONCE: the box membership flags (the string
    # normalize+match would otherwise be re-evaluated inside each of the 6
    # aggregate functions — codegen does not CSE across aggregate buffers)
    # and the exact long-micros fixed-point of each measure (2 decimal casts
    # per row instead of 12).
    if compat:
        boxn = F.upper(F.trim(F.coalesce(box.cast("string"), F.lit("nan"))))
        flag = lambda L: boxn.contains(F.lit(L))  # noqa: E731
    else:
        letter = F.regexp_extract(F.upper(F.trim(box.cast("string"))), r"\b([A-D])\b", 1)
        flag = lambda L: letter == F.lit(L)  # noqa: E731
    keys = [year_col, monthnum_col] + ([month_col] if month_col else [])
    pre = df.select(
        *keys,
        *[flag(L).alias(f"_f{L}") for L in "ABC"],
        micros(net).alias("_net_u"),
        micros(vat).alias("_vat_u"),
    )

    # hierarchical exact sums (functions/numeric.py): long-micros partials
    # per (period, input partition) — pure codegen'd long arithmetic, each
    # partial bounded by partition size so no overflow at any total scale —
    # then a decimal merge over the tiny partial set. Cross-engine
    # bit-stable; all-NULL → 0.0 (Q9).
    parts = {
        f"{n}{L}": F.when(F.col(f"_f{L}"), F.col(f"_{n}_u"))
        for L in "ABC"
        for n in ("net", "vat")
    }
    st1 = pre.groupBy(*keys, F.spark_partition_id().alias("_pid")).agg(
        *[F.sum(e).alias(f"_{k}") for k, e in parts.items()]
    )
    agg = st1.groupBy(*keys).agg(
        *[hsum_merge(F.col(f"_{k}")).alias(k) for k in parts]
    )
    agg = agg.withColumn("vatD", F.col("vatA") - F.col("vatC"))
    if month_col:
        label = F.col(month_col)
    else:
        label = F.when(
            F.col(monthnum_col).between(1, 12),
            F.element_at(_month_abbrevs(), F.col(monthnum_col)),
        ).otherwise(F.lit("Unknown"))
    period = F.concat_ws(" ", label, F.col(year_col).cast("string"))

    def row(box_name: str, net_v: Column, vat_v: Column, payable: Column) -> Column:
        return F.struct(
            F.lit(box_name).alias("FTA Box"),
            F.lit(BOX_DESCRIPTIONS[box_name]).alias("Description"),
            F.round(net_v, 2).cast("double").alias("Net Value"),
            F.round(vat_v, 2).cast("double").alias("VAT Value"),
            F.round(payable, 2).cast("double").alias("Net VAT Payable"),
        )

    zero = F.lit(0.0)
    boxes = F.array(
        row("Box A", F.col("netA"), F.col("vatA"), zero),
        row("Box B", F.col("netB"), F.col("vatB"), zero),
        row("Box C", F.col("netC"), F.col("vatC"), zero),
        row("Box D", zero, F.col("vatD"), F.col("vatD")),
    )
    # single-partition sort, not orderBy: the summary is 4 rows per period
    # (bounded by reporting periods, never by data volume), and a global
    # orderBy costs a range-partitioning SAMPLING JOB + a 32-task sort
    # stage — measured ~15% of flagship wall at sf0.1 for a ~300-row sort
    out = (
        agg.select(
            F.col(year_col),
            F.col(monthnum_col),
            period.alias("Period"),
            F.inline(boxes),
        )
        .coalesce(1)
        .sortWithinPartitions(F.col(year_col), F.col(monthnum_col), F.col("FTA Box"))
        .drop(year_col, monthnum_col)
    )
    return out


def lineitem_as_vat_transactions(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Map the driver's TPC-H-ish tables onto the VAT transaction shape
    (FIXTURES.md §B mapping): period = month/year of o_orderdate; box from
    returnflag/tax bands (returns → C, taxed → A, zero-tax → B);
    net = extendedprice × (1 − discount); vat = net × tax.

    The join shuffles both sides on orderkey — at 100 TB both tables would be
    bucketed/co-partitioned on orderkey so this becomes a shuffle-free
    sort-merge; at bench scale AQE picks a broadcast for the orders side
    projection when it fits.

    No Month string is materialized: the label is a pure function of
    MonthNum here, so the summary derives it post-aggregation
    (vat_box_summary(month_col=None)) instead of hashing a string per row.
    """
    # period columns computed on the 150k-row orders side BEFORE the
    # broadcast join — month/year extraction runs once per order, not once
    # per joined lineitem row, and the broadcast stays 3 narrow columns
    o = orders.select(
        "o_orderkey",
        F.month("o_orderdate").alias("MonthNum"),
        F.year("o_orderdate").alias("Year"),
    )
    j = lineitem.join(o, lineitem["l_orderkey"] == o["o_orderkey"], "inner")
    # double math here is bit-identical across engines; the exact-decimal
    # conversion happens inside the aggregate (functions.numeric)
    net = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    vat = net * F.col("l_tax")
    box = (
        F.when(F.col("l_returnflag") == "R", F.lit("C"))
        .when(F.col("l_tax") > 0, F.lit("A"))
        .otherwise(F.lit("B"))
    )
    return j.select(
        box.alias("Box"),
        net.alias("Supply/Purchase Value"),
        vat.alias("VAT Value"),
        "MonthNum", "Year",
    )


def vat_flagship(lineitem: DataFrame, orders: DataFrame, compat: bool = True) -> DataFrame:
    """End-to-end flagship: testdata → VAT transaction shape → box summary."""
    return vat_box_summary(
        lineitem_as_vat_transactions(lineitem, orders), compat=compat, month_col=None
    )
