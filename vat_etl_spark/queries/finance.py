"""Financial allocation and market-basket operators.

The reference's whole domain is money aggregation (fianl2.py:167-195 sums
net/VAT per period×box); real finance ETL also needs the inverse —
*allocating* a total back across constituent lines so every cent is
accounted for — plus the basket-affinity analytics a sales ledger feeds.
Both are implemented in exact integer-cents arithmetic so the DuckDB oracle
hash-matches bit-for-bit (no float accumulation anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vat_etl_spark.queries import query
from vat_etl_spark.sources.catalog import read_table as _t


_PRORATE_SQL = """
WITH j AS (
  SELECT l_orderkey, l_linenumber,
    cast(round(l_extendedprice * 100) AS BIGINT) AS w_cents,
    cast(round(o_totalprice * 100) AS BIGINT) AS t_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
x AS (
  SELECT *, sum(w_cents) OVER (PARTITION BY l_orderkey) AS w_total FROM j
),
y AS (
  SELECT *,
    (t_cents * w_cents) // w_total AS base,
    (t_cents * w_cents) % w_total AS rem
  FROM x
),
z AS (
  SELECT *,
    sum(base) OVER (PARTITION BY l_orderkey) AS base_sum,
    row_number() OVER (PARTITION BY l_orderkey ORDER BY rem DESC, l_linenumber) AS rk
  FROM y
)
SELECT l_orderkey, l_linenumber,
  CAST(base + CASE WHEN rk <= t_cents - base_sum THEN 1 ELSE 0 END AS BIGINT)
    AS alloc_cents,
  cast(base + CASE WHEN rk <= t_cents - base_sum THEN 1 ELSE 0 END AS DOUBLE) / 100
    AS allocated
FROM z
"""


@query("fin_allocate_proration", oracle=_PRORATE_SQL)
def fin_allocate_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration: allocate each order's total across its
    lines proportionally to line value, in whole cents, such that the
    per-order allocations sum EXACTLY to the order total (the classic
    invoice/VAT apportionment problem — naive `total * share` rounding
    leaks cents and fails reconciliation).

    All arithmetic is 64-bit integer: base share = floor(T*w/W), then the
    leftover r = T - Σbase cents (0 ≤ r < n_lines) go one each to the r
    lines with the largest remainder (T*w mod W), ties broken by line
    number — fully deterministic and engine-portable. Scale shape: one
    broadcast-ready fact-dim join keyed on l_orderkey, then two window
    functions over the SAME partition key (one shuffle; lines-per-order is
    bounded at 7 in TPC-H-shaped data, so no partition skew)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cents = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        cents("l_extendedprice").alias("w_cents"),
        cents("o_totalprice").alias("t_cents"),
    )
    part = W.partitionBy("l_orderkey")
    j = (
        j.withColumn("w_total", F.sum("w_cents").over(part))
        .withColumn("base", F.expr("t_cents * w_cents div w_total"))
        .withColumn("rem", F.expr("t_cents * w_cents % w_total"))
    )
    j = j.withColumn("base_sum", F.sum("base").over(part)).withColumn(
        "rk",
        F.row_number().over(part.orderBy(F.col("rem").desc(), "l_linenumber")),
    )
    alloc = F.col("base") + F.when(
        F.col("rk") <= F.col("t_cents") - F.col("base_sum"), F.lit(1)
    ).otherwise(F.lit(0))
    return j.select(
        "l_orderkey",
        "l_linenumber",
        alloc.alias("alloc_cents"),
        (alloc.cast("double") / F.lit(100)).alias("allocated"),
    )


_BASKET_SQL = """
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT count(DISTINCT ok) AS n_orders FROM baskets),
counts AS (SELECT brand, count(*) AS c FROM baskets GROUP BY brand),
pairs AS (
  SELECT x.brand AS ante, y.brand AS conseq, count(*) AS co
  FROM baskets x JOIN baskets y ON x.ok = y.ok AND x.brand < y.brand
  GROUP BY 1, 2
)
SELECT ante, conseq, co,
  ca.c AS ante_orders, cb.c AS conseq_orders,
  cast(co AS DOUBLE) / n_orders AS support,
  cast(co AS DOUBLE) / ca.c AS confidence,
  cast(co * n_orders AS DOUBLE) / cast(ca.c * cb.c AS DOUBLE) AS lift
FROM pairs CROSS JOIN n
JOIN counts ca ON ca.brand = ante
JOIN counts cb ON cb.brand = conseq
"""


@query("basket_association_rules", oracle=_BASKET_SQL)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift) over
    order→brand baskets — the A-priori pair stage, the workhorse of
    affinity analytics.

    Scale shape: the item dimension joins under the broadcast-threshold/AQE
    policy (part scales with SF, so no hard hint); the basket self-join is
    keyed on l_orderkey (one co-partitioned shuffle, pair blowup bounded by
    per-basket item count ≤ brands-per-order); the per-BRAND count table
    (25 rows at every SF) broadcasts back twice by hint. All measures are
    integer counts; the three ratios are single IEEE divisions over exact
    integers, so Spark and DuckDB agree bitwise. The total-basket count is
    a driver-side scalar (one job) rather than a window-over-everything."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders = baskets.select("ok").distinct().count()
    counts = baskets.groupBy("brand").agg(F.count("*").alias("c"))
    x = baskets.select("ok", F.col("brand").alias("ante"))
    y = baskets.select(F.col("ok").alias("ok2"), F.col("brand").alias("conseq"))
    pairs = (
        x.join(y, (x.ok == y.ok2) & (F.col("ante") < F.col("conseq")))
        .groupBy("ante", "conseq")
        .agg(F.count("*").alias("co"))
    )
    ca = counts.select(F.col("brand").alias("b1"), F.col("c").alias("ante_orders"))
    cb = counts.select(F.col("brand").alias("b2"), F.col("c").alias("conseq_orders"))
    return (
        pairs.join(F.broadcast(ca), F.col("ante") == F.col("b1"))
        .join(F.broadcast(cb), F.col("conseq") == F.col("b2"))
        .select(
            "ante",
            "conseq",
            "co",
            "ante_orders",
            "conseq_orders",
            (F.col("co").cast("double") / F.lit(n_orders)).alias("support"),
            (F.col("co").cast("double") / F.col("ante_orders")).alias("confidence"),
            (
                (F.col("co") * F.lit(n_orders)).cast("double")
                / (F.col("ante_orders") * F.col("conseq_orders")).cast("double")
            ).alias("lift"),
        )
    )


_PVM_SQL = """
WITH g AS (
  SELECT p.p_brand AS brand, year(o.o_orderdate) AS yr,
    sum(cast(round(l.l_extendedprice * 100) AS BIGINT)) AS r_cents,
    sum(cast(l.l_quantity AS BIGINT)) AS q
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
w AS (
  SELECT a.brand,
    cast(a.r_cents AS BIGINT) AS r0_cents, cast(b.r_cents AS BIGINT) AS r1_cents,
    cast(a.q AS BIGINT) AS q0, cast(b.q AS BIGINT) AS q1
  FROM g a JOIN g b ON a.brand = b.brand AND a.yr = 1995 AND b.yr = 1996
)
SELECT brand, r0_cents, r1_cents, q0, q1,
  r1_cents - r0_cents AS delta_cents,
  cast(q1 - q0 AS DOUBLE) * (cast(r0_cents AS DOUBLE) / cast(q0 AS DOUBLE))
    AS volume_effect_cents,
  (cast(r1_cents AS DOUBLE) / cast(q1 AS DOUBLE)
   - cast(r0_cents AS DOUBLE) / cast(q0 AS DOUBLE)) * cast(q1 AS DOUBLE)
    AS price_effect_cents
FROM w
"""


@query("fin_price_volume_mix", oracle=_PVM_SQL)
def fin_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix revenue bridge (the standard FP&A decomposition of
    a period-over-period revenue change): per brand, 1995→1996 revenue
    delta split into a volume effect (quantity change at old unit price)
    and a price effect (unit-price change at new volume); the two effects
    sum to the delta up to float rounding, while delta_cents itself stays
    exact integer.

    Cross-engine exactness: revenue and quantity aggregate as integers
    (cents / whole units); unit prices and effects are then a FIXED tree of
    IEEE divisions/multiplications over those exact integers, so both
    engines compute bit-identical doubles. Scale shape: one fact scan with
    a year pushdown-filter, two broadcast dim joins, one groupBy on
    (brand, year), then a self-join of the 50-row aggregate — all
    post-aggregation work is dimension-sized."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_quantity"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        # range predicate, not year(col) IN (...): a raw-column comparison
        # reaches the parquet scan as a PushedFilter; a function-wrapped
        # column does not (asserted in tests/test_plans.py)
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("p_brand").alias("brand"), F.year("o_orderdate").alias("yr")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "r_cents"
            ),
            F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
        )
    )
    a = g.where(F.col("yr") == 1995).select(
        "brand", F.col("r_cents").alias("r0_cents"), F.col("q").alias("q0")
    )
    b = g.where(F.col("yr") == 1996).select(
        F.col("brand").alias("brand_b"),
        F.col("r_cents").alias("r1_cents"),
        F.col("q").alias("q1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return a.join(b, F.col("brand") == F.col("brand_b")).select(
        "brand",
        "r0_cents",
        "r1_cents",
        "q0",
        "q1",
        (F.col("r1_cents") - F.col("r0_cents")).alias("delta_cents"),
        ((d("q1") - d("q0")) * (d("r0_cents") / d("q0"))).alias(
            "volume_effect_cents"
        ),
        (
            (d("r1_cents") / d("q1") - d("r0_cents") / d("q0")) * d("q1")
        ).alias("price_effect_cents"),
    )


_WMEDIAN_SQL = """
WITH j AS (
  SELECT p.p_brand AS brand,
    cast(round(l.l_extendedprice * 100) AS BIGINT) AS pc,
    cast(l.l_quantity AS BIGINT) AS w
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
g AS (SELECT brand, pc, sum(w) AS w FROM j GROUP BY 1, 2),
c AS (
  SELECT brand, pc, w,
    sum(w) OVER (PARTITION BY brand ORDER BY pc) AS cw,
    sum(w) OVER (PARTITION BY brand) AS tw
  FROM g
)
SELECT brand, cast(any_value(tw) AS BIGINT) AS total_weight,
  cast(min(CASE WHEN 2 * cw >= tw THEN pc END) AS DOUBLE) / 100
    AS weighted_median_price
FROM c GROUP BY brand
"""


@query("agg_weighted_median", oracle=_WMEDIAN_SQL)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand quantity-weighted median price — the inventory-weighted
    'typical price' a plain median misstates (a line selling 50 units
    should pull the median 50× harder than a line selling one).

    Algorithm: collapse to (brand, price) grain FIRST (makes the
    cumulative-weight walk deterministic under price ties), then lower
    weighted median = smallest price whose cumulative weight reaches half
    the total. Everything is integer (cents, unit counts, cumulative sums
    — DuckDB's segment-tree window association is exact on integers), so
    the oracle matches bitwise. Scale shape: fact scan + broadcast dim
    join, pre-aggregation shrinks the window input to distinct prices per
    brand, and both windows share the single brand-keyed shuffle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("brand", "pc")
        .agg(F.sum("w").alias("w"))
    )
    c = g.withColumn(
        "cw", F.sum("w").over(W.partitionBy("brand").orderBy("pc"))
    ).withColumn("tw", F.sum("w").over(W.partitionBy("brand")))
    return c.groupBy("brand").agg(
        F.any_value("tw").alias("total_weight"),
        (
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("pc"))).cast(
                "double"
            )
            / 100
        ).alias("weighted_median_price"),
    )


_AGING_SQL = """
WITH anchor AS (SELECT max(cast(o_orderdate AS DATE)) AS d1 FROM orders),
open_ar AS (
  SELECT o_custkey,
    cast(round(o_totalprice * 100) AS BIGINT) AS cents,
    (SELECT d1 FROM anchor) - cast(o_orderdate AS DATE) AS age_days
  FROM orders WHERE o_orderstatus = 'O'
),
bucketed AS (
  SELECT *,
    CASE WHEN age_days <= 30 THEN '0-30'
         WHEN age_days <= 60 THEN '31-60'
         WHEN age_days <= 90 THEN '61-90'
         ELSE '90+' END AS bucket
  FROM open_ar
)
SELECT bucket, count(*) AS n_orders,
  count(DISTINCT o_custkey) AS n_customers,
  cast(sum(cents) AS BIGINT) AS total_cents,
  cast(min(age_days) AS BIGINT) AS min_age_days,
  cast(max(age_days) AS BIGINT) AS max_age_days
FROM bucketed GROUP BY bucket
"""


@query("fin_receivables_aging", oracle=_AGING_SQL)
def fin_receivables_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable aging report: open orders bucketed by age
    (0-30 / 31-60 / 61-90 / 90+ days as of the ledger's latest date) with
    order counts, distinct debtors, and exact cent totals — the collections
    report every finance close produces, and the VAT ledger's natural
    sibling output.

    Ages are integer day diffs against a data-derived anchor (no wall
    clock — the reference's datetime.now() nondeterminism wart, SURVEY §2.3
    F11, is exactly what this avoids); bucket edges are integer
    comparisons. Scale shape: status filter pushed to the scan, one
    aggregation to 4 bucket rows; the anchor is a driver-side scalar
    (one tiny job), never a window-over-everything."""
    o = _t(spark, sf_dir, "orders")
    # anchor over ALL orders (matches the oracle's unfiltered max)
    d1 = o.agg(F.max(F.to_date("o_orderdate"))).first()[0]
    open_ar = o.where(F.col("o_orderstatus") == "O").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.datediff(F.lit(d1), F.to_date("o_orderdate")).cast("bigint").alias(
            "age_days"
        ),
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 60, "31-60")
        .when(F.col("age_days") <= 90, "61-90")
        .otherwise("90+")
    )
    return open_ar.select("o_custkey", "cents", "age_days", bucket.alias("bucket")).groupBy(
        "bucket"
    ).agg(
        F.count("*").alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.min("age_days").alias("min_age_days"),
        F.max("age_days").alias("max_age_days"),
    )
