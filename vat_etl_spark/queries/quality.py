"""Data-quality operators: column profiling and declarative constraint
validation. The reference's only quality machinery is runtime warnings
(SURVEY.md §5.1 item 3: multiple-years warning fianl2.py:124-125, per-sheet
error capture fianl2.py:219-221); an engine run unattended over 100 TB needs
these as first-class, aggregate-shaped operators instead — one scan computes
every rule, violations come back as data, and the pipeline decides
fail/quarantine/continue from counts, never by eyeballing a UI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vat_etl_spark.functions.localrel import local_rows_df
from vat_etl_spark.queries import query
from vat_etl_spark.sources.catalog import read_table as _t


_PROFILE_SQL = """
WITH stats AS (
  SELECT
    count(*) AS n_rows,
    count(o_custkey) AS nn_custkey, count(DISTINCT o_custkey) AS nd_custkey,
    count(o_orderstatus) AS nn_status, count(DISTINCT o_orderstatus) AS nd_status,
    count(o_totalprice) AS nn_price, count(DISTINCT o_totalprice) AS nd_price,
    cast(min(o_totalprice) AS VARCHAR) AS min_price,
    cast(max(o_totalprice) AS VARCHAR) AS max_price,
    count(o_orderdate) AS nn_date, count(DISTINCT o_orderdate) AS nd_date,
    cast(min(o_orderdate) AS VARCHAR) AS min_date,
    cast(max(o_orderdate) AS VARCHAR) AS max_date
  FROM orders
)
SELECT col, n_rows, n_nonnull, n_distinct, min_value, max_value FROM (
  SELECT 'o_custkey' AS col, n_rows, nn_custkey AS n_nonnull, nd_custkey AS n_distinct,
         cast(NULL AS VARCHAR) AS min_value, cast(NULL AS VARCHAR) AS max_value FROM stats
  UNION ALL
  SELECT 'o_orderstatus', n_rows, nn_status, nd_status, NULL, NULL FROM stats
  UNION ALL
  SELECT 'o_totalprice', n_rows, nn_price, nd_price, min_price, max_price FROM stats
  UNION ALL
  SELECT 'o_orderdate', n_rows, nn_date, nd_date, min_date, max_date FROM stats
)
"""


@query("profile_orders_columns", oracle=_PROFILE_SQL)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders`` in long form: row count, non-null
    count, exact distinct count, min/max (stringified so one schema fits
    every column type). ONE pass over the table computes all columns'
    profiles simultaneously (multiple count-distincts in a single
    aggregate — Catalyst plans them via Expand rather than N scans);
    at 100 TB swap the exact distincts for approx_count_distinct and the
    plan collapses to a single scan + tiny aggregate with no Expand."""
    o = _t(spark, sf_dir, "orders")
    stats = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").cast("string").alias("min_price"),
        F.max("o_totalprice").cast("string").alias("max_price"),
        F.count("o_orderdate").alias("nn_date"),
        F.countDistinct("o_orderdate").alias("nd_date"),
        F.min("o_orderdate").cast("string").alias("min_date"),
        F.max("o_orderdate").cast("string").alias("max_date"),
    )
    null_s = F.lit(None).cast("string")

    def row(col: str, nn, nd, mn, mx):
        return F.struct(
            F.lit(col).alias("col"),
            F.col("n_rows").alias("n_rows"),
            nn.alias("n_nonnull"),
            nd.alias("n_distinct"),
            mn.alias("min_value"),
            mx.alias("max_value"),
        )

    return stats.select(
        F.inline(
            F.array(
                row("o_custkey", F.col("nn_custkey"), F.col("nd_custkey"), null_s, null_s),
                row("o_orderstatus", F.col("nn_status"), F.col("nd_status"), null_s, null_s),
                row("o_totalprice", F.col("nn_price"), F.col("nd_price"),
                    F.col("min_price"), F.col("max_price")),
                row("o_orderdate", F.col("nn_date"), F.col("nd_date"),
                    F.col("min_date"), F.col("max_date")),
            )
        )
    )


_DQ_SQL = """
WITH li AS (
  SELECT l.*, (o_orderkey IS NULL) AS orphan
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l_orderkey = o_orderkey
)
SELECT rule, n_violations, sample_key FROM (
  SELECT 'nonneg_quantity' AS rule,
         CAST(sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         min(CASE WHEN l_quantity < 0 THEN l_orderkey END) AS sample_key FROM li
  UNION ALL
  SELECT 'discount_in_unit_range',
         CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END) AS BIGINT),
         min(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN l_orderkey END) FROM li
  UNION ALL
  SELECT 'shipdate_in_range',
         CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1990-01-01'
                    OR l_shipdate > TIMESTAMP '2010-01-01' THEN 1 ELSE 0 END) AS BIGINT),
         min(CASE WHEN l_shipdate < TIMESTAMP '1990-01-01'
                    OR l_shipdate > TIMESTAMP '2010-01-01' THEN l_orderkey END) FROM li
  UNION ALL
  SELECT 'fk_order_exists',
         CAST(sum(CASE WHEN orphan THEN 1 ELSE 0 END) AS BIGINT),
         min(CASE WHEN orphan THEN l_orderkey END) FROM li
)
"""


@query("dq_constraint_violations", oracle=_DQ_SQL)
def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint validation: every rule (range checks, FK
    existence) evaluated in ONE scan + one left join, emitted long-form as
    (rule, violation count, sample offending key). Conditional aggregation
    means adding a rule costs a column, not a pass — the difference
    between 4 rules and 40 is invisible at 100 TB. The FK check rides the
    same orderkey join the queries already do (bucketed at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    ok = _t(spark, sf_dir, "orders").select("o_orderkey").distinct()
    j = li.join(ok, F.col("l_orderkey") == F.col("o_orderkey"), "left").withColumn(
        "orphan", F.col("o_orderkey").isNull()
    )
    rules = {
        "nonneg_quantity": F.col("l_quantity") < 0,
        "discount_in_unit_range": (F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0),
        "shipdate_in_range": (
            (F.col("l_shipdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("l_shipdate") > F.lit("2010-01-01").cast("timestamp"))
        ),
        "fk_order_exists": F.col("orphan"),
    }
    agg = j.agg(
        *[
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"n_{name}")
            for name, pred in rules.items()
        ],
        *[
            F.min(F.when(pred, F.col("l_orderkey"))).alias(f"k_{name}")
            for name, pred in rules.items()
        ],
    )
    return agg.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(f"n_{name}").alias("n_violations"),
                        F.col(f"k_{name}").alias("sample_key"),
                    )
                    for name in rules
                ]
            )
        )
    )


_OUTLIER_SQL = """
WITH f AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1) THEN 'low'
            ELSE 'high' END AS side
FROM events e JOIN f USING (event_type)
WHERE e.value < f.q1 - 1.5 * (f.q3 - f.q1)
   OR e.value > f.q3 + 1.5 * (f.q3 - f.q1)
"""


@query("dq_outlier_fences", oracle=_OUTLIER_SQL)
def dq_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier detection per stratum: quartile fences (q1 −
    1.5·IQR, q3 + 1.5·IQR) computed per event type over the heavy-tailed
    event values, rows outside flagged with their side — the robust (quantile-based, distribution-free) complement
    to z-score screening.

    Same two-pass shape as feature_zscore_normalize: fences are a tiny
    aggregate broadcast back onto the fact scan, so outlier flagging adds
    no fact shuffle. Exact percentiles need a per-group sort — at 100 TB
    substitute approx_percentile for the fence estimation (fences are
    robust to sketch error by construction; a 1e-3-quantile wobble moves
    no fence materially). Spark ``percentile`` and DuckDB ``quantile_cont``
    share the interpolation definition, so the fences — and therefore the
    flagged set — are oracle-exact."""
    e = _t(spark, sf_dir, "events")
    f = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    return (
        e.join(F.broadcast(f), "event_type")
        .where((F.col("value") < lo) | (F.col("value") > hi))
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(F.col("value") < lo, "low").otherwise("high").alias("side"),
        )
    )


_BENFORD_PROBS = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_PROBS.items()
)

_BENFORD_SQL = f"""
WITH digits AS (
  SELECT cast(substr(cast(cast(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
              1, 1) AS INTEGER) AS digit
  FROM orders WHERE o_totalprice > 0
),
tot AS (SELECT count(*) AS n FROM digits)
SELECT digit, count(*) AS observed,
  cast(count(*) AS DOUBLE) / any_value(n) AS observed_p,
  cast(CASE digit {_BENFORD_CASE} END AS DOUBLE) AS benford_p,
  (cast(count(*) AS DOUBLE) / any_value(n)
   - cast(CASE digit {_BENFORD_CASE} END AS DOUBLE)) AS deviation
FROM digits CROSS JOIN tot
GROUP BY digit
"""


@query("dq_benford_digits", oracle=_BENFORD_SQL)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen (the classic financial-fraud /
    data-fabrication tripwire): observed leading-digit shares of the money
    amounts vs the log10(1+1/d) expectation, per digit.

    The leading digit is taken from the DECIMAL STRING of exact integer
    cents — never via log10/pow (libm, engine-specific bits) and never from
    double repr (formatting differs across engines); bigint→string is
    identical everywhere. Benford expectations are baked-in literals shared
    by both engines. One scan, 9-row output. (Synthetic uniform prices
    won't follow Benford — the point here is the measurement contract, and
    the deviation column quantifies exactly how un-Benford the data is.)"""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    digits = o.select(digit.alias("digit"))
    tot = digits.count()  # driver-side scalar: single job, avoids window-over-all
    benford = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PROBS.items() for x in kv]
    )[F.col("digit")]
    return (
        digits.groupBy("digit")
        .agg(F.count("*").alias("observed"))
        .select(
            "digit",
            "observed",
            (F.col("observed").cast("double") / F.lit(tot)).alias("observed_p"),
            benford.alias("benford_p"),
            (
                F.col("observed").cast("double") / F.lit(tot) - benford
            ).alias("deviation"),
        )
    )


_DUP_PAY_SQL = """
WITH e AS (
  SELECT event_id, user_id,
    cast(round(value * 100) AS BIGINT) AS amount_cents,
    epoch_us(ts) AS us
  FROM events
)
SELECT a.user_id, a.amount_cents,
  a.event_id AS event_id_a, b.event_id AS event_id_b,
  b.us - a.us AS gap_us
FROM e a JOIN e b
  ON a.user_id = b.user_id AND a.amount_cents = b.amount_cents
 AND a.event_id < b.event_id
WHERE abs(b.us - a.us) <= 604800000000
"""


@query("dq_duplicate_payments", oracle=_DUP_PAY_SQL)
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detection: pairs of events by the same user for the
    same exact amount within 7 days — the canonical accounts-payable /
    double-charge audit (the reference's domain is VAT ledgers; this is the
    control that runs next to them).

    Amounts compare as exact integer cents (never float equality) and the
    gap as integer epoch-microseconds. Scale shape: a self-equi-join on the
    composite key (user_id, amount_cents) — already highly selective, so
    the time window is a cheap residual filter; the shuffle is one
    co-partitioned hash join on the pair key, skew handled by AQE. Each
    pair is emitted once (event_id_a < event_id_b)."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("amount_cents"),
        F.unix_micros("ts").alias("us"),
    )
    a = e.select(
        F.col("event_id").alias("event_id_a"),
        "user_id",
        "amount_cents",
        F.col("us").alias("us_a"),
    )
    b = e.select(
        F.col("event_id").alias("event_id_b"),
        F.col("user_id").alias("user_b"),
        F.col("amount_cents").alias("cents_b"),
        F.col("us").alias("us_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (F.col("amount_cents") == F.col("cents_b"))
            & (F.col("event_id_a") < F.col("event_id_b")),
        )
        .where(F.abs(F.col("us_b") - F.col("us_a")) <= F.lit(604_800_000_000))
        .select(
            "user_id",
            "amount_cents",
            "event_id_a",
            "event_id_b",
            (F.col("us_b") - F.col("us_a")).alias("gap_us"),
        )
    )


_FRESHNESS_SQL = """
WITH g AS (SELECT max(epoch_us(ts)) AS gmax FROM events),
per AS (
  SELECT event_type, count(*) AS n_events,
    max(epoch_us(ts)) AS last_us, min(epoch_us(ts)) AS first_us
  FROM events GROUP BY event_type
)
SELECT event_type, n_events,
  cast(gmax - last_us AS BIGINT) AS staleness_us,
  cast((gmax - last_us) // 60000000 AS BIGINT) AS staleness_min,
  CASE WHEN gmax - last_us > 3600000000 THEN 'stale' ELSE 'fresh' END AS status
FROM per CROSS JOIN g
"""


@query("dq_freshness_by_source", oracle=_FRESHNESS_SQL)
def dq_freshness_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness monitor: each event type's lag behind the most
    recent event anywhere, with a 1-hour staleness flag — the first alarm
    any unattended 100 TB ingest needs ('feed X stopped landing'), judged
    against the DATA's own high-water mark, never the wall clock (the
    reference's datetime.now() wart again).

    Staleness is an integer µs diff; the flag is an integer comparison.
    One scan, one aggregate to feed-cardinality rows, global max rides
    along as a broadcast 1-row cross join."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    per = e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.max("us").alias("last_us"),
        F.min("us").alias("first_us"),
    )
    g = e.agg(F.max("us").alias("gmax"))
    stale = F.col("gmax") - F.col("last_us")
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        stale.alias("staleness_us"),
        F.expr("(gmax - last_us) div 60000000").alias("staleness_min"),
        F.when(stale > 3_600_000_000, "stale").otherwise("fresh").alias("status"),
    )


_OBSERVE_SQL = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_priorities,
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_prices,
       max(o_totalprice) AS max_price
FROM orders
"""


@query("dq_observe_metrics", oracle=_OBSERVE_SQL)
def dq_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``df.observe()``: data-quality counters
    (row count, null priorities, non-positive prices, max price)
    ride along on a pass the pipeline was ALREADY making — zero extra
    scans, metrics surface through the observation channel after any
    action. This is how a 100 TB nightly job self-reports health without a
    second read: attach observe() to the write, alert from the metrics
    map (observed metrics must be non-DISTINCT aggregates — a documented
    CollectMetrics restriction). Here the observed pass is a noop-sink write of the orders scan;
    the returned 1-row DataFrame is the metrics record (oracle recomputes
    the same aggregates relationally)."""
    from pyspark.sql import Observation

    o = _t(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderpriority").isNull().cast("long")).alias("null_priorities"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("nonpositive_prices"),
        F.max("o_totalprice").alias("max_price"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return local_rows_df(
        spark,
        [(m["n_rows"], m["null_priorities"], m["nonpositive_prices"], m["max_price"])],
        "n_rows long, null_priorities long, nonpositive_prices long, max_price double",
    )


_SKEW_SQL = """
WITH per_key AS (
  SELECT o_custkey AS key, count(*) AS c FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         max(c) AS max_c,
         CAST(sum(c) AS BIGINT) // count(*) AS mean_c
  FROM per_key
),
top AS (
  SELECT key, c, row_number() OVER (ORDER BY c DESC, key) AS rk FROM per_key
)
SELECT t.rk AS rank, t.key AS hot_key, t.c AS key_rows,
       s.n_keys, s.n_rows, s.max_c, s.mean_c,
       CAST(t.c AS BIGINT) * 100 // s.mean_c AS pct_of_mean_x100
FROM top t CROSS JOIN stats s
WHERE t.rk <= 5
"""


@query("dq_key_skew_profile", oracle=_SKEW_SQL)
def dq_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew pre-flight: before shuffling a fact table on a key,
    profile the key's frequency distribution — top-5 hottest keys with
    their row counts, and each as an integer percentage of the mean key
    frequency. A max/mean ratio in the hundreds says the plain shuffle
    join will straggle on one partition and the plan needs salting or AQE
    skew-split (which this engine enables — see join_skew_salted and the
    AQE session config). One aggregate + a top-5; integer-only ratios so
    the report is engine-exact. At 100 TB this runs on a sample or on the
    partial-agg output — either way it is one cheap pass that prevents an
    hours-long straggler."""
    o = _t(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("c")
    )
    stats = per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_c"),
        F.expr("sum(c) div count(*)").alias("mean_c"),
    )
    # top-5 FIRST (TakeOrderedAndProject), then rank the 5-row result —
    # the global rank window never sees the key-grain table
    top5 = per_key.orderBy(F.desc("c"), F.asc("key")).limit(5)
    w = W.orderBy(F.desc("c"), F.asc("key"))
    top = top5.withColumn("rank", F.row_number().over(w))
    return top.crossJoin(F.broadcast(stats)).select(
        "rank",
        F.col("key").alias("hot_key"),
        F.col("c").alias("key_rows"),
        "n_keys", "n_rows", "max_c", "mean_c",
        F.expr("c * 100 div mean_c").alias("pct_of_mean_x100"),
    )
