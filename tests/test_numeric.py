"""msum (fixed-point long fast path) must be value-identical to dsum (exact
decimal) on its domain, including negatives and rounding-boundary values."""

from __future__ import annotations

from pyspark.sql import functions as F

from vat_etl_spark.functions.numeric import dsum, msum


def test_msum_equals_dsum_on_tricky_values(spark):
    vals = [
        0.005, -0.005, 0.015, 2.675, -2.675, 1e9 + 0.125, -1e9 - 0.125,
        0.1 + 0.2, 123.4567495, -123.4567495, 1e-7, -1e-7, 0.0,
    ] * 100 + [None] * 10
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    got = df.groupBy((F.col("i") % 7).alias("g")).agg(
        msum(F.col("v")).alias("m"), dsum(F.col("v")).alias("d")
    )
    rows = got.collect()
    assert all(r.m == r.d for r in rows), [(r.g, r.m, r.d) for r in rows if r.m != r.d]


def test_msum_all_null_group_is_zero(spark):
    df = spark.createDataFrame([(1, None), (1, None)], "g int, v double")
    r = df.groupBy("g").agg(msum(F.col("v")).alias("m")).first()
    assert r.m == 0.0


def test_udaf_geomean_matches_native_identity(spark, sf_smoke):
    from pyspark.sql import functions as F

    from vat_etl_spark.queries import QUERIES

    got = {r.o_orderstatus: r.geomean_micros
           for r in QUERIES["udaf_geomean"](spark, sf_smoke).collect()}
    import math
    o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    exact = {
        r.o_orderstatus: math.exp(r.m)
        for r in o.filter(F.col("o_totalprice") > 0)
        .groupBy("o_orderstatus")
        .agg(F.avg(F.log("o_totalprice")).alias("m"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in got:
        # query output is integer micros (the cross-engine-exact form);
        # compare against the native identity at micros resolution
        assert abs(got[k] / 1e6 - exact[k]) / exact[k] < 1e-9


def test_hierarchical_sum_equals_dsum(spark):
    """hsum_partial/hsum_merge two-stage must be bit-identical to dsum."""
    import random

    from vat_etl_spark.functions.numeric import dsum, hsum_merge, hsum_partial

    rng = random.Random(7)
    rows = [
        (i % 5, rng.choice([1.0, -1.0]) * rng.random() * 10**rng.randint(0, 7))
        for i in range(5000)
    ] + [(9, None)] * 5
    df = spark.createDataFrame(rows, "g int, v double").repartition(16)
    st1 = df.groupBy("g", F.spark_partition_id().alias("_pid")).agg(
        hsum_partial(F.col("v")).alias("_p")
    )
    hier = {r.g: r.s for r in st1.groupBy("g").agg(hsum_merge(F.col("_p")).alias("s")).collect()}
    flat = {r.g: r.s for r in df.groupBy("g").agg(dsum(F.col("v")).alias("s")).collect()}
    assert hier == flat
    assert hier[9] == 0.0  # all-NULL group → 0.0


def test_statistics_match_numpy(spark, sf_smoke):
    """The exact-moment agg_statistics (round-9 graduation) must agree
    with numpy AND with Spark's float-native builtins (stddev_samp /
    var_samp / corr / covar_samp) to 1e-9 relative — the builtins stay
    covered here as the accumulation-order-dependent alternative the
    registered form replaced."""
    import numpy as np

    from vat_etl_spark.queries import QUERIES

    got = {r.o_orderstatus: r for r in QUERIES["agg_statistics"](spark, sf_smoke).collect()}
    o = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderstatus", "o_totalprice", "o_custkey"
    )
    builtin = {
        r.o_orderstatus: r
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.stddev_samp("o_totalprice").alias("sd"),
            F.var_samp("o_totalprice").alias("va"),
            F.corr("o_totalprice", "o_custkey").alias("co"),
            F.covar_samp("o_totalprice", "o_custkey").alias("cv"),
        )
        .collect()
    }
    for st, b in builtin.items():
        g = got[st]
        assert abs(g.stddev_price - b.sd) <= 1e-9 * abs(b.sd)
        assert abs(g.var_price - b.va) <= 1e-9 * abs(b.va)
        assert abs(g.corr_price_cust - b.co) <= 1e-6 * abs(b.co)
        assert abs(g.covar_price_cust - b.cv) <= 1e-6 * abs(b.cv)
    import collections

    groups = collections.defaultdict(list)
    for r in o.collect():
        groups[r.o_orderstatus].append((r.o_totalprice, r.o_custkey))
    for status, rows in groups.items():
        p = np.array([x for x, _ in rows]); c = np.array([float(y) for _, y in rows])
        g = got[status]
        assert g.n == len(rows)
        if len(rows) > 1:
            assert abs(g.stddev_price - p.std(ddof=1)) / p.std(ddof=1) < 1e-9
            assert abs(g.var_price - p.var(ddof=1)) / p.var(ddof=1) < 1e-9
            expected_cov = np.cov(p, c, ddof=1)[0, 1]
            assert abs(g.covar_price_cust - expected_cov) / abs(expected_cov) < 1e-6
            expected_corr = np.corrcoef(p, c)[0, 1]
            assert abs(g.corr_price_cust - expected_corr) < 1e-9


def test_percentile_approx_brackets_exact(spark, sf_smoke):
    from pyspark.sql import functions as F

    from vat_etl_spark.queries import QUERIES

    # the registered query now hashes the rank-bound verdicts (round-9
    # error-bound oracle); the raw estimates stay pinned here
    verdicts = QUERIES["agg_percentile_approx"](spark, sf_smoke).collect()
    assert verdicts and all(
        r.p50_in_bound and r.p90_in_bound and r.p99_in_bound for r in verdicts
    )
    li0 = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    got = {
        r.l_returnflag: r.pcts
        for r in li0.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.9, 0.99], 10000
            ).alias("pcts")
        )
        .collect()
    }
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    exact = {
        r.l_returnflag: r.pcts
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("pcts"))
        .collect()
    }
    for k in got:
        for a, e in zip(got[k], exact[k]):
            assert abs(a - e) / e < 0.02  # within 2% of the exact quantile


def test_registered_agg_approx_distinct_error_bound(spark, sf_smoke):
    """Binds the registered `agg_approx_distinct` query: the rsd=0.01 HLL
    estimate must land within 5% of the exact distinct count it is joined
    against (5 sigma of the configured rsd — drift margin without letting
    the sketch degenerate)."""
    from vat_etl_spark.queries import QUERIES

    rows = QUERIES["agg_approx_distinct"](spark, sf_smoke).collect()
    assert len(rows) >= 2
    assert all(r.within_5rsd for r in rows)
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    est = {
        r.l_returnflag: (r.a, r.e)
        for r in li.groupBy("l_returnflag").agg(
            F.approx_count_distinct("l_orderkey", 0.01).alias("a"),
            F.countDistinct("l_orderkey").alias("e"),
        ).collect()
    }
    for r in rows:
        a, e = est[r.l_returnflag]
        assert r.exact_orders == e > 0
        assert abs(a - e) / e <= 0.05, (r.l_returnflag, a, e)
