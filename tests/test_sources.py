"""Source-format surface: CSV / JSON round-trips with explicit schemas, and
bucketed-table co-located joins (the pay-shuffle-once-at-write-time path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vat_etl_spark.plans import shuffle_count
from vat_etl_spark.sources.catalog import (
    read_csv,
    read_json,
    read_table,
    write_bucketed_table,
)


def test_csv_roundtrip_explicit_schema(spark, sf_smoke, tmp_path):
    df = read_table(spark, sf_smoke, "nation")
    out = str(tmp_path / "nation_csv")
    df.write.option("header", "true").csv(out)
    back = read_csv(spark, out, schema=df.schema)
    assert back.schema == df.schema
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in df.collect()
    )


def test_json_roundtrip_explicit_schema(spark, sf_smoke, tmp_path):
    df = read_table(spark, sf_smoke, "region")
    out = str(tmp_path / "region_json")
    df.write.json(out)
    back = read_json(spark, out, schema=df.schema)
    assert back.schema == df.schema
    assert back.count() == df.count()
    assert sorted(r.r_name for r in back.collect()) == sorted(
        r.r_name for r in df.collect()
    )


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path):
    """Co-bucketed fact-fact join: zero Exchange operators in the plan."""
    o = read_table(spark, sf_smoke, "orders")
    li = read_table(spark, sf_smoke, "lineitem")
    write_bucketed_table(o, "orders_b", str(tmp_path / "ob"), ["o_orderkey"], 4)
    write_bucketed_table(li, "lineitem_b", str(tmp_path / "lb"), ["l_orderkey"], 4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"]).select(
            "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
        )
        assert shuffle_count(joined) == 0
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
