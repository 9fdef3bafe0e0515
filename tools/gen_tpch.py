"""Relational-decade data generator: TPC-H-ish tables one decade above the
driver testdata (default sf=1), matching the driver generator's schemas
and measured distributions (TESTDATA.md; distributions reverse-fitted from
/root/testdata/sf0.1 — categorical domains, uniform ranges, Poisson(4)
lineitems/order, shipdate = orderdate + U[1,95] days, retailprice
900 + (key%1000)/10, events = sorted 30-day uniform stream with
Expo(50) values).

This extends the MEASURED decade for the relational family (sf0.1 → sf1:
lineitem 600 K → 6 M) the way tools/gen_fuzzy_corpus.py did for the LLM
family — the data is statistically matched, not byte-identical, which is
what a wall-clock exponent measurement needs. Parquet is written with
bounded row groups (512 K rows ≈ tens of MB) so the scan SPLITS across
cores — the round-9 finding: a single-row-group file serializes the whole
scan through one task.

Usage: python tools/gen_tpch.py [out_dir] [sf]   (default testdata_sf1 1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 512 * 1024

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "ECONOMY", "SMALL", "PROMO"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
ETYPES = ["click", "error", "purchase", "signup", "view"]

DAY_US = 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
EPOCH_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
ORDER_DAYS = (
    np.datetime64("2001-08-01") - np.datetime64("1995-01-01")
).astype(int) + 1  # uniform inclusive day range, matches observed max


def _write(out: str, name: str, cols: dict) -> None:
    tbl = pa.table(cols)
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"), row_group_size=ROW_GROUP)
    print(f"{name}: {tbl.num_rows} rows", flush=True)


def _ts(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("datetime64[us]"))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)

    _write(out, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    })
    _write(out, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    })
    _write(out, "customer", {
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    })
    _write(out, "supplier", {
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    })
    pk = np.arange(n_part, dtype=np.int64)
    _write(out, "part", {
        "p_partkey": pa.array(pk),
        "p_name": pa.array([
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(900.0 + (pk % 1000) / 10.0),
    })
    odate_day = rng.integers(0, ORDER_DAYS, n_ord)
    _write(out, "orders", {
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2)),
        "o_orderdate": _ts(EPOCH_1995 + odate_day * DAY_US),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    })
    # lineitem: k ~ Poisson(4) rows per order (zeros -> empty orders, as in
    # the driver data); shipdate = orderdate + U[1, 95] days
    k = rng.poisson(4.0, n_ord)
    okey = np.repeat(np.arange(n_ord, dtype=np.int64), k)
    odays = np.repeat(odate_day, k)
    n_li = len(okey)
    _write(out, "lineitem", {
        "l_orderkey": pa.array(okey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(rng.integers(0, 11, n_li) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, n_li) / 100.0),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts(
            EPOCH_1995 + (odays + rng.integers(1, 96, n_li)) * DAY_US
        ),
    })
    ev_us = np.sort(rng.integers(0, 30 * DAY_US, n_ev))
    _write(out, "events", {
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": _ts(EPOCH_2024 + ev_us),
        "user_id": pa.array(rng.integers(0, n_users, n_ev)),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev), 2)),
        "props": pa.array([f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)]),
    })


if __name__ == "__main__":
    main()
