"""Round-15 twin-formula audit — batch 13 (r18-window pre-insurance).

TPC-H rewrite twins re-derived from the PLAIN SPEC (the r14 batch-11
discipline, extended): Q5's correlated star walk, Q8's market-share
conditional ratio, Q17's decorrelated per-part average, and Q21's
EXISTS/NOT-EXISTS pair replayed as literal per-order set logic.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


def _vol_e4(price, disc) -> int:
    """extendedprice * (1 - discount) as the exact 4-decimal integer
    the DECIMAL(18,2) x DECIMAL product carries."""
    return _cents(price) * (100 - _cents(disc))


# ---------------------------------------------------------------------------
# TPC-H Q5 — the six-way correlated star replayed with dicts
# ---------------------------------------------------------------------------


def test_tpch_q5_matches_literal_spec_walk(spark):
    import datetime

    region = {
        r["r_regionkey"]: r["r_name"]
        for r in _rows("region", ["r_regionkey", "r_name"])
    }
    nation = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in _rows("nation", ["n_nationkey", "n_name", "n_regionkey"])
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in _rows("customer", ["c_custkey", "c_nationkey"])
    }
    supp = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in _rows("supplier", ["s_suppkey", "s_nationkey"])
    }
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in _rows("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        if lo <= r["o_orderdate"] < hi
    }
    rev = Counter()
    for r in _rows(
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ):
        ck = orders.get(r["l_orderkey"])
        if ck is None:
            continue
        cn = cust[ck]
        sn = supp[r["l_suppkey"]]
        if cn != sn:
            continue
        n_name, regkey = nation[sn]
        if region[regkey] != "ASIA":
            continue
        rev[n_name] += _vol_e4(r["l_extendedprice"], r["l_discount"])
    expected = {n: v / 10_000.0 for n, v in rev.items()}
    got = {
        r.n_name: r.revenue for r in _run(spark, "q_tpch_q5_local_supplier")
    }
    assert got == expected
    assert expected  # non-vacuous


# ---------------------------------------------------------------------------
# TPC-H Q8 — national market share per year
# ---------------------------------------------------------------------------


def test_tpch_q8_matches_literal_spec_walk(spark):
    import datetime

    region = {
        r["r_regionkey"]: r["r_name"]
        for r in _rows("region", ["r_regionkey", "r_name"])
    }
    nation = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in _rows("nation", ["n_nationkey", "n_name", "n_regionkey"])
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in _rows("customer", ["c_custkey", "c_nationkey"])
    }
    supp = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in _rows("supplier", ["s_suppkey", "s_nationkey"])
    }
    econ_parts = {
        r["p_partkey"]
        for r in _rows("part", ["p_partkey", "p_type"])
        if r["p_type"] == "ECONOMY"
    }
    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    orders = {
        r["o_orderkey"]: (r["o_custkey"], r["o_orderdate"].year)
        for r in _rows("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        if lo <= r["o_orderdate"] < hi
    }
    num = Counter()
    den = Counter()
    for r in _rows(
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ):
        if r["l_partkey"] not in econ_parts:
            continue
        o = orders.get(r["l_orderkey"])
        if o is None:
            continue
        ck, year = o
        c_nat_name, c_reg = nation[cust[ck]]
        if region[c_reg] != "ASIA":
            continue
        v = _vol_e4(r["l_extendedprice"], r["l_discount"])
        den[year] += v
        if nation[supp[r["l_suppkey"]]][0] == "NATION_3":
            num[year] += v
    expected = {
        y: (num[y] / 10_000.0) / (den[y] / 10_000.0) if y in num else None
        for y in den
    }
    got = {
        r.o_year: r.mkt_share for r in _run(spark, "q_tpch_q8_market_share")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# TPC-H Q17 — decorrelated per-part average, replayed correlated
# ---------------------------------------------------------------------------


def test_tpch_q17_matches_literal_correlated_walk(spark):
    """The engine decorrelates the per-part-average subquery into a
    window; this twin evaluates the ORIGINAL correlated form — per
    part, the average over ALL its lineitems — so the rewrite's
    domain-restriction argument is machine-checked."""
    brand_parts = {
        r["p_partkey"]
        for r in _rows("part", ["p_partkey", "p_brand"])
        if r["p_brand"] == "Brand#3"
    }
    li = _rows(
        "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )
    qty_sum: Counter = Counter()
    qty_n: Counter = Counter()
    for r in li:
        qty_sum[r["l_partkey"]] += _cents(r["l_quantity"])
        qty_n[r["l_partkey"]] += 1
    price_cents = 0
    for r in li:
        pk = r["l_partkey"]
        if pk not in brand_parts:
            continue
        avg = (qty_sum[pk] / 100) / qty_n[pk]
        if float(r["l_quantity"]) < 0.2 * avg:
            price_cents += _cents(r["l_extendedprice"])
    expected = (price_cents / 100) / 7.0
    out = _run(spark, "q_tpch_q17_small_quantity_revenue")
    assert len(out) == 1
    assert out[0].avg_yearly == expected


# ---------------------------------------------------------------------------
# TPC-H Q21 — EXISTS/NOT-EXISTS replayed as per-order set logic
# ---------------------------------------------------------------------------


def test_tpch_q21_matches_literal_exists_walk(spark):
    # sf0.01 (the driver's grading SF): at sf0.001 the qualifying set
    # is empty — both engines agree on [], but the twin must exercise
    # the EXISTS/NOT-EXISTS branches non-vacuously
    sf = "/root/testdata/sf0.01"
    nation9 = {
        r["n_nationkey"]
        for r in _rows("nation", ["n_nationkey", "n_name"], sf=sf)
        if r["n_name"] == "NATION_9"
    }
    supp = {
        r["s_suppkey"]: (r["s_name"], r["s_nationkey"])
        for r in _rows("supplier", ["s_suppkey", "s_name", "s_nationkey"], sf=sf)
    }
    f_orders = {
        r["o_orderkey"]
        for r in _rows("orders", ["o_orderkey", "o_orderstatus"], sf=sf)
        if r["o_orderstatus"] == "F"
    }
    li = _rows("lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"], sf=sf)
    supps_of = defaultdict(set)
    r_supps_of = defaultdict(set)
    for r in li:
        supps_of[r["l_orderkey"]].add(r["l_suppkey"])
        if r["l_returnflag"] == "R":
            r_supps_of[r["l_orderkey"]].add(r["l_suppkey"])
    numwait: Counter = Counter()
    for r in li:  # per LINE l1, exactly as the spec quantifies
        ok, sk = r["l_orderkey"], r["l_suppkey"]
        if r["l_returnflag"] != "R" or ok not in f_orders:
            continue
        name, nat = supp[sk]
        if nat not in nation9:
            continue
        if not (supps_of[ok] - {sk}):  # EXISTS another supplier
            continue
        if r_supps_of[ok] - {sk}:  # NOT EXISTS other at fault
            continue
        numwait[name] += 1
    ranked = sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = [
        (r.s_name, r.numwait)
        for r in _run(spark, "q_tpch_q21_waiting_supplier", sf=sf)
    ]
    assert got == ranked
    assert ranked  # non-vacuous
