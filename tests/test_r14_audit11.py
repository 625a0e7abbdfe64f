"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 11: the four
window-fronting TPC-H queries, the as-of join, and ExactSubstr.

The TPC-H twins matter because the Spark implementations are REWRITES
(aggregate-carry Q18, envelope-pushdown Q19, decorrelated Q20/Q22) —
each test re-derives the answer from the plain specification with
per-row loops, so a rewrite that drifted from the spec (not just from
the oracle, which shares the spec text) would surface.
"""

from __future__ import annotations

import datetime
import hashlib
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


# ---------------------------------------------------------------------------
# TPC-H Q18 — literal per-order quantity walk + top-100 selection
# ---------------------------------------------------------------------------


def test_tpch_q18_matches_literal_walk(spark):
    qty = Counter()
    for r in _rows("lineitem", ["l_orderkey", "l_quantity"]):
        qty[r["l_orderkey"]] += _cents(r["l_quantity"])
    cust = {
        r["c_custkey"]: r["c_name"]
        for r in _rows("customer", ["c_custkey", "c_name"])
    }
    cand = []
    for r in _rows(
        "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ):
        q = qty.get(r["o_orderkey"], 0)
        if q > 25000:  # > 250 in exact cents
            cand.append(
                (
                    -float(r["o_totalprice"]),
                    r["o_orderkey"],
                    cust[r["o_custkey"]],
                    r["o_custkey"],
                    r["o_orderdate"],
                    q / 100.0,
                )
            )
    cand.sort()
    expected = {
        (name, ck, okey, odate, -negp, sq)
        for negp, okey, name, ck, odate, sq in cand[:100]
    }
    got = {
        (r.c_name, r.c_custkey, r.o_orderkey, r.o_orderdate,
         r.o_totalprice, r.sum_qty)
        for r in _run(spark, "q_tpch_q18_large_volume_customer")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# TPC-H Q19 — literal OR-of-bands revenue
# ---------------------------------------------------------------------------


def test_tpch_q19_matches_literal_bands(spark):
    part = {
        r["p_partkey"]: (r["p_brand"], r["p_size"])
        for r in _rows("part", ["p_partkey", "p_brand", "p_size"])
    }
    rev_e4 = 0
    for r in _rows(
        "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    ):
        brand, size = part[r["l_partkey"]]
        q = float(r["l_quantity"])
        ok = (
            (brand == "Brand#12" and 1 <= size <= 5 and 1 <= q <= 11)
            or (brand == "Brand#13" and 1 <= size <= 10 and 10 <= q <= 20)
            or (brand == "Brand#14" and 1 <= size <= 15 and 20 <= q <= 30)
        )
        if ok:
            rev_e4 += _cents(r["l_extendedprice"]) * (
                100 - _cents(r["l_discount"])
            )
    [row] = _run(spark, "q_tpch_q19_discounted_revenue")
    assert row.revenue == rev_e4 / 10_000.0


# ---------------------------------------------------------------------------
# TPC-H Q20 — literal red-part volume movers
# ---------------------------------------------------------------------------


def test_tpch_q20_matches_literal_movers(spark):
    red = {
        r["p_partkey"]
        for r in _rows("part", ["p_partkey", "p_name"])
        if (r["p_name"] or "").startswith("red")
    }
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    vol = Counter()
    for r in _rows("lineitem", ["l_suppkey", "l_partkey", "l_shipdate", "l_quantity"]):
        if r["l_partkey"] in red and lo <= r["l_shipdate"] < hi:
            vol[r["l_suppkey"]] += _cents(r["l_quantity"])
    movers = {sk for sk, v in vol.items() if v > 5000}
    nation7 = {
        r["n_nationkey"]
        for r in _rows("nation", ["n_nationkey", "n_name"])
        if r["n_name"] == "NATION_7"
    }
    expected = {
        (r["s_name"], float(r["s_acctbal"]))
        for r in _rows("supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
        if r["s_nationkey"] in nation7 and r["s_suppkey"] in movers
    }
    got = {
        (r.s_name, r.s_acctbal)
        for r in _run(spark, "q_tpch_q20_part_promotion")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# TPC-H Q22 — literal above-average no-order customers
# ---------------------------------------------------------------------------


def test_tpch_q22_matches_literal_threshold(spark):
    cust = _rows("customer", ["c_custkey", "c_acctbal"])
    pos = [_cents(r["c_acctbal"]) for r in cust if float(r["c_acctbal"]) > 0]
    thr = (sum(pos) / 100.0) / len(pos)
    with_orders = {r["o_custkey"] for r in _rows("orders", ["o_custkey"])}
    hits = [
        _cents(r["c_acctbal"])
        for r in cust
        if float(r["c_acctbal"]) > thr and r["c_custkey"] not in with_orders
    ]
    [row] = _run(spark, "q_tpch_q22_global_sales_opportunity")
    # SUM over an empty set is SQL NULL, not 0 (at sf0.001 every
    # above-average customer has at least one order)
    expected_tot = sum(hits) / 100.0 if hits else None
    assert (row.numcust, row.totacctbal) == (len(hits), expected_tot)
    # non-vacuity: the threshold itself selects customers; only the
    # no-orders anti-join empties the set here
    assert any(float(r["c_acctbal"]) > thr for r in cust)


# ---------------------------------------------------------------------------
# q_join_asof — literal most-recent-at-or-before walk
# ---------------------------------------------------------------------------


def test_asof_join_matches_literal_backward_walk(spark):
    per_user = defaultdict(dict)  # user -> {ots: max okey}
    for r in _rows("orders", ["o_custkey", "o_orderdate", "o_orderkey"]):
        d = per_user[r["o_custkey"]]
        ts = r["o_orderdate"]
        if ts not in d or r["o_orderkey"] > d[ts]:
            d[ts] = r["o_orderkey"]
    expected = {}
    for r in _rows("events", ["event_id", "user_id", "ts"]):
        cand = [
            (ots, okey)
            for ots, okey in per_user.get(r["user_id"], {}).items()
            if ots <= r["ts"]
        ]
        if cand:
            ots, okey = max(cand)
            expected[r["event_id"]] = (r["user_id"], r["ts"], okey, ots)
        else:
            expected[r["event_id"]] = (r["user_id"], r["ts"], None, None)
    got = {
        r.event_id: (r.user_id, r.ts, r.last_orderkey, r.last_orderdate)
        for r in _run(spark, "q_join_asof")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_dedup_exact_substring — literal 10-token window multiplicity walk
# ---------------------------------------------------------------------------


def test_exact_substring_matches_literal_window_walk(spark):
    import math

    wins_per_doc = {}
    for r in _rows("documents", ["doc_id", "text"]):
        if r["doc_id"] >= 300:
            continue
        t = [x for x in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()) if x]
        wins_per_doc[r["doc_id"]] = [
            hashlib.md5(" ".join(t[i : i + 10]).encode()).hexdigest()
            for i in range(len(t) - 9)
        ]
    corpus = Counter(w for ws in wins_per_doc.values() for w in ws)
    expected = {}
    for did, ws in wins_per_doc.items():
        if not ws:
            continue
        rep = sum(1 for w in ws if corpus[w] >= 2)
        expected[did] = (
            len(ws),
            rep,
            math.floor(1000000.0 * rep / len(ws)),
        )
    got = {
        r.doc_id: (r.n_windows, r.n_repeated, r.repeated_micro)
        for r in _run(spark, "q_dedup_exact_substring")
    }
    assert got == expected
