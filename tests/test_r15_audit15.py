"""Round-15 twin-formula audit — batch 15 (r16-window members from the
r14 vintage plus the interval-overlap theta join).

Literal raw-parquet walks: the salted skew join (result law vs a dict
join), sorted array aggregation, the interval-overlap join (O(n·m)
pair test — the independent route vs the engine's grid-bucket
decomposition), the bloom-prefiltered semi join (exact set semantics),
event routing, the keep-latest upsert, and the monthly rollup anchor.
"""

from __future__ import annotations

import datetime
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


# ---------------------------------------------------------------------------
# q_join_salted_skew — salt transparency law vs a dict join
# ---------------------------------------------------------------------------


def test_salted_skew_matches_literal_dict_join(spark):
    o = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_orderpriority"])
        for r in _rows("orders", ["o_orderkey", "o_orderstatus", "o_orderpriority"])
    }
    expected: Counter = Counter()
    for r in _rows("lineitem", ["l_orderkey", "l_linenumber"]):
        st = o.get(r["l_orderkey"])
        if st is not None:
            expected[(r["l_orderkey"], r["l_linenumber"], *st)] += 1
    got: Counter = Counter()
    for r in _run(spark, "q_join_salted_skew"):
        got[
            (r.l_orderkey, r.l_linenumber, r.o_orderstatus, r.o_orderpriority)
        ] += 1
    assert got == expected


# ---------------------------------------------------------------------------
# q_array_agg_sorted — per-order line lists by hand
# ---------------------------------------------------------------------------


def test_array_agg_sorted_matches_literal_walk(spark):
    lines = defaultdict(list)
    for r in _rows("lineitem", ["l_orderkey", "l_linenumber"]):
        lines[r["l_orderkey"]].append(r["l_linenumber"])
    expected = {
        ok: (",".join(str(x) for x in sorted(ls)), len(ls), max(ls))
        for ok, ls in lines.items()
    }
    got = {
        r.l_orderkey: (r.lines, r.n_lines, r.max_line)
        for r in _run(spark, "q_array_agg_sorted")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_join_interval_overlap — the O(n·m) pair test (independent route)
# ---------------------------------------------------------------------------


def test_interval_overlap_matches_literal_pair_test(spark):
    epoch = datetime.date(1970, 1, 1)
    lo = datetime.date(1995, 3, 1)
    hi = datetime.date(1995, 4, 1)
    iv = []
    for r in _rows("orders", ["o_orderkey", "o_orderdate"]):
        d = r["o_orderdate"].date()
        if lo <= d < hi:
            start = (d - epoch).days
            iv.append((r["o_orderkey"], start, start + r["o_orderkey"] % 5 + 1))
    left = [t for t in iv if t[0] % 2 == 0]
    right = [t for t in iv if t[0] % 2 == 1]
    expected = {
        (li, ls, le, ri, rs, re_)
        for li, ls, le in left
        for ri, rs, re_ in right
        if ls < re_ and rs < le
    }
    got = {
        (r.l_id, r.l_start_day, r.l_end_day, r.r_id, r.r_start_day, r.r_end_day)
        for r in _run(spark, "q_join_interval_overlap")
    }
    assert got == expected
    assert expected  # overlaps exist


# ---------------------------------------------------------------------------
# q_join_bloom_prefilter — exact semi-join semantics by set
# ---------------------------------------------------------------------------


def test_bloom_prefilter_matches_literal_set_semantics(spark):
    rich = {
        r["c_custkey"]
        for r in _rows("customer", ["c_custkey", "c_acctbal"])
        if float(r["c_acctbal"]) > 9000
    }
    expected = {
        r["o_orderkey"]: (r["o_custkey"], float(r["o_totalprice"]))
        for r in _rows("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        if r["o_custkey"] in rich
    }
    got = {
        r.o_orderkey: (r.o_custkey, r.o_totalprice)
        for r in _run(spark, "q_join_bloom_prefilter")
    }
    assert got == expected
    assert expected  # the bloom path actually passed rows


# ---------------------------------------------------------------------------
# q_route_filter — CASE routing by hand
# ---------------------------------------------------------------------------


def test_route_filter_matches_literal_walk(spark):
    expected = {}
    for r in _rows("events", ["event_id", "event_type"]):
        et = r["event_type"]
        if et.startswith("~$"):
            continue
        low = et.lower()
        route = (
            "ventes"
            if "purchase" in low
            else "clients"
            if "signup" in low
            else "produits"
            if "view" in low
            else "skip"
        )
        expected[r["event_id"]] = (et, route)
    got = {
        r.event_id: (r.event_type, r.route)
        for r in _run(spark, "q_route_filter")
    }
    assert got == expected
    assert {v[1] for v in expected.values()} >= {"ventes", "clients", "produits", "skip"}


# ---------------------------------------------------------------------------
# q_upsert_latest — keep-latest election by hand
# ---------------------------------------------------------------------------


def test_upsert_latest_matches_literal_walk(spark):
    ev = _rows("events", ["event_id", "user_id", "ts", "value"])
    merged = []
    for r in ev:
        if r["event_id"] >= 250:
            merged.append((r["user_id"], r["ts"], float(r["value"]), "reprocessed"))
        if r["event_id"] < 500:
            merged.append((r["user_id"], r["ts"], float(r["value"]), "success"))
    best = {}
    for u, ts, v, st in merged:
        key = (ts, v, st)
        cur = best.get(u)
        # ts DESC, value DESC, status ASC
        if cur is None or (-_ord(ts), -v, st) < (-_ord(cur[0]), -cur[1], cur[2]):
            best[u] = (ts, v, st)
    expected = {u: t for u, t in best.items()}
    got = {
        r.user_id: (r.ts, float(r.value), r.status)
        for r in _run(spark, "q_upsert_latest")
    }
    assert got == expected
    assert {t[2] for t in expected.values()} >= {"reprocessed"}


def _ord(ts):
    return ts.timestamp() if hasattr(ts, "timestamp") else ts


# ---------------------------------------------------------------------------
# q_upsert_partition_rollup — the full-history anchor by hand
# ---------------------------------------------------------------------------


def test_partition_rollup_matches_literal_walk(spark):
    agg = defaultdict(lambda: [0, 0])
    for r in _rows("orders", ["o_orderdate", "o_totalprice"]):
        cell = agg[r["o_orderdate"].date().replace(day=1)]
        cell[0] += 1
        cell[1] += _cents(r["o_totalprice"])
    expected = {m: (n, c / 100.0) for m, (n, c) in agg.items()}
    got = {
        r.order_month: (r.n_orders, r.total_price)
        for r in _run(spark, "q_upsert_partition_rollup")
    }
    assert got == expected
