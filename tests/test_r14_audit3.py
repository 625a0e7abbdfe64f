"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 3.

Literal twins for the composed-threshold and report-shaped closed
forms: the bot screen (four rules + OR), supplier scorecard, ship
latency histogram, hourly heatmap, SCD2 state intervals, and VARIANT
JSON extraction.
"""

from __future__ import annotations

import datetime
import json
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.datetime(1970, 1, 1)


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


def _day(x) -> datetime.date:
    return x.date() if hasattr(x, "date") else x


def _epoch_us(ts: datetime.datetime) -> int:
    d = ts - _EPOCH
    return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds


# ---------------------------------------------------------------------------
# q_events_bot_verdict — all four rules re-derived per user
# ---------------------------------------------------------------------------


def test_bot_verdict_matches_literal_rule_walk(spark):
    events = _rows("events", ["user_id", "event_type", "ts", "event_id"])
    per_user = defaultdict(list)
    for r in events:
        per_user[r["user_id"]].append(r)
    expected = {}
    for uid, evs in per_user.items():
        n = len(evs)
        tc = Counter(e["event_type"] for e in evs)
        ssq = sum(c * c for c in tc.values())
        gini = (n * n - ssq) * 1_000_000 // (n * n)
        night = sum(1 for e in evs if e["ts"].hour < 6)
        night_share = night * 1_000_000 // n
        dc = Counter(_day(e["ts"]) for e in evs)
        max_day_share = max(dc.values()) * 1_000_000 // n
        seq = sorted((_epoch_us(e["ts"]), e["event_id"]) for e in evs)
        gaps = [seq[i][0] - seq[i - 1][0] for i in range(1, len(seq))]
        gn, gs = len(gaps), sum(gaps)
        gss = sum(g * g for g in gaps)
        single = n >= 20 and gini < 100_000
        nocturnal = n >= 20 and night_share > 800_000
        bursty = n >= 20 and max_day_share > 500_000
        metronomic = gn >= 19 and 100 * (gn * gss - gs * gs) < gs * gs
        expected[uid] = (
            n,
            len(tc),
            gini,
            night_share,
            max_day_share,
            single,
            nocturnal,
            bursty,
            metronomic,
            single or nocturnal or bursty or metronomic,
        )
    got = {
        r.user_id: (
            r.n_events,
            r.n_types,
            r.gini_e6,
            r.night_share_e6,
            r.max_day_share_e6,
            r.single_minded,
            r.nocturnal,
            r.bursty,
            r.metronomic,
            r.bot_verdict,
        )
        for r in _run(spark, "q_events_bot_verdict")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_supplier_scorecard — literal revenue/return/rank walk
# ---------------------------------------------------------------------------


def test_supplier_scorecard_matches_literal_walk(spark):
    li = _rows(
        "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    stats = defaultdict(lambda: [0, 0, 0])  # lines, rev_e4, returns
    for r in li:
        s = stats[r["l_suppkey"]]
        s[0] += 1
        s[1] += _cents(r["l_extendedprice"]) * (100 - _cents(r["l_discount"]))
        s[2] += 1 if r["l_returnflag"] == "R" else 0
    supp = {
        r["s_suppkey"]: (r["s_name"], r["s_nationkey"])
        for r in _rows("supplier", ["s_suppkey", "s_name", "s_nationkey"])
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in _rows("nation", ["n_nationkey", "n_name"])
    }
    scored = [
        (
            nat[supp[sk][1]],
            supp[sk][0],
            n,
            rev_e4 / 10_000.0,
            ret * 1_000_000 // n,
            sk,
        )
        for sk, (n, rev_e4, ret) in stats.items()
    ]
    per_nation = defaultdict(list)
    for row in scored:
        per_nation[row[0]].append(row)
    expected = {}
    for nation, rows in per_nation.items():
        rows.sort(key=lambda r: (-r[3], r[5]))
        for rank, (nn, sname, n, rev, ret, _) in enumerate(rows, 1):
            expected[(nn, sname)] = (n, rev, ret, rank)
    got = {
        (r.nation, r.supplier): (
            r.n_lines,
            r.revenue,
            r.return_share_e6,
            r.nation_rank,
        )
        for r in _run(spark, "q_supplier_scorecard")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_ship_latency — literal bucket/share walk
# ---------------------------------------------------------------------------


def test_ship_latency_matches_literal_buckets(spark):
    placed = {
        r["o_orderkey"]: (_day(r["o_orderdate"]), r["o_orderpriority"])
        for r in _rows("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    }
    counts = Counter()
    for r in _rows("lineitem", ["l_orderkey", "l_shipdate"]):
        od, pri = placed[r["l_orderkey"]]
        gap = (_day(r["l_shipdate"]) - od).days
        bucket = (
            "0-7d" if gap <= 7 else
            "8-30d" if gap <= 30 else
            "31-90d" if gap <= 90 else "90d+"
        )
        counts[(pri, bucket)] += 1
    pri_tot = Counter()
    for (pri, _), n in counts.items():
        pri_tot[pri] += n
    expected = {
        k: (n, n * 1_000_000 // pri_tot[k[0]]) for k, n in counts.items()
    }
    got = {
        (r.o_orderpriority, r.bucket): (r.n_lines, r.share_e6)
        for r in _run(spark, "q_orders_ship_latency")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_hourly_heatmap — stdlib isoweekday vs the engines' remap
# ---------------------------------------------------------------------------


def test_hourly_heatmap_matches_stdlib_isoweekday(spark):
    cells = defaultdict(lambda: [0, 0])
    for r in _rows("events", ["ts", "value"]):
        key = (r["ts"].isoweekday(), r["ts"].hour)
        cells[key][0] += 1
        cells[key][1] += _cents(r["value"])
    expected = {k: (n, c / 100.0) for k, (n, c) in cells.items()}
    got = {
        (r.dow, r.hr): (r.n_events, r.total_value)
        for r in _run(spark, "q_events_hourly_heatmap")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_scd2_user_state — literal state-change interval walk
# ---------------------------------------------------------------------------


def test_scd2_user_state_matches_literal_intervals(spark):
    events = _rows("events", ["user_id", "event_type", "ts", "event_id"])
    per_user = defaultdict(list)
    for r in events:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    expected = set()
    for uid, evs in per_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        changes = []
        prev = object()  # sentinel distinct from any type (and None)
        for ts, eid, et in evs:
            if et != prev:
                changes.append((ts, eid, et))
            prev = et
        for i, (ts, eid, et) in enumerate(changes):
            valid_to = changes[i + 1][0] if i + 1 < len(changes) else None
            expected.add((uid, et, ts, valid_to))
    got = {
        (r.user_id, r.event_type, r.valid_from, r.valid_to)
        for r in _run(spark, "q_scd2_user_state")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_variant_extract — stdlib json vs VARIANT shredding
# ---------------------------------------------------------------------------


def test_variant_extract_matches_stdlib_json(spark):
    stats = defaultdict(lambda: [0, 0, 0, None])  # n, with_k, sum, max
    for r in _rows("events", ["event_type", "props"]):
        s = stats[r["event_type"]]
        s[0] += 1
        try:
            k = json.loads(r["props"]).get("k")
        except (TypeError, ValueError):
            k = None
        if isinstance(k, bool) or not isinstance(k, int):
            continue
        s[1] += 1
        s[2] += k
        s[3] = k if s[3] is None else max(s[3], k)
    expected = {
        et: (n, wk, total if wk else None, mx)
        for et, (n, wk, total, mx) in stats.items()
    }
    got = {
        r.event_type: (r.n_events, r.n_with_k, r.sum_k, r.max_k)
        for r in _run(spark, "q_events_variant_extract")
    }
    assert got == expected
