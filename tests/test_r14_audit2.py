"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 2.

Literal-reference property tests for the remaining r5/r10 closed forms
with no literal twin: PageRank power iteration, market-basket lift,
DAU/WAU, inter-arrival rates, repeat-purchase quantiles, customer
migration matrix, ABC revenue classes, fill-rate SLA, gap histogram,
and the Pareto cumulative share.
"""

from __future__ import annotations

import datetime
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
# q_graph_pagerank — literal float power iteration (dyadic, bit-exact)
# ---------------------------------------------------------------------------


def test_pagerank_matches_float_power_iteration(spark):
    nodes = sorted(
        r["doc_id"]
        for r in _rows("documents", ["doc_id"])
        if r["doc_id"] < 64
    )
    edges = []
    for i in nodes:
        edges.append((i, (2 * i + 1) % 64))
        edges.append((i, (3 * i + 2) % 64))
    deg = Counter(src for src, _ in edges)
    ranks = {i: 1.0 / 64 for i in nodes}
    for _ in range(4):
        contrib = defaultdict(float)
        for src, dst in edges:
            contrib[dst] += ranks[src] / deg[src]
        ranks = {
            i: (1.0 - 0.75) / 64 + 0.75 * contrib.get(i, 0.0) for i in nodes
        }
    got = {r.id: r.rank for r in _run(spark, "q_graph_pagerank")}
    assert got == ranks  # dyadic rationals: bit-exact equality


# ---------------------------------------------------------------------------
# q_orders_market_basket — literal pair counting + integer lift
# ---------------------------------------------------------------------------


def test_market_basket_matches_literal_pair_counts(spark):
    li = _rows("lineitem", ["l_orderkey", "l_partkey"])
    items = {(r["l_orderkey"], r["l_partkey"]) for r in li}
    baskets = defaultdict(set)
    for ok, pk in items:
        baskets[ok].add(pk)
    n_orders = len(baskets)
    part_n = Counter(pk for _, pk in items)
    pair_n = Counter()
    for _, parts in baskets.items():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_n[(a, b)] += 1
    cands = sorted(
        ((ab, n) for ab, n in pair_n.items() if n >= 3),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    expected = {
        (a, b): (
            n,
            part_n[a],
            part_n[b],
            n * n_orders * 1_000_000 // (part_n[a] * part_n[b]),
        )
        for (a, b), n in cands
    }
    got = {
        (r.part_a, r.part_b): (r.n_ab, r.n_a, r.n_b, r.lift_e6)
        for r in _run(spark, "q_orders_market_basket")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_dau_wau — literal trailing-7-day distinct-user walk
# ---------------------------------------------------------------------------


def test_dau_wau_matches_literal_trailing_window(spark):
    events = _rows("events", ["user_id", "ts"])
    user_days = {(r["user_id"], _day(r["ts"])) for r in events}
    max_day = max(d for _, d in user_days)
    contrib_days = sorted(
        {
            d + datetime.timedelta(days=k)
            for _, d in user_days
            for k in range(7)
            if d + datetime.timedelta(days=k) <= max_day
        }
    )
    expected = {}
    for day in contrib_days:
        active7 = {
            u
            for u, d in user_days
            if day - datetime.timedelta(days=6) <= d <= day
        }
        dau = sum(1 for _, d in user_days if d == day)
        expected[day] = (dau, len(active7))
    got = {r.day: (r.dau, r.wau) for r in _run(spark, "q_events_dau_wau")}
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_interarrival_rate — literal microsecond gap walk
# ---------------------------------------------------------------------------


def test_interarrival_rate_matches_literal_gaps(spark):
    events = _rows("events", ["user_id", "event_type", "ts", "event_id"])
    streams = defaultdict(list)
    for r in events:
        streams[(r["user_id"], r["event_type"])].append(
            (_epoch_us(r["ts"]), r["event_id"])
        )
    per_type = defaultdict(list)
    for (_, et), seq in streams.items():
        seq.sort()
        for i in range(1, len(seq)):
            per_type[et].append(seq[i][0] - seq[i - 1][0])
    expected = {}
    for et, gaps in per_type.items():
        n, s = len(gaps), sum(gaps)
        expected[et] = (
            n,
            s,
            s // n,
            n * 3_600_000_000 * 1_000_000 // s if s else None,
        )
    got = {
        r.event_type: (r.n_gaps, r.sum_gap_us, r.mean_gap_us, r.rate_per_hour_e6)
        for r in _run(spark, "q_events_interarrival_rate")
        if r.n_gaps > 0
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_repeat_interval — literal day-gap quantile walk
# ---------------------------------------------------------------------------


def test_repeat_interval_matches_literal_quantiles(spark):
    orders = _rows("orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    seg_of = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in _rows("customer", ["c_custkey", "c_mktsegment"])
    }
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append((_day(r["o_orderdate"]), r["o_orderkey"]))
    per_seg = defaultdict(list)
    for ck, lst in by_cust.items():
        lst.sort()
        for i in range(1, len(lst)):
            per_seg[seg_of[ck]].append((lst[i][0] - lst[i - 1][0]).days)
    expected = {}
    for seg, gaps in per_seg.items():
        gaps.sort()
        n, s = len(gaps), sum(gaps)
        median = next(g for i, g in enumerate(gaps) if (i + 1) * 2 >= n)
        p90 = next(g for i, g in enumerate(gaps) if (i + 1) * 10 >= n * 9)
        expected[seg] = (n, s * 1_000_000 // n, median, p90, max(gaps))
    got = {
        r.c_mktsegment: (
            r.n_gaps,
            r.mean_gap_e6,
            r.median_gap_days,
            r.p90_gap_days,
            r.max_gap_days,
        )
        for r in _run(spark, "q_orders_repeat_interval")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_customer_migration — literal year-over-year band walk
# ---------------------------------------------------------------------------


def test_customer_migration_matches_literal_band_walk(spark):
    orders = _rows("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    yearly = Counter()
    for r in orders:
        yearly[(r["o_custkey"], _day(r["o_orderdate"]).year)] += _cents(
            r["o_totalprice"]
        )

    def band(cents):
        return "low" if cents < 25_000_000 else (
            "mid" if cents < 60_000_000 else "high"
        )

    seg = {(ck, y): band(c) for (ck, y), c in yearly.items()}
    matrix = Counter()
    for (ck, y), s in seg.items():
        matrix[(y, s, seg.get((ck, y + 1), "none"))] += 1
        if (ck, y - 1) not in seg:
            matrix[(y - 1, "none", s)] += 1
    row_tot = Counter()
    for (y, f, _), n in matrix.items():
        row_tot[(y, f)] += n
    expected = {
        k: (n, n * 1_000_000 // row_tot[(k[0], k[1])])
        for k, n in matrix.items()
    }
    got = {
        (r.year_from, r.from_seg, r.to_seg): (r.n_customers, r.share_e6)
        for r in _run(spark, "q_orders_customer_migration")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_abc_parts — literal strictly-above mass classification
# ---------------------------------------------------------------------------


def test_abc_parts_match_literal_mass_walk(spark):
    li = _rows("lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    per_part = Counter()
    for r in li:
        p2 = _cents(r["l_extendedprice"])
        d2 = _cents(r["l_discount"])
        per_part[r["l_partkey"]] += p2 * (100 - d2)
    per_value = Counter()
    for _, s in per_part.items():
        per_value[s] += 1
    total = sum(s * n for s, n in per_value.items())
    classes = defaultdict(lambda: [0, 0])
    for s, n in per_value.items():
        above = sum(s2 * n2 for s2, n2 in per_value.items() if s2 > s)
        cls = (
            "A"
            if above * 5 < total * 4
            else ("B" if above * 20 < total * 19 else "C")
        )
        classes[cls][0] += n
        classes[cls][1] += s * n
    expected = {
        c: (n, m, m * 1_000_000 // total) for c, (n, m) in classes.items()
    }
    got = {
        r.abc_class: (r.n_parts, r.mass_e4, r.share_e6)
        for r in _run(spark, "q_orders_abc_parts")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_fill_rate_sla — literal 30-day close walk
# ---------------------------------------------------------------------------


def test_fill_rate_matches_literal_close_walk(spark):
    li = _rows("lineitem", ["l_orderkey", "l_shipdate"])
    close = {}
    for r in li:
        d = _day(r["l_shipdate"])
        k = r["l_orderkey"]
        if k not in close or d > close[k]:
            close[k] = d
    per_pri = defaultdict(lambda: [0, 0])
    for r in _rows("orders", ["o_orderkey", "o_orderpriority", "o_orderdate"]):
        if r["o_orderkey"] not in close:
            continue
        slot = per_pri[r["o_orderpriority"]]
        slot[0] += 1
        if close[r["o_orderkey"]] <= _day(
            r["o_orderdate"]
        ) + datetime.timedelta(days=30):
            slot[1] += 1
    expected = {
        p: (n, s, s * 1_000_000 // n) for p, (n, s) in per_pri.items()
    }
    got = {
        r.o_orderpriority: (r.n_orders, r.n_shipped_30d, r.fill_rate_e6)
        for r in _run(spark, "q_orders_fill_rate_sla")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_gap_histogram — literal epoch-second gap buckets
# ---------------------------------------------------------------------------


def test_gap_histogram_matches_literal_second_walk(spark):
    events = _rows("events", ["user_id", "ts", "event_id"])
    streams = defaultdict(list)
    for r in events:
        d = r["ts"] - _EPOCH
        sec = d.days * 86400 + d.seconds  # endpoint truncation
        streams[r["user_id"]].append((_epoch_us(r["ts"]), r["event_id"], sec))
    hist = Counter()
    for _, seq in streams.items():
        seq.sort()  # (ts, event_id) order
        for i in range(1, len(seq)):
            gap = seq[i][2] - seq[i - 1][2]
            hist[(gap // 600) * 600] += 1
    got = {
        r.gap_bucket_sec: r.n_gaps
        for r in _run(spark, "q_events_gap_histogram")
    }
    assert got == dict(hist)


# ---------------------------------------------------------------------------
# q_orders_pareto — literal descending cumulative revenue share
# ---------------------------------------------------------------------------


def test_pareto_matches_literal_cumulative_share(spark):
    orders = _rows("orders", ["o_custkey", "o_totalprice"])
    per_cust = Counter()
    for r in orders:
        per_cust[r["o_custkey"]] += _cents(r["o_totalprice"])
    total = sum(per_cust.values())
    order = sorted(per_cust.items(), key=lambda kv: (-kv[1], kv[0]))
    expected, cum = {}, 0
    for ck, cents in order:
        cum += cents
        expected[ck] = (
            cents / 100.0,
            (cum / 100.0) / (total / 100.0),
        )
    got = {
        r.o_custkey: (r.revenue, r.cum_share)
        for r in _run(spark, "q_orders_pareto")
    }
    assert got == expected
