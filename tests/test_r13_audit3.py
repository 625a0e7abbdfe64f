"""Round-13 twin-formula audit, batch 3 — time-series / robust-stats /
text-diversity closed forms re-derived from first principles (same
discipline as test_r13_audit.py / test_r13_audit2.py).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from fractions import Fraction

import pyarrow.parquet as pq
import pytest

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


def _day(ts):
    return ts.date() if hasattr(ts, "date") else ts


def _pdisc(sorted_vals, q):
    """SQL PERCENTILE_DISC: smallest value whose cume_dist >= q."""
    return sorted_vals[math.ceil(q * len(sorted_vals)) - 1]


# ---------------------------------------------------------------------------
# q_events_anomaly_days — exact-rational 2-sigma from the definition
# ---------------------------------------------------------------------------


def test_anomaly_days_match_exact_two_sigma(spark):
    ev = _rows("events", ["ts"])
    daily = Counter(_day(r["ts"]) for r in ev)
    n_days = len(daily)
    mean = Fraction(sum(daily.values()), n_days)
    var = sum((Fraction(c) - mean) ** 2 for c in daily.values()) / n_days
    expected = {d: (Fraction(c) - mean) ** 2 > 4 * var for d, c in daily.items()}

    got = {r.day: (r.n_events, r.is_anomaly)
           for r in _run(spark, "q_events_anomaly_days")}
    assert set(got) == set(daily)
    for d, c in daily.items():
        assert got[d] == (c, expected[d]), d


# ---------------------------------------------------------------------------
# q_events_ewma_daily — bit-exact dyadic truncated EWMA
# ---------------------------------------------------------------------------


def test_ewma_daily_matches_literal_dyadic_sum(spark):
    ev = _rows("events", ["ts"])
    daily = Counter(_day(r["ts"]) for r in ev)
    days = sorted(daily)
    counts = [daily[d] for d in days]
    expected = {}
    for i, d in enumerate(days):
        s = 0.0
        for k in range(20):
            x = counts[i - k] if i - k >= 0 else 0
            s += x * 2.0 ** -(k + 1)
        expected[d] = s
    got = {r.day: (r.n_events, r.ewma) for r in _run(spark, "q_events_ewma_daily")}
    assert set(got) == set(expected)
    for d in days:
        assert got[d] == (daily[d], expected[d]), d  # dyadic => exact ==


# ---------------------------------------------------------------------------
# q_stats_winsorized — clip to literal order statistics, then mean
# ---------------------------------------------------------------------------


def test_winsorized_matches_literal_clip(spark):
    orders = _rows("orders", ["o_orderpriority", "o_totalprice"])
    by_p = defaultdict(list)
    for r in orders:
        by_p[r["o_orderpriority"]].append(float(r["o_totalprice"]))
    got = {r.o_orderpriority: r for r in _run(spark, "q_stats_winsorized")}
    assert set(got) == set(by_p)
    for p, xs in by_p.items():
        s = sorted(xs)
        lo, hi = _pdisc(s, 0.05), _pdisc(s, 0.95)
        clipped = [min(max(x, lo), hi) for x in xs]
        n_clipped = sum(1 for x in xs if x < lo or x > hi)
        row = got[p]
        assert row.n_orders == len(xs)
        assert row.n_clipped == n_clipped, p
        assert row.winsorized_mean == pytest.approx(
            sum(clipped) / len(xs), rel=1e-9
        )


# ---------------------------------------------------------------------------
# q_orders_seasonal_naive_backtest
# ---------------------------------------------------------------------------


def test_seasonal_backtest_matches_literal_month_pairs(spark):
    orders = _rows("orders", ["o_orderdate", "o_totalprice"])
    monthly = defaultdict(int)  # linear month index -> revenue cents
    ym_of = {}
    for r in orders:
        d = _day(r["o_orderdate"])
        m_idx = d.year * 12 + d.month
        monthly[m_idx] += _cents(r["o_totalprice"])
        ym_of[m_idx] = d.year * 100 + d.month
    got = {r.ym: r for r in _run(spark, "q_orders_seasonal_naive_backtest")}
    expected_yms = {ym_of[m] for m in monthly if m - 12 in monthly}
    assert set(got) == expected_yms
    for m, cur in monthly.items():
        if m - 12 not in monthly:
            continue
        prev = monthly[m - 12]
        row = got[ym_of[m]]
        assert row.actual_revenue == pytest.approx(cur / 100, rel=1e-12)
        assert row.forecast_revenue == pytest.approx(prev / 100, rel=1e-12)
        assert row.ape_ppm == abs(cur - prev) * 1_000_000 // cur


# ---------------------------------------------------------------------------
# q_text_simpson_diversity
# ---------------------------------------------------------------------------


def test_simpson_diversity_matches_collision_probability(spark):
    docs = _rows("documents", ["source", "text"])
    tf = defaultdict(Counter)
    for r in docs:
        for t in re.split(r"[^a-z0-9]+", r["text"].lower()):
            if t:
                tf[r["source"]][t] += 1
    got = {r.source: r for r in _run(spark, "q_text_simpson_diversity")}
    assert set(got) == set(tf)
    for src, c in tf.items():
        n = sum(c.values())
        coll = sum(v * (v - 1) for v in c.values())
        row = got[src]
        assert (row.n_tokens, row.vocab) == (n, len(c))
        if n <= 1:
            assert row.simpson_e6 is None
        else:
            # collision probability of two draws without replacement
            assert abs(row.simpson_e6 - coll / (n * (n - 1)) * 1e6) <= 1, src


# ---------------------------------------------------------------------------
# q_events_dow_uniformity_chisq — python weekday(), not epoch arithmetic
# ---------------------------------------------------------------------------


def test_dow_chisq_matches_python_weekday(spark):
    ev = _rows("events", ["ts", "event_type"])
    dow = defaultdict(Counter)
    for r in ev:
        # datetime.weekday(): Monday=0 — engine uses (epoch_days+4)%7
        # which makes Monday=0 too ONLY if the mapping is right; using
        # the library call checks that convention independently
        dow[r["event_type"]][_day(r["ts"]).weekday()] += 1
    got = {r.event_type: r for r in _run(spark, "q_events_dow_uniformity_chisq")}
    assert set(got) == set(dow)
    for t, hist in dow.items():
        n = sum(hist.values())
        chi2 = sum((hist.get(d, 0) - n / 7) ** 2 / (n / 7) for d in range(7))
        row = got[t]
        assert row.n_events == n
        assert abs(row.chisq_e6 - chi2 * 1e6) <= 2, t


# ---------------------------------------------------------------------------
# q_events_dwell_time — per-user sequence walk
# ---------------------------------------------------------------------------


def test_dwell_time_matches_sequence_walk(spark):
    ev = _rows("events", ["user_id", "ts", "event_id", "event_type"])
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    by_user = defaultdict(list)
    for r in ev:
        t = r["ts"]
        # naive NTZ seconds from the NTZ epoch (not .timestamp(), which
        # would interpret the naive value in the PROCESS timezone) —
        # truncated to whole seconds first, like the engine
        sec = int((t.replace(tzinfo=None) - epoch).total_seconds())
        by_user[r["user_id"]].append((sec, r["event_id"], r["event_type"]))
    dwells = defaultdict(list)
    for lst in by_user.values():
        lst.sort(key=lambda x: (x[0], x[1]))
        for (s1, _, ty), (s2, _, _) in zip(lst, lst[1:]):
            dwells[ty].append(s2 - s1)
    got = {r.event_type: r for r in _run(spark, "q_events_dwell_time")}
    assert set(got) == set(dwells)
    for ty, ds in dwells.items():
        row = got[ty]
        assert row.n_dwells == len(ds)
        assert row.mean_dwell_e3 == sum(ds) * 1000 // len(ds)
        s = sorted(ds)
        assert row.p50_dwell_s == _pdisc(s, 0.5)
        assert row.p90_dwell_s == _pdisc(s, 0.9)
