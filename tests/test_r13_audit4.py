"""Round-13 twin-formula audit, batch 4 — inequality / robust-trend /
correlogram / concentration closed forms (same discipline as batches
1-3: literal Python over raw parquet, no shared machinery).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

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


# ---------------------------------------------------------------------------
# q_orders_gini_coefficient — sorted-rank identity, literal indexing
# ---------------------------------------------------------------------------


def test_gini_matches_sorted_rank_identity(spark):
    orders = _rows("orders", ["o_custkey", "o_totalprice"])
    spend = Counter()
    for r in orders:
        spend[r["o_custkey"]] += _cents(r["o_totalprice"])
    xs = sorted(spend.values())
    n = len(xs)
    sx = sum(xs)
    s2 = sum(2 * (i + 1) * x for i, x in enumerate(xs))
    gini_e6 = (s2 - (n + 1) * sx) * 1_000_000 // (n * sx)

    [row] = _run(spark, "q_orders_gini_coefficient")
    assert (row.n_customers, row.total_cents) == (n, sx)
    assert row.gini_e6 == gini_e6
    # sanity from the definition: Gini = mean|xi-xj| / (2*mean)
    mad = sum(abs(a - b) for a in xs for b in xs) / (n * n)
    assert row.gini_e6 / 1e6 == pytest.approx(mad / (2 * sx / n), abs=2e-6)


# ---------------------------------------------------------------------------
# q_orders_theil_sen_trend — literal all-pairs slope median
# ---------------------------------------------------------------------------


def test_theil_sen_matches_pairwise_slope_median(spark):
    orders = _rows("orders", ["o_orderdate", "o_totalprice"])
    monthly = Counter()
    for r in orders:
        d = _day(r["o_orderdate"])
        monthly[d.year * 12 + d.month] += _cents(r["o_totalprice"])
    ts = sorted(monthly)
    slopes = []
    for i, ta in enumerate(ts):
        for tb in ts[i + 1:]:
            slopes.append((monthly[tb] - monthly[ta]) * 1_000_000 // (tb - ta))
    slopes.sort()
    n = len(slopes)
    # smallest slope with 2*cum >= n (the engine's discrete median read)
    median = next(
        s for i, s in enumerate(slopes) if 2 * (i + 1) >= n
    )
    [row] = _run(spark, "q_orders_theil_sen_trend")
    assert (row.n_months, row.n_pairs) == (len(ts), n)
    assert row.median_slope_e6 == median


# ---------------------------------------------------------------------------
# q_events_autocorr_daily — literal per-lag Pearson over existing pairs
# ---------------------------------------------------------------------------


def test_autocorr_daily_matches_literal_pearson(spark):
    import datetime as dt

    ev = _rows("events", ["ts"])
    daily = Counter(_day(r["ts"]) for r in ev)
    got = {r.lag_days: r for r in _run(spark, "q_events_autocorr_daily")}
    assert set(got) == set(range(1, 8))
    for k in range(1, 8):
        pairs = [
            (daily[d], daily[d + dt.timedelta(days=k)])
            for d in daily
            if d + dt.timedelta(days=k) in daily
        ]
        row = got[k]
        assert row.n_pairs == len(pairs)
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if n < 2 or dx == 0 or dy == 0:
            assert row.acf is None
            continue
        r = (n * sxy - sx * sy) / math.sqrt(dx) / math.sqrt(dy)
        assert row.acf == pytest.approx(r, abs=2e-6), k


# ---------------------------------------------------------------------------
# q_stats_runs_test — literal run counting + null moments
# ---------------------------------------------------------------------------


def test_runs_test_matches_literal_run_walk(spark):
    ev = _rows("events", ["ts"])
    daily = Counter(_day(r["ts"]) for r in ev)
    days = sorted(daily)
    signs = []
    for prev, cur in zip(days, days[1:]):
        dx = daily[cur] - daily[prev]
        if dx != 0:
            signs.append(1 if dx > 0 else -1)
    n_up = signs.count(1)
    n_down = signs.count(-1)
    n = len(signs)
    n_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    mu = 1 + 2 * n_up * n_down / n
    var = 2 * n_up * n_down * (2 * n_up * n_down - n) / (n * n * (n - 1))
    [row] = _run(spark, "q_stats_runs_test")
    assert (row.n_up, row.n_down, row.n_runs) == (n_up, n_down, n_runs)
    if var <= 0:
        assert row.z is None
    else:
        assert row.z == pytest.approx((n_runs - mu) / math.sqrt(var), abs=5e-6)


# ---------------------------------------------------------------------------
# q_supplier_concentration_hhi — pure-integer literal
# ---------------------------------------------------------------------------


def test_hhi_matches_integer_concentration(spark):
    li = _rows("lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    supplier = {r["s_suppkey"]: r["s_nationkey"]
                for r in _rows("supplier", ["s_suppkey", "s_nationkey"])}
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _rows("nation", ["n_nationkey", "n_name"])}
    rev = Counter()
    for r in li:
        # price(2dp) * (1 - discount(2dp)) * 1e4 == price_cents * (100 - disc_cents)
        rev[r["l_suppkey"]] += _cents(r["l_extendedprice"]) * (
            100 - _cents(r["l_discount"])
        )
    by_nation = defaultdict(list)
    for sk, s in rev.items():
        by_nation[nation[supplier[sk]]].append(s)
    got = {r.n_name: r for r in _run(spark, "q_supplier_concentration_hhi")}
    assert set(got) == set(by_nation)
    for nm, ss in by_nation.items():
        total = sum(ss)
        hhi = sum(s * s for s in ss) * 1_000_000 // (total * total)
        row = got[nm]
        assert row.n_suppliers == len(ss)
        assert row.total_rev_e4 == total
        assert row.hhi_e6 == hhi, nm
        assert row.cr1_e6 == max(ss) * 1_000_000 // total
        assert row.n_eff_e3 == 1_000_000_000 // hhi
        # definition sanity: HHI >= 1e6 / n (evenness bound)
        assert hhi >= 1_000_000 // len(ss)
