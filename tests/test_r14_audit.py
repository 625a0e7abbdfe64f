"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 1.

Extends the r13 literal-reference discipline to the r10/r11 closed
forms that had no literal twin: each test re-derives one query from
FIRST PRINCIPLES with a brute-force Python implementation over the raw
sf0.001 parquet — per-row loops, plain dict/list machinery, no shared
code with the engine — and checks the engine's output exactly (or
within documented float dust where the literal route differs in
parenthesization).
"""

from __future__ import annotations

import datetime
import math
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


def _day(x) -> datetime.date:
    return x.date() if hasattr(x, "date") else x


def _month_start(d: datetime.date) -> datetime.date:
    return d.replace(day=1)


# ---------------------------------------------------------------------------
# q_orders_cohort_ltv — the (cohort x age) LTV triangle by literal walk
# ---------------------------------------------------------------------------


def test_cohort_ltv_matches_per_customer_walk(spark):
    orders = _rows("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    first_month: dict[int, datetime.date] = {}
    for r in orders:
        m = _month_start(_day(r["o_orderdate"]))
        k = r["o_custkey"]
        if k not in first_month or m < first_month[k]:
            first_month[k] = m
    cells = defaultdict(lambda: [set(), 0, 0])  # custs, n_orders, cents
    for r in orders:
        om = _month_start(_day(r["o_orderdate"]))
        cm = first_month[r["o_custkey"]]
        age = (om.year - cm.year) * 12 + (om.month - cm.month)
        cell = cells[(cm, age)]
        cell[0].add(r["o_custkey"])
        cell[1] += 1
        cell[2] += _cents(r["o_totalprice"])
    expected = {
        k: (len(c[0]), c[1], c[2] / 100.0) for k, c in cells.items()
    }
    got = {
        (r.cohort_month, r.age_months): (r.n_customers, r.n_orders, r.revenue)
        for r in _run(spark, "q_orders_cohort_ltv")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_user_lifecycle — growth accounting by per-user day walk
# ---------------------------------------------------------------------------


def test_user_lifecycle_matches_per_user_day_walk(spark):
    events = _rows("events", ["user_id", "ts"])
    days = defaultdict(set)
    for r in events:
        days[r["user_id"]].add(_day(r["ts"]))
    per_day = defaultdict(lambda: [0, 0, 0, 0])  # active/new/ret/res
    for _, ds in days.items():
        seq = sorted(ds)
        for i, d in enumerate(seq):
            slot = per_day[d]
            slot[0] += 1
            if i == 0:
                slot[1] += 1
            else:
                gap = (d - seq[i - 1]).days
                if gap == 1:
                    slot[2] += 1
                elif gap > 1:
                    slot[3] += 1
    expected = {d: tuple(v) for d, v in per_day.items()}
    got = {
        r.day: (r.n_active, r.n_new, r.n_retained, r.n_resurrected)
        for r in _run(spark, "q_events_user_lifecycle")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_seasonality_decompose — positional 12-month window by hand
# ---------------------------------------------------------------------------


def test_seasonality_matches_literal_moving_average(spark):
    orders = _rows("orders", ["o_orderdate", "o_totalprice"])
    monthly = Counter()
    for r in orders:
        monthly[_month_start(_day(r["o_orderdate"]))] += _cents(
            r["o_totalprice"]
        )
    months = sorted(monthly)
    expected = {}
    for i, m in enumerate(months):
        y = monthly[m]
        lo, hi = i - 5, i + 6
        if lo >= 0 and hi < len(months):
            window = [monthly[months[j]] for j in range(lo, hi + 1)]
            trend = sum(window) // 12
            seasonal = y * 1_000_000 // trend if trend else None
        else:
            trend, seasonal = None, None
        expected[m] = (y, trend, seasonal)
    got = {
        r.month: (r.revenue_cents, r.trend_cents, r.seasonal_e6)
        for r in _run(spark, "q_orders_seasonality_decompose")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_zipf_fit — doubling-law OLS from a literal token count
# ---------------------------------------------------------------------------


def test_zipf_fit_matches_literal_rank_frequency(spark):
    docs = _rows("documents", ["lang", "text"])
    tf = defaultdict(Counter)
    for r in docs:
        for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()):
            if t:
                tf[r["lang"]][t] += 1
    expected = {}
    for lang, counts in tf.items():
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
        pts = [
            ((i + 1).bit_length() - 1, cnt.bit_length() - 1)
            for i, (_, cnt) in enumerate(ranked)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        syy = sum(y * y for _, y in pts)
        num = n * sxy - sx * sy
        den_x = n * sxx - sx * sx
        den_y = n * syy - sy * sy
        slope = round(num / den_x, 6) if den_x else None
        r2 = round(num * num / (den_x * den_y), 6) if den_x * den_y else None
        expected[lang] = (n, slope, r2)
    got = {
        r.lang: (r.n_terms, r.slope6, r.r2_6)
        for r in _run(spark, "q_text_zipf_fit")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_revenue_trend — per-region OLS slope vs a literal fit
# ---------------------------------------------------------------------------


def test_revenue_trend_matches_literal_ols(spark):
    orders = _rows("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in _rows("customer", ["c_custkey", "c_nationkey"])
    }
    nation = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in _rows("nation", ["n_nationkey", "n_regionkey"])
    }
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in _rows("region", ["r_regionkey", "r_name"])
    }
    monthly = Counter()
    for r in orders:
        rg = region[nation[cust[r["o_custkey"]]]]
        d = _day(r["o_orderdate"])
        x = (d.year - 1992) * 12 + (d.month - 1)
        monthly[(rg, x)] += _cents(r["o_totalprice"])
    per_region = defaultdict(list)
    for (rg, x), y in monthly.items():
        per_region[rg].append((x, y))
    for r in _run(spark, "q_orders_revenue_trend"):
        pts = per_region[r.r_name]
        assert r.n_months == len(pts)
        n = len(pts)
        sx = float(sum(x for x, _ in pts))
        sy = float(sum(y for _, y in pts))
        sxy = float(sum(x * y for x, y in pts))
        sxx = float(sum(x * x for x, _ in pts))
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den if den else None
        # independent parenthesization: allow proportional float dust
        assert abs(r.slope_cents_per_month6 - slope) <= max(
            1e-4, 1e-9 * abs(slope)
        )
        assert r.mean_monthly_revenue == round(sy / n / 100, 2)


# ---------------------------------------------------------------------------
# q_events_cusum_changepoint — literal scaled-CUSUM argmax
# ---------------------------------------------------------------------------


def test_cusum_matches_literal_partial_sums(spark):
    events = _rows("events", ["event_type", "ts"])
    daily = Counter()
    for r in events:
        daily[(r["event_type"], _day(r["ts"]))] += 1
    by_type = defaultdict(dict)
    for (et, d), n in daily.items():
        by_type[et][d] = n
    expected = {}
    for et, dm in by_type.items():
        days = sorted(dm)
        total, nd = sum(dm.values()), len(days)
        s, best = 0, None
        for d in days:
            s += dm[d] * nd - total
            if best is None or abs(s) > abs(best[3]):
                best = (et, d, dm[d], s)
        expected[et] = (best[1], best[2], best[3], abs(best[3]))
    got = {
        r.event_type: (r.changepoint_day, r.day_events, r.s_scaled, r.s_abs)
        for r in _run(spark, "q_events_cusum_changepoint")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_retention_triangle — literal Monday-week cohort triangle
# ---------------------------------------------------------------------------


def test_retention_triangle_matches_literal_cohorts(spark):
    events = _rows("events", ["user_id", "ts"])
    weeks = defaultdict(set)
    for r in events:
        d = _day(r["ts"])
        weeks[r["user_id"]].add(d - datetime.timedelta(days=d.weekday()))
    tri = Counter()
    for _, ws in weeks.items():
        cohort = min(ws)
        for w in ws:
            tri[(cohort, (w - cohort).days // 7)] += 1
    expected = {}
    for (cohort, age), n in tri.items():
        base = tri[(cohort, 0)]
        expected[(cohort, age)] = (n, base, n * 1_000_000 // base)
    got = {
        (r.cohort, r.age_weeks): (r.n_active, r.cohort_size, r.retention_e6)
        for r in _run(spark, "q_events_retention_triangle")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_xyz_parts — literal integer cross-multiplied CV classes
# ---------------------------------------------------------------------------


def test_xyz_parts_match_literal_cv_classes(spark):
    li = _rows("lineitem", ["l_partkey", "l_shipdate", "l_quantity"])
    pm = Counter()
    for r in li:
        d = _day(r["l_shipdate"])
        pm[(r["l_partkey"], d.year * 12 + d.month)] += _cents(r["l_quantity"])
    per_part = defaultdict(list)
    for (pk, _), dqty in pm.items():
        per_part[pk].append(dqty)
    classes = Counter()
    for _, ds in per_part.items():
        n, s, ss = len(ds), sum(ds), sum(d * d for d in ds)
        var_num = n * ss - s * s
        if 4 * var_num < s * s:
            classes["X"] += 1
        elif var_num < s * s:
            classes["Y"] += 1
        else:
            classes["Z"] += 1
    total = sum(classes.values())
    expected = {
        c: (n, n * 1_000_000 // total) for c, n in classes.items()
    }
    got = {
        r.xyz_class: (r.n_parts, r.share_e6)
        for r in _run(spark, "q_orders_xyz_parts")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_stats_mad_outliers — literal discrete median / MAD / 3-sigma gate
# ---------------------------------------------------------------------------


def _disc_median(vals: list[float]) -> float:
    """percentile_disc(0.5): smallest value whose cumulative count
    reaches half the rows."""
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_mad_outliers_match_literal_medians(spark):
    orders = _rows("orders", ["o_orderpriority", "o_totalprice"])
    groups = defaultdict(list)
    for r in orders:
        groups[r["o_orderpriority"]].append(float(r["o_totalprice"]))
    expected = {}
    for pri, vals in groups.items():
        med = _disc_median(vals)
        devs = [abs(v - med) for v in vals]
        mad = _disc_median(devs)
        n_out = sum(1 for d in devs if d > 3.0 * mad)
        expected[pri] = (len(vals), med, mad, n_out)
    got = {
        r.o_orderpriority: (r.n_orders, r.med, r.mad, r.n_outliers)
        for r in _run(spark, "q_stats_mad_outliers")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_stats_mode_deterministic — literal (count desc, value asc) winner
# ---------------------------------------------------------------------------


def test_mode_matches_literal_counter(spark):
    li = _rows("lineitem", ["l_returnflag", "l_quantity"])
    counts = Counter((r["l_returnflag"], float(r["l_quantity"])) for r in li)
    per_flag = defaultdict(list)
    for (flag, qty), c in counts.items():
        per_flag[flag].append((-c, qty))
    expected = {}
    for flag, lst in per_flag.items():
        negc, qty = min(lst)
        expected[flag] = (qty, -negc)
    got = {
        r.l_returnflag: (float(r.mode_qty), r.mode_count)
        for r in _run(spark, "q_stats_mode_deterministic")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_stats_moments — textbook two-pass variance / Pearson correlation
# ---------------------------------------------------------------------------


def test_moments_match_textbook_two_pass(spark):
    li = _rows("lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    groups = defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append(
            (float(r["l_quantity"]), float(r["l_extendedprice"]))
        )
    for r in _run(spark, "q_stats_moments"):
        pts = groups[r.l_returnflag]
        n = len(pts)
        assert r.n_items == n
        mq = sum(q for q, _ in pts) / n
        mp = sum(p for _, p in pts) / n
        var = sum((q - mq) ** 2 for q, _ in pts) / (n - 1)
        cov = sum((q - mq) * (p - mp) for q, p in pts) / (n - 1)
        vp = sum((p - mp) ** 2 for _, p in pts) / (n - 1)
        assert abs(r.qty_var - var) <= 1e-6 * max(1.0, abs(var))
        assert abs(r.qty_stddev - math.sqrt(var)) <= 1e-6
        assert abs(r.qty_price_corr - cov / math.sqrt(var * vp)) <= 2e-6


# ---------------------------------------------------------------------------
# q_rfm_segmentation — literal ntile quartiles with pinned tie-break
# ---------------------------------------------------------------------------


def _ntile4(keys: list) -> dict:
    """ntile(4) over sorted keys: first n%4 buckets get n//4+1 rows."""
    n = len(keys)
    out, idx = {}, 0
    for b in range(1, 5):
        size = n // 4 + (1 if b <= n % 4 else 0)
        for k in sorted(keys)[idx : idx + size]:
            out[k] = b
        idx += size
    return out


def test_rfm_matches_literal_quartiles(spark):
    orders = _rows("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    per_cust = {}
    for r in orders:
        k = r["o_custkey"]
        d = _day(r["o_orderdate"])
        c = _cents(r["o_totalprice"])
        if k in per_cust:
            last, freq, cents = per_cust[k]
            per_cust[k] = (max(last, d), freq + 1, cents + c)
        else:
            per_cust[k] = (d, 1, c)
    r_tile = _ntile4([(v[0], k) for k, v in per_cust.items()])
    f_tile = _ntile4([(v[1], k) for k, v in per_cust.items()])
    m_tile = _ntile4([(v[2] / 100.0, k) for k, v in per_cust.items()])
    expected = {
        k: (
            v[0],
            v[1],
            v[2] / 100.0,
            r_tile[(v[0], k)],
            f_tile[(v[1], k)],
            m_tile[(v[2] / 100.0, k)],
        )
        for k, v in per_cust.items()
    }
    got = {
        r.o_custkey: (
            r.last_order_day,
            r.frequency,
            r.monetary,
            r.r_score,
            r.f_score,
            r.m_score,
        )
        for r in _run(spark, "q_rfm_segmentation")
    }
    assert got == expected
