"""Round-13 twin-formula audit (VERDICT r12 #7).

The r12 peak-concurrency bug proved a defect class the DuckDB oracle
cannot catch: when Spark and SQL encode the SAME wrong formula, hash
parity certifies the bug. Each test here re-derives one of the
trickiest closed-form r12 queries from FIRST PRINCIPLES with a literal
brute-force Python implementation over the raw sf0.001 parquet —
per-row loops, float math, no shared machinery with the engine — and
checks the engine's exact-integer output against it within floor-dust
tolerance (the engine floors per-group exact quotients; the literal
reference doesn't).
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


# ---------------------------------------------------------------------------
# q_orders_conversion_hazard: per-customer brute force
# ---------------------------------------------------------------------------


def test_hazard_matches_per_customer_walk(spark):
    """Literal reference: enumerate each customer's orders, find first
    and second order dates by (date, orderkey), bucket the gap (or the
    censor gap to the corpus max date) into weeks, then count at-risk /
    conversions / censored per week by direct scanning — no windows, no
    reverse cumsum."""
    orders = _rows("orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    horizon = max(r["o_orderdate"] for r in orders)
    if hasattr(horizon, "date"):
        horizon = horizon.date()

    events = []  # (week, converted)
    for cust, lst in by_cust.items():
        lst.sort()
        first = lst[0][0]
        first = first.date() if hasattr(first, "date") else first
        if len(lst) >= 2:
            second = lst[1][0]
            second = second.date() if hasattr(second, "date") else second
            events.append(((second - first).days // 7, True))
        else:
            events.append(((horizon - first).days // 7, False))

    weeks = sorted({wk for wk, _ in events})
    expected = {}
    for wk in weeks:
        at_risk = sum(1 for w, _ in events if w >= wk)
        conv = sum(1 for w, c in events if w == wk and c)
        cens = sum(1 for w, c in events if w == wk and not c)
        expected[wk] = (at_risk, conv, cens, conv * 1_000_000 // at_risk)

    got = {
        r.week: (r.n_at_risk, r.n_convert, r.n_censored, r.hazard_ppm)
        for r in _run(spark, "q_orders_conversion_hazard")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_quality_brier_decomposition: float Murphy decomposition + identity
# ---------------------------------------------------------------------------


def test_brier_matches_float_murphy_decomposition(spark):
    """Literal reference: per-doc p = min(n_chars, 8192)/8192 and
    y = (lang == 'en'); Brier = mean((p-y)^2); Murphy over distinct p:
    REL = sum n_b (p_b - ybar_b)^2 / N, RES = sum n_b (ybar_b - ybar)^2
    / N, UNC = ybar(1-ybar). All float; engine must sit within a few
    ppm of each component AND the identity must hold."""
    docs = _rows("documents", ["n_chars", "lang"])
    cap = 8192
    pys = [
        (min(r["n_chars"], cap) / cap, 1.0 if (r["lang"] or "") == "en" else 0.0)
        for r in docs
    ]
    n = len(pys)
    ybar = sum(y for _, y in pys) / n
    brier = sum((p - y) ** 2 for p, y in pys) / n
    by_p = defaultdict(list)
    for p, y in pys:
        by_p[p].append(y)
    rel = sum(len(v) * (p - sum(v) / len(v)) ** 2 for p, v in by_p.items()) / n
    res = sum(len(v) * (sum(v) / len(v) - ybar) ** 2 for v in by_p.values()) / n
    unc = ybar * (1 - ybar)
    assert brier == pytest.approx(rel - res + unc, abs=1e-12)  # Murphy identity

    [row] = _run(spark, "q_quality_brier_decomposition")
    assert row.n_docs == n
    assert abs(row.brier_ppm - brier * 1e6) <= 2
    assert abs(row.reliability_ppm - rel * 1e6) <= 2
    assert abs(row.resolution_ppm - res * 1e6) <= 2
    assert abs(row.uncertainty_ppm - unc * 1e6) <= 2


# ---------------------------------------------------------------------------
# q_stats_kruskal_wallis: textbook H on scipy-style average ranks
# ---------------------------------------------------------------------------


def _kw_literal(pairs):
    """Textbook Kruskal-Wallis with ties: average ranks via sorting,
    H = 12/(N(N+1)) sum R_g^2/n_g - 3(N+1), tie-corrected by
    1 - sum(t^3-t)/(N^3-N)."""
    vals = sorted(v for _, v in pairs)
    # average rank per distinct value (1-based)
    ranks = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        ranks[vals[i]] = (i + 1 + j) / 2  # mean of ranks i+1..j
        i = j
    n = len(pairs)
    by_g = defaultdict(list)
    for g, v in pairs:
        by_g[g].append(ranks[v])
    h = 12.0 / (n * (n + 1)) * sum(
        sum(rs) ** 2 / len(rs) for rs in by_g.values()
    ) - 3 * (n + 1)
    h = max(h, 0.0)
    tie_counts = Counter(vals)
    t = sum(c**3 - c for c in tie_counts.values())
    c = 1 - t / (n**3 - n)
    return n, len(by_g), h, h / c


def test_kruskal_wallis_matches_textbook_ranks(spark):
    cust = _rows("customer", ["c_mktsegment", "c_acctbal"])
    orders = _rows("orders", ["o_orderpriority", "o_totalprice"])

    def cents(x):
        return round(float(x) * 100)

    cases = {
        "acctbal_by_segment": [
            (r["c_mktsegment"], cents(r["c_acctbal"])) for r in cust
        ],
        "totalprice_by_priority": [
            (r["o_orderpriority"], cents(r["o_totalprice"])) for r in orders
        ],
    }
    got = {r.case_name: r for r in _run(spark, "q_stats_kruskal_wallis")}
    assert set(got) == set(cases)
    for label, pairs in cases.items():
        n, k, h, h_adj = _kw_literal(pairs)
        row = got[label]
        assert row.n_rows == n and row.n_groups == k
        # engine output is exact-floored e6; the literal float drifts by
        # ULPs on the big rank sums — allow 5 e6-units (5e-6 absolute)
        assert abs(row.h_e6 - h * 1e6) <= 5, label
        assert abs(row.h_adj_e6 - h_adj * 1e6) <= 5, label


# ---------------------------------------------------------------------------
# q_events_transition_gini: per-user sequence walk
# ---------------------------------------------------------------------------


def _event_transitions():
    ev = _rows("events", ["user_id", "ts", "event_id", "event_type"])
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    trans = Counter()
    for lst in by_user.values():
        lst.sort(key=lambda x: (x[0], x[1]))
        for (_, _, a), (_, _, b) in zip(lst, lst[1:]):
            trans[(a, b)] += 1
    return trans


def test_transition_gini_matches_sequence_walk(spark):
    trans = _event_transitions()
    out = defaultdict(Counter)
    for (a, b), c in trans.items():
        out[a][b] = c
    got = {r.prev_type: r for r in _run(spark, "q_events_transition_gini")}
    assert set(got) == set(out)
    for prev, nxt in out.items():
        n_out = sum(nxt.values())
        gini = 1 - sum(c * c for c in nxt.values()) / (n_out * n_out)
        top_share = max(nxt.values()) / n_out
        row = got[prev]
        assert row.n_out == n_out
        assert row.n_next_types == len(nxt)
        assert abs(row.gini_e6 - gini * 1e6) <= 1
        assert abs(row.top_share_e6 - top_share * 1e6) <= 1


# ---------------------------------------------------------------------------
# q_events_markov_stationary: float power iteration
# ---------------------------------------------------------------------------


def test_markov_stationary_matches_float_power_iteration(spark):
    """The engine's contract is the exact-integer 8-step iterate; a
    float x·P^8 from uniform must agree to within the documented
    floored-remainder mass loss (each of the 8 steps floors one term
    per matrix cell at e12 scale — sub-ppm)."""
    trans = _event_transitions()
    states = sorted({a for a, _ in trans})
    row_tot = Counter()
    for (a, _), c in trans.items():
        row_tot[a] += c
    x = {s: 1.0 / len(states) for s in states}
    for _ in range(8):
        nxt = defaultdict(float)
        for (a, b), c in trans.items():
            if a in x:
                nxt[b] += x[a] * c / row_tot[a]
        x = dict(nxt)
    got = {r.state: r.stationary_e6 for r in _run(spark, "q_events_markov_stationary")}
    # engine keys: every state reachable at step 8 that still holds mass
    for s, r in got.items():
        assert abs(r - x.get(s, 0.0) * 1e6) <= 2, s
    # no expected state with meaningful mass may be missing
    for s, v in x.items():
        if v * 1e6 >= 2:
            assert s in got, s


# ---------------------------------------------------------------------------
# q_events_fano_burstiness: windowed dispersion from scratch
# ---------------------------------------------------------------------------


def test_fano_burstiness_matches_literal_dispersion(spark):
    """Literal reference for the Fano factor: build each type's DAILY
    count vector over the corpus-wide day span (zero days included as
    literal zeros in the vector — the engine handles them
    algebraically), then population var/mean of that vector."""
    ev = _rows("events", ["ts", "event_type"])

    def day(t):
        return t.date() if hasattr(t, "date") else t

    all_days = [day(r["ts"]) for r in ev]
    lo, hi = min(all_days), max(all_days)
    n_days = (hi - lo).days + 1
    per_type_daily = defaultdict(Counter)
    for r in ev:
        per_type_daily[r["event_type"]][day(r["ts"])] += 1

    rows = _run(spark, "q_events_fano_burstiness")
    assert {r.event_type for r in rows} == set(per_type_daily)
    for row in rows:
        daily = per_type_daily[row.event_type]
        counts = [daily.get(lo + __import__("datetime").timedelta(days=i), 0)
                  for i in range(n_days)]
        assert row.n_days == n_days
        assert row.n_events == sum(counts)
        mean = sum(counts) / n_days
        var = sum((c - mean) ** 2 for c in counts) / n_days
        fano = var / mean
        assert abs(row.fano_e6 - fano * 1e6) <= 2, row.event_type


# ---------------------------------------------------------------------------
# q_quality_calibration_bins: direct bucket walk
# ---------------------------------------------------------------------------


def test_calibration_bins_match_literal_rates(spark):
    docs = _rows("documents", ["n_chars", "lang"])
    bins = defaultdict(lambda: [0, 0])
    for r in docs:
        b = (r["n_chars"] // 512) * 512
        bins[b][0] += 1
        bins[b][1] += 1 if (r["lang"] or "") == "en" else 0
    td = sum(v[0] for v in bins.values())
    te = sum(v[1] for v in bins.values())
    got = {r.bin_lo: r for r in _run(spark, "q_quality_calibration_bins")}
    assert set(got) == set(bins)
    for b, (nd, ne) in bins.items():
        row = got[b]
        assert (row.n_docs, row.n_en) == (nd, ne)
        assert abs(row.en_rate_ppm - ne / nd * 1e6) <= 1
        if te == 0:
            assert row.lift_e6 is None
        else:
            assert abs(row.lift_e6 - (ne / nd) / (te / td) * 1e6) <= 1, b


# ---------------------------------------------------------------------------
# q_stats_cramers_v: textbook chi-square over the dense contingency grid
# ---------------------------------------------------------------------------


def test_cramers_v_matches_textbook_chi_square(spark):
    cust = _rows("customer", ["c_mktsegment", "c_nationkey"])
    obs = Counter((r["c_mktsegment"], r["c_nationkey"]) for r in cust)
    segs = sorted({a for a, _ in obs})
    nats = sorted({b for _, b in obs})
    n = len(cust)
    row_m = Counter(r["c_mktsegment"] for r in cust)
    col_m = Counter(r["c_nationkey"] for r in cust)
    chi2 = 0.0
    for a in segs:
        for b in nats:
            e = row_m[a] * col_m[b] / n
            chi2 += (obs.get((a, b), 0) - e) ** 2 / e
    v = math.sqrt(chi2 / (n * min(len(segs) - 1, len(nats) - 1)))

    [row] = _run(spark, "q_stats_cramers_v")
    assert row.n_rows == n
    assert (row.n_segments, row.n_nations) == (len(segs), len(nats))
    # one exact floor per dense-grid cell: |segs|x|nats| units of dust
    assert abs(row.chi2_e6 - chi2 * 1e6) <= len(segs) * len(nats) + 2
    assert row.cramers_v6 == pytest.approx(v, abs=5e-5)


# ---------------------------------------------------------------------------
# q_quality_cumulative_gains: deciles re-derived from sorted order stats
# ---------------------------------------------------------------------------


def test_cumulative_gains_match_literal_decile_walk(spark):
    """Independent derivation: b_k = value at ceil(k/10*n) in 1-based
    sorted order (the percentile_disc definition, computed by literal
    indexing, not an engine aggregate); decile = 1 + #bounds strictly
    below x; capture/lift from counting."""
    docs = _rows("documents", ["n_chars", "lang"])
    xs = sorted(r["n_chars"] for r in docs)
    n = len(xs)
    bounds = [xs[math.ceil(k / 10 * n) - 1] for k in range(1, 10)]
    per = defaultdict(lambda: [0, 0])
    for r in docs:
        dec = 1 + sum(1 for b in bounds if r["n_chars"] > b)
        per[dec][0] += 1
        per[dec][1] += 1 if (r["lang"] or "") == "en" else 0
    tot_docs = sum(v[0] for v in per.values())
    tot_pos = sum(v[1] for v in per.values())

    got = {r.decile: r for r in _run(spark, "q_quality_cumulative_gains")}
    assert set(got) == set(per)
    for dec in sorted(per, reverse=True):
        nd, np_ = per[dec]
        row = got[dec]
        assert (row.n_docs, row.n_pos) == (nd, np_), dec
        cum_docs = sum(per[d][0] for d in per if d >= dec)
        cum_pos = sum(per[d][1] for d in per if d >= dec)
        assert row.cum_docs == cum_docs
        assert abs(row.capture_e6 - cum_pos / tot_pos * 1e6) <= 1
        assert abs(row.lift_e6 - (np_ / nd) / (tot_pos / tot_docs) * 1e6) <= 1


# ---------------------------------------------------------------------------
# q_orders_price_elasticity: numpy lstsq per brand
# ---------------------------------------------------------------------------


def test_price_elasticity_matches_numpy_lstsq(spark):
    import numpy as np

    li = _rows("lineitem", ["l_partkey", "l_discount", "l_quantity"])
    part = {r["p_partkey"]: r["p_brand"]
            for r in _rows("part", ["p_partkey", "p_brand"])}
    by_brand = defaultdict(list)
    for r in li:
        x = round(float(r["l_discount"]) * 100)
        y = round(float(r["l_quantity"]) * 100)
        by_brand[part[r["l_partkey"]]].append((x, y))

    got = {r.p_brand: r for r in _run(spark, "q_orders_price_elasticity")}
    assert set(got) == set(by_brand)
    for brand, pts in by_brand.items():
        row = got[brand]
        assert row.n_lines == len(pts)
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        if np.all(x == x[0]):
            assert row.slope is None and row.intercept is None
            continue
        A = np.vstack([x, np.ones_like(x)]).T
        (slope, intercept), res, *_ = np.linalg.lstsq(A, y, rcond=None)
        r_mat = np.corrcoef(x, y)
        r2 = float(r_mat[0, 1] ** 2)
        assert row.slope == pytest.approx(slope, rel=1e-6, abs=1e-9), brand
        assert row.intercept == pytest.approx(intercept, rel=1e-6, abs=1e-9)
        assert row.r2 == pytest.approx(r2, rel=1e-6, abs=1e-12), brand
