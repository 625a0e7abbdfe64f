"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 5: the drift
battery.

The three drift reports front the r14 graded window (stalest r8
verdicts), and each hides a rational-identity substitution (TVD, the
chi-square homogeneity identity, the integer-numerator KS statistic)
that both engines share — exactly the twin-formula defect class. Each
test re-derives the statistic from the textbook definition with
per-row Python over raw sf0.001 parquet.
"""

from __future__ import annotations

import math
from collections import Counter

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


def _orders():
    return _rows(
        "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )


# ---------------------------------------------------------------------------
# q_drift_tvd_report — textbook ½·Σ|p_A − p_B| vs the rational identity
# ---------------------------------------------------------------------------


def test_drift_tvd_matches_textbook_half_l1(spark):
    a, b = Counter(), Counter()
    for r in _orders():
        binno = min(int(math.floor(float(r["o_totalprice"]) / 50000)), 9)
        (a if r["o_orderkey"] % 2 == 0 else b)[binno] += 1
    n_a, n_b = sum(a.values()), sum(b.values())
    bins = sorted(set(a) | set(b))
    # textbook float TVD, independent of the engines' integer identity
    tvd_float = 0.5 * sum(
        abs(a[x] / n_a - b[x] / n_b) for x in bins
    )
    # the engines' exact rational, floored to e6
    num = sum(abs(a[x] * n_b - b[x] * n_a) for x in bins)
    tvd_e6 = num * 1_000_000 // (2 * n_a * n_b)
    assert abs(tvd_e6 / 1e6 - tvd_float) <= 2e-6  # floor dust only
    got = {r.bin: (r.cnt_a, r.cnt_b, r.tvd_e6) for r in _run(spark, "q_drift_tvd_report")}
    assert got == {x: (a[x], b[x], tvd_e6) for x in bins}


# ---------------------------------------------------------------------------
# q_drift_chisq_report — textbook (obs−exp)²/exp vs the homogeneity identity
# ---------------------------------------------------------------------------


def test_drift_chisq_matches_textbook_expected_counts(spark):
    a, b = Counter(), Counter()
    for r in _orders():
        (a if r["o_orderkey"] % 2 == 0 else b)[r["o_orderpriority"]] += 1
    n_a, n_b = sum(a.values()), sum(b.values())
    n = n_a + n_b
    expected = {}
    total_e6 = 0
    for x in sorted(set(a) | set(b)):
        row = a[x] + b[x]
        # textbook homogeneity chi-square contribution (float)
        e_a, e_b = row * n_a / n, row * n_b / n
        lit = (a[x] - e_a) ** 2 / e_a + (b[x] - e_b) ** 2 / e_b
        # engines' rational identity... scaled by n/(nA+nB): the
        # identity (cA·nB − cB·nA)²/((cA+cB)·nA·nB) equals the
        # textbook contribution TIMES (nA+nB)/n == exactly 1
        d = a[x] * n_b - b[x] * n_a
        e6 = d * d * 1_000_000 // (row * n_a * n_b)
        assert abs(e6 / 1e6 - lit) <= 2e-6
        total_e6 += e6
        expected[x] = (a[x], b[x], e6)
    got = {
        r.bin: (r.cnt_a, r.cnt_b, r.chisq_e6)
        for r in _run(spark, "q_drift_chisq_report")
    }
    assert got == expected
    totals = {
        r.chisq_total_e6 for r in _run(spark, "q_drift_chisq_report")
    }
    assert totals == {total_e6}


# ---------------------------------------------------------------------------
# q_drift_ks_report — textbook sup|F_A − F_B| by literal ECDF walk
# ---------------------------------------------------------------------------


def test_drift_ks_matches_literal_ecdf_walk(spark):
    a, b = Counter(), Counter()
    for r in _orders():
        c = _cents(r["o_totalprice"])
        (a if r["o_orderkey"] % 2 == 0 else b)[c] += 1
    n_a, n_b = sum(a.values()), sum(b.values())
    best = None  # (d_num, cents) with smallest-cents tie-break
    c_a = c_b = 0
    for c in sorted(set(a) | set(b)):
        c_a += a[c]
        c_b += b[c]
        d_num = abs(c_a * n_b - c_b * n_a)
        if best is None or d_num > best[0]:
            best = (d_num, c)
    # cross-check against the float textbook statistic at the argmax
    d_float = best[0] / (n_a * n_b)
    c_a = c_b = 0
    sup = 0.0
    for c in sorted(set(a) | set(b)):
        c_a += a[c]
        c_b += b[c]
        sup = max(sup, abs(c_a / n_a - c_b / n_b))
    assert abs(d_float - sup) <= 1e-12
    [row] = _run(spark, "q_drift_ks_report")
    assert (
        row.at_value_cents,
        row.d_num,
        row.d_e6,
        row.n_a,
        row.n_b,
    ) == (
        best[1],
        best[0],
        best[0] * 1_000_000 // (n_a * n_b),
        n_a,
        n_b,
    )
