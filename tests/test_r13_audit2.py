"""Round-13 twin-formula audit, batch 2 (VERDICT r12 #7 continued).

Literal first-principles references for eight more closed-form stats /
text queries spanning r10-r12 — same discipline as test_r13_audit.py:
plain Python over raw parquet, float math, no shared machinery, engine
output matched within documented floor dust.
"""

from __future__ import annotations

import math
import re
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


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ---------------------------------------------------------------------------
# q_stats_welch_ttest
# ---------------------------------------------------------------------------


def test_welch_ttest_matches_textbook(spark):
    orders = _rows("orders", ["o_orderkey", "o_totalprice"])
    a = [_cents(r["o_totalprice"]) for r in orders if r["o_orderkey"] % 2 == 0]
    b = [_cents(r["o_totalprice"]) for r in orders if r["o_orderkey"] % 2 != 0]

    def mean_var(xs):
        m = sum(xs) / len(xs)
        v = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)  # sample var
        return m, v

    ma, va = mean_var(a)
    mb, vb = mean_var(b)
    t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))

    [row] = _run(spark, "q_stats_welch_ttest")
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert row.t6 == pytest.approx(t, abs=5e-6)
    assert row.mean_diff_dollars == pytest.approx((ma - mb) / 100, abs=0.011)


# ---------------------------------------------------------------------------
# q_stats_eta_squared
# ---------------------------------------------------------------------------


def test_eta_squared_matches_textbook_anova(spark):
    cases = {
        "acctbal_by_segment": [
            (r["c_mktsegment"], _cents(r["c_acctbal"]))
            for r in _rows("customer", ["c_mktsegment", "c_acctbal"])
        ],
        "totalprice_by_priority": [
            (r["o_orderpriority"], _cents(r["o_totalprice"]))
            for r in _rows("orders", ["o_orderpriority", "o_totalprice"])
        ],
    }
    got = {r.case_name: r for r in _run(spark, "q_stats_eta_squared")}
    assert set(got) == set(cases)
    for label, pairs in cases.items():
        by_g = defaultdict(list)
        for g, v in pairs:
            by_g[g].append(v)
        n = len(pairs)
        m = sum(v for _, v in pairs) / n
        ssb = sum(len(xs) * (sum(xs) / len(xs) - m) ** 2 for xs in by_g.values())
        sst = sum((v - m) ** 2 for _, v in pairs)
        row = got[label]
        assert (row.n_rows, row.n_groups) == (n, len(by_g))
        assert abs(row.eta2_e6 - ssb / sst * 1e6) <= len(by_g) + 2, label


# ---------------------------------------------------------------------------
# q_stats_brown_forsythe
# ---------------------------------------------------------------------------


def test_brown_forsythe_matches_textbook_levene_on_medians(spark):
    cases = {
        "acctbal_by_segment": [
            (r["c_mktsegment"], _cents(r["c_acctbal"]))
            for r in _rows("customer", ["c_mktsegment", "c_acctbal"])
        ],
        "totalprice_by_priority": [
            (r["o_orderpriority"], _cents(r["o_totalprice"]))
            for r in _rows("orders", ["o_orderpriority", "o_totalprice"])
        ],
    }
    got = {r.case_name: r for r in _run(spark, "q_stats_brown_forsythe")}
    assert set(got) == set(cases)
    for label, pairs in cases.items():
        by_g = defaultdict(list)
        for g, v in pairs:
            by_g[g].append(v)
        # z = |x - group median|, median = mean of the two middle order
        # statistics (ranks ceil(n/2) and floor(n/2)+1, 1-based)
        zs, groups = [], []
        for g, xs in by_g.items():
            s = sorted(xs)
            n = len(s)
            med = (s[math.ceil(n / 2) - 1] + s[n // 2]) / 2
            for x in xs:
                zs.append(abs(x - med))
                groups.append(g)
        n = len(zs)
        k = len(by_g)
        zm = sum(zs) / n
        zg = defaultdict(list)
        for g, z in zip(groups, zs):
            zg[g].append(z)
        ssb = sum(len(v) * (sum(v) / len(v) - zm) ** 2 for v in zg.values())
        ssw = sum(
            (z - sum(v) / len(v)) ** 2
            for v in zg.values()
            for z in v
        )
        f = (n - k) / (k - 1) * ssb / ssw
        row = got[label]
        assert (row.n_rows, row.n_groups) == (n, k)
        assert abs(row.f_e6 - f * 1e6) <= 20, (label, row.f_e6, f * 1e6)


# ---------------------------------------------------------------------------
# q_text_heaps_fit
# ---------------------------------------------------------------------------


def test_heaps_fit_matches_literal_growth_curve(spark):
    docs = _rows("documents", ["doc_id", "text"])

    def flog2(n):
        return n.bit_length() - 1

    doc_toks = {r["doc_id"]: _tokens(r["text"]) for r in docs}
    bucket_toks = Counter()
    for d, ts in doc_toks.items():
        bucket_toks[flog2(d + 1)] += len(ts)
    first_seen = {}
    for d in sorted(doc_toks):
        for w in doc_toks[d]:
            first_seen.setdefault(w, d)
    bucket_vocab = Counter(flog2(d + 1) for d in first_seen.values())

    pts = []
    ct = cv = 0
    for bk in sorted(bucket_toks):
        ct += bucket_toks[bk]
        cv += bucket_vocab.get(bk, 0)
        if ct >= 1 and cv >= 1:
            pts.append((flog2(ct), flog2(cv)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # the synthetic corpus saturates its vocabulary in the first bucket
    # (flog2(cum_vocab) constant) — the degenerate-fit branch is itself
    # part of the contract: r2 must be NULL, beta 0
    r2_den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r2 = (n * sxy - sx * sy) ** 2 / r2_den if r2_den else None

    [row] = _run(spark, "q_text_heaps_fit")
    assert row.n_points == n
    assert row.beta6 == pytest.approx(beta, abs=2e-6)
    if r2 is None:
        assert row.r2_6 is None
    else:
        assert row.r2_6 == pytest.approx(r2, abs=2e-6)


# ---------------------------------------------------------------------------
# q_quality_auc_by_source
# ---------------------------------------------------------------------------


def test_auc_by_source_matches_rank_sum(spark):
    docs = _rows("documents", ["source", "n_chars", "lang"])
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append(
            (r["n_chars"], 1 if (r["lang"] or "") == "en" else 0)
        )
    got = {r.source: r for r in _run(spark, "q_quality_auc_by_source")}
    assert set(got) == set(by_src)
    for src, xs in by_src.items():
        vals = sorted(s for s, _ in xs)
        # average rank per distinct score
        rank = {}
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j] == vals[i]:
                j += 1
            rank[vals[i]] = (i + 1 + j) / 2
            i = j
        n1 = sum(y for _, y in xs)
        n0 = len(xs) - n1
        row = got[src]
        assert (row.n_pos, row.n_neg) == (n1, n0)
        if n1 == 0 or n0 == 0:
            assert row.auc_e6 is None
            continue
        u = sum(rank[s] for s, y in xs if y) - n1 * (n1 + 1) / 2
        auc = u / (n1 * n0)
        assert abs(row.auc_e6 - auc * 1e6) <= 1, src


# ---------------------------------------------------------------------------
# q_stats_kendall_tau
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_pair_count(spark):
    orders = _rows("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    cust = {r["c_custkey"]: r["c_nationkey"]
            for r in _rows("customer", ["c_custkey", "c_nationkey"])}
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _rows("nation", ["n_nationkey", "n_name"])}
    rev = defaultdict(lambda: [0, 0])
    for r in orders:
        d = r["o_orderdate"]
        y = d.year
        if y not in (1995, 1996):
            continue
        nk = cust[r["o_custkey"]]
        rev[nk][0 if y == 1995 else 1] += _cents(r["o_totalprice"])
    named = [(nation[nk], c95, c96) for nk, (c95, c96) in rev.items()]
    r95 = {nm: i + 1 for i, (nm, _, _) in enumerate(
        sorted(named, key=lambda t: (-t[1], t[0])))}
    r96 = {nm: i + 1 for i, (nm, _, _) in enumerate(
        sorted(named, key=lambda t: (-t[2], t[0])))}
    names = sorted(nm for nm, _, _ in named)
    conc = disc = 0
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            if (r95[a] - r95[b]) * (r96[a] - r96[b]) > 0:
                conc += 1
            else:
                disc += 1
    [row] = _run(spark, "q_stats_kendall_tau")
    assert row.n_entities == len(names)
    assert (row.concordant, row.discordant) == (conc, disc)
    assert row.tau == pytest.approx(
        (conc - disc) / (conc + disc), abs=1e-12
    )


# ---------------------------------------------------------------------------
# q_stats_mann_whitney
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_all_pairs(spark):
    orders = _rows("orders", ["o_orderpriority", "o_totalprice"])
    a = [_cents(r["o_totalprice"]) for r in orders
         if r["o_orderpriority"] in ("1-URGENT", "2-HIGH")]
    b = [_cents(r["o_totalprice"]) for r in orders
         if r["o_orderpriority"] not in ("1-URGENT", "2-HIGH")]
    # literal U_A: every (a, b) pair scored 1 / 0.5 / 0
    bc = Counter(b)
    u2 = 0  # 2*U_A stays integer
    for x in a:
        for v, c in bc.items():
            if x > v:
                u2 += 2 * c
            elif x == v:
                u2 += c
    [row] = _run(spark, "q_stats_mann_whitney")
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert row.u2_a == u2
    assert row.u2_b == 2 * len(a) * len(b) - u2
    assert abs(row.auc_a_e6 - u2 / (2 * len(a) * len(b)) * 1e6) <= 1


# ---------------------------------------------------------------------------
# q_stats_benford_first_digit
# ---------------------------------------------------------------------------


def test_benford_matches_literal_digit_walk(spark):
    orders = _rows("orders", ["o_totalprice"])
    digits = Counter(
        int(str(_cents(r["o_totalprice"]))[0])
        for r in orders
        if float(r["o_totalprice"]) > 0
    )
    total = sum(digits.values())
    got = {r.digit: r for r in _run(spark, "q_stats_benford_first_digit")}
    assert set(got) == set(digits)
    for d, n in digits.items():
        row = got[d]
        assert row.n_orders == n
        assert abs(row.share_e6 - n / total * 1e6) <= 1
        expected = math.floor(1e6 * math.log10(1 + 1 / d) + 1e-9)
        assert row.expected_e6 == expected, d
        assert row.excess_e6 == row.share_e6 - expected
