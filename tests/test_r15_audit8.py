"""Round-15 twin-formula audit — batch 8 (r18-window pre-insurance,
r12-vintage closed forms).

Literal raw-parquet walks: the sweep-line peak-concurrency (carry-in
plateau included), new-vs-returning revenue split, business-day
latency histogram (Monday-epoch closed form), the TTR-by-length curve,
event-type affinity (Jaccard + lift), and the k-anonymity report.
"""

from __future__ import annotations

import datetime
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"

_EPOCH = datetime.datetime(1970, 1, 1)


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


def _word_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ---------------------------------------------------------------------------
# q_events_peak_concurrency — the sweep line replayed by hand
# ---------------------------------------------------------------------------


def test_peak_concurrency_matches_literal_sweep(spark):
    hold = datetime.timedelta(seconds=300)
    deltas = defaultdict(list)  # day -> [(k, delta)]
    for r in _rows("events", ["ts"]):
        ts = r["ts"]
        end = ts + hold
        us_s = (ts - _EPOCH) // datetime.timedelta(microseconds=1)
        us_e = (end - _EPOCH) // datetime.timedelta(microseconds=1)
        deltas[ts.date()].append((2 * us_s + 1, 1))
        deltas[end.date()].append((2 * us_e, -1))
    days = sorted(deltas)
    carry = 0
    expected = {}
    for day in days:
        evs = deltas[day]
        n_starts = sum(1 for _, d in evs if d == 1)
        # RANGE frame: peers (same k) accumulate together
        by_k: Counter = Counter()
        for k, d in evs:
            by_k[k] += d
        run = 0
        peak = carry  # the carried midnight plateau is attained
        for k in sorted(by_k):
            run += by_k[k]
            peak = max(peak, carry + run)
        expected[day] = (n_starts, carry, peak)
        carry += sum(d for _, d in evs)
    got = {
        r.day: (r.n_starts, r.carry_in, r.peak_concurrency)
        for r in _run(spark, "q_events_peak_concurrency")
    }
    assert got == expected
    assert any(c > 0 for _, c, _ in expected.values())  # carry-in exercised


# ---------------------------------------------------------------------------
# q_orders_new_vs_returning — first-order split by hand
# ---------------------------------------------------------------------------


def test_new_vs_returning_matches_literal_walk(spark):
    orders = _rows(
        "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    per_cust = defaultdict(list)
    for r in orders:
        per_cust[r["o_custkey"]].append(r)
    monthly = defaultdict(lambda: [0, 0, 0, 0])  # nn, nr, cents_new, cents_rep
    for rs in per_cust.values():
        rs.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        for rn, r in enumerate(rs, 1):
            d = r["o_orderdate"]
            ym = d.year * 100 + d.month
            cell = monthly[ym]
            c = _cents(r["o_totalprice"])
            if rn == 1:
                cell[0] += 1
                cell[2] += c
            else:
                cell[1] += 1
                cell[3] += c
    expected = {}
    for ym, (nn, nr, cn, cr) in monthly.items():
        share = cn * 1_000_000 // (cn + cr) if cn + cr else None
        expected[ym] = (nn, nr, cn / 100.0, cr / 100.0, share)
    got = {
        r.ym: (
            r.n_new_orders,
            r.n_repeat_orders,
            r.new_revenue,
            r.repeat_revenue,
            r.new_share_e6,
        )
        for r in _run(spark, "q_orders_new_vs_returning")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_date_business_days — Monday-epoch weekday closed form by hand
# ---------------------------------------------------------------------------


def test_business_days_matches_literal_calendar_walk(spark):
    """The closed form W(d) is re-derived here by LITERALLY iterating
    the calendar (count non-weekend days), not by re-evaluating the
    formula — the genuinely independent route."""
    monday = datetime.date(1969, 12, 29)

    wcache: dict[int, int] = {}

    def w_of(d: datetime.date) -> int:
        m = (d - monday).days
        if m not in wcache:
            # literal: business days among epoch..d inclusive (m+1 days),
            # counted day-by-day via weekday()
            full_weeks, rem = divmod(m, 7)
            lit = full_weeks * 5 + sum(
                1
                for i in range(rem + 1)
                if (monday + datetime.timedelta(days=full_weeks * 7 + i)).weekday() < 5
            )
            # the query's closed form
            formula = 5 * (m // 7) + min(m % 7 + 1, 5)
            assert lit == formula, (d, lit, formula)
            wcache[m] = formula
        return wcache[m]

    close = {}
    orders = {
        r["o_orderkey"]: (r["o_orderpriority"], r["o_orderdate"].date())
        for r in _rows("orders", ["o_orderkey", "o_orderpriority", "o_orderdate"])
    }
    hist: Counter = Counter()
    for r in _rows("lineitem", ["l_orderkey", "l_shipdate"]):
        prio, odate = orders[r["l_orderkey"]]
        bus = w_of(r["l_shipdate"].date()) - w_of(odate)
        hist[(prio, bus)] += 1
    got = {
        (r.o_orderpriority, r.busdays): r.n_lineitems
        for r in _run(spark, "q_date_business_days")
    }
    assert got == dict(hist)


# ---------------------------------------------------------------------------
# q_text_ttr_by_length — Herdan curve buckets by hand
# ---------------------------------------------------------------------------


def test_ttr_by_length_matches_literal_walk(spark):
    buckets = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in _rows("documents", ["text"]):
        cnts = Counter(_word_tokens(r["text"]))
        if not cnts:
            continue
        n_tok = sum(cnts.values())
        n_types = len(cnts)
        n_hapax = sum(1 for c in cnts.values() if c == 1)
        b = buckets[n_tok.bit_length() - 1]
        b[0] += 1
        b[1] += n_tok
        b[2] += n_types
        b[3] += n_hapax
        b[4] += n_types * 1_000_000 // n_tok
    expected = {
        lb: (
            n_docs,
            n_tok,
            types * 1_000_000 // n_tok,
            ttr_sum // n_docs,
            hapax * 1_000_000 // types,
        )
        for lb, (n_docs, n_tok, types, hapax, ttr_sum) in buckets.items()
    }
    got = {
        r.len_log2: (
            r.n_docs,
            r.n_tokens,
            r.pooled_ttr_ppm,
            r.mean_ttr_ppm,
            r.hapax_rate_ppm,
        )
        for r in _run(spark, "q_text_ttr_by_length")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_type_affinity — user-set Jaccard + lift by hand
# ---------------------------------------------------------------------------


def test_type_affinity_matches_literal_walk(spark):
    users_of: dict[str, set] = defaultdict(set)
    for r in _rows("events", ["user_id", "event_type"]):
        users_of[r["event_type"]].add(r["user_id"])
    all_users = set().union(*users_of.values())
    u = len(all_users)
    types = sorted(users_of)
    expected = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            both = len(users_of[ta] & users_of[tb])
            if both == 0:
                continue
            na, nb = len(users_of[ta]), len(users_of[tb])
            expected[(ta, tb)] = (
                both,
                na,
                nb,
                both * 1_000_000 // (na + nb - both),
                both * u * 1_000_000 // (na * nb),
            )
    got = {
        (r.type_a, r.type_b): (r.n_both, r.n_a, r.n_b, r.jaccard_ppm, r.lift_e6)
        for r in _run(spark, "q_events_type_affinity")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_privacy_k_anonymity — equivalence classes by hand
# ---------------------------------------------------------------------------


def test_k_anonymity_matches_literal_walk(spark):
    cls = defaultdict(lambda: [0, set()])
    for r in _rows("customer", ["c_mktsegment", "c_nationkey", "c_acctbal"]):
        cell = cls[(r["c_mktsegment"], r["c_nationkey"])]
        cell[0] += 1
        cell[1].add(float(r["c_acctbal"]) < 0)
    rep = defaultdict(lambda: [0, 0, None, 0, None])
    for s, sens in cls.values():
        b = rep[s.bit_length() - 1]
        b[0] += 1
        b[1] += s
        b[2] = s if b[2] is None or s < b[2] else b[2]
        b[3] += s if s < 5 else 0
        ld = len(sens)
        b[4] = ld if b[4] is None or ld < b[4] else b[4]
    total_rows = sum(b[1] for b in rep.values())
    expected = {
        lb: (
            n_cls,
            n_rows,
            n_rows * 1_000_000 // total_rows,
            mn,
            at_risk,
            ldiv,
        )
        for lb, (n_cls, n_rows, mn, at_risk, ldiv) in rep.items()
    }
    got = {
        r.size_log2: (
            r.n_classes,
            r.n_rows,
            r.rows_ppm,
            r.min_size,
            r.n_rows_at_risk,
            r.min_l_div,
        )
        for r in _run(spark, "q_privacy_k_anonymity")
    }
    assert got == expected
