"""Round-15 twin-formula audit — batch 2 (VERDICT r14 #5 continuation).

Literal raw-parquet walks for the r16-window candidates whose only
prior coverage was staged "laws" tests: domain-cap application, the
ordered funnel (RANGE-frame tie semantics included), the month-end
open-backlog interval walk, Flesch reading ease, per-source hapax
ratios, and successor diversity. Same discipline as batch 1: per-row
Python loops over the raw parquet, no shared code with the engine,
exact comparison of every output cell.
"""

from __future__ import annotations

import calendar
import datetime
import hashlib
import re
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


def _day(x) -> datetime.date:
    return x.date() if hasattr(x, "date") else x


def _last_day(d: datetime.date) -> datetime.date:
    return d.replace(day=calendar.monthrange(d.year, d.month)[1])


_WORDS = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return [t for t in _WORDS.split(text.lower()) if t]


# ---------------------------------------------------------------------------
# q_curation_domain_cap_apply — staged URL + host + md5 rank by hand
# ---------------------------------------------------------------------------


def test_domain_cap_apply_matches_literal_walk(spark):
    """The staged URL is rebuilt from the doc_id formulas, the host
    extracted with Python's own regex engine (scheme strip, authority
    capture, lowercase, www strip), the per-host md5 rank ordered by
    (hex digest asc, doc_id asc), and the cap-3 report aggregated by
    hand. A closed-form cross-check (host == site{doc_id%50}
    .example.com) guards the staging itself."""
    docs = _rows("documents", ["doc_id", "n_chars"])
    hosted = []
    for r in docs:
        i = r["doc_id"]
        url = (
            ("https://" if i % 3 in (0, 2) else "HTTP://")
            + ("WWW." if i % 2 == 0 else "")
            + f"Site{i % 50}.Example.COM/docs/{i % 200}"
            + ("/" if i % 4 == 0 else "")
            + (
                f"?b=1&id={i % 200}"
                if i % 3 == 0
                else f"?id={i % 200}&b=1"
                if i % 3 == 1
                else f"?id={i % 200}&utm_src=9&b=1"
            )
            + ("#sec-2" if i % 7 == 0 else "")
        )
        no_scheme = re.sub(r"^[A-Za-z]+://", "", url)
        m = re.match(r"^([^/?#]+)", no_scheme)
        host = re.sub(r"^www\.", "", m.group(1).lower())
        assert host == f"site{i % 50}.example.com"
        hosted.append((host, i, r["n_chars"]))

    by_host = defaultdict(list)
    for host, i, n_chars in hosted:
        by_host[host].append((hashlib.md5(str(i).encode()).hexdigest(), i, n_chars))
    expected = {}
    for host, entries in by_host.items():
        entries.sort()
        kept = entries[:3]
        expected[host] = (
            len(entries),
            len(kept),
            len(entries) - len(kept),
            sum(n for _, _, n in kept),
        )
    got = {
        r.host: (r.n_docs, r.n_kept, r.n_dropped, r.kept_chars)
        for r in _run(spark, "q_curation_domain_cap_apply")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_funnel_conversion — per-event RANGE-frame windows by hand
# ---------------------------------------------------------------------------


def test_funnel_conversion_matches_literal_window_walk(spark):
    """The three running-min windows are replayed per event with the
    literal RANGE-frame rule (every event at ts <= this event's ts is
    in frame, peers included): sv at any event is the min view ts at
    or before it; qc the min ts of a click whose OWN sv is set; qp the
    min ts of a purchase whose OWN qc is set. Per-user minima then
    give the step counts and the floored micro-unit conversions."""
    ev = _rows("events", ["user_id", "ts", "event_type"])
    per_user = defaultdict(list)
    for r in ev:
        if r["event_type"] in ("view", "click", "purchase"):
            per_user[r["user_id"]].append((r["ts"], r["event_type"]))
    n1 = n2 = n3 = 0
    for evs in per_user.values():
        def sv(t):
            hits = [ts for ts, ty in evs if ty == "view" and ts <= t]
            return min(hits) if hits else None

        def qc(t):
            hits = [
                ts
                for ts, ty in evs
                if ty == "click" and ts <= t and sv(ts) is not None
            ]
            return min(hits) if hits else None

        def qp(t):
            hits = [
                ts
                for ts, ty in evs
                if ty == "purchase" and ts <= t and qc(ts) is not None
            ]
            return min(hits) if hits else None

        tmax = max(ts for ts, _ in evs)
        t1, t2, t3 = sv(tmax), qc(tmax), qp(tmax)
        n1 += t1 is not None
        n2 += t2 is not None
        n3 += t3 is not None

    def conv(num, den):
        return num * 1_000_000 // den if den else None

    expected = {
        1: ("view", n1, None, None),
        2: ("click", n2, conv(n2, n1), conv(n2, n1)),
        3: ("purchase", n3, conv(n3, n2), conv(n3, n1)),
    }
    got = {
        r.step: (r.step_name, r.n_users, r.conv_from_prev_e6, r.conv_from_first_e6)
        for r in _run(spark, "q_events_funnel_conversion")
    }
    assert got == expected
    assert n1 >= n2 >= n3 > 0  # non-vacuous monotone funnel


# ---------------------------------------------------------------------------
# q_orders_open_backlog — direct interval membership per boundary
# ---------------------------------------------------------------------------


def test_open_backlog_matches_literal_interval_walk(spark):
    """The query computes the backlog as a prefix sum of month-delta
    events; this twin uses the DIRECT definition instead — for every
    month-end boundary, count the orders with placed <= B < close and
    sum their prices in exact cents — so a sweep-line bookkeeping bug
    (off-by-one at either boundary, cancellation error) cannot hide."""
    li = _rows("lineitem", ["l_orderkey", "l_shipdate"])
    close: dict[int, datetime.date] = {}
    for r in li:
        d = _day(r["l_shipdate"])
        k = r["l_orderkey"]
        if k not in close or d > close[k]:
            close[k] = d
    orders = _rows("orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
    boundaries = {_last_day(_day(r["o_orderdate"])) for r in orders}
    expected = {}
    for b in boundaries:
        n = 0
        cents = 0
        for r in orders:
            c = close.get(r["o_orderkey"])
            if c is not None and _day(r["o_orderdate"]) <= b < c:
                n += 1
                cents += _cents(r["o_totalprice"])
        if n:
            expected[b] = (n, cents / 100.0)
    got = {
        _day(r.as_of): (r.n_open, r.value_open)
        for r in _run(spark, "q_orders_open_backlog")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_readability_flesch — regex counts + integer formula by hand
# ---------------------------------------------------------------------------


def test_readability_flesch_matches_literal_walk(spark):
    word_re = re.compile(r"[a-z0-9]+")
    sent_re = re.compile(r"[.!?]+")
    syl_re = re.compile(r"[aeiouy]+")
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        low = r["text"].lower()
        w = len(word_re.findall(low))
        s = max(len(sent_re.findall(r["text"])), 1)
        y = len(syl_re.findall(low))
        if w == 0:
            flesch, band = None, "empty"
        else:
            flesch = 206835 - (1015 * w // s) - (84600 * y // w)
            band = (
                "easy"
                if flesch >= 60000
                else "medium"
                if flesch >= 30000
                else "hard"
            )
        expected[r["doc_id"]] = (w, s, y, flesch, band)
    got = {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.flesch_e3, r.band)
        for r in _run(spark, "q_text_readability_flesch")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_hapax_ratio — per-source type/token accounting by hand
# ---------------------------------------------------------------------------


def test_hapax_ratio_matches_literal_walk(spark):
    wc: dict[str, Counter] = defaultdict(Counter)
    for r in _rows("documents", ["source", "text"]):
        wc[r["source"]].update(_tokens(r["text"]))
    expected = {}
    for source, cnts in wc.items():
        n_tokens = sum(cnts.values())
        n_types = len(cnts)
        n_hapax = sum(1 for c in cnts.values() if c == 1)
        expected[source] = (
            n_tokens,
            n_types,
            n_hapax,
            n_types * 1_000_000 // n_tokens,
            n_hapax * 1_000_000 // n_types,
        )
    got = {
        r.source: (r.n_tokens, r.n_types, r.n_hapax, r.ttr_e6, r.hapax_share_e6)
        for r in _run(spark, "q_text_hapax_ratio")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_successor_diversity — bigram branching factor by hand
# ---------------------------------------------------------------------------


def test_successor_diversity_matches_literal_walk(spark):
    pair: Counter = Counter()
    for r in _rows("documents", ["text"]):
        toks = _tokens(r["text"])
        for a, b in zip(toks, toks[1:]):
            pair[(a, b)] += 1
    heads: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for (a, _), c in pair.items():
        heads[a][0] += c
        heads[a][1] += 1
    ranked = sorted(
        (
            (tok, tot, succ, succ * 1_000_000 // tot)
            for tok, (tot, succ) in heads.items()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:50]
    expected = [(t, n, s, b) for t, n, s, b in ranked]
    got = [
        (r.token, r.n_total, r.n_successors, r.branching_e6)
        for r in _run(spark, "q_text_successor_diversity")
    ]
    # the query orders by (n_total desc, token asc) — compare as lists
    assert got == expected
