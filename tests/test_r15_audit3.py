"""Round-15 twin-formula audit — batch 3 (VERDICT r14 #5 continuation).

Literal raw-parquet walks for more r16-window candidates: the exact
quantized covariance cells, containment dedup, last-touch attribution,
the full-outer reconciliation, order-statistic value deciles, path
trigrams, and per-source total-variation divergence.
"""

from __future__ import annotations

import datetime
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

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


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ---------------------------------------------------------------------------
# q_embedding_covariance_exact — integer Gram cells by per-vector loop
# ---------------------------------------------------------------------------


def test_covariance_exact_matches_literal_gram_walk(spark):
    """Every upper-triangle cell re-accumulated with plain Python int
    arithmetic per vector (no numpy, no matmul — the third
    implementation beside Spark's Arrow-batched partial Gram and the
    oracle's position self-join); cov12 re-rounded through
    Decimal(repr(x)) HALF_UP — the shortest-decimal-repr + half-up
    semantics both engines' round(double, 2) implement."""
    emb = _rows("embeddings", ["embedding"])
    qs = [
        [math.floor(float(v) * 1_000_000) for v in r["embedding"]]
        for r in emb
    ]
    d = len(qs[0])
    n = len(qs)
    sij: dict[tuple[int, int], int] = defaultdict(int)
    si = [0] * d
    for q in qs:
        for i in range(d):
            si[i] += q[i]
            qi = q[i]
            for j in range(i, d):
                sij[(i, j)] += qi * q[j]
    expected = {}
    for (i, j), s in sij.items():
        raw = (n * float(s) - float(si[i]) * float(si[j])) / n / n
        cov12 = float(
            Decimal(repr(raw)).quantize(Decimal("0.01"), ROUND_HALF_UP)
        )
        expected[(i, j)] = (n, str(s), str(si[i]), str(si[j]), cov12)
    got = {
        (r.i, r.j): (r.n_vecs, r.sij, r.si, r.sj, r.cov12)
        for r in _run(spark, "q_embedding_covariance_exact")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_dedup_containment_subset — staged shingle-set containment by hand
# ---------------------------------------------------------------------------


def test_containment_subset_matches_literal_set_walk(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in _rows("documents", ["doc_id", "text"])
        if r["doc_id"] < 40
    }
    base = dict(docs)
    for did, text in docs.items():
        if did % 4 == 0:
            base[did + 20000] = " ".join(
                [t for t in re.split(r"\s+", text.lower()) if t][:10]
            )
    shingled = {}
    for did, text in base.items():
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        sh = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        if sh:
            shingled[did] = sh
    expected = {}
    for a, sa in shingled.items():
        for b, sb in shingled.items():
            if a == b:
                continue
            common = len(sa & sb)
            cont = common * 1_000_000 // len(sa)
            if cont >= 800_000:
                expected[(a, b)] = (common, len(sa), cont)
    got = {
        (r.src_doc, r.dst_doc): (r.n_common, r.n_src_shingles, r.containment_e6)
        for r in _run(spark, "q_dedup_containment_subset")
    }
    assert got == expected
    assert any(src >= 20000 for src, _ in expected)  # staged subsets fired


# ---------------------------------------------------------------------------
# q_events_attribution_last_touch — the running last-touch by hand
# ---------------------------------------------------------------------------


def test_attribution_last_touch_matches_literal_walk(spark):
    ev = _rows("events", ["event_id", "user_id", "ts", "event_type", "value"])
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append(r)
    credit: Counter = Counter()
    value_e6: Counter = Counter()
    for evs in per_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        last_touch = None
        for r in evs:
            if r["event_type"] != "purchase":
                last_touch = r["event_type"]
            else:
                t = last_touch if last_touch is not None else "unattributed"
                credit[t] += 1
                value_e6[t] += math.floor(float(r["value"]) * 1_000_000)
    expected = {t: (n, value_e6[t]) for t, n in credit.items()}
    got = {
        r.touch_type: (r.n_purchases, r.value_e6)
        for r in _run(spark, "q_events_attribution_last_touch")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_join_full_outer_reconcile — snapshot diff classes by dict walk
# ---------------------------------------------------------------------------


def test_full_outer_reconcile_matches_literal_walk(spark):
    orders = _rows("orders", ["o_orderkey", "o_totalprice"])
    a = {
        r["o_orderkey"]: _cents(r["o_totalprice"])
        for r in orders
        if r["o_orderkey"] % 3 != 0
    }
    b = {
        r["o_orderkey"]: _cents(r["o_totalprice"])
        + (100 if r["o_orderkey"] % 7 == 0 else 0)
        for r in orders
        if r["o_orderkey"] % 5 != 0
    }
    agg = defaultdict(lambda: [0, 0])
    for k in set(a) | set(b):
        av, bv = a.get(k), b.get(k)
        if av is None:
            status = "right_only"
        elif bv is None:
            status = "left_only"
        elif av == bv:
            status = "matched"
        else:
            status = "changed"
        cell = agg[status]
        cell[0] += 1
        cell[1] += (bv or 0) - (av or 0)
    expected = {s: tuple(c) for s, c in agg.items()}
    assert set(expected) == {"matched", "changed", "left_only", "right_only"}
    got = {
        r.status: (r.n_keys, r.value_delta_cents)
        for r in _run(spark, "q_join_full_outer_reconcile")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_value_deciles — percentile_disc bounds + bucketing by hand
# ---------------------------------------------------------------------------


def test_value_deciles_matches_literal_order_stat_walk(spark):
    orders = _rows("orders", ["o_totalprice"])
    vals = sorted(float(r["o_totalprice"]) for r in orders)
    n = len(vals)
    # percentile_disc(k/10) = min{v : 10 * cum(v) >= k * n}
    bounds = [vals[(k * n + 9) // 10 - 1] for k in range(1, 10)]
    agg = defaultdict(lambda: [0, 0])
    for r in orders:
        v = float(r["o_totalprice"])
        decile = 1 + sum(v > b for b in bounds)
        cell = agg[decile]
        cell[0] += 1
        cell[1] += _cents(r["o_totalprice"])
    total = sum(c[1] for c in agg.values())
    expected = {}
    cum = 0
    for decile in sorted(agg):
        n_orders, cents = agg[decile]
        cum += cents
        expected[decile] = (
            n_orders,
            cents,
            cents * 1_000_000 // total,
            cum * 1_000_000 // total,
        )
    got = {
        r.decile: (r.n_orders, r.revenue_cents, r.share_e6, r.cum_share_e6)
        for r in _run(spark, "q_orders_value_deciles")
    }
    assert got == expected
    assert sorted(got) == list(range(1, 11))


# ---------------------------------------------------------------------------
# q_events_path_trigrams — consecutive type triples by hand
# ---------------------------------------------------------------------------


def test_path_trigrams_matches_literal_walk(spark):
    ev = _rows("events", ["event_id", "user_id", "ts", "event_type"])
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append(r)
    n_paths: Counter = Counter()
    users: dict[str, set] = defaultdict(set)
    for uid, evs in per_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        types = [r["event_type"] for r in evs]
        for i in range(len(types) - 2):
            path = ">".join(types[i : i + 3])
            n_paths[path] += 1
            users[path].add(uid)
    ranked = sorted(
        ((p, c, len(users[p])) for p, c in n_paths.items()),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [
        (r.path, r.n_paths, r.n_users)
        for r in _run(spark, "q_events_path_trigrams")
    ]
    assert got == ranked


# ---------------------------------------------------------------------------
# q_text_source_divergence — born-rational TVD identity by hand
# ---------------------------------------------------------------------------


def test_source_divergence_matches_literal_tvd_walk(spark):
    sw: dict[str, Counter] = defaultdict(Counter)
    for r in _rows("documents", ["source", "text"]):
        sw[r["source"]].update(_tokens(r["text"]))
    c_w: Counter = Counter()
    for cnts in sw.values():
        c_w.update(cnts)
    big_n = sum(c_w.values())
    expected = {}
    for source, cnts in sw.items():
        n_s = sum(cnts.values())
        total = sum(
            abs(c * big_n - c_w[w] * n_s) for w, c in cnts.items()
        )
        own_mass = sum(c_w[w] * n_s for w in cnts)
        tvd_e6 = (total + (big_n * n_s - own_mass)) * 1_000_000 // (
            2 * n_s * big_n
        )
        expected[source] = (n_s, tvd_e6)
    got = {
        r.source: (r.n_tokens, r.tvd_e6)
        for r in _run(spark, "q_text_source_divergence")
    }
    assert got == expected
    # independent sanity: the identity really is the textbook half-L1
    for source, cnts in sw.items():
        n_s = sum(cnts.values())
        tvd = 0.5 * sum(
            abs(cnts.get(w, 0) / n_s - c / big_n) for w, c in c_w.items()
        )
        assert abs(expected[source][1] / 1_000_000 - tvd) < 1e-3, source
