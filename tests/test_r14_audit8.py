"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 8: the curation
and sampling window members.

hashlib-md5 twins for the deterministic draws (stratified sample, shard
assignment, the funnel's rate gate), a literal LP-corner walk for the
mixture budget, numpy-free interpolated percentiles, and the
heavy-hitter report.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _md5(s) -> str:
    return hashlib.md5(str(s).encode()).hexdigest()


# ---------------------------------------------------------------------------
# q_sample_stratified_exact — k smallest md5(doc_id) per language
# ---------------------------------------------------------------------------


def test_stratified_sample_matches_hashlib_ranks(spark):
    per_lang = defaultdict(list)
    for r in _rows("documents", ["doc_id", "lang"]):
        per_lang[r["lang"]].append((_md5(r["doc_id"]), r["doc_id"]))
    expected = {}
    for lang, lst in per_lang.items():
        lst.sort()
        for rank, (_, did) in enumerate(lst[:20], 1):
            expected[did] = (lang, rank)
    got = {
        r.doc_id: (r.lang, r.sample_rank)
        for r in _run(spark, "q_sample_stratified_exact")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_mixture_token_budget — literal min-corner mixture LP
# ---------------------------------------------------------------------------


def test_mixture_budget_matches_literal_corner(spark):
    weights = {"en": 400000, "zh": 200000, "de": 150000, "fr": 150000,
               "es": 100000}
    avail = Counter()
    for r in _rows("documents", ["lang", "text"]):
        if r["lang"] in weights:
            avail[r["lang"]] += len((r["text"] or "").lower().split())
    caps = {
        lang: avail[lang] * 1_000_000 // w for lang, w in weights.items()
    }
    t_max = min(caps.values())
    expected = {}
    for lang, w in weights.items():
        allotted = w * t_max // 1_000_000
        rate = (
            allotted * 1_000_000 // avail[lang] if avail[lang] else None
        )
        expected[lang] = (
            w, avail[lang], caps[lang], allotted, rate, caps[lang] == t_max
        )
    got = {
        r.lang: (
            r.w_e6,
            r.avail_tokens,
            r.budget_cap,
            r.allotted_tokens,
            r.sample_rate_e6,
            r.binding,
        )
        for r in _run(spark, "q_mixture_token_budget")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_shard_assign — first md5 nibble + within-shard rank
# ---------------------------------------------------------------------------


def test_shard_assign_matches_hashlib_nibbles(spark):
    shards = defaultdict(list)
    meta = {}
    for r in _rows("documents", ["doc_id", "lang", "n_chars"]):
        k = _md5(r["doc_id"])
        shards[int(k[0], 16)].append((k, r["doc_id"]))
        meta[r["doc_id"]] = (r["lang"], r["n_chars"])
    expected = {}
    for shard, lst in shards.items():
        lst.sort()
        for pos, (_, did) in enumerate(lst, 1):
            expected[did] = (*meta[did], shard, pos)
    got = {
        r.doc_id: (r.lang, r.n_chars, r.shard, r.shard_pos)
        for r in _run(spark, "q_curation_shard_assign")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_funnel_report — literal four-stage survivor walk
# ---------------------------------------------------------------------------


def test_funnel_report_matches_literal_stage_walk(spark):
    docs = _rows("documents", ["doc_id", "lang", "n_chars", "text"])
    first_per_hash = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        first_per_hash.setdefault(_md5(r["text"]), r["doc_id"])
    keepers = set(first_per_hash.values())
    gate = {"en": "7fffffff", "zh": "cccccccc", "es": "33333333",
            "de": "33333333", "fr": "ffffffff"}
    n0 = len(docs)
    n1 = n2 = n3 = n4 = 0
    for r in docs:
        k1 = r["doc_id"] in keepers
        k2 = k1 and 100 <= r["n_chars"] <= 20000
        k3 = k2 and r["lang"] in ("en", "zh", "es", "fr")
        k4 = k3 and _md5(r["doc_id"])[:8] <= gate.get(r["lang"], "00000000")
        n1 += k1
        n2 += k2
        n3 += k3
        n4 += k4
    expected = {
        1: ("exact_dedup", n0, n1, n0 - n1),
        2: ("length", n1, n2, n1 - n2),
        3: ("lang", n2, n3, n2 - n3),
        4: ("mixture_sample", n3, n4, n3 - n4),
    }
    got = {
        r.stage_idx: (r.stage, r.n_in, r.n_kept, r.n_dropped)
        for r in _run(spark, "q_curation_funnel_report")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_agg_percentile — literal linear-interpolation quantiles
# ---------------------------------------------------------------------------


def test_agg_percentile_matches_literal_interpolation(spark):
    groups = defaultdict(list)
    for r in _rows("lineitem", ["l_returnflag", "l_quantity"]):
        groups[r["l_returnflag"]].append(float(r["l_quantity"]))

    def q(vals, p):
        s = sorted(vals)
        h = (len(s) - 1) * p
        lo = math.floor(h)
        frac = h - lo
        hi = min(lo + 1, len(s) - 1)
        return s[lo] + frac * (s[hi] - s[lo])

    for r in _run(spark, "q_agg_percentile"):
        vals = groups[r.l_returnflag]
        assert r.n_items == len(vals)
        for col, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            assert abs(getattr(r, col) - q(vals, p)) <= 1e-9


# ---------------------------------------------------------------------------
# q_heavy_hitters — literal top-20 key-count walk
# ---------------------------------------------------------------------------


def test_heavy_hitters_match_literal_top20(spark):
    li = _rows("lineitem", ["l_orderkey", "l_extendedprice"])
    per_key = defaultdict(lambda: [0, 0])
    for r in li:
        s = per_key[r["l_orderkey"]]
        s[0] += 1
        s[1] += round(float(r["l_extendedprice"]) * 100)
    total = len(li)
    ranked = sorted(
        ((n, cents / 100.0, k) for k, (n, cents) in per_key.items()),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[:20]
    expected = {
        k: (n, rev, n / total) for n, rev, k in ranked
    }
    got = {
        r.l_orderkey: (r.n_lines, r.key_revenue, r.share)
        for r in _run(spark, "q_heavy_hitters")
    }
    assert got == expected
