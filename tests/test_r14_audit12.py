"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 12: the
r9-vintage text/curation battery (the queries that will front the r15
graded window).

Literal twins for TF-IDF top terms, interpolated length percentiles,
repetition fractions, per-source dup rates (keyed on RAW text, not the
engines' md5 — independent of the hash), systematic PPS sampling, exact
shingle Jaccard on the staged corpus, and contamination overlap.
"""

from __future__ import annotations

import hashlib
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


def _alnum_toks(text) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _ws_toks(text) -> list[str]:
    return [t for t in re.split(r"\s+", (text or "").lower()) if t]


# ---------------------------------------------------------------------------
# q_text_tfidf_topterms — literal tf/df walk + ln scoring
# ---------------------------------------------------------------------------


def test_tfidf_topterms_match_literal_scores(spark):
    docs = _rows("documents", ["doc_id", "text"])
    n_docs = len(docs)
    tf = defaultdict(Counter)
    for r in docs:
        for t in _alnum_toks(r["text"]):
            tf[r["doc_id"]][t] += 1
    df = Counter()
    for terms in tf.values():
        for t in terms:
            df[t] += 1
    expected = {}
    for did, terms in tf.items():
        scored = sorted(
            (
                (-round(c * math.log(n_docs / df[t]), 6), t)
                for t, c in terms.items()
            )
        )[:3]
        for negs, t in scored:
            expected[(did, t)] = -negs
    got = {
        (r.doc_id, r.term): r.tfidf
        for r in _run(spark, "q_text_tfidf_topterms")
    }
    assert set(got) == set(expected)
    for k, v in got.items():
        assert abs(v - expected[k]) <= 1e-6


# ---------------------------------------------------------------------------
# q_docs_length_percentiles — literal interpolation per language
# ---------------------------------------------------------------------------


def test_length_percentiles_match_literal_interpolation(spark):
    groups = defaultdict(list)
    for r in _rows("documents", ["lang", "n_chars"]):
        groups[r["lang"]].append(float(r["n_chars"]))

    def q(vals, p):
        s = sorted(vals)
        h = (len(s) - 1) * p
        lo = math.floor(h)
        hi = min(lo + 1, len(s) - 1)
        return s[lo] + (h - lo) * (s[hi] - s[lo])

    for r in _run(spark, "q_docs_length_percentiles"):
        vals = groups[r.lang]
        assert r.n_docs == len(vals)
        assert abs(r.p50_chars - q(vals, 0.5)) <= 1e-9
        assert abs(r.p90_chars - q(vals, 0.9)) <= 1e-9
        assert (r.min_chars, r.max_chars) == (min(vals), max(vals))


# ---------------------------------------------------------------------------
# q_text_repetition_score — literal distinct fractions
# ---------------------------------------------------------------------------


def test_repetition_score_matches_literal_fractions(spark):
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        t = _alnum_toks(r["text"])
        if len(t) < 2:
            continue
        bg = [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]
        expected[r["doc_id"]] = (
            len(t),
            math.floor((1.0 - len(set(t)) / len(t)) * 1000000),
            math.floor((1.0 - len(set(bg)) / len(bg)) * 1000000),
        )
    got = {
        r.doc_id: (r.n_tokens, r.dup_token_frac_e6, r.dup_bigram_frac_e6)
        for r in _run(spark, "q_text_repetition_score")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_docs_dup_rate_by_source — keyed on RAW text (hash-independent)
# ---------------------------------------------------------------------------


def test_dup_rate_by_source_matches_raw_text_sets(spark):
    per_src = defaultdict(list)
    for r in _rows("documents", ["source", "text"]):
        per_src[r["source"]].append(r["text"])
    expected = {
        src: (len(texts), len(set(texts)), len(texts) - len(set(texts)))
        for src, texts in per_src.items()
    }
    got = {
        r.source: (r.n_docs, r.n_unique, r.n_dupes)
        for r in _run(spark, "q_docs_dup_rate_by_source")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_sample_pps_systematic — literal cumulative-mass grid walk
# ---------------------------------------------------------------------------


def test_pps_systematic_matches_literal_grid(spark):
    per_lang = defaultdict(list)
    for r in _rows("documents", ["doc_id", "lang", "n_chars"]):
        rk = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        per_lang[r["lang"]].append((rk, r["doc_id"], r["n_chars"]))
    expected = {}
    for lang, lst in per_lang.items():
        lst.sort()
        total = sum(w for _, _, w in lst)
        step = total // 10
        if step <= 0:
            continue
        cum = 0
        for _, did, w in lst:
            lo, cum = cum, cum + w
            hits = cum // step - lo // step
            if hits > 0:
                expected[did] = (lang, w, hits)
    got = {
        r.doc_id: (r.lang, r.n_chars, r.n_hits)
        for r in _run(spark, "q_sample_pps_systematic")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_dedup_ngram_jaccard — literal staged-twin pairwise Jaccard
# ---------------------------------------------------------------------------


def test_ngram_jaccard_matches_literal_pairs(spark):
    base = {
        r["doc_id"]: r["text"]
        for r in _rows("documents", ["doc_id", "text"])
        if r["doc_id"] < 40
    }
    staged = dict(base)
    for did, text in base.items():
        if did % 3 == 0:
            staged[did + 10000] = text + " zebra quill oxcart"
    sh = {}
    for did, text in staged.items():
        t = _ws_toks(text)
        s = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        if s:
            sh[did] = s
    ids = sorted(sh)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            jac = inter / (len(sh[a]) + len(sh[b]) - inter)
            if jac >= 0.1:
                expected[(a, b)] = jac
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _run(spark, "q_dedup_ngram_jaccard")
    }
    assert got == expected
    assert expected  # non-vacuous: the staged twins must pair up


# ---------------------------------------------------------------------------
# q_text_contamination_overlap — literal bench-vs-corpus shingle sets
# ---------------------------------------------------------------------------


def test_contamination_overlap_matches_literal_sets(spark):
    tri = {}
    for r in _rows("documents", ["doc_id", "text"]):
        t = _alnum_toks(r["text"])
        tri[r["doc_id"]] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
    expected = {}
    for bid, bsh in tri.items():
        if bid % 97 != 0 or not bsh:
            continue
        n = sum(
            1
            for cid, csh in tri.items()
            if cid % 97 != 0 and csh and (bsh & csh)
        )
        if n:
            expected[bid] = n
    got = {
        r.bench_doc_id: r.n_contaminated_docs
        for r in _run(spark, "q_text_contamination_overlap")
    }
    assert got == expected
