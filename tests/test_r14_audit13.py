"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 13: more
r9-vintage members (r15 window insurance).

Literal twins for fuzzy name pairs (textbook dynamic-programming
Levenshtein), the hash-mixture rate gate, Unicode NFC dedup via
stdlib unicodedata (independent of BOTH engines' normalizers),
embedding norm stats with the exact decimal rounding discipline,
pack-chunks running-sum assignment, and lag-delta gaps.
"""

from __future__ import annotations

import datetime
import hashlib
import re
import unicodedata
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.datetime(1970, 1, 1)


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


# ---------------------------------------------------------------------------
# q_dedup_fuzzy_names — textbook DP Levenshtein over the blocked pairs
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_names_match_textbook_levenshtein(spark):
    cust = [
        (r["c_custkey"], r["c_name"])
        for r in _rows("customer", ["c_custkey", "c_name"])
        if r["c_custkey"] < 200
    ]
    expected = {}
    for i, (ka, na) in enumerate(cust):
        for kb, nb in cust[i + 1 :]:
            a, b = (ka, na), (kb, nb)
            if a[0] > b[0]:
                a, b = b, a
            if abs(len(a[1]) - len(b[1])) <= 1:
                d = _lev(a[1], b[1])
                if d <= 1:
                    expected[(a[0], b[0])] = (a[1], b[1], d)
    got = {
        (r.id_a, r.id_b): (r.name_a, r.name_b, r.edit_distance)
        for r in _run(spark, "q_dedup_fuzzy_names")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_sample_hash_mixture — hashlib prefix against the per-lang gate
# ---------------------------------------------------------------------------


def test_hash_mixture_matches_hashlib_gate(spark):
    rates = {"en": "7fffffff", "zh": "cccccccc", "es": "33333333",
             "de": "33333333", "fr": "ffffffff"}
    expected = {}
    for r in _rows("documents", ["doc_id", "lang"]):
        gate = rates.get(r["lang"], "00000000")
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
        if h <= gate:
            expected[r["doc_id"]] = r["lang"]
    got = {r.doc_id: r.lang for r in _run(spark, "q_sample_hash_mixture")}
    assert got == expected


# ---------------------------------------------------------------------------
# q_dedup_unicode_normalize — stdlib unicodedata NFC (third implementation)
# ---------------------------------------------------------------------------


def test_unicode_normalize_matches_stdlib_nfc(spark):
    groups = defaultdict(list)
    for r in _rows("documents", ["doc_id"]):
        did = r["doc_id"]
        k = did % 50
        raw = {
            0: f"café menü  no.{k}",
            1: f"café menü  no.{k}",
            2: f"CAFÉ   MENÜ NO.{k}",
        }[did % 3]
        canon = re.sub(
            r"\s+", " ", unicodedata.normalize("NFC", raw.lower())
        ).strip()
        groups[canon].append(did)
    expected = {
        canon: (min(ids), len(ids) - 1) for canon, ids in groups.items()
    }
    got = {
        r.text_canon: (r.keeper_doc_id, r.n_dupes)
        for r in _run(spark, "q_dedup_unicode_normalize")
    }
    assert got == expected
    # non-vacuity: the three compositions of the same logical text must
    # have merged (fewer canonical groups than staged variants)
    assert all(n > 0 for _, n in expected.values())


# ---------------------------------------------------------------------------
# q_embedding_norm_stats — sequential fold + HALF_UP decimal rounding
# ---------------------------------------------------------------------------


def test_embedding_norm_stats_match_literal_fold(spark):
    import math

    per_label = defaultdict(list)
    for r in _rows("embeddings", ["label", "embedding"]):
        acc = 0.0
        for x in r["embedding"]:  # left fold, matching F.aggregate
            acc += float(x) * float(x)
        norm = Decimal(repr(math.sqrt(acc))).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
        per_label[r["label"]].append(norm)
    for r in _run(spark, "q_embedding_norm_stats"):
        norms = per_label[r.label]
        assert r.n_vecs == len(norms)
        assert r.mean_norm == float(sum(norms)) / len(norms)
        assert r.min_norm == float(min(norms))
        assert r.max_norm == float(max(norms))


# ---------------------------------------------------------------------------
# q_curation_pack_chunks — literal running-token-sum chunk ids
# ---------------------------------------------------------------------------


def test_pack_chunks_match_literal_running_sum(spark):
    per_lang = defaultdict(list)
    for r in _rows("documents", ["doc_id", "lang", "text"]):
        n = len(
            [t for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()) if t]
        )
        per_lang[r["lang"]].append((r["doc_id"], n))
    expected = {}
    for lang, docs in per_lang.items():
        docs.sort()
        cum = 0
        for did, n in docs:
            expected[did] = (lang, n, cum // 2048)
            cum += n
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.chunk_id)
        for r in _run(spark, "q_curation_pack_chunks")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_window_lag_delta — literal per-user gap walk
# ---------------------------------------------------------------------------


def test_lag_delta_matches_literal_walk(spark):
    def sec(ts):
        d = ts - _EPOCH
        return d.days * 86400 + d.seconds

    per_user = defaultdict(list)
    for r in _rows("events", ["event_id", "user_id", "ts"]):
        per_user[r["user_id"]].append((r["ts"], r["event_id"]))
    expected = {}
    for uid, evs in per_user.items():
        evs.sort()
        prev = None
        for ts, eid in evs:
            gap = sec(ts) - sec(prev) if prev is not None else None
            expected[eid] = (uid, ts, prev, gap)
            prev = ts
    got = {
        r.event_id: (r.user_id, r.ts, r.prev_ts, r.gap_seconds)
        for r in _run(spark, "q_window_lag_delta")
    }
    assert got == expected
