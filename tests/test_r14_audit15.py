"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 15 (capstone):
the composed pipelines and the remaining profiling reports.

The master-pipeline twin is the capstone: the full six-stage corpus
build (takedown -> URL dedup -> exact dedup -> quality gate -> hash
mixture -> shard summary) re-executed as a plain Python loop over the
raw parquet — one staging bug anywhere in the chain and the per-shard
summary diverges.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"

MIXTURE_RATES = {"en": "7fffffff", "zh": "cccccccc", "es": "33333333",
                 "de": "33333333", "fr": "ffffffff"}
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _md5(s) -> str:
    return hashlib.md5(str(s).encode()).hexdigest()


def _alnum_toks(text) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


# ---------------------------------------------------------------------------
# q_curation_optout_takedown — literal tombstone walk
# ---------------------------------------------------------------------------


def test_optout_takedown_matches_literal_tombstones(spark):
    per_src = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in _rows("documents", ["doc_id", "source"]):
        did = r["doc_id"]
        id_hit = did % 37 == 0
        dom_hit = (did % 50) % 7 == 3  # host = site{doc_id % 50}...
        s = per_src[r["source"]]
        s[0] += 1
        s[1] += id_hit
        s[2] += dom_hit
        s[3] += id_hit or dom_hit
        s[4] += not (id_hit or dom_hit)
    expected = {src: tuple(v) for src, v in per_src.items()}
    got = {
        r.source: (
            r.n_docs,
            r.n_removed_id,
            r.n_removed_domain,
            r.n_removed_total,
            r.n_kept,
        )
        for r in _run(spark, "q_curation_optout_takedown")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_master_pipeline — the full six-stage build as a Python loop
# ---------------------------------------------------------------------------


def test_master_pipeline_matches_literal_six_stage_walk(spark):
    docs = sorted(
        _rows("documents", ["doc_id", "lang", "text"]),
        key=lambda r: r["doc_id"],
    )
    # stage 1: takedown (id + domain tombstones, fused filter form)
    survivors = [
        r
        for r in docs
        if r["doc_id"] % 37 != 0 and (r["doc_id"] % 50) % 7 != 3
    ]
    # stage 2: URL-canonical dedup — first doc per (host, page)
    seen_hp = set()
    stage2 = []
    for r in survivors:  # doc_id order = the window's ORDER BY
        hp = (r["doc_id"] % 50, r["doc_id"] % 200)
        if hp not in seen_hp:
            seen_hp.add(hp)
            stage2.append(r)
    # stage 3: exact-text dedup — first doc per md5(text)
    seen_h = set()
    stage3 = []
    for r in stage2:
        h = _md5(r["text"])
        if h not in seen_h:
            seen_h.add(h)
            stage3.append(r)
    # stage 4: quality gate (token band 20..1000)
    stage4 = [
        (r["doc_id"], r["lang"], len(_alnum_toks(r["text"])))
        for r in stage3
        if 20 <= len(_alnum_toks(r["text"])) <= 1000
    ]
    # stage 5: language hash mixture
    stage5 = [
        (did, lang, n)
        for did, lang, n in stage4
        if _md5(did)[:8] <= MIXTURE_RATES.get(lang, "00000000")
    ]
    # stage 6: shard assignment + summary
    shards = defaultdict(lambda: [0, 0, set()])
    for did, lang, n in stage5:
        shard = int(_md5(did)[0], 16) % 8
        s = shards[shard]
        s[0] += 1
        s[1] += n
        s[2].add(lang)
    expected = {
        shard: (n, tot, len(langs))
        for shard, (n, tot, langs) in shards.items()
    }
    got = {
        r.shard: (r.n_docs, r.total_tokens, r.n_langs)
        for r in _run(spark, "q_curation_master_pipeline")
    }
    assert got == expected
    assert expected  # non-vacuous: the pipeline keeps documents


# ---------------------------------------------------------------------------
# q_layout_compaction_plan — literal first-fit cumulative packing
# ---------------------------------------------------------------------------


def test_compaction_plan_matches_literal_packing(spark):
    files = defaultdict(int)
    for r in _rows("orders", ["o_orderpriority", "o_orderdate", "o_totalprice"]):
        d = r["o_orderdate"]
        day = d.date() if hasattr(d, "date") else d
        files[(r["o_orderpriority"], day)] += round(
            float(r["o_totalprice"]) * 100
        )
    per_part = defaultdict(list)
    for (part, day), size in files.items():
        per_part[part].append((day, size))
    expected = defaultdict(lambda: [0, 0, None, None])
    for part, lst in per_part.items():
        lst.sort()
        cum = 0
        for day, size in lst:
            cum += size
            gid = (max(cum, 1) - 1) // 100_000_000
            g = expected[(part, gid)]
            g[0] += 1
            g[1] += size
            g[2] = day if g[2] is None else min(g[2], day)
            g[3] = day if g[3] is None else max(g[3], day)
    expected = {k: tuple(v) for k, v in expected.items()}
    got = {
        (r.part, r.group_id): (r.n_files, r.group_bytes, r.first_day, r.last_day)
        for r in _run(spark, "q_layout_compaction_plan")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_profile_skew_report — literal key-count CDF walk
# ---------------------------------------------------------------------------


def test_skew_report_matches_literal_cdf(spark):
    per_key = defaultdict(int)
    li = _rows("lineitem", ["l_suppkey"])
    for r in li:
        per_key[r["l_suppkey"]] += 1
    counts = sorted(per_key.values())
    n_keys, n_rows = len(counts), len(li)

    def q_disc(num, den):
        cum = 0
        by_val = defaultdict(int)
        for c in counts:
            by_val[c] += 1
        for v in sorted(by_val):
            cum += by_val[v]
            if cum * den >= n_keys * num:
                return v

    med, p99 = q_disc(1, 2), q_disc(99, 100)
    [row] = _run(spark, "q_profile_skew_report")
    assert (
        row.key_col,
        row.n_keys,
        row.n_rows,
        row.max_cnt,
        row.med_cnt,
        row.p99_cnt,
        row.top_share_e6,
        row.p99_over_med_e6,
    ) == (
        "l_suppkey",
        n_keys,
        n_rows,
        max(counts),
        med,
        p99,
        max(counts) * 1_000_000 // n_rows,
        p99 * 1_000_000 // med,
    )


# ---------------------------------------------------------------------------
# q_curation_topk_per_lang — literal stopword-ratio ranking
# ---------------------------------------------------------------------------


def test_topk_per_lang_matches_literal_ranking(spark):
    per_lang = defaultdict(list)
    for r in _rows("documents", ["doc_id", "lang", "text"]):
        t = [x for x in re.split(r"\s+", (r["text"] or "").lower()) if x]
        if not t:
            continue
        score = sum(1 for x in t if x in STOPWORDS) / len(t)
        per_lang[r["lang"]].append((-score, r["doc_id"]))
    expected = {}
    for lang, lst in per_lang.items():
        lst.sort()
        for rk, (negs, did) in enumerate(lst[:20], 1):
            expected[(lang, did)] = (-negs, rk)
    got = {
        (r.lang, r.doc_id): (r.score, r.rk)
        for r in _run(spark, "q_curation_topk_per_lang")
    }
    assert got == expected
