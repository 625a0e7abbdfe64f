"""Round-15 twin-formula audit — batch 7 (r17-window pre-insurance).

The two iterative/composed r11-vintage pipelines: BPE merge training
(three rounds replayed with plain Python dicts and str.replace) and the
SemDeDup composed pipeline (staged twins + all-pairs cosine + a
union-find THIRD implementation of the component fixpoint).
"""

from __future__ import annotations

import math
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


# ---------------------------------------------------------------------------
# q_bpe_learn_merges — three merge rounds replayed by hand
# ---------------------------------------------------------------------------


def test_bpe_learn_merges_matches_literal_walk(spark):
    words: Counter = Counter()
    for r in _rows("documents", ["text"]):
        words.update(t for t in re.split(r"\s+", r["text"].lower()) if t)
    # repr: every char wrapped as <c>
    reprs = {f"""{"".join(f"<{c}>" for c in w)}""": c for w, c in words.items()}
    expected = []
    for rank in (1, 2, 3):
        pairs: Counter = Counter()
        for rep, cnt in reprs.items():
            syms = rep[1:-1].split("><")
            for l, r_ in zip(syms, syms[1:]):
                pairs[(l, r_)] += cnt
        (l, r_), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, l, r_, n))
        merged: Counter = Counter()
        for rep, cnt in reprs.items():
            merged[rep.replace(f"<{l}><{r_}>", f"<{l}{r_}>")] += cnt
        reprs = merged
    got = sorted(
        (r.rank, r.l, r.r, r.n) for r in _run(spark, "q_bpe_learn_merges")
    )
    assert got == expected


# ---------------------------------------------------------------------------
# q_semantic_dedup_corpus — staged twins + cosine pairs + union-find
# ---------------------------------------------------------------------------


def test_semantic_dedup_matches_literal_union_find(spark):
    emb = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in _rows("embeddings", ["vec_id", "embedding"])
        if r["vec_id"] < 60
    }
    corpus = dict(emb)
    for vid, vec in emb.items():
        if vid % 3 == 0:
            corpus[vid + 1000] = [
                x + 0.01 * ((i % 5) - 2) for i, x in enumerate(vec)
            ]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))  # left fold, same order
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    ids = sorted(corpus)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_pairs = 0
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            if cos(corpus[a], corpus[b]) > 0.8:
                n_pairs += 1
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(set)
    for i in ids:
        comp[find(i)].add(i)
    expected = {}
    for i in ids:
        root = find(i)
        members = comp[root]
        if len(members) > 1:
            keeper = min(members)
            if i == keeper:
                expected[i] = len(members) - 1
        else:
            expected[i] = 0
    got = {
        r.vec_id: r.n_dupes_removed
        for r in _run(spark, "q_semantic_dedup_corpus")
    }
    assert got == expected
    assert n_pairs > 0 and any(v > 0 for v in expected.values())
