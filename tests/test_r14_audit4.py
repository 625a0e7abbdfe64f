"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 4 (closes the
inventory).

Literal twins for the structural/relational closed forms: triangle
counting by brute-force enumeration, both hierarchy walks by literal
parent-chasing, cross-source vocabulary Jaccard by set algebra, and
the gap-filled month spine by calendar iteration.
"""

from __future__ import annotations

import datetime
import re
from collections import defaultdict

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


def _day(x) -> datetime.date:
    return x.date() if hasattr(x, "date") else x


# ---------------------------------------------------------------------------
# q_graph_triangles — brute-force a<b<c enumeration
# ---------------------------------------------------------------------------


def test_triangles_match_bruteforce_enumeration(spark):
    nodes = [
        r["doc_id"] for r in _rows("documents", ["doc_id"]) if r["doc_id"] < 64
    ]
    und = set()
    for i in nodes:
        for d in ((2 * i + 1) % 64, (3 * i + 2) % 64):
            if i != d:
                und.add((min(i, d), max(i, d)))
    tri = 0
    for a, b in und:
        for c in range(b + 1, 64):
            if (a, c) in und and (b, c) in und:
                tri += 1
    [row] = _run(spark, "q_graph_triangles")
    assert (row.n_triangles, row.n_edges) == (tri, len(und))


# ---------------------------------------------------------------------------
# q_hierarchy_sql_recursive — literal parent-chasing walk
# ---------------------------------------------------------------------------


def test_hierarchy_sql_recursive_matches_parent_walk(spark):
    docs = [
        r["doc_id"] for r in _rows("documents", ["doc_id"]) if r["doc_id"] < 127
    ]
    expected = {}
    for d in docs:
        chain = [d]
        while chain[-1] > 0:
            chain.append((chain[-1] - 1) // 2)
        expected[d] = (len(chain) - 1, min(chain), len(chain))
    got = {
        r.doc_id: (r.depth, r.root_id, r.n_ancestors)
        for r in _run(spark, "q_hierarchy_sql_recursive")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_hierarchy_recursive_cte — literal root/depth over the id-derived tree
# ---------------------------------------------------------------------------


def test_hierarchy_recursive_cte_matches_parent_walk(spark):
    custs = [
        r["c_custkey"]
        for r in _rows("customer", ["c_custkey"])
        if r["c_custkey"] < 1000
    ]
    present = set(custs)
    expected = {}
    for c in custs:
        node, depth = c, 0
        # parent = floor(id/10) for ids >= 10; roots are ids < 10. The
        # recursion only descends through parents PRESENT in the node
        # set (the join), so a missing intermediate orphanes the chain.
        chain_ok = True
        while node >= 10:
            parent = node // 10
            if parent not in present:
                chain_ok = False
                break
            node, depth = parent, depth + 1
        if chain_ok:
            expected[c] = (node, depth)
    got = {
        r.id: (r.root, r.depth)
        for r in _run(spark, "q_hierarchy_recursive_cte")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_source_vocab_jaccard — literal vocabulary set algebra
# ---------------------------------------------------------------------------


def test_vocab_jaccard_matches_set_algebra(spark):
    vocab = defaultdict(set)
    for r in _rows("documents", ["source", "text"]):
        for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()):
            if t:
                vocab[r["source"]].add(t)
    sources = sorted(vocab)
    expected = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            common = len(vocab[a] & vocab[b])
            if common == 0:
                continue  # the inner pair join emits no row
            union = len(vocab[a]) + len(vocab[b]) - common
            expected[(a, b)] = (
                common,
                len(vocab[a]),
                len(vocab[b]),
                common * 1_000_000 // union,
            )
    got = {
        (r.source_a, r.source_b): (
            r.n_common,
            r.n_words_a,
            r.n_words_b,
            r.jaccard_e6,
        )
        for r in _run(spark, "q_text_source_vocab_jaccard")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_date_gapfill_months — literal calendar spine
# ---------------------------------------------------------------------------


def test_gapfill_months_matches_literal_calendar(spark):
    orders = _rows("orders", ["o_orderdate", "o_totalprice"])
    months = [_day(r["o_orderdate"]).replace(day=1) for r in orders]
    lo, hi = min(months), max(months)
    spine = []
    cur = lo
    while cur <= hi:
        spine.append(cur)
        cur = (cur + datetime.timedelta(days=32)).replace(day=1)
    rev = defaultdict(lambda: [0, 0])
    for r in orders:
        if float(r["o_totalprice"]) > 400000:
            m = _day(r["o_orderdate"]).replace(day=1)
            rev[m][0] += _cents(r["o_totalprice"])
            rev[m][1] += 1
    expected = {
        m: (rev[m][0] / 100.0 if rev[m][1] else 0.0, rev[m][1]) for m in spine
    }
    got = {
        r.month: (r.revenue, r.n_orders)
        for r in _run(spark, "q_date_gapfill_months")
    }
    assert got == expected
