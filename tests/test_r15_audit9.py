"""Round-15 twin-formula audit — batch 9 (r18-window pre-insurance).

Literal raw-parquet walks over the co-purchase graph family and two
more r12 closed forms: per-degree clustering coefficients (triangle
enumeration over adjacency sets), common-neighbor link prediction,
the basket profile, and head/tail positional vocabulary drift.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from itertools import combinations

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


def _copurchase_edges():
    """support>=2 oriented co-purchase edges from the raw incidence."""
    items = {
        (r["l_orderkey"], r["l_partkey"])
        for r in _rows("lineitem", ["l_orderkey", "l_partkey"])
    }
    baskets = defaultdict(set)
    for ok, pk in items:
        baskets[ok].add(pk)
    pair_n: Counter = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            pair_n[(a, b)] += 1
    return {ab for ab, n in pair_n.items() if n >= 2}


# ---------------------------------------------------------------------------
# q_graph_clustering_coeff — triangle closure per degree class
# ---------------------------------------------------------------------------


def test_clustering_coeff_matches_literal_triangle_walk(spark):
    edges = _copurchase_edges()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri: Counter = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c counts each triangle once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    klass = defaultdict(lambda: [0, 0])
    for node, nbrs in adj.items():
        d = len(nbrs)
        klass[d][0] += 1
        klass[d][1] += tri[node]
    expected = {}
    for d, (n_nodes, n_tri) in klass.items():
        den = n_nodes * d * (d - 1)
        expected[d] = (
            n_nodes,
            n_tri,
            2 * n_tri * 1_000_000 // den if den else None,
        )
    got = {
        r.degree: (r.n_nodes, r.n_triangle_incidences, r.mean_closure_e6)
        for r in _run(spark, "q_graph_clustering_coeff")
    }
    assert got == expected
    assert sum(v[1] for v in expected.values()) > 0  # triangles exist


# ---------------------------------------------------------------------------
# q_graph_link_prediction — wedge candidates + Jaccard by hand
# ---------------------------------------------------------------------------


def test_link_prediction_matches_literal_wedge_walk(spark):
    edges = _copurchase_edges()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    wedge: Counter = Counter()
    for m, nbrs in adj.items():
        for a, c in combinations(sorted(nbrs), 2):
            wedge[(a, c)] += 1
    scored = []
    for (a, c), cn in wedge.items():
        if (a, c) in edges:
            continue
        j = cn * 1_000_000 // (len(adj[a]) + len(adj[c]) - cn)
        scored.append((a, c, cn, j))
    top = sorted(scored, key=lambda t: (-t[3], t[0], t[1]))[:20]
    expected = [(a, c, cn, j) for a, c, cn, j in top]
    got = [
        (r.part_a, r.part_b, r.common_neighbors, r.jaccard_e6)
        for r in _run(spark, "q_graph_link_prediction")
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# q_orders_basket_profile — lines-per-order histogram by hand
# ---------------------------------------------------------------------------


def test_basket_profile_matches_literal_walk(spark):
    per_order = defaultdict(lambda: [0, set(), 0])
    for r in _rows("lineitem", ["l_orderkey", "l_partkey", "l_quantity"]):
        cell = per_order[r["l_orderkey"]]
        cell[0] += 1
        cell[1].add(r["l_partkey"])
        cell[2] += round(float(r["l_quantity"]) * 100)
    hist = defaultdict(lambda: [0, 0, 0])
    for n_lines, parts, qty in per_order.values():
        cell = hist[n_lines]
        cell[0] += 1
        cell[1] += len(parts)
        cell[2] += qty
    expected = {
        nl: (n, parts * 1000 // n, qty // n)
        for nl, (n, parts, qty) in hist.items()
    }
    got = {
        r.n_lines: (r.n_orders, r.mean_parts_e3, r.mean_qty_cents)
        for r in _run(spark, "q_orders_basket_profile")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_head_tail_drift — positional TVD by hand
# ---------------------------------------------------------------------------


def test_head_tail_drift_matches_literal_walk(spark):
    ch: dict[str, Counter] = defaultdict(Counter)
    ct: dict[str, Counter] = defaultdict(Counter)
    for r in _rows("documents", ["source", "text"]):
        toks = [
            t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t
        ]
        n = len(toks)
        for pos, tok in enumerate(toks, 1):
            if 2 * pos <= n:
                ch[r["source"]][tok] += 1
            else:
                ct[r["source"]][tok] += 1
    expected = {}
    for source in set(ch) | set(ct):
        h, t = ch[source], ct[source]
        th, tt = sum(h.values()), sum(t.values())
        vocab = set(h) | set(t)
        absdiff = sum(
            abs(h.get(w, 0) * tt - t.get(w, 0) * th) for w in vocab
        )
        expected[source] = (
            th,
            tt,
            sum(1 for w in vocab if h.get(w, 0) > 0),
            sum(1 for w in vocab if t.get(w, 0) > 0),
            absdiff * 500_000 // (th * tt) if th * tt else None,
        )
    got = {
        r.source: (
            r.head_tokens,
            r.tail_tokens,
            r.head_vocab,
            r.tail_vocab,
            r.tvd_e6,
        )
        for r in _run(spark, "q_text_head_tail_drift")
    }
    assert got == expected
