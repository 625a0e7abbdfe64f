"""Round-15 twin-formula audit — batch 12 (r18-window pre-insurance).

Literal raw-parquet walks for the heaviest r12-vintage formulas: the
doubled-rank Spearman rho (exact integer rank moments by per-value
counting), co-purchase connected components (union-find third
implementation), the exact cosine top-k baseline (left-fold IEEE
mirror), and the flagship star-join monthly rollup.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations

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


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# q_stats_spearman_rho — doubled average ranks + exact moments by hand
# ---------------------------------------------------------------------------


def test_spearman_rho_matches_literal_rank_walk(spark):
    pairs = (
        ("l_quantity", "l_extendedprice"),
        ("l_discount", "l_tax"),
    )
    li = _rows(
        "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    expected = {}
    for xc, yc in pairs:
        xs = [_cents(r[xc]) for r in li]
        ys = [_cents(r[yc]) for r in li]

        def r2_of(vals):
            cnt = Counter(vals)
            keys = sorted(cnt)
            r2 = {}
            less = 0
            for v in keys:
                r2[v] = 2 * less + cnt[v] + 1
                less += cnt[v]
            return r2

        r2x, r2y = r2_of(xs), r2_of(ys)
        n = len(xs)
        sx = sum(r2x[v] for v in xs)
        sy = sum(r2y[v] for v in ys)
        sxx = sum(r2x[v] ** 2 for v in xs)
        syy = sum(r2y[v] ** 2 for v in ys)
        sxy = sum(r2x[a] * r2y[b] for a, b in zip(xs, ys))
        num = float(n * sxy - sx * sy)
        dx = float(n * sxx - sx * sx)
        dy = float(n * syy - sy * sy)
        rho6 = (
            _round6(num / math.sqrt(dx) / math.sqrt(dy))
            if dx and dy
            else None
        )
        expected[(xc, yc)] = (n, rho6)
    got = {
        (r.col_x, r.col_y): (r.n_rows, r.rho6)
        for r in _run(spark, "q_stats_spearman_rho")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_graph_components_copurchase — union-find size histogram
# ---------------------------------------------------------------------------


def test_components_copurchase_matches_union_find(spark):
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
    edges = [ab for ab, n in pair_n.items() if n >= 2]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_size: Counter = Counter(find(x) for x in parent)
    hist: Counter = Counter(comp_size.values())
    expected = {
        size: (n, size * n) for size, n in hist.items()
    }
    got = {
        r.comp_size: (r.n_components, r.n_parts)
        for r in _run(spark, "q_graph_components_copurchase")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_similarity_cosine_topk — left-fold IEEE cosine + rank by hand
# ---------------------------------------------------------------------------


def test_cosine_topk_matches_literal_fold_walk(spark):
    emb = [
        (r["vec_id"], [float(v) for v in r["embedding"]])
        for r in _rows("embeddings", ["vec_id", "embedding"])
    ]

    def fold_cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y  # sequential left fold, same order as zip_with
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    expected = {}
    for qid, qv in emb:
        if qid >= 8:
            continue
        scored = sorted(
            (
                (-fold_cos(qv, cv), nid)
                for nid, cv in emb
                if nid != qid
            )
        )
        for rnk, (negcos, nid) in enumerate(scored[:5], 1):
            expected[(qid, nid)] = (-negcos, rnk)
    got = {
        (r.query_id, r.neighbor_id): (r.cos, r.rnk)
        for r in _run(spark, "q_similarity_cosine_topk")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_flagship_monthly_revenue — the star join replayed with dicts
# ---------------------------------------------------------------------------


def test_flagship_matches_literal_star_walk(spark):
    nation = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in _rows("nation", ["n_nationkey", "n_regionkey"])
    }
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in _rows("region", ["r_regionkey", "r_name"])
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in _rows("customer", ["c_custkey", "c_nationkey"])
    }
    orders = {
        r["o_orderkey"]: (r["o_custkey"], r["o_orderdate"].date().replace(day=1))
        for r in _rows("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    }
    cells = defaultdict(lambda: [0, 0, set()])  # rev_e4, n_items, custs
    for r in _rows("lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]):
        ck, month = orders[r["l_orderkey"]]
        rname = region[nation[cust[ck]]]
        # 2dp x 2dp decimal product = exact 4-dec integer units
        rev_e4 = _cents(r["l_extendedprice"]) * (100 - _cents(r["l_discount"]))
        cell = cells[(rname, month)]
        cell[0] += rev_e4
        cell[1] += 1
        cell[2].add(ck)
    expected = {
        k: (v[0] / 10_000.0, v[1], len(v[2])) for k, v in cells.items()
    }
    got = {
        (r.r_name, r.order_month): (r.revenue, r.n_items, r.n_customers)
        for r in _run(spark, "q_flagship_monthly_revenue")
    }
    assert got == expected
