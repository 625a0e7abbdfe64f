"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 10: layout,
lookup, and vector window members.

Literal twins for the Morton interleave (bit twiddling re-derived in
Python), the profile unpivot, the band join, the staged-CDC SCD2 as-of
lookup (per-key version walk), and the embedding near-dup pairs
(sequential-fold float cosine, exact equality).
"""

from __future__ import annotations

from collections import defaultdict

import math

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


def _day(x):
    return x.date() if hasattr(x, "date") else x


# ---------------------------------------------------------------------------
# q_profile_columns — literal per-column stats
# ---------------------------------------------------------------------------


def test_profile_columns_match_literal_stats(spark):
    cols = ("l_quantity", "l_extendedprice", "l_discount")
    li = _rows("lineitem", list(cols))
    expected = {}
    for c in cols:
        vals = [r[c] for r in li if r[c] is not None]
        expected[c] = (
            len(li),
            len(vals),
            len(set(vals)),
            min(vals),
            max(vals),
        )
    got = {
        r.col_name: (r.n_rows, r.n_nonnull, r.n_distinct, r.min_v, r.max_v)
        for r in _run(spark, "q_profile_columns")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_join_range_bands — literal half-open interval buckets
# ---------------------------------------------------------------------------


def test_range_bands_match_literal_intervals(spark):
    bands = (("small", 0.0, 50000.0), ("mid", 50000.0, 200000.0),
             ("large", 200000.0, 1000000.0))
    agg = defaultdict(lambda: [0, 0])
    for r in _rows("orders", ["o_totalprice"]):
        p = float(r["o_totalprice"])
        for name, lo, hi in bands:
            if lo <= p < hi:
                agg[name][0] += 1
                agg[name][1] += _cents(p)
    expected = {k: (n, c / 100.0) for k, (n, c) in agg.items()}
    got = {
        r.band: (r.n_orders, r.total_price)
        for r in _run(spark, "q_join_range_bands")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_layout_zorder_cells — Morton interleave re-derived bit by bit
# ---------------------------------------------------------------------------


def test_zorder_cells_match_literal_morton(spark):
    cells = defaultdict(lambda: [0, 0])
    for r in _rows("orders", ["o_custkey", "o_orderdate", "o_totalprice"]):
        d = _day(r["o_orderdate"])
        xb = r["o_custkey"] % 256
        yb = (d.year * 12 + d.month - 1) % 256
        c = cells[(xb, yb)]
        c[0] += 1
        c[1] += _cents(r["o_totalprice"])

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    expected = {
        (xb, yb): (morton(xb, yb), n, cents / 100.0)
        for (xb, yb), (n, cents) in cells.items()
    }
    got = {
        (r.xb, r.yb): (r.zvalue, r.n_orders, r.cell_revenue)
        for r in _run(spark, "q_layout_zorder_cells")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_scd2_asof_lookup — literal staged-CDC version walk
# ---------------------------------------------------------------------------


def test_scd2_asof_matches_literal_version_walk(spark):
    changes = []  # (key, status, price, op, seq)
    for r in _rows("orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]):
        k, st, p = r["o_orderkey"], r["o_orderstatus"], float(r["o_totalprice"])
        m = k % 7
        if m == 0:
            changes.append((k, st, p * 1.05, "U", 1))
            changes.append((k, st, p, "D", 2))
        if m in (1, 2):
            changes.append((k, st, p * 1.10, "U", 1))
        if m == 2:
            changes.append((k, st, p * 1.20, "U", 2))
        if m == 3:
            changes.append((k + 100000000, "N", p, "I", 1))
    by_key = defaultdict(list)
    for k, st, p, op, seq in changes:
        by_key[k].append((seq, op, st, p))
    expected = {}
    for k, vers in by_key.items():
        vers.sort()
        for i, (seq, op, st, p) in enumerate(vers):
            if op == "D":
                continue
            valid_to = vers[i + 1][0] if i + 1 < len(vers) else None
            for probe in (1, 2):
                if seq <= probe and (valid_to is None or probe < valid_to):
                    expected[(probe, k)] = (st, p)
    got = {
        (r.probe_seq, r.o_orderkey): (r.o_orderstatus, r.o_totalprice)
        for r in _run(spark, "q_scd2_asof_lookup")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_embedding_neardup — sequential-fold float cosine, exact equality
# ---------------------------------------------------------------------------


def test_embedding_neardup_matches_literal_cosine(spark):
    base = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in _rows("embeddings", ["vec_id", "embedding"])
        if r["vec_id"] < 60
    }
    corpus = dict(base)
    for vid, emb in base.items():
        if vid % 3 == 0:
            corpus[vid + 1000] = [
                x + 0.01 * ((i % 5) - 2) for i, x in enumerate(emb)
            ]

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):  # sequential fold, matching both engines
            dot += x * y
        na = 0.0
        nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    ids = sorted(corpus)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = cos(corpus[a], corpus[b])
            if c > 0.8:
                expected[(a, b)] = c
    got = {
        (r.vec_a, r.vec_b): r.cos for r in _run(spark, "q_embedding_neardup")
    }
    assert got == expected
