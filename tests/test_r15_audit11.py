"""Round-15 twin-formula audit — batch 11 (r18-window pre-insurance).

Literal raw-parquet walks for the profiling/discovery family:
inclusion dependencies (set algebra), candidate keys (tuple counting),
functional dependencies (determinant→dependent fan-out), and the
per-brand OLS price elasticity (exact integer co-moments).
"""

from __future__ import annotations

from collections import Counter, defaultdict

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


# ---------------------------------------------------------------------------
# q_profile_ind_discovery — candidate join arcs by set algebra
# ---------------------------------------------------------------------------


def test_ind_discovery_matches_literal_set_walk(spark):
    cands = (
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("events", "user_id", "customer", "c_custkey"),
        ("part", "p_size", "nation", "n_nationkey"),
    )
    expected = {}
    for ct, cc, pt, pc in cands:
        child = {
            int(r[cc]) for r in _rows(ct, [cc]) if r[cc] is not None
        }
        parent = {
            int(r[pc]) for r in _rows(pt, [pc]) if r[pc] is not None
        }
        missing = len(child - parent)
        expected[f"{ct}.{cc} -> {pt}.{pc}"] = (
            len(child),
            missing,
            1 if missing == 0 else 0,
        )
    got = {
        r.dependency: (r.n_values, r.n_missing, r.holds)
        for r in _run(spark, "q_profile_ind_discovery")
    }
    assert got == expected
    verdicts = {v[2] for v in expected.values()}
    assert verdicts == {0, 1}  # both positives and negatives live


# ---------------------------------------------------------------------------
# q_profile_key_discovery — tuple uniqueness by hand
# ---------------------------------------------------------------------------


def test_key_discovery_matches_literal_walk(spark):
    cands = (
        ("orders", ("o_orderkey",)),
        ("orders", ("o_custkey",)),
        ("orders", ("o_custkey", "o_orderdate")),
        ("lineitem", ("l_orderkey",)),
        ("lineitem", ("l_orderkey", "l_linenumber")),
        ("lineitem", ("l_partkey", "l_suppkey")),
        ("customer", ("c_custkey",)),
        ("events", ("event_id",)),
        ("events", ("user_id", "ts")),
        ("documents", ("doc_id",)),
    )
    expected = {}
    for tbl, cols in cands:
        cnt = Counter(
            tuple(r[c] for c in cols) for r in _rows(tbl, list(cols))
        )
        n_rows = sum(cnt.values())
        n_keys = len(cnt)
        expected[(tbl, ", ".join(cols))] = (
            n_rows,
            n_keys,
            n_rows - n_keys,
            1 if n_rows == n_keys else 0,
        )
    got = {
        (r.table_name, r.key_cols): (r.n_rows, r.n_keys, r.n_dup_rows, r.is_key)
        for r in _run(spark, "q_profile_key_discovery")
    }
    assert got == expected
    assert {v[3] for v in expected.values()} == {0, 1}


# ---------------------------------------------------------------------------
# q_profile_fd_discovery — determinant fan-out by hand
# ---------------------------------------------------------------------------


def test_fd_discovery_matches_literal_walk(spark):
    cases = (
        ("orders", ("o_orderkey",), "o_custkey"),
        ("orders", ("o_custkey",), "o_orderpriority"),
        ("customer", ("c_custkey",), "c_mktsegment"),
        ("customer", ("c_mktsegment",), "c_nationkey"),
        ("lineitem", ("l_orderkey", "l_linenumber"), "l_partkey"),
        ("lineitem", ("l_partkey",), "l_suppkey"),
    )
    expected = {}
    for tbl, det, dep in cases:
        groups = defaultdict(set)
        for r in _rows(tbl, list(det) + [dep]):
            groups[tuple(r[c] for c in det)].add(r[dep])
        n_det = len(groups)
        n_pairs = sum(len(s) for s in groups.values())
        viol = sum(1 for s in groups.values() if len(s) > 1)
        expected[(tbl, "+".join(det), dep)] = (
            n_det,
            n_pairs,
            viol,
            viol == 0,
        )
    got = {
        (r.tbl, r.det, r.dep): (r.n_det, r.n_pairs, r.n_violating_dets, r.holds)
        for r in _run(spark, "q_profile_fd_discovery")
    }
    assert got == expected
    assert {v[3] for v in expected.values()} == {True, False}


# ---------------------------------------------------------------------------
# q_orders_price_elasticity — grouped OLS co-moments by hand
# ---------------------------------------------------------------------------


def test_price_elasticity_matches_literal_ols_walk(spark):
    brand_of = {
        r["p_partkey"]: r["p_brand"]
        for r in _rows("part", ["p_partkey", "p_brand"])
    }
    mom = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in _rows("lineitem", ["l_partkey", "l_discount", "l_quantity"]):
        x = _cents(r["l_discount"])
        y = _cents(r["l_quantity"])
        m = mom[brand_of[r["l_partkey"]]]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * y
        m[4] += x * x
        m[5] += y * y
    expected = {}
    for brand, (n, sx, sy, sxy, sxx, syy) in mom.items():
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        deny = n * syy - sy * sy
        slope = float(num) / float(den) if den else None
        intercept = float(sy * sxx - sx * sxy) / float(den) if den else None
        r2 = (
            (float(num) * float(num)) / (float(den) * float(deny))
            if den and deny
            else None
        )
        expected[brand] = (n, slope, intercept, r2)
    got = {
        r.p_brand: (r.n_lines, r.slope, r.intercept, r.r2)
        for r in _run(spark, "q_orders_price_elasticity")
    }
    assert got == expected
