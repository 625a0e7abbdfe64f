"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 6: the r8-vintage
window members with formula substance.

The reconciliation checksum twin is the deepest one here: it re-derives
the netstring canonicalization + md5 + hex15 + modular sum with
hashlib/stdlib — if the engines shared a canonicalization bug (framing
collision, hex parse off-by-one), the cross-engine hash could not catch
it, but this walk does.
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
MOD_P = (1 << 61) - 1


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


# ---------------------------------------------------------------------------
# q_reconcile_checksums — hashlib md5 + netstring framing + modular sum
# ---------------------------------------------------------------------------

_CK_TABLES = {
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "region": ["r_regionkey", "r_name"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    "documents": ["doc_id", "lang", "source", "n_chars"],
}


def test_reconcile_checksums_match_hashlib_walk(spark):
    expected = {}
    for tbl, cols in _CK_TABLES.items():
        total = 0
        rows = _rows(tbl, cols)
        for r in rows:
            canon = "".join(
                "N" if r[c] is None else f"S{len(str(r[c]))}:{r[c]}"
                for c in cols
            )
            h = hashlib.md5(canon.encode()).hexdigest()
            total += int(h[:15], 16)
        expected[tbl] = (len(rows), total % MOD_P)
    got = {
        r.table_name: (r.n_rows, r.checksum)
        for r in _run(spark, "q_reconcile_checksums")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_stats_corr_matrix — textbook two-pass Pearson on integer cents
# ---------------------------------------------------------------------------


def test_corr_matrix_matches_textbook_pearson(spark):
    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    li = _rows("lineitem", list(cols))
    data = {c: [_cents(r[c]) for r in li] for c in cols}
    n = len(li)
    means = {c: sum(v) / n for c, v in data.items()}

    def corr(x, y):
        dx = [v - means[x] for v in data[x]]
        dy = [v - means[y] for v in data[y]]
        num = sum(a * b for a, b in zip(dx, dy))
        return num / math.sqrt(sum(a * a for a in dx) * sum(b * b for b in dy))

    for r in _run(spark, "q_stats_corr_matrix"):
        assert r.n_rows == n
        assert abs(r.corr6 - corr(r.col_x, r.col_y)) <= 2e-6


# ---------------------------------------------------------------------------
# q_stats_regression — numpy-free literal least squares per group
# ---------------------------------------------------------------------------


def test_regression_matches_literal_least_squares(spark):
    li = _rows("lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    groups = defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append(
            (_cents(r["l_quantity"]), _cents(r["l_extendedprice"]))
        )
    for r in _run(spark, "q_stats_regression"):
        pts = groups[r.l_returnflag]
        n = len(pts)
        assert r.n_rows == n
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        num = sum((x - mx) * (y - my) for x, y in pts)
        den = sum((x - mx) ** 2 for x, _ in pts)
        slope = num / den
        intercept = (my - slope * mx) / 100  # cents -> dollars
        assert abs(r.slope6 - slope) <= max(1e-4, 1e-7 * abs(slope))
        assert abs(r.intercept6 - intercept) <= max(
            1e-3, 1e-7 * abs(intercept)
        )


# ---------------------------------------------------------------------------
# q_text_char_gini — literal collision-probability diversity
# ---------------------------------------------------------------------------


def test_char_gini_matches_literal_counter(spark):
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        counts = Counter(r["text"] or "")
        if not counts:
            continue
        total = sum(counts.values())
        ssq = sum(c * c for c in counts.values())
        expected[r["doc_id"]] = (
            total,
            len(counts),
            math.floor((total * total - ssq) * 1000000.0 / (total * total)),
        )
    got = {
        r.doc_id: (r.n_chars_counted, r.distinct_chars, r.gini_e6)
        for r in _run(spark, "q_text_char_gini")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_bigram_novelty — literal bigram vocabulary walk
# ---------------------------------------------------------------------------


def test_bigram_novelty_matches_literal_vocab(spark):
    docs = _rows("documents", ["doc_id", "text"])
    bigrams = {}
    for r in docs:
        toks = [
            t for t in re.split(r"\s+", (r["text"] or "").lower()) if t
        ]
        if len(toks) >= 2:
            bigrams[r["doc_id"]] = [
                f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
            ]
    corpus = Counter(bg for bgs in bigrams.values() for bg in bgs)
    expected = {}
    for did, bgs in bigrams.items():
        novel = sum(1 for bg in bgs if corpus[bg] < 3)
        expected[did] = (
            len(bgs),
            novel,
            math.floor(novel * 1000000.0 / len(bgs)),
        )
    got = {
        r.doc_id: (r.n_bigrams, r.n_novel, r.novelty_e6)
        for r in _run(spark, "q_text_bigram_novelty")
    }
    assert got == expected
