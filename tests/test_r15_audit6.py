"""Round-15 twin-formula audit — batch 6 (r17-window pre-insurance).

Literal raw-parquet walks: the log2-histogram sketch (bin via exact
bit_length, the float-free third route), the Carter-Wegman count-min
cells, Gopher line rules, the token/quality/lang/fingerprint text
battery, the duplicate report, and full MERGE (CDC apply) semantics.
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

STOPWORDS = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"}


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


def _ws_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


# ---------------------------------------------------------------------------
# q_sketch_log_histogram — octave bins via exact integer bit_length
# ---------------------------------------------------------------------------


def test_log_histogram_matches_exact_bitlength_walk(spark):
    """bin = floor(log2(cents)) recomputed WITHOUT floats
    (c.bit_length() - 1) — proving the engines' double log2 never
    misbins an octave boundary on this data."""
    agg: dict[tuple[str, int], list] = defaultdict(
        lambda: [0, None, None, 0]
    )
    for r in _rows("lineitem", ["l_returnflag", "l_extendedprice"]):
        c = _cents(r["l_extendedprice"])
        b = -1 if c <= 0 else c.bit_length() - 1
        cell = agg[(r["l_returnflag"], b)]
        cell[0] += 1
        cell[1] = c if cell[1] is None or c < cell[1] else cell[1]
        cell[2] = c if cell[2] is None or c > cell[2] else cell[2]
        cell[3] += c
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        (r.l_returnflag, r.bin): (r.n, r.min_cents, r.max_cents, r.sum_cents)
        for r in _run(spark, "q_sketch_log_histogram")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_sketch_count_min — Carter-Wegman cells by hand
# ---------------------------------------------------------------------------


def test_count_min_matches_literal_hash_walk(spark):
    hashes = (
        (1103515245, 12345),
        (69069, 362437),
        (134775813, 1),
    )
    cells: Counter = Counter()
    for r in _rows("orders", ["o_custkey"]):
        key = r["o_custkey"]
        for row, (a, b) in enumerate(hashes):
            cells[(row, ((a * key + b) % 2147483647) % 256)] += 1
    got = {
        (r.row, r.col): r.n for r in _run(spark, "q_sketch_count_min")
    }
    assert got == dict(cells)


# ---------------------------------------------------------------------------
# q_curation_gopher_rules — MassiveText line rules by hand
# ---------------------------------------------------------------------------


def test_gopher_rules_matches_literal_walk(spark):
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        i, t = r["doc_id"], r["text"]
        s2 = t[50:80]
        line2 = (
            "- " + s2
            if i % 4 == 0
            else s2 + "..."
            if i % 4 == 1
            else s2
        )
        line3 = t[:50] if i % 5 == 0 else t[80:120]
        lines = [l for l in (t[:50], line2, line3) if l.strip()]
        toks = _ws_tokens("\n".join(lines)) if lines else []
        nl, nt = len(lines), len(toks)

        def fr(cnt):
            return math.floor(1000000.0 * cnt / nl) if nl else None

        bullet = fr(
            sum(1 for l in lines if l.startswith(("- ", "* ")))
        )
        ellipsis = fr(sum(1 for l in lines if l.endswith("...")))
        dup = (
            math.floor(1000000.0 * (1.0 - len(set(lines)) / nl))
            if nl
            else None
        )
        mwl = (
            math.floor(1000000.0 * sum(len(x) for x in toks) / nt)
            if nt
            else None
        )
        keep = (
            50 <= nt <= 100000
            and mwl is not None
            and 3000000 <= mwl <= 10000000
            and bullet <= 900000
            and ellipsis <= 300000
            and dup <= 300000
        )
        expected[i] = (nl, nt, bullet, ellipsis, dup, mwl, keep)
    got = {
        r.doc_id: (
            r.n_lines,
            r.n_tokens,
            r.bullet_frac_e6,
            r.ellipsis_frac_e6,
            r.dup_line_frac_e6,
            r.mean_word_len_e6,
            r.gopher_keep,
        )
        for r in _run(spark, "q_curation_gopher_rules")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# the C-extension text battery: token count / quality / lang / fingerprint
# ---------------------------------------------------------------------------


def test_token_count_matches_literal_walk(spark):
    expected = {
        r["doc_id"]: (len(_ws_tokens(r["text"])), len(r["text"]))
        for r in _rows("documents", ["doc_id", "text"])
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_chars)
        for r in _run(spark, "q_text_token_count")
    }
    assert got == expected


def test_quality_score_matches_literal_walk(spark):
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        toks = _ws_tokens(r["text"])
        if not toks:
            continue
        nc, nt = len(r["text"]), len(toks)
        ns = sum(1 for t in toks if t in STOPWORDS)
        cpt = nc / nt
        expected[r["doc_id"]] = (
            nc,
            nt,
            ns,
            ns / nt,
            cpt,
            10 <= nt <= 100000 and 3.0 <= cpt <= 12.0,
        )
    got = {
        r.doc_id: (
            r.n_chars,
            r.n_tokens,
            r.n_stopwords,
            r.stopword_ratio,
            r.chars_per_token,
            r.quality_ok,
        )
        for r in _run(spark, "q_text_quality_score")
    }
    assert got == expected


def test_lang_score_matches_literal_walk(spark):
    expected = {}
    for r in _rows("documents", ["doc_id", "lang", "text"]):
        toks = _ws_tokens(r["text"])
        if not toks:
            continue
        score = sum(1 for t in toks if t in STOPWORDS) / len(toks)
        expected[r["doc_id"]] = (r["lang"], score, score >= 0.05)
    got = {
        r.doc_id: (r.lang, r.en_score, r.looks_english)
        for r in _run(spark, "q_text_lang_score")
    }
    assert got == expected


def test_fingerprint_matches_literal_md5_walk(spark):
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        # trim() strips ASCII spaces only; \s mirrors the Java class
        norm = re.sub(
            r"[ \t\n\x0b\f\r]+", " ", r["text"].lower().strip(" ")
        )
        expected[r["doc_id"]] = hashlib.md5(norm.encode()).hexdigest()
    got = {
        r.doc_id: r.fingerprint for r in _run(spark, "q_text_fingerprint")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_dup_report — staged duplicate audit by hand
# ---------------------------------------------------------------------------


def test_dup_report_matches_literal_walk(spark):
    staged = []
    for r in _rows("documents", ["doc_id", "text"]):
        staged.append((r["doc_id"], r["text"]))
        if r["doc_id"] < 50:
            staged.append((r["doc_id"] + 1000, r["text"]))
    groups = defaultdict(list)
    for did, text in staged:
        groups[text].append(did)
    expected = {
        text: (len(ids), min(ids))
        for text, ids in groups.items()
        if len(ids) > 1
    }
    got = {
        r.text: (r.n_copies, r.first_doc_id)
        for r in _run(spark, "q_dup_report")
    }
    assert got == expected
    assert expected  # the staged copies fired


# ---------------------------------------------------------------------------
# q_merge_cdc_apply — full MERGE (I/U/D, latest-per-key) by hand
# ---------------------------------------------------------------------------


def test_merge_cdc_apply_matches_literal_walk(spark):
    orders = _rows(
        "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]
    )
    base = {
        r["o_orderkey"]: (r["o_orderstatus"], float(r["o_totalprice"]))
        for r in orders
    }
    changes = []  # (key, status, price, op, seq)
    for k, (st, p) in base.items():
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
    latest = {}
    for key, st, p, op, seq in changes:
        if key not in latest or seq > latest[key][3]:
            latest[key] = (st, p, op, seq)
    expected: Counter = Counter()
    for k, (st, p) in base.items():
        if k not in latest:
            expected[(k, st, p)] += 1
    for key, (st, p, op, _) in latest.items():
        if op != "D":
            expected[(key, st, p)] += 1
    got: Counter = Counter()
    for r in _run(spark, "q_merge_cdc_apply"):
        got[(r.o_orderkey, r.o_orderstatus, float(r.o_totalprice))] += 1
    assert got == expected
    # all three MERGE verbs fired
    assert any(k >= 100000000 for k, _, _ in expected)  # inserts
    deleted = {k for k, (_, _, op, _) in latest.items() if op == "D"}
    assert deleted and all(
        (k, *base[k]) not in expected for k in deleted
    )  # deletes removed the base rows
