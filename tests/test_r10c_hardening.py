"""Round-10 batch-10 law tests: staged-data first-principles checks
for the winnowing dedup tier, supplier concentration, repeat-purchase
latency, segment migration, Mann-Whitney, charset profile, boilerplate
snippets, k-fold split, and cluster balance (one law battery per new
declared query, mirroring the r10 discipline)."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from datawarehouse1_spark import registry
from tests.conftest import SF_DIR

registry.load_all()

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz,"
    " o_orderpriority string"
)

_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp_ntz"
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


# ------------------------------------------------------------ winnowing


def _ref_winnow(tokens: list[str], k: int = 3, w: int = 4) -> set[str]:
    """Independent pure-python winnowing (Schleimer et al.): 24-bit
    md5-prefix gram keys, rightmost-min per window — the spec the
    query must reproduce."""
    grams = [
        " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
    ]
    if not grams:
        return set()
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:6], 16) for g in grams
    ]
    out: set[str] = set()
    n = len(grams)
    for p in range(max(n - w + 1, 1)):
        win = list(range(p, min(p + w, n)))
        m = min(hs[j] for j in win)
        sel = max(j for j in win if hs[j] == m)  # rightmost min
        out.add(grams[sel])
    return out


def test_winnowing_matches_reference_implementation(spark, tmp_path):
    """The query's fingerprint pairs equal the pure-python winnowing
    reference computed from the same token streams: identical docs
    share ALL fingerprints (overlap exactly 1e6), partially
    overlapping docs share exactly |fp(a) ∩ fp(b)|, and disjoint-vocab
    docs never pair."""
    t1 = " ".join(f"w{i}" for i in range(30))
    # doc 2 = same 30 tokens (exact dup); doc 3 shares tokens 10..29
    t3 = " ".join(f"w{i}" for i in range(10, 30)) + " " + " ".join(
        f"x{i}" for i in range(10)
    )
    t4 = " ".join(f"z{i}" for i in range(30))
    docs = [
        (1, t1, "en", "s", 100),
        (2, t1, "en", "s", 100),
        (3, t3, "en", "s", 100),
        (4, t4, "en", "s", 100),
    ]
    _write(spark, tmp_path, "documents", docs, _DOCS_SCHEMA)
    out = registry.QUERIES["q_dedup_winnowing_fingerprint"](
        spark, str(tmp_path)
    ).collect()
    pairs = {(r.src_doc, r.dst_doc): r for r in out}
    fp = {
        i: _ref_winnow(t.split())
        for i, t in ((1, t1), (2, t1), (3, t3), (4, t4))
    }
    # exact dup: all fingerprints shared, overlap exactly 1e6
    r = pairs[(1, 2)]
    assert r.n_shared == len(fp[1]) == r.n_src_fp == r.n_dst_fp
    assert r.overlap_e6 == 1_000_000
    # partial overlap: the query's count equals the reference
    # intersection (when it clears the >= 3 reporting threshold)
    inter13 = len(fp[1] & fp[3])
    if inter13 >= 3:
        assert pairs[(1, 3)].n_shared == inter13
        assert pairs[(1, 3)].n_src_fp == len(fp[1])
        assert pairs[(1, 3)].n_dst_fp == len(fp[3])
    # disjoint vocab never pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs


def test_winnowing_guarantee_on_staged_excerpts(spark):
    """The winnowing locality guarantee, exercised on the real corpus:
    every staged 20-token excerpt (doc_id+30000, staged for doc_id % 5
    == 0 with >= 28 tokens) shares a >= 6-token run with its source,
    so it MUST pair with it (>= 3 shared fingerprints for a 20-token
    excerpt: at least one fingerprint per W consecutive windows)."""
    import re

    import duckdb

    out = registry.QUERIES["q_dedup_winnowing_fingerprint"](
        spark, SF_DIR
    ).collect()
    pairs = {(r.src_doc, r.dst_doc) for r in out}
    # EVERY qualifying staged excerpt (source has >= 28 tokens, so the
    # excerpt is the full 20 tokens and shares >= ceil(15/W)=4 >= 3
    # fingerprints) must pair with its source — the guarantee is
    # universal, not existential
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
        f" WHERE doc_id < 60 AND doc_id % 5 = 0"
    ).fetchall()
    expected = {
        (i, i + 30000)
        for i, t in texts
        if len([w for w in re.split(r"\s+", t.lower()) if w]) >= 28
    }
    assert expected, "staging produced no qualifying excerpt docs"
    missing = expected - pairs
    assert not missing, f"excerpts missing their source pair: {missing}"


# ------------------------------------------------------------------ hhi


def test_hhi_uniform_and_monopoly(spark, tmp_path):
    """HHI laws: n equal-revenue suppliers give hhi == 1e6 div n (and
    CR1 likewise); a single-supplier nation is exactly 1e6; n_eff
    inverts hhi."""
    d = datetime.datetime
    # nation 0: 4 suppliers, equal revenue; nation 1: monopoly
    suppliers = [(k, f"s{k}", 0 if k < 4 else 1, 0.0) for k in range(5)]
    _write(
        spark, tmp_path, "supplier", suppliers,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    _write(
        spark, tmp_path, "nation",
        [(0, "AAA", 0), (1, "BBB", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    li = [
        (k + 1, 1, k, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d(1995, 1, 1))
        for k in range(5)
    ]
    _write(spark, tmp_path, "lineitem", li, _LI_SCHEMA)
    out = {
        r.n_name: r
        for r in registry.QUERIES["q_supplier_concentration_hhi"](
            spark, str(tmp_path)
        ).collect()
    }
    a = out["AAA"]
    assert a.n_suppliers == 4
    assert a.hhi_e6 == 1_000_000 // 4 == 250_000
    assert a.cr1_e6 == 250_000
    assert a.n_eff_e3 == 1_000_000_000 // 250_000 == 4000
    b = out["BBB"]
    assert b.n_suppliers == 1
    assert b.hhi_e6 == 1_000_000 and b.cr1_e6 == 1_000_000
    assert b.n_eff_e3 == 1000


# -------------------------------------------------------- repeat interval


def test_repeat_interval_hand_computed(spark, tmp_path):
    """Hand-computed gaps: cust 1 orders on days 0/10/20 (gaps 10,10),
    cust 2 on days 0/30 (gap 30) — one segment: n=3, mean=50/3 in
    micro-days, median 10 (cum·2 >= 3 first at gap 10), p90 30
    (cum·10 >= 27 first at 30), max 30."""
    d = datetime.datetime
    orders = [
        (1, 1, "O", 10.0, d(1995, 1, 1), "1-URGENT"),
        (2, 1, "O", 10.0, d(1995, 1, 11), "1-URGENT"),
        (3, 1, "O", 10.0, d(1995, 1, 21), "1-URGENT"),
        (4, 2, "O", 10.0, d(1995, 1, 1), "1-URGENT"),
        (5, 2, "O", 10.0, d(1995, 1, 31), "1-URGENT"),
    ]
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    _write(
        spark, tmp_path, "customer",
        [(1, "c1", 0, 0.0, "SEG"), (2, "c2", 0, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    [r] = registry.QUERIES["q_orders_repeat_interval"](
        spark, str(tmp_path)
    ).collect()
    assert r.c_mktsegment == "SEG"
    assert r.n_gaps == 3
    assert r.mean_gap_e6 == 50 * 1_000_000 // 3
    assert r.median_gap_days == 10
    assert r.p90_gap_days == 30
    assert r.max_gap_days == 30


# ------------------------------------------------------------- migration


def test_migration_cells_and_share_closure(spark, tmp_path):
    """Staged moves: cust 1 low(1995)->high(1996); cust 2 present 1995
    only (churn row to 'none'); cust 3 present 1996 only (acquisition
    row from 'none' at year 1995).  Shares floor-close within each
    (year, from) group."""
    d = datetime.datetime
    orders = [
        # cust 1: 1995 total $100k (low), 1996 total $700k (high)
        (1, 1, "O", 100_000.0, d(1995, 3, 1), "1-URGENT"),
        (2, 1, "O", 700_000.0, d(1996, 3, 1), "1-URGENT"),
        # cust 2: 1995 only (mid band: $300k)
        (3, 2, "O", 300_000.0, d(1995, 5, 1), "1-URGENT"),
        # cust 3: 1996 only (low)
        (4, 3, "O", 100_000.0, d(1996, 7, 1), "1-URGENT"),
    ]
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    out = registry.QUERIES["q_orders_customer_migration"](
        spark, str(tmp_path)
    ).collect()
    cells = {(r.year_from, r.from_seg, r.to_seg): r.n_customers for r in out}
    assert cells[(1995, "low", "high")] == 1
    assert cells[(1995, "mid", "none")] == 1  # churn
    assert cells[(1995, "none", "low")] == 1  # acquisition
    # 1996 rows pair against (empty) 1997 -> both land in to='none'
    assert cells[(1996, "high", "none")] == 1
    assert cells[(1996, "low", "none")] == 1
    # share closure within each (year, from) row
    import collections

    groups = collections.defaultdict(list)
    for r in out:
        groups[(r.year_from, r.from_seg)].append(r)
    for rows in groups.values():
        total = sum(r.share_e6 for r in rows)
        assert 1_000_000 - len(rows) < total <= 1_000_000


# ----------------------------------------------------------- mann-whitney


def test_mann_whitney_u_identity_on_real_data(spark):
    """u2_a + u2_b == 2·n_a·n_b — the rank-sum conservation law."""
    [r] = registry.QUERIES["q_stats_mann_whitney"](spark, SF_DIR).collect()
    assert r.u2_a + r.u2_b == 2 * r.n_a * r.n_b
    assert 0 <= r.auc_a_e6 <= 1_000_000


def test_mann_whitney_hand_computed_with_ties(spark, tmp_path):
    """A = {$1, $2} (urgent), B = {$1} (low): pairs (1,1) tie = 1/2,
    (2,1) win = 1 -> U_A = 1.5, u2_a = 3, u2_b = 1,
    auc = 3e6 // 4 = 750000."""
    d = datetime.datetime
    orders = [
        (1, 1, "O", 1.0, d(1995, 1, 1), "1-URGENT"),
        (2, 1, "O", 2.0, d(1995, 1, 2), "2-HIGH"),
        (3, 2, "O", 1.0, d(1995, 1, 3), "5-LOW"),
    ]
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    [r] = registry.QUERIES["q_stats_mann_whitney"](
        spark, str(tmp_path)
    ).collect()
    assert (r.n_a, r.n_b) == (2, 1)
    assert r.u2_a == 3 and r.u2_b == 1
    assert r.auc_a_e6 == 750_000


def test_mann_whitney_symmetric_halves(spark, tmp_path):
    """Identical value multisets in A and B -> u2_a == u2_b and
    auc exactly 500000."""
    d = datetime.datetime
    orders = []
    for i, price in enumerate((10.0, 20.0, 30.0)):
        orders.append(
            (2 * i, 1, "O", price, d(1995, 1, 1), "1-URGENT")
        )
        orders.append(
            (2 * i + 1, 1, "O", price, d(1995, 1, 1), "5-LOW")
        )
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    [r] = registry.QUERIES["q_stats_mann_whitney"](
        spark, str(tmp_path)
    ).collect()
    assert r.u2_a == r.u2_b
    assert r.auc_a_e6 == 500_000


# --------------------------------------------------------------- charset


def test_charset_hand_computed(spark, tmp_path):
    """'abc 12 世界 мир.' = 3 alpha + 2 digit + 3 space + 2 CJK +
    3 Cyrillic + 1 other of 14 chars; doc_id avoids the %7 staging."""
    docs = [(1, "abc 12 世界 мир.", "en", "s", 14)]
    _write(spark, tmp_path, "documents", docs, _DOCS_SCHEMA)
    [r] = registry.QUERIES["q_text_charset_profile"](
        spark, str(tmp_path)
    ).collect()
    assert r.n_chars == 14
    assert r.alpha_e6 == 3 * 1_000_000 // 14
    assert r.digit_e6 == 2 * 1_000_000 // 14
    assert r.space_e6 == 3 * 1_000_000 // 14
    assert r.cjk_e6 == 2 * 1_000_000 // 14
    assert r.cyr_e6 == 3 * 1_000_000 // 14
    assert r.other_e6 == 1 * 1_000_000 // 14


def test_charset_closure_on_real_data(spark):
    """The six classes partition every character: floored shares sum
    into (1e6 - 6, 1e6] per source."""
    out = registry.QUERIES["q_text_charset_profile"](spark, SF_DIR).collect()
    assert out
    for r in out:
        s = (
            r.alpha_e6 + r.digit_e6 + r.space_e6
            + r.cjk_e6 + r.cyr_e6 + r.other_e6
        )
        assert 1_000_000 - 6 < s <= 1_000_000, r


# ------------------------------------------------------------ boilerplate


def test_boilerplate_detects_staged_header_and_footer(spark, tmp_path):
    """10 docs in one source: 4 share a 5-token header (40% >= 10%,
    n >= 3 -> reported); the %3-staged footer lands on >= 3 docs ->
    reported; a header shared by only 2 docs is NOT reported."""
    common = "alpha beta gamma delta epsilon"
    docs = []
    for i in range(1, 11):
        if i <= 4:
            body = f"{common} body{i} " + " ".join(
                f"t{i}{j}" for j in range(8)
            )
        else:
            body = f"head{i} h2{i} h3{i} h4{i} h5{i} " + " ".join(
                f"t{i}{j}" for j in range(8)
            )
        docs.append((i, body, "en", "s", len(body)))
    _write(spark, tmp_path, "documents", docs, _DOCS_SCHEMA)
    out = registry.QUERIES["q_curation_boilerplate_snippets"](
        spark, str(tmp_path)
    ).collect()
    rows = {(r.kind, r.snippet): r for r in out}
    hdr = rows[("header", common)]
    assert hdr.n_docs == 4 and hdr.share_e6 == 400_000
    # doc_ids 3, 6, 9 get the staged footer -> its 5 tokens are their
    # last-5 window exactly
    foot = rows[("footer", "subscribe to our newsletter today")]
    assert foot.n_docs == 3 and foot.share_e6 == 300_000
    # two-doc headers never report (threshold n >= 3)
    assert all(r.n_docs >= 3 for r in out)


# ----------------------------------------------------------------- kfold


def test_kfold_closure_and_determinism(spark):
    """Folds partition the corpus (cell counts sum to |documents|),
    fold ids are 0..4, shares close within each lang, and a second
    run is bit-identical (pure function of identity)."""
    import duckdb

    fn = registry.QUERIES["q_split_kfold_assign"]
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b
    n_total = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r[2] for r in a) == n_total
    assert {r[0] for r in a} <= {0, 1, 2, 3, 4}
    import collections

    langs = collections.defaultdict(int)
    for r in a:
        langs[r[1]] += r[4]
    for lang, s in langs.items():
        assert 1_000_000 - 5 < s <= 1_000_000, (lang, s)


# -------------------------------------------------------- cluster balance


def test_cluster_balance_staged_geometry(spark, tmp_path):
    """Vectors placed exactly AT centroids have zero inertia and
    balanced counts; an equidistant vector ties to the LOWER centroid
    id."""
    d = 4
    rows = []
    # 8 centroids along axis 0 at 10*i, plus one extra member each
    for i in range(8):
        v = [0.0] * d
        v[0] = 10.0 * i
        rows.append((i, v, i))
        rows.append((100 + i, list(v), i))
    # equidistant between centroid 0 (at 0) and centroid 1 (at 10)
    eq = [0.0] * d
    eq[0] = 5.0
    rows.append((200, eq, 0))
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r.cluster_id: r
        for r in registry.QUERIES["q_embedding_cluster_balance"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == set(range(8))
    # tie goes to cluster 0: it holds centroid + member + the tie vector
    assert out[0].n_vecs == 3
    for cid in range(1, 8):
        assert out[cid].n_vecs == 2
        assert out[cid].inertia_mean_q == 0
    # cluster 0 inertia = tie vector's exact quantized distance / 3
    assert out[0].inertia_mean_q == (5_000_000 ** 2) // 3
    # shares floor-close
    total = sum(r.share_e6 for r in out.values())
    assert 1_000_000 - 8 < total <= 1_000_000


# ---------------------------------------------------------- kendall tau


def test_kendall_tau_identical_and_reversed_rankings(spark, tmp_path):
    """tau == 1.0 when the two years rank nations identically,
    -1.0 when exactly reversed; C + D == n(n-1)/2 always."""
    d = datetime.datetime
    _write(
        spark, tmp_path, "nation",
        [(i, f"N{i}", 0) for i in range(3)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    _write(
        spark, tmp_path, "customer",
        [(i, f"c{i}", i, 0.0, "S") for i in range(3)],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    # reversed: nation 0 biggest in 1995, smallest in 1996
    orders = []
    for i in range(3):
        orders.append(
            (10 + i, i, "O", 100.0 * (3 - i), d(1995, 2, 1), "1-URGENT")
        )
        orders.append(
            (20 + i, i, "O", 100.0 * (i + 1), d(1996, 2, 1), "1-URGENT")
        )
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    [r] = registry.QUERIES["q_stats_kendall_tau"](
        spark, str(tmp_path)
    ).collect()
    assert r.n_entities == 3 and r.n_pairs == 3
    assert r.concordant == 0 and r.discordant == 3
    assert r.tau == -1.0
    # identical rankings -> tau == 1.0
    orders2 = []
    for i in range(3):
        for y in (1995, 1996):
            orders2.append(
                (100 * y + i, i, "O", 100.0 * (3 - i), d(y, 2, 1), "1-URGENT")
            )
    _write(spark, tmp_path, "orders", orders2, _ORDERS_SCHEMA)
    [r2] = registry.QUERIES["q_stats_kendall_tau"](
        spark, str(tmp_path)
    ).collect()
    assert r2.tau == 1.0 and r2.concordant == 3 and r2.discordant == 0


def test_kendall_tau_pair_conservation_on_real_data(spark):
    [r] = registry.QUERIES["q_stats_kendall_tau"](spark, SF_DIR).collect()
    assert r.concordant + r.discordant == r.n_pairs
    assert r.n_pairs == r.n_entities * (r.n_entities - 1) // 2
    assert -1.0 <= r.tau <= 1.0


# ------------------------------------------------------------- abc parts


def test_abc_parts_minimality_and_closure(spark):
    """A covers >= 80% of revenue (floored share >= 799999 is the
    minimal-prefix guarantee at value granularity); A+B covers >= 95%;
    classes partition parts and revenue."""
    rows = {
        r.abc_class: r
        for r in registry.QUERIES["q_orders_abc_parts"](
            spark, SF_DIR
        ).collect()
    }
    total_mass = sum(r.mass_e4 for r in rows.values())
    a = rows["A"].mass_e4
    assert a * 5 >= total_mass * 4  # >= 80%
    if "B" in rows:
        assert (a + rows["B"].mass_e4) * 20 >= total_mass * 19  # >= 95%
    shares = sum(r.share_e6 for r in rows.values())
    assert 1_000_000 - len(rows) < shares <= 1_000_000


def test_abc_parts_hand_computed(spark, tmp_path):
    """4 parts with revenue 70/20/6/4: A = {70, 20} (70 alone is only
    70% < 80), B = {6} (90 -> 96%), C = {4}."""
    d = datetime.datetime
    li = []
    for pk, price in ((1, 70.0), (2, 20.0), (3, 6.0), (4, 4.0)):
        li.append(
            (pk, pk, 1, 1, 1.0, price, 0.0, 0.0, "N", "O", d(1995, 1, 1))
        )
    _write(spark, tmp_path, "lineitem", li, _LI_SCHEMA)
    rows = {
        r.abc_class: r
        for r in registry.QUERIES["q_orders_abc_parts"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["A"].n_parts == 2 and rows["A"].mass_e4 == 900_000
    assert rows["B"].n_parts == 1 and rows["B"].mass_e4 == 60_000
    assert rows["C"].n_parts == 1 and rows["C"].mass_e4 == 40_000
    assert rows["A"].share_e6 == 900_000
    assert rows["B"].share_e6 == 60_000
    assert rows["C"].share_e6 == 40_000


# -------------------------------------------------------------- user gini


def test_user_type_gini_hand_computed(spark, tmp_path):
    """Single-type user -> gini 0; uniform over 4 types -> exactly
    750000; 2 types at 3:1 -> 1 - (9+1)/16 = 375000."""
    d = datetime.datetime
    events = []
    eid = 0
    for _ in range(5):
        eid += 1
        events.append((eid, d(2024, 1, 1, eid), 1, "click", 0.0, "{}"))
    for t in ("a", "b", "c", "d"):
        eid += 1
        events.append((eid, d(2024, 1, 1, 0, eid), 2, t, 0.0, "{}"))
    for t in ("x", "x", "x", "y"):
        eid += 1
        events.append((eid, d(2024, 1, 1, 0, 0, eid), 3, t, 0.0, "{}"))
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    out = {
        r.user_id: r
        for r in registry.QUERIES["q_events_user_type_gini"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1].gini_e6 == 0 and out[1].n_types == 1
    assert out[2].gini_e6 == 750_000 and out[2].n_types == 4
    assert out[3].gini_e6 == 375_000 and out[3].n_events == 4


# ---------------------------------------------------------- ngram leakage


def test_ngram_leakage_staged_copy_detected(spark, tmp_path):
    """A holdout doc that is an exact copy of a train doc leaks; a
    holdout doc with a fresh 10-token vocabulary does not.  Split
    membership is derived from the SAME md5 rule the query uses."""
    import hashlib as h

    def split_of(doc_id: int) -> str:
        p = h.md5(str(doc_id).encode()).hexdigest()[:8]
        return "train" if p < "e6666666" else ("val" if p < "f3333333" else "test")

    # find a train id and a holdout id (odd, so the %2 staging doesn't
    # add copies of them)
    train_id = next(i for i in range(1, 500, 2) if split_of(i) == "train")
    hold_id = next(i for i in range(1, 500, 2) if split_of(i) != "train")
    clean_id = next(
        i for i in range(hold_id + 2, 900, 2) if split_of(i) != "train"
    )
    shared = " ".join(f"tok{j}" for j in range(12))
    fresh = " ".join(f"zzz{j}" for j in range(12))
    docs = [
        (train_id, shared, "en", "s", 10),
        (hold_id, shared, "en", "s", 10),
        (clean_id, fresh, "en", "s", 10),
    ]
    _write(spark, tmp_path, "documents", docs, _DOCS_SCHEMA)
    out = {
        r.split: r
        for r in registry.QUERIES["q_split_ngram_leakage"](
            spark, str(tmp_path)
        ).collect()
    }
    leaked = sum(r.n_leaked for r in out.values())
    n_docs = sum(r.n_docs for r in out.values())
    # hold_id leaks (shares all windows with train_id); clean does not
    assert leaked == 1, out
    assert n_docs == 2
    for r in out.values():
        assert 0 <= r.leak_share_e6 <= 1_000_000


# ------------------------------------------------------------- daily acf


def test_autocorr_constant_and_alternating_series(spark, tmp_path):
    """A perfectly alternating daily series has acf(1) == -1 and
    acf(2) == +1 exactly; a linearly increasing series has acf
    exactly 1.0 at every lag (Pearson of a linear map); pair counts
    shrink by one per lag over a contiguous range."""
    d = datetime.datetime
    events = []
    eid = 0
    # alternating 2/4 events per day over 14 days
    for day in range(14):
        n = 2 if day % 2 == 0 else 4
        for j in range(n):
            eid += 1
            events.append(
                (eid, d(2024, 1, 1 + day, 5, j), 1, "click", 0.0, "{}")
            )
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    out = {
        r.lag_days: r
        for r in registry.QUERIES["q_events_autocorr_daily"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1].acf == -1.0 and out[2].acf == 1.0
    assert out[1].n_pairs == 13 and out[7].n_pairs == 7
    # linear ramp: 1,2,...,10 events per day -> acf exactly 1.0
    events2 = []
    eid = 0
    for day in range(10):
        for j in range(day + 1):
            eid += 1
            events2.append(
                (eid, d(2024, 2, 1 + day, 5, 0, j), 1, "click", 0.0, "{}")
            )
    _write(
        spark, tmp_path, "events", events2,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    out2 = {
        r.lag_days: r.acf
        for r in registry.QUERIES["q_events_autocorr_daily"](
            spark, str(tmp_path)
        ).collect()
    }
    assert all(v == 1.0 for v in out2.values()), out2


# --------------------------------------------------------------- oov rate


def test_oov_rate_hand_computed_vocab_boundary(spark, tmp_path):
    """With a vocabulary larger than the corpus' distinct tokens, OOV
    is zero everywhere; tokens outside the head count by OCCURRENCE;
    the per-source split is exact."""
    docs = [
        (1, "common common rare1", "en", "a", 10),
        (2, "common rare2 rare2 rare2", "en", "b", 10),
    ]
    _write(spark, tmp_path, "documents", docs, _DOCS_SCHEMA)
    out = {
        r.source: r
        for r in registry.QUERIES["q_docs_oov_rate"](
            spark, str(tmp_path)
        ).collect()
    }
    # 4 distinct tokens < vocab size 1000 -> nothing is OOV
    assert out["a"].n_oov == 0 and out["b"].n_oov == 0
    assert out["a"].n_tokens == 3 and out["b"].n_tokens == 4


def test_oov_closure_and_determinism_on_real_data(spark):
    """n_oov <= n_tokens, shares in range, and a second run is
    bit-identical (the vocabulary tie-break is a total order)."""
    fn = registry.QUERIES["q_docs_oov_rate"]
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b and a
    for (_, n_tokens, n_oov, share) in a:
        assert 0 <= n_oov <= n_tokens
        assert 0 <= share <= 1_000_000


# --------------------------------------------------------- time to convert


def test_time_to_convert_hand_computed(spark, tmp_path):
    """User 1: view at t0, purchase at t0+90s (1 min bucket) and a
    second purchase at t0+30min — both measure from the FIRST view.
    User 2: purchase with no prior view -> excluded."""
    d = datetime.datetime
    events = [
        (1, d(2024, 1, 1, 10, 0, 0), 1, "view", 0.0, "{}"),
        (2, d(2024, 1, 1, 10, 1, 30), 1, "purchase", 0.0, "{}"),
        (3, d(2024, 1, 1, 10, 30, 0), 1, "purchase", 0.0, "{}"),
        (4, d(2024, 1, 1, 11, 0, 0), 2, "purchase", 0.0, "{}"),
    ]
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    [r] = registry.QUERIES["q_events_time_to_convert"](
        spark, str(tmp_path)
    ).collect()
    assert r.n_conversions == 2
    # latencies: 90s and 1800s -> mean = (90 + 1800) * 1e6 // 2
    assert r.mean_latency_us == (90 + 1800) * 1_000_000 // 2
    assert r.median_latency_min == 1  # 90s -> minute bucket 1
    assert r.p90_latency_min == 30
    assert r.max_latency_min == 30


# ---------------------------------------------------------------- runs test


def test_runs_test_alternating_and_monotone(spark, tmp_path):
    """A strictly alternating series has the maximum run count
    (R == n, z > 0); a strictly monotone series has n_down == 0 and a
    single run; ties (equal consecutive days) drop out."""
    d = datetime.datetime
    # counts: 2,4,2,4,2,4,2,4 -> signs +,-,+,-,+,-,+ (7 signs, 7 runs)
    events = []
    eid = 0
    for day in range(8):
        n = 2 if day % 2 == 0 else 4
        for j in range(n):
            eid += 1
            events.append(
                (eid, d(2024, 3, 1 + day, 1, j), 1, "click", 0.0, "{}")
            )
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    [r] = registry.QUERIES["q_stats_runs_test"](
        spark, str(tmp_path)
    ).collect()
    assert (r.n_up, r.n_down) == (4, 3)
    assert r.n_runs == 7  # every change flips sign
    assert r.z > 0
    # monotone ramp 1..6 -> all ups, one run
    events2 = []
    eid = 0
    for day in range(6):
        for j in range(day + 1):
            eid += 1
            events2.append(
                (eid, d(2024, 4, 1 + day, 1, 0, j), 1, "click", 0.0, "{}")
            )
    _write(
        spark, tmp_path, "events", events2,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    [r2] = registry.QUERIES["q_stats_runs_test"](
        spark, str(tmp_path)
    ).collect()
    assert (r2.n_up, r2.n_down, r2.n_runs) == (5, 0, 1)
    assert r2.z is None  # zero null variance -> nothing to standardize


# ------------------------------------------------------------------- gini


def test_gini_equality_and_hand_computed(spark, tmp_path):
    """Equal spenders -> gini exactly 0; the 4-customer case
    (10, 20, 30, 40 dollars) hand-computes to
    G = (2*(1*1000+2*2000+3*3000+4*4000) - 5*10000) / (4*10000)
      = (60000 - 50000) / 40000 = 0.25 -> 250000e-6."""
    d = datetime.datetime
    orders = [
        (i, i, "O", 100.0, d(1995, 1, 1), "1-URGENT") for i in range(1, 5)
    ]
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    [r] = registry.QUERIES["q_orders_gini_coefficient"](
        spark, str(tmp_path)
    ).collect()
    assert r.gini_e6 == 0 and r.n_customers == 4
    orders2 = [
        (i, i, "O", 10.0 * i, d(1995, 1, 1), "1-URGENT")
        for i in range(1, 5)
    ]
    _write(spark, tmp_path, "orders", orders2, _ORDERS_SCHEMA)
    [r2] = registry.QUERIES["q_orders_gini_coefficient"](
        spark, str(tmp_path)
    ).collect()
    assert r2.gini_e6 == 250_000
    assert r2.total_cents == 10000


def test_gini_in_range_on_real_data(spark):
    [r] = registry.QUERIES["q_orders_gini_coefficient"](
        spark, SF_DIR
    ).collect()
    assert 0 <= r.gini_e6 < 1_000_000


# -------------------------------------------------------------- theil-sen


def test_theil_sen_exact_on_linear_and_robust_to_outlier(spark, tmp_path):
    """A clean linear monthly ramp (slope exactly $100/month = 1e10
    micro-cents) yields that exact median slope; corrupting ONE month
    10x leaves the median UNCHANGED (the robustness the OLS twin does
    not have)."""
    d = datetime.datetime
    orders = [
        (m, 1, "O", 1000.0 + 100.0 * m, d(1995, 1 + m, 1), "1-URGENT")
        for m in range(6)
    ]
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    [r] = registry.QUERIES["q_orders_theil_sen_trend"](
        spark, str(tmp_path)
    ).collect()
    assert r.n_months == 6 and r.n_pairs == 15
    assert r.median_slope_e6 == 100 * 100 * 1_000_000  # $100 in micro-cents
    # corrupt one interior month 10x
    orders2 = [
        (m, 1, "O",
         (1000.0 + 100.0 * m) * (10 if m == 3 else 1),
         d(1995, 1 + m, 1), "1-URGENT")
        for m in range(6)
    ]
    _write(spark, tmp_path, "orders", orders2, _ORDERS_SCHEMA)
    [r2] = registry.QUERIES["q_orders_theil_sen_trend"](
        spark, str(tmp_path)
    ).collect()
    assert r2.median_slope_e6 == 100 * 100 * 1_000_000


# --------------------------------------------------------- retention plan


def test_retention_plan_classes_and_boundary_law(spark):
    """Month partitioning + a mid-month cutoff: every partition left of
    the cutoff month drops whole, every one right of it keeps whole,
    and EXACTLY the cutoff month rewrites; counts close
    (n_expired <= n_rows; survivor share floors)."""
    out = registry.QUERIES["q_layout_retention_plan"](
        spark, SF_DIR
    ).collect()
    rewrites = [r for r in out if r.action == "rewrite"]
    assert len(rewrites) == 1
    assert str(rewrites[0].part_month) == "1996-07-01"
    for r in out:
        assert 0 <= r.n_expired <= r.n_rows
        if r.action == "drop_partition":
            assert r.n_expired == r.n_rows and r.survivor_share_e6 == 0
        if r.action == "keep":
            assert r.n_expired == 0 and r.survivor_share_e6 == 1_000_000
        if r.action == "rewrite":
            assert 0 < r.n_expired < r.n_rows


# ------------------------------------------------ review-round-2 corners


def test_autocorr_constant_series_yields_null_not_crash(spark, tmp_path):
    """Zero variance at a lag (constant daily counts, or a single
    pair) must yield acf NULL — identically in both engines — never a
    raised DIVIDE_BY_ZERO (rule 27; reproduced by the second review
    round before the fix)."""
    d = datetime.datetime
    events = []
    eid = 0
    for day in range(9):
        for j in range(3):  # constant 3/day
            eid += 1
            events.append(
                (eid, d(2024, 5, 1 + day, 1, j), 1, "click", 0.0, "{}")
            )
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    out = registry.QUERIES["q_events_autocorr_daily"](
        spark, str(tmp_path)
    ).collect()
    assert out and all(r.acf is None for r in out)


def test_runs_test_single_sign_yields_null_z(spark, tmp_path):
    """Exactly one usable sign makes even the variance DENOMINATOR
    zero (n(n-1) == 0) — z must be NULL, not a crash."""
    d = datetime.datetime
    events = [
        (1, d(2024, 6, 1, 1, 0), 1, "c", 0.0, "{}"),
        (2, d(2024, 6, 2, 1, 0), 1, "c", 0.0, "{}"),
        (3, d(2024, 6, 2, 1, 1), 1, "c", 0.0, "{}"),
    ]
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    [r] = registry.QUERIES["q_stats_runs_test"](
        spark, str(tmp_path)
    ).collect()
    assert r.n_runs == 1 and r.z is None


def test_gini_zero_total_revenue_yields_null(spark, tmp_path):
    """All-zero order totals give sx == 0: gini must be NULL in both
    engines (NULLIF), never a raised division error."""
    d = datetime.datetime
    orders = [(1, 1, "O", 0.0, d(1995, 1, 1), "1-URGENT")]
    _write(spark, tmp_path, "orders", orders, _ORDERS_SCHEMA)
    [r] = registry.QUERIES["q_orders_gini_coefficient"](
        spark, str(tmp_path)
    ).collect()
    assert r.gini_e6 is None and r.total_cents == 0


# ------------------------------------------------------------- xyz parts


def test_xyz_constant_and_erratic_demand(spark, tmp_path):
    """Constant monthly demand -> X (cv 0); demand 10/10/10/70 ->
    cv² = (4*5200-10000)/10000... computed exactly: n=4, s=100,
    ss=5800 -> var_num = 4*5800 - 10000 = 13200 > s² = 10000 -> Z;
    mild 10/12/10/12 -> X."""
    d = datetime.datetime
    li = []
    lk = 0
    for m, q in enumerate((5.0, 5.0, 5.0, 5.0)):       # part 1: X
        lk += 1
        li.append((lk, 1, 1, 1, q, 1.0, 0.0, 0.0, "N", "O", d(1995, 1 + m, 1)))
    for m, q in enumerate((10.0, 10.0, 10.0, 70.0)):   # part 2: Z
        lk += 1
        li.append((lk, 2, 1, 1, q, 1.0, 0.0, 0.0, "N", "O", d(1995, 1 + m, 1)))
    for m, q in enumerate((10.0, 12.0, 10.0, 12.0)):   # part 3: X
        lk += 1
        li.append((lk, 3, 1, 1, q, 1.0, 0.0, 0.0, "N", "O", d(1995, 1 + m, 1)))
    _write(spark, tmp_path, "lineitem", li, _LI_SCHEMA)
    out = {
        r.xyz_class: r.n_parts
        for r in registry.QUERIES["q_orders_xyz_parts"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out.get("X") == 2 and out.get("Z") == 1


# ------------------------------------------------------------ bot verdict


def test_bot_verdict_flags_staged_bot_and_clears_human(spark, tmp_path):
    """A scripted user (one type, exact 60 s timer, all at night, one
    day) trips every rule; a diverse daytime multi-day user trips
    none."""
    d = datetime.datetime
    events = []
    eid = 0
    # bot: 30 clicks, exactly 60 s apart, 01:00-01:29, one day
    for j in range(30):
        eid += 1
        events.append(
            (eid, d(2024, 1, 1, 1, 0, 0) + datetime.timedelta(seconds=60 * j),
             1, "click", 0.0, "{}")
        )
    # human: 30 events, 3 types, spread over 10 days at noon with
    # irregular gaps
    for j in range(30):
        eid += 1
        events.append(
            (eid,
             d(2024, 2, 1 + j % 10, 12, (7 * j * j + 3 * j) % 60, j % 60),
             2, ("view", "click", "purchase")[j % 3], 0.0, "{}")
        )
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    out = {
        r.user_id: r
        for r in registry.QUERIES["q_events_bot_verdict"](
            spark, str(tmp_path)
        ).collect()
    }
    bot, human = out[1], out[2]
    assert bot.single_minded and bot.nocturnal and bot.bursty
    assert bot.metronomic and bot.bot_verdict
    assert bot.gini_e6 == 0
    assert not human.bot_verdict
    assert not (human.single_minded or human.nocturnal
                or human.bursty or human.metronomic)


def test_bot_verdict_single_event_user_is_not_metronomic(spark, tmp_path):
    """A user with no gaps (one event) gets metronomic FALSE, never
    NULL (the COALESCE convention), and no verdict."""
    d = datetime.datetime
    events = [(1, d(2024, 1, 1, 12, 0), 1, "view", 0.0, "{}")]
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    [r] = registry.QUERIES["q_events_bot_verdict"](
        spark, str(tmp_path)
    ).collect()
    assert r.metronomic is False and r.bot_verdict is False


# ---------------------------------------------------------- cluster purity


def test_cluster_purity_staged_geometry(spark, tmp_path):
    """Members placed exactly at their centroid with one shared label
    give purity exactly 1e6; a mixed cluster (2 of label 9, 1 of label
    3) reports majority 9 at floor(2e6/3); counts close."""
    d = 4
    rows = []
    for i in range(8):
        v = [0.0] * d
        v[0] = 10.0 * i
        rows.append((i, v, 7))            # centroid itself, label 7
        rows.append((100 + i, list(v), 7))  # pure member
    # cluster 2 gets two extra label-9 members and the centroid+member
    # are label 7 -> counts: {7: 2, 9: 2} -> tie -> majority label 7
    v2 = [0.0] * d
    v2[0] = 20.0
    rows.append((200, list(v2), 9))
    rows.append((201, list(v2), 9))
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r.cluster_id: r
        for r in registry.QUERIES["q_embedding_cluster_purity"](
            spark, str(tmp_path)
        ).collect()
    }
    for cid in (0, 1, 3, 4, 5, 6, 7):
        assert out[cid].purity_e6 == 1_000_000
        assert out[cid].majority_label == 7
    c2 = out[2]
    assert c2.n_members == 4
    # tie between labels 7 and 9 breaks LOW
    assert c2.majority_label == 7 and c2.n_majority == 2
    assert c2.purity_e6 == 500_000
    assert sum(r.n_members for r in out.values()) == len(rows)
