"""Round-10 batch-4 law tests: staged-data first-principles checks for
the funnel, streak, hopping-window, backlog, trend, Benford,
readability, and hapax queries (one law battery per new declared query,
mirroring the r10 discipline in test_r10_hardening.py)."""

from __future__ import annotations

import datetime

from datawarehouse1_spark import registry

registry.load_all()

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


# ---------------------------------------------------------------- funnel


def test_funnel_ordered_step_semantics(spark, tmp_path):
    """Funnel laws on a staged stream: (a) a click BEFORE the user's
    first view does NOT qualify (and a purchase after that click
    doesn't either); (b) a click SIMULTANEOUS with the first view
    qualifies (at-or-after semantics — the RANGE frame includes
    peers); (c) counts are monotone non-increasing; (d) conversion
    micro-units are the exact floored ratios."""
    t0 = datetime.datetime(2026, 4, 1, 12, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        # user 1: clean view -> click -> purchase
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + s, 1, "click", 1.0, "{}"),
        (2, t0 + 2 * s, 1, "purchase", 1.0, "{}"),
        # user 2: click strictly BEFORE first view, then purchase —
        # step 1 only (the click doesn't qualify, so nor does the buy)
        (3, t0, 2, "click", 1.0, "{}"),
        (4, t0 + s, 2, "view", 1.0, "{}"),
        (5, t0 + 2 * s, 2, "purchase", 1.0, "{}"),
        # user 3: view and click at the SAME timestamp -> qualifies
        (6, t0, 3, "view", 1.0, "{}"),
        (7, t0, 3, "click", 1.0, "{}"),
        # user 4: purchase only — contributes to no step
        (8, t0, 4, "purchase", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
    got = {
        r.step_name: r
        for r in registry.QUERIES["q_events_funnel_conversion"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["view"].n_users == 3  # users 1, 2, 3
    assert got["click"].n_users == 2  # users 1, 3
    assert got["purchase"].n_users == 1  # user 1 only
    assert got["view"].conv_from_prev_e6 is None
    assert got["click"].conv_from_prev_e6 == 2 * 1_000_000 // 3
    assert got["purchase"].conv_from_prev_e6 == 500_000
    assert got["purchase"].conv_from_first_e6 == 1_000_000 // 3
    ns = [got["view"].n_users, got["click"].n_users, got["purchase"].n_users]
    assert ns == sorted(ns, reverse=True)


# ---------------------------------------------------------------- streak


def test_streak_gaps_islands_and_tiebreak(spark, tmp_path):
    """Streak laws: (a) the anchor grouping finds the true longest
    consecutive-day run across a gap; (b) equal-length runs break the
    tie to the EARLIEST start; (c) multiple same-day events collapse
    to one streak day."""
    base = datetime.datetime(2026, 5, 1, 9, 0, 0)
    day = datetime.timedelta(days=1)
    rows = []
    eid = 0
    # user 1: days 0,1,2 then 4,5  -> longest 3 starting day 0
    for d in (0, 1, 2, 4, 5):
        rows.append((eid, base + d * day, 1, "click", 1.0, "{}"))
        eid += 1
    # duplicate events on day 0 must not inflate the streak
    rows.append((eid, base + datetime.timedelta(hours=3), 1, "view", 1.0, "{}"))
    eid += 1
    # user 2: two runs of length 2 (days 10,11 and 20,21) -> earliest
    for d in (10, 11, 20, 21):
        rows.append((eid, base + d * day, 2, "click", 1.0, "{}"))
        eid += 1
    _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
    got = {
        r.user_id: r
        for r in registry.QUERIES["q_events_streak_longest"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1].streak_days == 3
    assert got[1].streak_start == datetime.date(2026, 5, 1)
    assert got[2].streak_days == 2
    assert got[2].streak_start == datetime.date(2026, 5, 11)  # base + 10


# ---------------------------------------------------------------- hopping


def test_hopping_window_membership_and_alignment(spark, tmp_path):
    """Hopping laws: (a) every event lands in EXACTLY 4 windows
    (sum of n_events == 4x input rows); (b) every window is exactly
    one hour wide and starts on a 15-minute wall boundary; (c) the
    window set of a hand-placed event is exactly {floor15(t) - k*15m}
    for k = 0..3."""
    t = datetime.datetime(2026, 6, 1, 1, 17, 30)
    rows = [
        (0, t, 1, "view", 1.0, "{}"),
        (1, datetime.datetime(2026, 6, 1, 1, 0, 0), 2, "view", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
    out = registry.QUERIES["q_events_hopping_window"](
        spark, str(tmp_path)
    ).collect()
    assert sum(r.n_events for r in out) == 4 * len(rows)
    for r in out:
        assert (r.window_end - r.window_start) == datetime.timedelta(hours=1)
        assert r.window_start.minute % 15 == 0
        assert r.window_start.second == 0
    # hand-placed event at 01:17:30 -> floor15 = 01:15; starts
    # 01:15, 01:00, 00:45, 00:30 (its windows, newest first)
    want = {
        datetime.datetime(2026, 6, 1, 1, 15),
        datetime.datetime(2026, 6, 1, 1, 0),
        datetime.datetime(2026, 6, 1, 0, 45),
        datetime.datetime(2026, 6, 1, 0, 30),
    }
    got_first = {
        r.window_start
        for r in out
        if r.n_events >= 1 and r.window_start in want
    }
    assert got_first == want
    # the 01:00:00 boundary event shares the 01:00 window with the
    # 01:17:30 one (start-inclusive) but NOT the 01:15 window
    by_start = {r.window_start: r for r in out}
    assert by_start[datetime.datetime(2026, 6, 1, 1, 0)].n_events == 2
    assert by_start[datetime.datetime(2026, 6, 1, 1, 15)].n_events == 1


# ---------------------------------------------------------------- backlog


def test_open_backlog_interval_containment(spark, tmp_path):
    """Backlog laws: an order is open on boundary B iff
    placed <= B < close (close = max lineitem ship date); same-day
    close does NOT count as open; orders with no lineitems never
    appear; boundaries derive from the order months present."""
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    )
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz"
    )
    d = datetime.datetime
    orders = [
        # placed Jan 15, closes Feb 20 -> open at Jan 31 only
        (1, 1, "O", 100.0, d(2026, 1, 15), "1-URGENT"),
        # placed Jan 5, closes Mar 5 -> open at Jan 31 AND Feb 28
        (2, 1, "O", 200.0, d(2026, 1, 5), "1-URGENT"),
        # placed Feb 10, closes Feb 11 -> open at no boundary
        (3, 1, "O", 400.0, d(2026, 2, 10), "1-URGENT"),
        # no lineitems -> never open
        (4, 1, "O", 800.0, d(2026, 1, 2), "1-URGENT"),
    ]
    li = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d(2026, 2, 20)),
        # two lines: close = MAX ship date
        (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d(2026, 1, 20)),
        (2, 1, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", d(2026, 3, 5)),
        (3, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d(2026, 2, 11)),
    ]
    _write(spark, tmp_path, "orders", orders, o_schema)
    _write(spark, tmp_path, "lineitem", li, li_schema)
    got = {
        r.as_of: r
        for r in registry.QUERIES["q_orders_open_backlog"](
            spark, str(tmp_path)
        ).collect()
    }
    jan = got[datetime.date(2026, 1, 31)]
    assert jan.n_open == 2 and jan.value_open == 300.0
    feb = got[datetime.date(2026, 2, 28)]
    assert feb.n_open == 1 and feb.value_open == 200.0
    assert set(got) == {datetime.date(2026, 1, 31), datetime.date(2026, 2, 28)}


# ---------------------------------------------------------------- trend


def test_revenue_trend_exact_linear_slope(spark, tmp_path):
    """On a staged region whose monthly revenue is EXACTLY linear in
    the month index (y = 100000 + 25000*x cents), the OLS slope must
    come out exactly 25000.0 cents/month and the mean exactly the
    hand-computed dollars."""
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    )
    d = datetime.datetime
    # months 2026-01..04 -> x = (2026-1992)*12 + (m-1)
    orders = [
        (m, 1, "O", 1000.0 + 250.0 * ((2026 - 1992) * 12 + (m - 1)), d(2026, m, 10), "1-URGENT")
        for m in (1, 2, 3, 4)
    ]
    _write(spark, tmp_path, "orders", orders, o_schema)
    _write(
        spark,
        tmp_path,
        "customer",
        [(1, "c1", 0, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    _write(
        spark,
        tmp_path,
        "nation",
        [(0, "NATION0", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    _write(
        spark,
        tmp_path,
        "region",
        [(0, "REGION0")],
        "r_regionkey int, r_name string",
    )
    rows = registry.QUERIES["q_orders_revenue_trend"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_months == 4
    assert r.slope_cents_per_month6 == 25000.0
    xs = [(2026 - 1992) * 12 + (m - 1) for m in (1, 2, 3, 4)]
    mean_dollars = round(sum(100000 + 25000 * x for x in xs) / 4 / 100, 2)
    assert r.mean_monthly_revenue == mean_dollars


# ---------------------------------------------------------------- benford


def test_benford_digits_and_constants(spark, tmp_path):
    """Benford laws: digits come from exact cents (a $0.55 amount is
    digit 5); shares are floored micro-units of the filtered total;
    the expected constants are the published floor(1e6*log10(1+1/d))
    values; excess = share - expected exactly."""
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    )
    d = datetime.datetime(2026, 1, 1)
    orders = []
    k = 0
    for _ in range(10):  # digit 1: $100.00
        orders.append((k, 1, "O", 100.0, d, "1")); k += 1
    for _ in range(5):  # digit 2: $2xx
        orders.append((k, 1, "O", 250.0, d, "1")); k += 1
    for _ in range(5):  # digit 5 via a SUB-DOLLAR amount: 55 cents
        orders.append((k, 1, "O", 0.55, d, "1")); k += 1
    _write(spark, tmp_path, "orders", orders, o_schema)
    got = {
        r.digit: r
        for r in registry.QUERIES["q_stats_benford_first_digit"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {1, 2, 5}
    assert got[1].n_orders == 10 and got[1].share_e6 == 500_000
    assert got[2].n_orders == 5 and got[2].share_e6 == 250_000
    assert got[5].n_orders == 5 and got[5].share_e6 == 250_000
    assert got[1].expected_e6 == 301_029
    assert got[2].expected_e6 == 176_091
    assert got[5].expected_e6 == 79_181
    for r in got.values():
        assert r.excess_e6 == r.share_e6 - r.expected_e6


# ---------------------------------------------------------------- flesch


def test_flesch_hand_computed_and_bands(spark, tmp_path):
    """Readability laws: hand-computed milli-unit scores for a short
    punctuated text and a polysyllabic one; the zero-word document
    scores NULL and bands 'empty'; unpunctuated text floors sentences
    at 1."""
    docs = [
        # "the cat sat. it ran!": W=5, S=2, Y=5 (e,a,a,i,a)
        # flesch_e3 = 206835 - 1015*5//2 - 84600*5//5 = 119698 -> easy
        (1, "The cat sat. It ran!", "en", "s", 20),
        # "organization optimization": W=2, S=1 (floored), Y=10
        # = 206835 - 2030 - 423000 = -218195 -> hard
        (2, "organization optimization", "en", "s", 25),
        (3, "?!.", "en", "s", 3),  # zero words -> NULL, 'empty'
    ]
    _write(spark, tmp_path, "documents", docs, _DOCS_SCHEMA)
    got = {
        r.doc_id: r
        for r in registry.QUERIES["q_text_readability_flesch"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1].n_words == 5 and got[1].n_sentences == 2
    assert got[1].n_syllables == 5
    assert got[1].flesch_e3 == 206835 - (1015 * 5 // 2) - (84600 * 5 // 5)
    assert got[1].band == "easy"
    assert got[2].n_sentences == 1  # floored
    assert got[2].flesch_e3 == 206835 - 2030 - 423000
    assert got[2].band == "hard"
    assert got[3].flesch_e3 is None and got[3].band == "empty"


# ---------------------------------------------------------------- hapax


def test_hapax_ttr_hand_computed(spark, tmp_path):
    """Lexical-diversity laws: hand-computed tokens/types/hapax/TTR on
    a staged source; hapax counts types-seen-once ACROSS the source,
    not per document."""
    docs = [
        (1, "alpha alpha beta gamma", "en", "s1", 22),
        # 'gamma' repeats in s1 via a second doc -> not hapax there
        (2, "gamma delta", "en", "s1", 11),
        (3, "solo", "en", "s2", 4),
    ]
    _write(spark, tmp_path, "documents", docs, _DOCS_SCHEMA)
    got = {
        r.source: r
        for r in registry.QUERIES["q_text_hapax_ratio"](
            spark, str(tmp_path)
        ).collect()
    }
    s1 = got["s1"]
    # s1 tokens: alpha alpha beta gamma gamma delta = 6
    # types: alpha beta gamma delta = 4; hapax: beta, delta = 2
    assert s1.n_tokens == 6 and s1.n_types == 4 and s1.n_hapax == 2
    assert s1.ttr_e6 == 4 * 1_000_000 // 6
    assert s1.hapax_share_e6 == 2 * 1_000_000 // 4
    s2 = got["s2"]
    assert s2.n_tokens == 1 and s2.n_types == 1 and s2.n_hapax == 1
    assert s2.ttr_e6 == 1_000_000 and s2.hapax_share_e6 == 1_000_000


# ------------------------------------------------------------- covariance


def test_covariance_cells_hand_computed(spark, tmp_path):
    """Covariance-cell laws on a 2-vector, 2-dim staged corpus: the
    quantized co-moments and the scaled covariance match the hand
    computation; the output is exactly the upper triangle."""
    vecs = [(1, [1.0, 2.0], 0), (2, [3.0, 6.0], 1)]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        (r.i, r.j): r
        for r in registry.QUERIES["q_embedding_covariance_exact"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {(0, 0), (0, 1), (1, 1)}  # upper triangle only
    # q-vectors: [1e6, 2e6], [3e6, 6e6]
    assert got[(0, 0)].sij == str(10**12 + 9 * 10**12)
    assert got[(0, 1)].sij == str(2 * 10**12 + 18 * 10**12)
    assert got[(1, 1)].sij == str(4 * 10**12 + 36 * 10**12)
    assert got[(0, 0)].si == str(4 * 10**6) and got[(0, 1)].sj == str(8 * 10**6)
    # cov12(0,0) = (2*1e13 - (4e6)^2) / 4 = 1e12
    assert got[(0, 0)].cov12 == 1.0e12
    # cov12(0,1) = (2*2e13 - 4e6*8e6) / 4 = 2e12
    assert got[(0, 1)].cov12 == 2.0e12
    assert got[(1, 1)].cov12 == 4.0e12


def test_pca_power_recovers_staged_axis(spark, tmp_path):
    """PCA law on staged geometry: points spread along axis 3 with
    constant other coordinates -> the top component is (±)e3 with the
    sign normalized positive, loading ~1e6 on dim 3 and ~0 elsewhere,
    explained share ~100%."""
    rows = [(k, [0.5, -0.25, 0.125, float(k - 8)], k % 3) for k in range(17)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        r.dim: r
        for r in registry.QUERIES["q_embedding_pca_power"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[3].loading_e6 >= 999_999  # the staged axis, sign-positive
    for d in (0, 1, 2):
        assert abs(got[d].loading_e6) <= 1  # constant dims carry nothing
    assert got[3].explained_share_e6 >= 999_999
    # explained share is a component property: identical on every row
    assert len({r.explained_share_e6 for r in got.values()}) == 1


# ------------------------------------------------------------- containment


def test_containment_subset_staged_prefix(spark, tmp_path):
    """Containment laws: a 10-token prefix doc is contained in its
    source at exactly 1e6 (every prefix shingle appears in the
    original); the reverse direction does NOT pass the 0.8 threshold
    for a long source; unrelated docs produce no pairs."""
    base_words = " ".join(f"w{i}" for i in range(40))
    docs = [
        (0, base_words, "en", "s", 200),  # doc 0: 40 tokens, %4==0 -> staged prefix 20000
        (1, " ".join(f"z{i}" for i in range(40)), "en", "s", 200),
        (3, "tiny", "en", "s", 4),  # <3 tokens -> no shingles, dropped
    ]
    spark.createDataFrame(docs, _DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = registry.QUERIES["q_dedup_containment_subset"](
        spark, str(tmp_path)
    ).collect()
    pairs = {(r.src_doc, r.dst_doc): r for r in out}
    # staged prefix doc 20000 (10 tokens -> 8 shingles) inside doc 0
    r = pairs[(20000, 0)]
    assert r.n_src_shingles == 8 and r.n_common == 8
    assert r.containment_e6 == 1_000_000
    # the long doc is NOT contained in its prefix (8/38 << 0.8)
    assert (0, 20000) not in pairs
    # unrelated docs never pair
    assert all(src in (20000,) for (src, _) in pairs)


# ------------------------------------------------------------- attribution


def test_attribution_last_touch_laws(spark, tmp_path):
    """Attribution laws: each purchase credits the LAST non-purchase
    touch at or before it (ties broken by event_id); purchases with no
    prior touch are 'unattributed'; intermediate purchases do not
    reset the touch; values sum as exact micro-units."""
    t0 = datetime.datetime(2026, 7, 1, 10, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        # user 1: view -> click -> purchase(1.5) -> purchase(2.25):
        # both purchases credit 'click' (no reset between them)
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + s, 1, "click", 1.0, "{}"),
        (2, t0 + 2 * s, 1, "purchase", 1.5, "{}"),
        (3, t0 + 3 * s, 1, "purchase", 2.25, "{}"),
        # user 2: purchase with NO prior touch -> unattributed
        (4, t0, 2, "purchase", 4.0, "{}"),
        # user 3: view and purchase at the SAME ts; event_id order puts
        # the view first -> the purchase credits 'view'
        (5, t0, 3, "view", 1.0, "{}"),
        (6, t0, 3, "purchase", 8.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
    got = {
        r.touch_type: r
        for r in registry.QUERIES["q_events_attribution_last_touch"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["click"].n_purchases == 2
    assert got["click"].value_e6 == 1_500_000 + 2_250_000
    assert got["unattributed"].n_purchases == 1
    assert got["unattributed"].value_e6 == 4_000_000
    assert got["view"].n_purchases == 1 and got["view"].value_e6 == 8_000_000
    assert set(got) == {"click", "unattributed", "view"}


# ---------------------------------------------------------- seasonality


def test_seasonality_trend_window_and_ratio(spark, tmp_path):
    """Seasonality laws on a staged 24-month series with an exact
    x2 December spike over a flat base: months without a complete
    12-month window carry NULL trend; interior trends and ratios
    match the hand computation."""
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    )
    d = datetime.datetime
    orders, k = [], 0
    for y in (2025, 2026):
        for m in range(1, 13):
            amount = 240.0 if m == 12 else 120.0  # cents: 24000 / 12000
            orders.append((k, 1, "O", amount, d(y, m, 5), "1")); k += 1
    spark.createDataFrame(orders, o_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.month: r
        for r in registry.QUERIES["q_orders_seasonality_decompose"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(got) == 24
    # first 5 and last 6 months: incomplete 12-row window -> NULL
    for m in (1, 2, 3, 4, 5):
        assert got[datetime.date(2025, m, 1)].trend_cents is None
    for m in (7, 8, 9, 10, 11, 12):
        assert got[datetime.date(2026, m, 1)].trend_cents is None
    # any complete window holds 11 normal + 1 spike month:
    # trend = (11*12000 + 24000) // 12 = 13000
    mid = got[datetime.date(2025, 12, 1)]
    assert mid.trend_cents == 13000
    assert mid.revenue_cents == 24000
    assert mid.seasonal_e6 == 24000 * 1_000_000 // 13000
    flat = got[datetime.date(2026, 1, 1)]
    assert flat.trend_cents == 13000
    assert flat.seasonal_e6 == 12000 * 1_000_000 // 13000


# ------------------------------------------------------------ vocab jaccard


def test_source_vocab_jaccard_hand_computed(spark, tmp_path):
    """Vocabulary-overlap laws: hand-computed Jaccard on staged
    sources; within-source repeats don't inflate the sets; disjoint
    sources never pair."""
    docs = [
        (1, "alpha beta gamma", "en", "s1", 16),
        (2, "alpha alpha delta", "en", "s1", 17),  # s1 = {alpha,beta,gamma,delta}
        (3, "alpha beta zeta", "en", "s2", 15),    # s2 = {alpha,beta,zeta}
        (4, "omega", "en", "s3", 5),               # disjoint
    ]
    spark.createDataFrame(docs, _DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = registry.QUERIES["q_text_source_vocab_jaccard"](
        spark, str(tmp_path)
    ).collect()
    pairs = {(r.source_a, r.source_b): r for r in out}
    assert set(pairs) == {("s1", "s2")}
    r = pairs[("s1", "s2")]
    assert r.n_common == 2 and r.n_words_a == 4 and r.n_words_b == 3
    assert r.jaccard_e6 == 2 * 1_000_000 // (4 + 3 - 2)


# ---------------------------------------------------------- full outer


def test_full_outer_reconcile_partition_law(spark, tmp_path):
    """Reconcile laws on a staged key space: the four classes
    partition the key universe exactly; deltas are the exact staged
    bumps; keys divisible by 15 (absent both sides) never appear."""
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    )
    d = datetime.datetime(2026, 1, 1)
    orders = [(k, 1, "O", 100.0, d, "1") for k in range(1, 106)]
    spark.createDataFrame(orders, o_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.status: r
        for r in registry.QUERIES["q_join_full_outer_reconcile"](
            spark, str(tmp_path)
        ).collect()
    }
    ks = range(1, 106)
    in_a = {k for k in ks if k % 3 != 0}
    in_b = {k for k in ks if k % 5 != 0}
    changed = {k for k in in_a & in_b if k % 7 == 0}
    assert got["left_only"].n_keys == len(in_a - in_b)
    assert got["right_only"].n_keys == len(in_b - in_a)
    assert got["changed"].n_keys == len(changed)
    assert got["matched"].n_keys == len((in_a & in_b) - changed)
    total = sum(r.n_keys for r in got.values())
    assert total == len(in_a | in_b)  # %15 keys excluded by both sides
    assert got["changed"].value_delta_cents == 100 * len(changed)
    assert got["left_only"].value_delta_cents == -10000 * len(in_a - in_b)
    # right-only keys also carry the %7 bump when it applies
    bumped_right = {k for k in in_b - in_a if k % 7 == 0}
    assert got["right_only"].value_delta_cents == 10000 * len(
        in_b - in_a
    ) + 100 * len(bumped_right)
    assert got["matched"].value_delta_cents == 0


# ---------------------------------------------------------- retention


def test_retention_triangle_laws(spark, tmp_path):
    """Retention laws: age-0 retention is exactly 1e6 for every
    cohort; a user active in weeks {0, 2} counts at ages 0 and 2 of
    their own cohort; cohort sizes come from the triangle's own age-0
    row."""
    base = datetime.datetime(2026, 3, 2, 12, 0)  # a Monday
    wk = datetime.timedelta(days=7)
    rows, eid = [], 0
    # cohort A (week of Mar 2): users 1,2 first active; user 1 returns
    # in week+2, user 2 never returns
    for u, weeks in ((1, (0, 2)), (2, (0,))):
        for w in weeks:
            rows.append((eid, base + w * wk, u, "view", 1.0, "{}")); eid += 1
    # cohort B (week of Mar 9): user 3, returns next week
    for w in (1, 2):
        rows.append((eid, base + w * wk, 3, "click", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
    got = {
        (r.cohort, r.age_weeks): r
        for r in registry.QUERIES["q_events_retention_triangle"](
            spark, str(tmp_path)
        ).collect()
    }
    a = datetime.date(2026, 3, 2)
    b = datetime.date(2026, 3, 9)
    assert got[(a, 0)].n_active == 2 and got[(a, 0)].retention_e6 == 1_000_000
    assert got[(a, 2)].n_active == 1
    assert got[(a, 2)].retention_e6 == 1_000_000 // 2
    assert (a, 1) not in got  # nobody from cohort A active in week 1
    assert got[(b, 0)].n_active == 1 and got[(b, 1)].n_active == 1
    assert got[(b, 1)].retention_e6 == 1_000_000


# ---------------------------------------------------------- fill rate


def test_fill_rate_sla_boundary(spark, tmp_path):
    """Fill-rate laws: a close exactly AT placed+30 counts as within
    SLA (<=); +31 does not; orders without lineitems are excluded."""
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    )
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz"
    )
    d = datetime.datetime
    orders = [
        (1, 1, "O", 10.0, d(2026, 1, 1), "P"),  # closes +30 -> within
        (2, 1, "O", 10.0, d(2026, 1, 1), "P"),  # closes +31 -> late
        (3, 1, "O", 10.0, d(2026, 1, 1), "P"),  # no lineitems -> excluded
    ]
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2026, 1, 31)),
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2026, 2, 1)),
    ]
    _write(spark, tmp_path, "orders", orders, o_schema)
    _write(spark, tmp_path, "lineitem", li, li_schema)
    got = registry.QUERIES["q_orders_fill_rate_sla"](
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_orders == 2 and r.n_shipped_30d == 1
    assert r.fill_rate_e6 == 500_000


# ---------------------------------------------------------- deciles


def test_value_deciles_laws(spark, tmp_path):
    """Decile laws: boundaries are exact order statistics so a
    100-row staged uniform ladder gives 10 exact 10-row deciles;
    shares close to <=1e6 with a floored remainder; cum share is
    monotone and ends at the full total's floor."""
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    )
    d = datetime.datetime(2026, 1, 1)
    orders = [(k, 1, "O", float(k), d, "P") for k in range(1, 101)]
    _write(spark, tmp_path, "orders", orders, o_schema)
    got = {
        r.decile: r
        for r in registry.QUERIES["q_orders_value_deciles"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == set(range(1, 11))
    assert all(got[k].n_orders == 10 for k in got)
    # decile 1 = values 1..10 -> 5500 cents
    assert got[1].revenue_cents == sum(range(1, 11)) * 100
    total = sum(r.revenue_cents for r in got.values())
    assert total == sum(range(1, 101)) * 100
    assert got[10].cum_share_e6 == 1_000_000 * total // total  # == 1e6
    cums = [got[k].cum_share_e6 for k in range(1, 11)]
    assert cums == sorted(cums)
    for k in got:
        assert got[k].share_e6 == got[k].revenue_cents * 1_000_000 // total


# ---------------------------------------------------------- successors


def test_successor_diversity_hand_computed(spark, tmp_path):
    """Branching laws: a token always followed by the same word has
    branching 1e6/n; a token with all-distinct successors has 1e6;
    last tokens of documents head no bigram."""
    docs = [
        (1, "the cat the dog the cat", "en", "s", 23),
        (2, "zig alpha zig beta zig gamma", "en", "s", 28),
    ]
    spark.createDataFrame(docs, _DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.token: r
        for r in registry.QUERIES["q_text_successor_diversity"](
            spark, str(tmp_path)
        ).collect()
    }
    # 'the' -> cat, dog, cat : 3 total, 2 distinct
    assert got["the"].n_total == 3 and got["the"].n_successors == 2
    assert got["the"].branching_e6 == 2 * 1_000_000 // 3
    # 'zig' -> alpha, beta, gamma : all distinct
    assert got["zig"].n_total == 3 and got["zig"].n_successors == 3
    assert got["zig"].branching_e6 == 1_000_000
    # 'cat' heads: cat->the once (the second 'cat' ends doc 1)
    assert got["cat"].n_total == 1
    assert "gamma" not in got  # ends its document, heads nothing


# ---------------------------------------------------------- path trigrams


def test_path_trigrams_hand_computed(spark, tmp_path):
    """Path laws: triples respect (ts, event_id) order (same-ts ties
    break by id); a user with k events yields k-2 paths; paths never
    cross users."""
    t0 = datetime.datetime(2026, 9, 1, 10, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        # user 1: view > click > purchase > view  -> 2 paths
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + s, 1, "click", 1.0, "{}"),
        (2, t0 + 2 * s, 1, "purchase", 1.0, "{}"),
        (3, t0 + 3 * s, 1, "view", 1.0, "{}"),
        # user 2: same-ts pair ordered by event_id: view(4) < click(5)
        (4, t0, 2, "view", 1.0, "{}"),
        (5, t0, 2, "click", 1.0, "{}"),
        (6, t0 + s, 2, "purchase", 1.0, "{}"),
        # user 3: two events only -> no path
        (7, t0, 3, "view", 1.0, "{}"),
        (8, t0 + s, 3, "click", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
    got = {
        r.path: r
        for r in registry.QUERIES["q_events_path_trigrams"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["view>click>purchase"].n_paths == 2  # users 1 and 2
    assert got["view>click>purchase"].n_users == 2
    assert got["click>purchase>view"].n_paths == 1
    assert sum(r.n_paths for r in got.values()) == 3  # (4-2) + (3-2) + 0


# ---------------------------------------------------------- divergence


def test_source_divergence_exact_tvd(spark, tmp_path):
    """TVD laws: a source identical to the corpus distribution scores
    0; hand-computed exact micro-units for a staged two-source
    corpus, including the mass of words a source never uses."""
    docs = [
        # s1: a a b   s2: a b b b
        (1, "a a b", "en", "s1", 5),
        (2, "a b b b", "en", "s2", 7),
    ]
    spark.createDataFrame(docs, _DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.source: r
        for r in registry.QUERIES["q_text_source_divergence"](
            spark, str(tmp_path)
        ).collect()
    }
    # corpus: a=3, b=4, N=7 ; s1: a=2,b=1,n=3 ; s2: a=1,b=3,n=4
    # TVD(s1) = 1/2 (|2/3-3/7| + |1/3-4/7|) = 1/2 (5/21 + 5/21) = 5/21
    # exact identity: (|2*7-3*3| + |1*7-4*3|) / (2*3*7) = (5+5)/42
    assert got["s1"].n_tokens == 3
    assert got["s1"].tvd_e6 == 10 * 1_000_000 // 42
    # TVD(s2) = 1/2 (|1/4-3/7| + |3/4-4/7|) = 1/2 (5/28 + 5/28) = 5/28
    assert got["s2"].n_tokens == 4
    assert got["s2"].tvd_e6 == 10 * 1_000_000 // 56


def test_source_divergence_missing_words_mass(spark, tmp_path):
    """A source that never uses a corpus word still pays that word's
    full probability mass: s1={a}, s2={b} -> TVD(s1) counts |1-1/2|
    for a AND |0-1/2| for b = 1/2 exactly."""
    docs = [
        (1, "a", "en", "s1", 1),
        (2, "b", "en", "s2", 1),
    ]
    spark.createDataFrame(docs, _DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.source: r.tvd_e6
        for r in registry.QUERIES["q_text_source_divergence"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"s1": 500_000, "s2": 500_000}
