"""Round-10 hardening: regression tests for the three ADVICE r9
findings (JPEG marker-walk tolerance in exif.py, durable no-op audit
proof in takedown_maintenance.py, no ignored broadcast hint in
drift_monitor.py)."""

from __future__ import annotations

import glob

import pytest


def test_exif_tolerates_fill_bytes_and_standalone_markers():
    """ADVICE r9 (exif.py): real-world camera JPEGs may carry 0xFF fill
    bytes before a marker (T.81 B.1.1.2) and standalone markers with
    NO length field (TEM 0x01, RSTn 0xD0-0xD7; B.1.1.3). The marker
    walk must step over both instead of declaring sync loss."""
    import numpy as np

    from datawarehouse1_spark.multimodal.exif import (
        encode_exif_app1,
        insert_app1,
        parse_exif,
    )
    from datawarehouse1_spark.multimodal.jpeg import encode_jpeg

    plain = encode_jpeg(np.full((8, 8, 3), 99, dtype=np.uint8), quality=96)
    app1 = encode_exif_app1("CamY", "M-10", 1, "2026:08:15 01:02:03")
    tagged = insert_app1(plain, app1)

    want = {
        "make": "CamY",
        "model": "M-10",
        "orientation": 1,
        "datetime": "2026:08:15 01:02:03",
    }

    # (a) fill bytes: repeated 0xFF padding before the APP1 marker
    padded = tagged[:2] + b"\xff\xff\xff" + tagged[2:]
    assert parse_exif(padded) == want

    # (b) standalone markers before APP1: TEM and an RST marker, each
    # exactly 2 bytes with no length field
    standalone = tagged[:2] + b"\xff\x01" + b"\xff\xd3" + tagged[2:]
    assert parse_exif(standalone) == want

    # (c) both at once, interleaved
    mixed = tagged[:2] + b"\xff\xff" + b"\xff\x01" + b"\xff" + tagged[2:]
    assert parse_exif(mixed) == want

    # (d) genuine sync loss still raises — tolerance must not become
    # silent acceptance of a corrupt stream
    broken = tagged[:2] + b"\x00\x00" + tagged[2:]
    with pytest.raises(ValueError, match="marker sync lost"):
        parse_exif(broken)


def test_takedown_noop_proof_row_is_durable_and_idempotent(spark, tmp_path):
    """ADVICE r9 (takedown_maintenance.py): a batch skipped because all
    its tombstones were already absent must still leave a durable audit
    row (n_removed=0), keyed by the tombstone content hash so replays
    stay overwrite-idempotent. Distinct no-op requests get distinct
    proof dirs; the published snapshot version never moves."""
    from datawarehouse1_spark.streaming import takedown_maintenance as tdm
    from datawarehouse1_spark.streaming.snapshot_store import latest_version

    corpus = spark.range(40).withColumnRenamed("id", "doc_id")
    corpus_path = str(tmp_path / "corpus")
    audit_path = str(tmp_path / "audit")
    sink = tdm.make_takedown_sink(spark, corpus_path, audit_path, corpus)

    def tomb(ids):
        return spark.createDataFrame([(i,) for i in ids], "doc_id long")

    sink(tomb([5, 6]), 0)
    assert latest_version(corpus_path) == 0

    # replayed batch: all ids already gone -> skip path -> proof row
    sink(tomb([5, 6]), 0)
    dirs = sorted(glob.glob(f"{audit_path}/batch=noop-*"))
    assert len(dirs) == 1
    row = spark.read.parquet(dirs[0]).collect()[0]
    assert (row.batch_id, row.n_tombstones, row.n_removed, row.n_remaining) == (
        -1,
        2,
        0,
        38,
    )
    assert latest_version(corpus_path) == 0  # no version bump on skip

    # same request again: same dir overwritten, nothing accumulates
    sink(tomb([5, 6]), 0)
    assert sorted(glob.glob(f"{audit_path}/batch=noop-*")) == dirs

    # a DIFFERENT all-no-op request gets its own proof dir
    sink(tomb([5]), 0)
    assert len(glob.glob(f"{audit_path}/batch=noop-*")) == 2


def test_drift_monitor_full_outer_join_has_no_broadcast(spark):
    """ADVICE r9 (drift_monitor.py): Spark cannot run a FULL OUTER join
    as broadcast-hash, so the old F.broadcast hint was silently ignored
    and misdocumented the plan. Pin the honest plan: no broadcast node
    in the join, and the null-safe full-outer parity with the batch
    report is unchanged."""
    from datawarehouse1_spark.streaming.drift_monitor import chisq_vs_reference

    b = spark.createDataFrame(
        [("a", 10), (None, 3)], "bin string, cnt_batch long"
    )
    r = spark.createDataFrame(
        [("a", 12), ("b", 4), (None, 2)], "bin string, cnt_ref long"
    )
    out = chisq_vs_reference(b, r)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert "BroadcastHashJoin" not in plan

    rows = {x["bin"]: (x["cnt_batch"], x["cnt_ref"]) for x in out.collect()}
    # NULL bin stays ONE matched row; the absent bin zero-fills
    assert rows[None] == (3, 2)
    assert rows["a"] == (10, 12)
    assert rows["b"] == (0, 4)


# ---------------------------------------------------------------------------
# Round-10 query laws
# ---------------------------------------------------------------------------

import hashlib

from datawarehouse1_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _py_split(doc_id: int) -> str:
    """The test's independent copy of the split rule (pure function of
    doc_id): md5 hex-prefix thresholds ~90/5/5."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    if h < "e6666666":
        return "train"
    if h < "f3333333":
        return "val"
    return "test"


def test_split_train_holdout_laws(spark, tmp_path):
    """Split laws: (a) the three classes PARTITION the corpus exactly;
    (b) a staged exact duplicate straddling train/val is counted as
    holdout leakage while a val-only duplicate pair is NOT (leakage is
    against TRAIN, not within-split); (c) the split is the documented
    pure function of doc_id."""
    # find ids landing in each split via the independent python rule
    train_ids = [i for i in range(1000) if _py_split(i) == "train"]
    val_ids = [i for i in range(1000) if _py_split(i) == "val"]
    test_ids = [i for i in range(1000) if _py_split(i) == "test"]
    assert len(val_ids) >= 2 and test_ids

    rows = []
    # leaked pair: same text in a train doc and a val doc
    rows.append((train_ids[0], "leaked text", "en", "s", 11))
    rows.append((val_ids[0], "leaked text", "en", "s", 11))
    # val-only duplicate pair: NOT leakage (train never saw it)
    rows.append((val_ids[1], "val only dup", "fr", "s", 12))
    # unique fillers in every split
    for i in train_ids[1:20]:
        rows.append((i, f"train unique {i}", "en", "s", 10))
    rows.append((test_ids[0], "test unique", "de", "s", 11))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    got = {
        r.split: r
        for r in registry.QUERIES["q_split_train_holdout"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["train"].n_docs == 20
    assert got["val"].n_docs == 2
    assert got["test"].n_docs == 1
    assert got["train"].n_leaked_from_train == 0  # by definition
    assert got["val"].n_leaked_from_train == 1  # the straddling dup only
    assert got["test"].n_leaked_from_train == 0
    assert sum(r.n_docs for r in got.values()) == len(rows)


def test_zipf_fit_exact_power_law(spark, tmp_path):
    """On a staged corpus whose rank/frequency table is an EXACT
    doubling law (freq = 16 >> floor(log2(rank))), the fit must return
    slope6 == -1.0 and r2_6 == 1.0 — integer-exact, no float wobble."""
    words = []
    freq_of_rank = {1: 16, 2: 8, 3: 8}
    freq_of_rank.update({r: 4 for r in range(4, 8)})
    freq_of_rank.update({r: 2 for r in range(8, 16)})
    for r, f in freq_of_rank.items():
        words += [f"w{r:02d}"] * f
    text = " ".join(words)
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = registry.QUERIES["q_text_zipf_fit"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    row = got[0]
    assert row.n_terms == 15
    assert row.slope6 == -1.0
    assert row.r2_6 == 1.0


def test_trigram_profile_hand_computed(spark, tmp_path):
    """Trigram profile on a hand-computable corpus: counts exact, the
    alphabet filter drops digit-bearing trigrams, ranking is
    (count desc, trigram asc)."""
    spark.createDataFrame(
        [
            (1, "aaab", "en", "s", 4),   # aaa, aab
            (2, "aaa9", "en", "s", 4),   # aaa, (aa9 filtered)
            (3, "ab", "en", "s", 2),     # too short: no trigrams
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = [
        (r.rnk, r.trigram, r.n)
        for r in registry.QUERIES["q_text_trigram_lang_profile"](
            spark, str(tmp_path)
        )
        .orderBy("rnk")
        .collect()
    ]
    assert got == [(1, "aaa", 2), (2, "aab", 1)]


def test_layout_prune_stats_laws(spark):
    """Pruning-simulation laws on the real table: both layouts see the
    same corpus and the same matching rows; the month-partitioned
    layout scans EXACTLY the matching rows (the window is
    month-aligned); the keyrange layout scans everything (every file
    spans the full date range) — the quantified motivation for
    clustering."""
    rows = {
        r.layout: r
        for r in registry.QUERIES["q_layout_file_prune_stats"](
            spark, SF_DIR
        ).collect()
    }
    kr, dp = rows["keyrange"], rows["datepart"]
    assert kr.total_rows == dp.total_rows > 0
    assert kr.rows_matching == dp.rows_matching > 0
    assert dp.rows_scanned == dp.rows_matching
    assert kr.rows_scanned == kr.total_rows
    assert dp.files_scanned == 6  # six month partitions in the window
    assert kr.files_scanned == kr.n_files


def test_layout_vacuum_plan_first_principles(spark):
    """Vacuum law recomputed from first principles: a file is
    deletable iff NO retained snapshot v in [live_min, vmax]
    references it, where v references a file iff
    created_v <= v < deleted_v. The query's closed-form flag
    (deleted_v <= live_min) must agree file-by-file.

    Runs at sf0.01 (the driver's grading SF): the sf0.001 manifest has
    only 3 files, all still referenced — too small to exercise the
    deletable branch non-vacuously."""
    out = registry.QUERIES["q_layout_vacuum_plan"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert out
    vmax = max(
        max(r.created_v, r.deleted_v if r.deleted_v is not None else r.created_v)
        for r in out
    )
    live_min = out[0].live_min
    assert live_min == vmax - 3 + 1
    n_deletable = 0
    for r in out:
        referenced = any(
            r.created_v <= v and (r.deleted_v is None or v < r.deleted_v)
            for v in range(live_min, vmax + 1)
        )
        assert r.deletable == (0 if referenced else 1), r
        n_deletable += r.deletable
    assert 0 < n_deletable < len(out)  # non-vacuous both ways


def test_cohort_ltv_laws(spark):
    """Cohort matrix laws: age-0 customer counts across cohorts sum to
    the total distinct customers; total revenue over the matrix equals
    the exact-decimal revenue of the orders table; ages are
    non-negative and every cohort has an age-0 cell."""
    from pyspark.sql import functions as F

    from datawarehouse1_spark.catalog import table

    out = registry.QUERIES["q_orders_cohort_ltv"](spark, SF_DIR)
    rows = out.collect()
    o = table(spark, SF_DIR, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    total_rev = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    ).collect()[0][0]

    age0 = [r for r in rows if r.age_months == 0]
    assert sum(r.n_customers for r in age0) == n_cust
    assert {r.cohort_month for r in age0} == {r.cohort_month for r in rows}
    assert min(r.age_months for r in rows) == 0
    # revenue closes exactly: each summand is an exact decimal sum
    # rendered to double; compare at cent precision
    assert abs(sum(r.revenue for r in rows) - total_rev) < 0.01 * len(rows)


def test_cume_dist_laws(spark):
    """cume_dist laws: row count preserved; within every priority
    class the maximum cd6 and rev_share6 are exactly 1.0 and both are
    monotone along o_totalprice."""
    from collections import defaultdict

    out = registry.QUERIES["q_window_cume_dist"](spark, SF_DIR).collect()
    by_prio = defaultdict(list)
    for r in out:
        by_prio[r.o_orderpriority].append(r)
    assert sum(len(v) for v in by_prio.values()) == len(out)
    for prio, rows in by_prio.items():
        rows.sort(key=lambda r: r.o_totalprice)
        assert rows[-1].cd6 == 1.0, prio
        assert rows[-1].rev_share6 == 1.0, prio
        for a, b in zip(rows, rows[1:]):
            assert a.cd6 <= b.cd6 and a.rev_share6 <= b.rev_share6


def test_user_lifecycle_partition_law(spark):
    """Growth-accounting laws: per day the three classes PARTITION the
    actives (new + retained + resurrected == active); summed n_new
    over all days equals the distinct user count; the first day is
    all-new."""
    from datawarehouse1_spark.catalog import table

    out = registry.QUERIES["q_events_user_lifecycle"](spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.n_new + r.n_retained + r.n_resurrected == r.n_active, r
    e = table(spark, SF_DIR, "events")
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n_new for r in out) == n_users
    first = min(out, key=lambda r: r.day)
    assert first.n_new == first.n_active


def test_centroid_drift_staged_geometry(spark, tmp_path):
    """Centroid drift on staged geometry: a label aligned with the
    global centroid scores ~1e6; an orthogonal label scores ~0; the
    exact expected integers are recomputed from the query's own
    quantize-floor algebra in pure python."""
    import math

    vecs = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [1.0, 0.0], 0),
        (4, [1.0, 0.0], 0),
        (5, [0.0, 1.0], 1),
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        r.label: r
        for r in registry.QUERIES["q_embedding_centroid_drift"](
            spark, str(tmp_path)
        ).collect()
    }
    # python twin of the integer algebra
    s = {0: (4_000_000, 0), 1: (0, 1_000_000)}
    g = (4_000_000, 1_000_000)
    g2 = g[0] * g[0] + g[1] * g[1]
    for label, (sx, sy) in s.items():
        dot = sx * g[0] + sy * g[1]
        l2 = sx * sx + sy * sy
        want = math.floor(dot * 1_000_000 / math.sqrt(l2 * g2))
        assert got[label].cos_e6 == want, label
    assert got[0].n_vecs == 4 and got[1].n_vecs == 1
    assert got[0].cos_e6 > 950_000  # aligned with the population
    assert got[1].cos_e6 < 300_000  # the drifting slice


def test_lang_classify_confusion_laws(spark, tmp_path):
    """Classifier laws on a separable staged corpus: (a) the confusion
    matrix row-sums equal the per-language doc counts; (b) languages
    with DISJOINT trigram alphabets classify perfectly (diagonal
    matrix); (c) a doc whose trigrams miss every profile lands in
    'unknown'."""
    rows = []
    # two separable languages: disjoint character sets
    for i in range(6):
        rows.append((i, "abc abc abd", "aa", "s", 11))
    for i in range(6, 12):
        rows.append((i, "xyz xyz xyw", "bb", "s", 11))
    # a doc of digits only: no valid trigrams -> unknown
    rows.append((99, "123 456 789", "aa", "s", 11))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        (r.lang, r.predicted): r.n_docs
        for r in registry.QUERIES["q_text_lang_classify_confusion"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        ("aa", "aa"): 6,
        ("bb", "bb"): 6,
        ("aa", "unknown"): 1,
    }


def test_market_basket_lift_first_principles(spark, tmp_path):
    """Market-basket laws on a staged order set: pair support counted
    once per order (duplicate lines collapse), part order canonical
    (a < b), and lift_e6 equals the hand-computed
    floor(N * n_ab * 1e6 / (n_a * n_b))."""
    import datetime

    li = []
    # orders 1..4 contain {10,20}; order 5 contains {10}; order 6 {20,30}
    base = dict(qty=1.0, price=1.0, disc=0.0, tax=0.0)
    d = datetime.datetime(1996, 1, 1)
    ln = 0
    def line(ok, pk):
        nonlocal ln
        ln += 1
        return (ok, pk, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
    for ok in (1, 2, 3, 4):
        li += [line(ok, 10), line(ok, 20), line(ok, 20)]  # dup line: 20 twice
    li.append(line(5, 10))
    li += [line(6, 20), line(6, 30)]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = registry.QUERIES["q_orders_market_basket"](
        spark, str(tmp_path)
    ).collect()
    # only (10,20) reaches support >= 3: n_ab=4, n_a=5, n_b=5, N=6
    assert len(got) == 1
    r = got[0]
    assert (r.part_a, r.part_b, r.n_ab, r.n_a, r.n_b) == (10, 20, 4, 5, 5)
    assert r.lift_e6 == (4 * 6 * 1_000_000) // (5 * 5)


def test_welch_ttest_detects_separated_groups(spark, tmp_path):
    """Welch laws: identical halves give t exactly 0; a staged mean
    shift gives the hand-computed t (exact integer moments, one IEEE
    assembly) and a large |t|."""
    import datetime
    import math

    d = datetime.datetime(1996, 1, 1)

    def orders(rows):
        return spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )

    # (a) mirrored halves: identical samples -> t == 0
    rows = []
    for i in range(50):
        price = 100.0 + i
        rows.append((2 * i, 1, "O", price, d, "1"))      # even: group A
        rows.append((2 * i + 1, 1, "O", price, d, "1"))  # odd: group B
    orders(rows).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    r = registry.QUERIES["q_stats_welch_ttest"](spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b) == (50, 50)
    assert r.t6 == 0.0 and r.mean_diff_dollars == 0.0

    # (b) shifted halves: hand-compute Welch t from the same cents
    a = [10000 + 100 * i for i in range(20)]  # cents
    b = [20000 + 100 * i for i in range(20)]
    rows = [(2 * i, 1, "O", a[i] / 100.0, d, "1") for i in range(20)]
    rows += [(2 * i + 1, 1, "O", b[i] / 100.0, d, "1") for i in range(20)]
    orders(rows).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    r = registry.QUERIES["q_stats_welch_ttest"](spark, str(tmp_path)).collect()[0]
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    qa, qb = sum(x * x for x in a), sum(x * x for x in b)
    va = (qa - sa * (sa / na)) / (na - 1) / na
    vb = (qb - sb * (sb / nb)) / (nb - 1) / nb
    want = round((sa / na - sb / nb) / math.sqrt(va + vb), 6)
    assert r.t6 == want
    assert abs(r.t6) > 10  # clearly separated


def test_ohlc_bucket_stays_ntz(spark):
    """TZ-hardening regression (r10): date_trunc coerces the NTZ events
    timestamp to session-zoned TIMESTAMP; under a session timezone
    (pinned UTC) that differs from the process timezone, collect()
    would render the bucket shifted. The query must cast the bucket
    back to timestamp_ntz so every (session, process) timezone
    combination renders the same naive wall-clock hour."""
    from pyspark.sql.types import TimestampNTZType

    df = registry.QUERIES["q_events_resample_ohlc"](spark, SF_DIR)
    bucket_type = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))[
        "bucket"
    ]
    assert isinstance(bucket_type, TimestampNTZType), bucket_type
    # no other declared query leaks a session-zoned timestamp either:
    # every timestamp-typed output column across the surface is NTZ
    from pyspark.sql.types import TimestampType

    leaky = []
    for name, fn in registry.QUERIES.items():
        for f in fn(spark, SF_DIR).schema.fields:
            if isinstance(f.dataType, TimestampType):
                leaky.append(f"{name}.{f.name}")
    assert not leaky, leaky


def test_supplier_scorecard_laws(spark):
    """Scorecard laws: ranks within each nation are a 1..k permutation
    ordered by revenue (ties impossible to misorder: suppkey
    tie-break); return shares sit in [0, 1e6]; every supplier with
    lineitem activity appears exactly once."""
    from collections import defaultdict

    rows = registry.QUERIES["q_supplier_scorecard"](spark, SF_DIR).collect()
    assert rows
    by_nation = defaultdict(list)
    for r in rows:
        assert 0 <= r.return_share_e6 <= 1_000_000, r
        by_nation[r.nation].append(r)
    names = [r.supplier for r in rows]
    assert len(names) == len(set(names))
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r.nation_rank)
        assert [r.nation_rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.revenue >= b.revenue, (nation, a, b)


def test_ship_latency_shares_close(spark):
    """Latency histogram laws: per priority the bucket line counts sum
    to that priority's lineitem count and the floored micro-unit
    shares sum to within len(buckets) of exactly 1e6."""
    from collections import defaultdict

    from datawarehouse1_spark.catalog import table
    from pyspark.sql import functions as F

    rows = registry.QUERIES["q_orders_ship_latency"](spark, SF_DIR).collect()
    by_prio = defaultdict(list)
    for r in rows:
        by_prio[r.o_orderpriority].append(r)
    li = table(spark, SF_DIR, "lineitem").join(
        table(spark, SF_DIR, "orders"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    want = {
        r.o_orderpriority: r.n
        for r in li.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for prio, rs in by_prio.items():
        assert sum(r.n_lines for r in rs) == want[prio]
        total_share = sum(r.share_e6 for r in rs)
        assert 1_000_000 - len(rs) <= total_share <= 1_000_000


def test_interarrival_rate_hand_computed(spark, tmp_path):
    """Inter-arrival laws on a staged stream: gaps are counted per
    (user, type) — never across users; the rate is the exact integer
    rational floor(n * 3.6e9us * 1e6 / sum_gap_us)."""
    import datetime

    base = datetime.datetime(2026, 1, 1)
    rows = []
    # user 1, type a: events at 0s, 10s, 30s -> gaps 10s, 20s
    for i, off in enumerate([0, 10, 30]):
        rows.append((i, base + datetime.timedelta(seconds=off), 1, "a", 1.0, "{}"))
    # user 2, type a: single event -> no gap
    rows.append((10, base, 2, "a", 1.0, "{}"))
    # user 1, type b: events at 0s, 5s -> gap 5s
    rows.append((20, base, 1, "b", 1.0, "{}"))
    rows.append((21, base + datetime.timedelta(seconds=5), 1, "b", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.event_type: r
        for r in registry.QUERIES["q_events_interarrival_rate"](
            spark, str(tmp_path)
        ).collect()
    }
    a, b = got["a"], got["b"]
    assert (a.n_gaps, a.sum_gap_us, a.mean_gap_us) == (2, 30_000_000, 15_000_000)
    assert a.rate_per_hour_e6 == (2 * 3_600_000_000 * 1_000_000) // 30_000_000
    assert (b.n_gaps, b.sum_gap_us) == (1, 5_000_000)
    assert b.rate_per_hour_e6 == (1 * 3_600_000_000 * 1_000_000) // 5_000_000


def test_every_declared_query_survives_an_empty_corpus(spark, tmp_path):
    """Degenerate-input law (r10): every declared query must evaluate
    cleanly over a corpus where EVERY table has zero rows — the state
    of a freshly-provisioned warehouse, and the regression net for
    divide-by-zero / empty-aggregate / empty-broadcast corners (the
    NULLIF/GREATEST guards the r9 self-review added are exactly what
    this sweeps). Schemas are preserved; only the rows are gone."""
    import duckdb

    from tests.conftest import SF_DIR, TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            f" WHERE 1=0) TO '{tmp_path}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    failures = []
    for name, fn in registry.QUERIES.items():
        try:
            fn(spark, str(tmp_path)).count()
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            failures.append(f"{name}: {str(ex).splitlines()[0][:140]}")
    assert not failures, failures


def test_domain_cap_apply_laws(spark):
    """Cap-application laws: n_kept == min(n_docs, 3) per host;
    n_kept + n_dropped == n_docs; kept_chars <= total chars; and the
    corpus-level kept total equals sum over hosts."""
    rows = registry.QUERIES["q_curation_domain_cap_apply"](
        spark, SF_DIR
    ).collect()
    assert rows
    capped = 0
    for r in rows:
        assert r.n_kept == min(r.n_docs, 3), r
        assert r.n_kept + r.n_dropped == r.n_docs, r
        capped += r.n_dropped > 0
    assert capped > 0  # the cap actually bites somewhere


def test_cusum_changepoint_detects_staged_shift(spark, tmp_path):
    """CUSUM law on a staged rate shift: 10 days at 2 events/day then
    10 days at 8 events/day puts the max-|S| day exactly at the shift
    boundary (the last low day), with the hand-computed scaled value."""
    import datetime

    rows = []
    eid = 0
    base = datetime.datetime(2026, 3, 1)
    for day in range(20):
        n = 2 if day < 10 else 8
        for k in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=day, seconds=k),
                 1, "shift", 1.0, "{}")
            )
            eid += 1
    # a steady control stream: constant rate -> |S| == 0 everywhere,
    # tie-break picks the FIRST day
    for day in range(20):
        for k in range(3):
            rows.append(
                (eid, base + datetime.timedelta(days=day, seconds=k),
                 2, "steady", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.event_type: r
        for r in registry.QUERIES["q_events_cusum_changepoint"](
            spark, str(tmp_path)
        ).collect()
    }
    shift = got["shift"]
    # hand-computed: D=20, N=100; S_k for k<10 = sum(2*20-100) = -60k,
    # min at k=10 (day index 9): -600; after that +60/day back to 0
    assert shift.changepoint_day == (base + datetime.timedelta(days=9)).date()
    assert shift.s_scaled == -600
    assert shift.s_abs == 600
    steady = got["steady"]
    assert steady.s_abs == 0
    assert steady.changepoint_day == base.date()
