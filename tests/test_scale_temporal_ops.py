"""Unit tests for the scale-posture and temporal operators: logical
equivalence (salted join == plain join; as-of edge cases) plus physical
assertions (partition pruning reaches the scan; bucketed join plans
without an exchange)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark.operators.scale import (
    salted_join,
    write_bucketed_table,
    write_partitioned_fact,
)
from datawarehouse1_spark.operators.temporal import (
    asof_join_backward,
    range_join_broadcast,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------- salted_join ----------


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (1, "e")], "k long, v string"
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "dk long, dv string")
    got = sorted(
        (r.k, r.v, r.dv)
        for r in salted_join(fact, dim, "k", "dk", n_salts=4).collect()
    )
    want = sorted(
        (r.k, r.v, r.dv) for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    assert got == want


def test_salted_join_left_matches_plain(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "orphan")], "k long, v string"
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "dk long, dv string")
    got = sorted(
        (r.k, r.v, r.dv)
        for r in salted_join(fact, dim, "k", "dk", n_salts=4, how="left").collect()
    )
    want = sorted(
        (r.k, r.v, r.dv)
        for r in fact.join(dim, fact.k == dim.dk, "left").collect()
    )
    assert got == want  # unmatched fact row appears exactly once, dv NULL


def test_salted_join_rejects_outer_modes(spark):
    """right/full would emit each unmatched dim row n_salts times — the
    operator must refuse rather than be silently wrong."""
    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "dk long, dv string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(fact, dim, "k", "dk", n_salts=4, how=how)


def test_salted_join_spreads_hot_key(spark):
    # one hot key, every row identical except a discriminator -> salts differ
    fact = spark.createDataFrame([(1, i) for i in range(100)], "k long, i long")
    dim = spark.createDataFrame([(1, "x")], "dk long, dv string")
    salted = fact.withColumn("__salt", F.pmod(F.hash("k", "i"), F.lit(8)))
    n_salts_used = salted.select("__salt").distinct().count()
    assert n_salts_used > 1  # the hot key's rows spread over >1 reducer
    assert salted_join(fact, dim, "k", "dk", n_salts=8).count() == 100


# ---------- partitioned fact writer ----------


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, datetime(2025, 1, 5)),
            (2, datetime(2025, 1, 20)),
            (3, datetime(2025, 2, 3)),
        ],
        "id long, ts timestamp",
    )
    path = str(tmp_path / "fact")
    write_partitioned_fact(df, path, "ts")
    back = spark.read.parquet(path).filter(F.col("part_month") == "2025-01")
    assert back.count() == 2
    # pruning happened at planning: only one partition dir in the scan
    plan = _plan(back)
    assert "2025-02" not in plan


# ---------- bucketed table ----------


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    a = spark.createDataFrame([(i, f"a{i}") for i in range(100)], "k long, av string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(100)], "k long, bv string")
    write_bucketed_table(a, spark, "t_bucket_a", "k", n_buckets=4)
    write_bucketed_table(b, spark, "t_bucket_b", "k", n_buckets=4)
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = spark.table("t_bucket_a"), spark.table("t_bucket_b")
        joined = ta.join(tb, "k")
        assert joined.count() == 100
        plan = _plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


# ---------- as-of join ----------


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, datetime(2025, 1, 10)),  # after r1, before r2
            (2, 10, datetime(2025, 1, 1)),   # exactly at r1 (tie -> matches)
            (3, 10, datetime(2024, 12, 1)),  # before everything -> NULL
            (4, 20, datetime(2025, 6, 1)),   # other key
            (5, 30, datetime(2025, 6, 1)),   # key with no right rows -> NULL
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, datetime(2025, 1, 1), 101),
            (10, datetime(2025, 1, 15), 102),
            (20, datetime(2025, 1, 1), 201),
        ],
        "k long, rts timestamp, payload long",
    )
    return left, right


def test_asof_backward_semantics(spark, asof_frames):
    left, right = asof_frames
    out = asof_join_backward(left, right, "k", "k", "ts", "rts", ["payload"])
    got = {r.event_id: r.payload for r in out.collect()}
    assert got == {1: 101, 2: 101, 3: None, 4: 201, 5: None}
    assert out.count() == left.count()  # left join: every left row kept


def test_asof_null_payload_propagates(spark):
    """A right row whose payload is genuinely NULL must advance the fill:
    the left row gets NULL, not the stale older payload (struct-fill, not
    per-column ignorenulls)."""
    left = spark.createDataFrame(
        [(1, 10, datetime(2025, 1, 20))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, datetime(2025, 1, 1), 101),
            (10, datetime(2025, 1, 15), None),  # newest as-of row: NULL payload
        ],
        "k long, rts timestamp, payload long",
    )
    out = asof_join_backward(left, right, "k", "k", "ts", "rts", ["payload"])
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].payload is None, "stale payload leaked past a NULL right row"


def test_asof_payload_name_collision_raises(spark, asof_frames):
    left, right = asof_frames
    clashing = right.withColumnRenamed("payload", "ts")  # collides with left.ts
    with pytest.raises(ValueError, match="collide"):
        asof_join_backward(left, clashing, "k", "k", "ts", "rts", ["ts"])


def test_asof_single_shuffle(spark, asof_frames):
    left, right = asof_frames
    plan = _plan(asof_join_backward(left, right, "k", "k", "ts", "rts", ["payload"]))
    # one exchange for the window; no BroadcastNestedLoop / CartesianProduct
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# ---------- range join ----------


def test_range_join_bands(spark):
    fact = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 150.0)], "id long, v double")
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 100.0)], "band string, lo double, hi double"
    )
    got = {r.id: r.band for r in range_join_broadcast(fact, bands, "v").collect()}
    assert got == {1: "lo", 2: "hi"}  # 150.0 outside all bands -> dropped


# ---------- ANALYZE for CBO ----------


def test_analyze_for_cbo_records_stats(spark):
    from datawarehouse1_spark.operators.scale import analyze_for_cbo

    df = spark.createDataFrame([(i, f"v{i % 7}") for i in range(500)], "k long, v string")
    df.write.mode("overwrite").format("parquet").saveAsTable("t_cbo_stats")
    try:
        analyze_for_cbo(spark, "t_cbo_stats", ["k", "v"])
        det = spark.sql("DESCRIBE TABLE EXTENDED t_cbo_stats").collect()
        stats = {r.col_name: r.data_type for r in det}
        assert "Statistics" in stats and "500 rows" in stats["Statistics"]
        colstat = spark.sql("DESCRIBE EXTENDED t_cbo_stats v").collect()
        kv = {r.info_name: r.info_value for r in colstat}
        assert kv.get("distinct_count") == "7"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cbo_stats")


# ---------- compaction ----------


def test_compact_table_reduces_files(spark, tmp_path):
    from pathlib import Path

    from datawarehouse1_spark.operators.scale import compact_table

    path = str(tmp_path / "frag")
    # simulate streaming appends: 12 tiny files
    for i in range(12):
        spark.createDataFrame([(i, f"v{i}")], "k long, v string").coalesce(
            1
        ).write.mode("append").parquet(path)
    before = len(list(Path(path).rglob("*.parquet")))
    assert before >= 12

    rows_before = sorted((r.k, r.v) for r in spark.read.parquet(path).collect())
    n_out = compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    after = len(list(Path(path).rglob("*.parquet")))
    assert n_out == 1 and after == 1
    rows_after = sorted((r.k, r.v) for r in spark.read.parquet(path).collect())
    assert rows_after == rows_before  # lossless rewrite


def test_compact_table_leaves_no_residue(spark, tmp_path):
    from pathlib import Path

    from datawarehouse1_spark.operators.scale import compact_table

    path = str(tmp_path / "frag_clean")
    for i in range(4):
        spark.createDataFrame([(i, f"v{i}")], "k long, v string").coalesce(
            1
        ).write.mode("append").parquet(path)
    compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    residue = [p.name for p in tmp_path.iterdir() if "__" in p.name]
    assert residue == [], f"leftover staging/backup dirs: {residue}"


def test_compact_table_without_success_markers(spark, tmp_path):
    """marksuccessfuljobs=false deployments write no _SUCCESS file; the
    verify step must then accept a parquet-bearing output instead of
    rolling back every compaction (round-4 ADVICE fix)."""
    from pathlib import Path

    from datawarehouse1_spark.operators.scale import compact_table

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    old = hconf.get(key, "true")
    hconf.set(key, "false")
    try:
        path = str(tmp_path / "frag_nomarker")
        for i in range(4):
            spark.createDataFrame([(i, f"v{i}")], "k long, v string").coalesce(
                1
            ).write.mode("append").parquet(path)
        rows_before = sorted((r.k, r.v) for r in spark.read.parquet(path).collect())
        n_out = compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
        assert n_out == 1
        assert not (Path(path) / "_SUCCESS").exists()  # committer really off
        rows_after = sorted((r.k, r.v) for r in spark.read.parquet(path).collect())
        assert rows_after == rows_before
        residue = [p.name for p in tmp_path.iterdir() if "__" in p.name]
        assert residue == []
    finally:
        hconf.set(key, old)


def test_compact_table_restores_backup_on_failure(spark, tmp_path, monkeypatch):
    """If the swap fails mid-flight the original table is restored from
    the backup — compaction can strand a staging dir but never lose the
    table."""
    import shutil as _shutil
    from pathlib import Path

    from datawarehouse1_spark.operators.scale import compact_table

    path = str(tmp_path / "frag_crash")
    for i in range(3):
        spark.createDataFrame([(i, f"v{i}")], "k long, v string").coalesce(
            1
        ).write.mode("append").parquet(path)
    rows_before = sorted((r.k, r.v) for r in spark.read.parquet(path).collect())

    real_move = _shutil.move
    calls = {"n": 0}

    def exploding_move(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the staging -> serving rename
            raise OSError("simulated crash during swap")
        return real_move(src, dst)

    monkeypatch.setattr(_shutil, "move", exploding_move)
    with pytest.raises(OSError, match="simulated crash"):
        compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    monkeypatch.undo()

    assert Path(path).exists(), "table path lost after failed compaction"
    rows_after = sorted((r.k, r.v) for r in spark.read.parquet(path).collect())
    assert rows_after == rows_before


def test_compact_table_preserves_partitions(spark, tmp_path):
    from pathlib import Path

    from datawarehouse1_spark.operators.scale import compact_table

    path = str(tmp_path / "frag_part")
    for i in range(8):
        spark.createDataFrame(
            [(i, "2025-01" if i % 2 == 0 else "2025-02")], "k long, month string"
        ).coalesce(1).write.mode("append").partitionBy("month").parquet(path)

    compact_table(spark, path, target_file_bytes=10 * 1024 * 1024, partition_col="month")
    # partition dirs survive (pruning preserved), and rows are intact
    dirs = {p.name for p in Path(path).iterdir() if p.is_dir()}
    assert dirs == {"month=2025-01", "month=2025-02"}
    back = spark.read.parquet(path)
    assert back.count() == 8
    assert back.filter(F.col("month") == "2025-01").count() == 4


def test_bucketed_fact_join_on_real_tables(spark):
    """The flagship's only shuffled join (lineitem⋈orders on orderkey)
    goes shuffle-free when both facts are bucketed on the key — the
    pre-paid-shuffle layout a recurring 100 TB join would use."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.operators.scale import write_bucketed_table

    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed_table(li, spark, "t_li_bkt", "l_orderkey", n_buckets=4)
    write_bucketed_table(o, spark, "t_o_bkt", "o_orderkey", n_buckets=4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bli, bo = spark.table("t_li_bkt"), spark.table("t_o_bkt")
        joined = bli.join(bo, bli.l_orderkey == bo.o_orderkey)
        plan = _plan(joined)
        assert "Exchange" not in plan, "bucketed fact join still shuffles"
        want = (
            li.join(o, li.l_orderkey == o.o_orderkey).count()
        )
        assert joined.count() == want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS t_li_bkt")
        spark.sql("DROP TABLE IF EXISTS t_o_bkt")


# ---------- Z-order clustered writer ----------


def _per_file_spreads(path, cols):
    """Per-parquet-file (max-min) spread of each column, via footer
    statistics — exactly what a scan's file-skipping reads."""
    from pathlib import Path

    import pyarrow.parquet as pq

    spreads = {c: [] for c in cols}
    for f in Path(path).rglob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for i in range(group.num_columns):
                col = group.column(i)
                name = col.path_in_schema
                if name in spreads and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        for c in cols:
            if lo[c] is not None:
                spreads[c].append(hi[c] - lo[c])
    return spreads


def test_zorder_bounds_every_column(spark, tmp_path):
    """Z-ordered layout: per-file min/max spread is a small fraction of
    the global range for BOTH keys, where a single-column sort bounds
    only its own key — the property file-skipping at 100 TB depends on."""
    import itertools

    from datawarehouse1_spark.operators.scale import write_zordered

    # a 64x64 grid: both dims uniform, global range 0..630
    rows = [(x * 10, y * 10) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "x long, y long")

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    z = _per_file_spreads(zpath, ["x", "y"])

    spath = str(tmp_path / "xsort")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )
    s = _per_file_spreads(spath, ["x", "y"])

    global_range = 630
    zx = sum(z["x"]) / len(z["x"]) / global_range
    zy = sum(z["y"]) / len(z["y"]) / global_range
    sy = sum(s["y"]) / len(s["y"]) / global_range
    # z-order: both dims bounded well below the global range
    assert zx <= 0.5 and zy <= 0.5, f"z-order spreads x={zx:.2f} y={zy:.2f}"
    # x-sorted layout: y is unbounded (~full range) per file
    assert sy > 0.9, f"expected x-sort to leave y unpruned, got {sy:.2f}"

    # round trip is lossless
    back = sorted((r.x, r.y) for r in spark.read.parquet(zpath).collect())
    assert back == sorted(rows)


def test_zorder_filter_skips_files(spark, tmp_path):
    """A predicate on EITHER z-ordered column must touch only a subset
    of files (file-level min/max skipping)."""
    import itertools

    from pyspark.sql import functions as F

    from datawarehouse1_spark.operators.scale import write_zordered

    rows = [(x * 10, y * 10) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "x long, y long")
    zpath = str(tmp_path / "zorder_skip")
    write_zordered(df, zpath, ["x", "y"], n_files=16)

    back = spark.read.parquet(zpath)
    for col in ("x", "y"):
        touched = (
            back.filter(F.col(col) < 100)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        assert touched <= 8, f"filter on {col} touched {touched}/16 files"


# ---------- dynamic partition overwrite ----------


def test_overwrite_partitions_touches_only_present_months(spark, tmp_path):
    """Backfilling one month must replace that month and leave every
    other partition byte-for-byte intact."""
    from datawarehouse1_spark.operators.scale import overwrite_partitions

    path = str(tmp_path / "fact_dyn")
    base = spark.createDataFrame(
        [(1, "2025-01", 10.0), (2, "2025-01", 20.0), (3, "2025-02", 30.0)],
        "id long, month string, v double",
    )
    base.write.partitionBy("month").parquet(path)

    # corrected January: one row instead of two, new values
    fix = spark.createDataFrame(
        [(9, "2025-01", 99.0)], "id long, month string, v double"
    )
    overwrite_partitions(fix, path, "month")

    back = spark.read.parquet(path)
    got = sorted((r.id, r.month, r.v) for r in back.collect())
    assert got == [(3, "2025-02", 30.0), (9, "2025-01", 99.0)]

    # conf restored (scoped to the write)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_bloom_semi_join_law_and_pruning(spark):
    """bloom_semi_join == plain left-semi join bit-for-bit (the bloom
    can only admit false positives, which the exact join removes), the
    prefilter actually prunes, and the FP rate stays under ~2% at the
    default 10+ bits/key sizing."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.operators.scale import bloom_semi_join
    from tests.conftest import SF_DIR

    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    rich = table(spark, SF_DIR, "customer").filter(F.col("c_acctbal") > 9000)

    got = bloom_semi_join(o, rich, "o_custkey", "c_custkey")
    want = o.join(rich, o.o_custkey == rich.c_custkey, "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # the prefilter alone: it must pass every true member and prune
    # hard — FP rate under ~2% of the non-members at 10+ bits/key
    from datawarehouse1_spark.operators.scale import bloom_prefilter

    n_fact, n_true = o.count(), want.count()
    n_pre = bloom_prefilter(o, rich, "o_custkey", "c_custkey").count()
    assert n_true <= n_pre < n_fact, "prefilter must pass members and prune"
    fp_rate = (n_pre - n_true) / max(1, n_fact - n_true)
    assert fp_rate < 0.02, f"bloom FP rate {fp_rate:.3%} above bound"
    # and the prefilter is NARROW: no exchange added before the scan
    plan = bloom_prefilter(o, rich, "o_custkey", "c_custkey")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 0
    # a bloom built from an EMPTY dim must reject everything (no bits set)
    empty = rich.filter(F.lit(False))
    assert bloom_semi_join(o, empty, "o_custkey", "c_custkey").count() == 0
