"""Round-8 hardening: regression tests for the four ADVICE r7 findings.

1. rollup_maintenance — legacy (pre-r7, `_last_batch`-column) rollups
   have no snapshot version, so the replay guard must come from the
   column itself before it is dropped.
2. sampling — the oversample prefilter join must be NULL-safe, or NULL
   strata are silently starved while the naive path samples them.
3. scd2_maintenance — the cross-batch high-water mark must include
   valid_to_seq (a delete closes intervals ABOVE max valid_from_seq).
4. temporal.interval_overlap_join — duplicate input rows must keep
   their multiplicity (canonical-bucket emission, no full-row dedup).
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ROLLUP_SCHEMA = StructType(
    [
        StructField("order_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("amount", DoubleType()),
    ]
)


def _rollup_agg(df):
    return df.groupBy(
        F.date_trunc("month", F.col("ts")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("amount").cast("decimal(18,2)")).alias("total"),
    )


def _rollup_batch(spark, rows):
    data = [(oid, datetime.fromisoformat(ts), amt) for oid, ts, amt in rows]
    return spark.createDataFrame(data, ROLLUP_SCHEMA)


def test_legacy_rollup_replay_guard_reads_last_batch_column(spark, tmp_path):
    """ADVICE r7 #1: a pre-r7 rollup is a REAL dir carrying the guard in
    a `_last_batch` column; latest_version() is None for it, so the
    filesystem guard is vacuous. A checkpoint replay right after the
    upgrade (sink committed, checkpoint didn't) must still be a no-op —
    the sink has to consult max(_last_batch) before dropping it."""
    from datawarehouse1_spark.streaming.rollup_maintenance import make_rollup_sink
    from datawarehouse1_spark.streaming.snapshot_store import latest_version

    rollup = str(tmp_path / "rollup")
    # simulate the pre-r7 layout: plain parquet dir, guard column inline,
    # already containing the fold of batches 0 and 1
    legacy = spark.createDataFrame(
        [("2025-01-01", 2, 15.00, 1)],
        "month string, n_orders long, total double, _last_batch long",
    ).select(
        F.col("month").cast("date").alias("month"),
        "n_orders",
        F.col("total").cast("decimal(18,2)").alias("total"),
        "_last_batch",
    )
    legacy.write.parquet(rollup)
    assert latest_version(rollup) is None  # truly legacy: no version

    sink = make_rollup_sink(
        spark, rollup, _rollup_agg, ["month"], ["n_orders", "total"]
    )
    # replay of batch 1 (already folded into the legacy table): no-op
    sink(_rollup_batch(spark, [("O2", "2025-01-20T11:00:00", 4.5)]), 1)
    after_replay = {
        str(r.month): (r.n_orders, str(r.total))
        for r in spark.read.parquet(rollup).collect()
    }
    assert after_replay == {"2025-01-01": (2, "15.00")}, "replay double-counted"

    # a genuinely NEW batch (id 2) merges, migrates the layout, and the
    # guard column is gone from the serving schema
    sink(_rollup_batch(spark, [("O3", "2025-02-03T08:00:00", 99.99)]), 2)
    served = spark.read.parquet(os.path.realpath(rollup))
    assert "_last_batch" not in served.columns
    after_new = {
        str(r.month): (r.n_orders, str(r.total)) for r in served.collect()
    }
    assert after_new == {
        "2025-01-01": (2, "15.00"),
        "2025-02-01": (1, "99.99"),
    }
    assert latest_version(rollup) == 2


def test_stratified_sample_null_strata_path_equivalence(spark):
    """ADVICE r7 #2: rows whose stratum is NULL must be sampled by the
    oversample scale path exactly as by the naive window path (the
    prefilter join is NULL-safe now)."""
    from datawarehouse1_spark.operators.sampling import stratified_sample

    rows = [(f"id{i:03d}", None if i % 3 == 0 else f"g{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "k string, grp string")

    naive = stratified_sample(df, ["grp"], "k", k=5)
    scaled = stratified_sample(df, ["grp"], "k", k=5, oversample=4)
    key = lambda d: sorted(
        (r.grp or "", r.k, r.sample_rank) for r in d.collect()
    )
    assert key(naive) == key(scaled)
    # and the NULL stratum is actually present with exactly k rows
    nulls = [t for t in key(scaled) if t[0] == ""]
    assert len(nulls) == 5


def test_stratified_sample_null_strata_shortfall_is_loud(spark):
    """The exact-or-loud check must also see NULL strata: an oversample
    so tight it starves the NULL stratum raises instead of silently
    shrinking the sample."""
    from datawarehouse1_spark.operators.sampling import stratified_sample

    # one large NULL stratum; tiny hash-space cut via oversample=1, k=40
    rows = [(f"id{i:04d}", None) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, grp string")
    naive = stratified_sample(df, ["grp"], "k", k=40)
    assert naive.count() == 40
    try:
        out = stratified_sample(df, ["grp"], "k", k=40, oversample=1)
        # if the prefilter happened to keep >= 40 rows, the paths agree
        assert sorted(r.k for r in out.collect()) == sorted(
            r.k for r in naive.collect()
        )
    except RuntimeError as e:
        assert "shortfall" in str(e)


def test_scd2_sink_rejects_seq_inside_delete_closed_interval(spark, tmp_path):
    """ADVICE r7 #3: a delete closes the last version at the D's seq, so
    the key's seq high-water mark is a valid_to_seq ABOVE every
    valid_from_seq. A later batch with a seq inside that closed interval
    violates the globally-increasing contract and must raise — the old
    max(valid_from_seq) guard let it through silently."""
    from datawarehouse1_spark.streaming.scd2_maintenance import make_scd2_sink

    path = str(tmp_path / "hist")
    sink = make_scd2_sink(spark, path, keys=("k",))
    schema = "k int, v string, op string, seq int"
    # I at 1, D at 5 -> one closed version [1, 5), no current row
    sink(spark.createDataFrame([(1, "a1", "I", 1), (1, None, "D", 5)], schema), 0)
    hist = {
        (r.k, r.v, r.valid_from_seq, r.valid_to_seq, r.is_current)
        for r in spark.read.parquet(path).collect()
    }
    assert hist == {(1, "a1", 1, 5, False)}

    # seq 3 sits strictly inside (1, 5): above max(valid_from_seq)=1 but
    # below the delete-close at 5 -> overlapping version row if accepted
    with pytest.raises(ValueError, match="globally-increasing-seq"):
        sink(spark.createDataFrame([(1, "a2", "I", 3)], schema), 1)
    # history untouched; a seq above the close is accepted fine
    sink(spark.createDataFrame([(1, "a3", "I", 7)], schema), 2)
    hist2 = {
        (r.k, r.v, r.valid_from_seq, r.valid_to_seq, r.is_current)
        for r in spark.read.parquet(path).collect()
    }
    assert hist2 == {(1, "a1", 1, 5, False), (1, "a3", 7, None, True)}


def test_interval_overlap_join_keeps_duplicate_row_multiplicity(spark):
    """ADVICE r7 #4: two identical intervals on one side must produce
    two output pairs (brute-force theta-join semantics), and pairs
    spanning many shared buckets still appear exactly once each."""
    from datawarehouse1_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 0, 100), (3, 250, 260)], "lid long, s long, e long"
    )
    # duplicate right rows: identical (rs, re) twice, spanning many buckets
    right = spark.createDataFrame(
        [(10, 50, 95), (10, 50, 95), (11, 255, 256)], "rid long, s long, e long"
    )
    out = interval_overlap_join(
        left, right, "s", "e", "s", "e", bucket_width=10
    )
    pairs = sorted((r.l_lid, r.r_rid) for r in out.collect())
    # brute force: lid 1 and 2 each overlap BOTH copies of rid 10;
    # lid 3 overlaps rid 11 once
    assert pairs == [(1, 10), (1, 10), (2, 10), (2, 10), (3, 11)]

    # and no dedup exchange: the plan carries no Aggregate/Deduplicate
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan
