"""Streaming SCD2 maintenance (streaming/scd2_maintenance.py).

The load-bearing claim is the batching-invariance law: folding a change
feed batch-by-batch through the sink yields EXACTLY
scd2_from_changes(whole feed) — cross-batch interval closing included.
Plus: delete-closes-history across batches, replay idempotence, and
bootstrap.
"""

from __future__ import annotations

from datawarehouse1_spark.operators.warehouse import scd2_from_changes
from datawarehouse1_spark.streaming.scd2_maintenance import make_scd2_sink
from datawarehouse1_spark.streaming.snapshot_store import latest_version

SCHEMA = "k int, v string, op string, seq int"


def _history(spark, path):
    return {
        (r.k, r.v, r.valid_from_seq, r.valid_to_seq, r.is_current)
        for r in spark.read.parquet(path).collect()
    }


def test_scd2_sink_batching_invariance_law(spark, tmp_path):
    path = str(tmp_path / "hist")
    sink = make_scd2_sink(spark, path, keys=("k",))

    b0 = [(1, "a1", "I", 1), (2, "b1", "I", 2), (1, "a2", "U", 4)]
    b1 = [(1, "a3", "U", 7), (3, "c1", "I", 8)]
    b2 = [(2, None, "D", 9), (1, "a4", "U", 11)]

    sink(spark.createDataFrame(b0, SCHEMA), 0)
    sink(spark.createDataFrame(b1, SCHEMA), 1)
    sink(spark.createDataFrame(b2, SCHEMA), 2)

    full = spark.createDataFrame(b0 + b1 + b2, SCHEMA)
    want = {
        (r.k, r.v, r.valid_from_seq, r.valid_to_seq, r.is_current)
        for r in scd2_from_changes(full, keys=("k",)).collect()
    }
    assert _history(spark, path) == want
    # spot semantics: k=2 deleted in b2 -> closed at 9, no current row;
    # k=1 chained across three batches, a4 current
    assert (2, "b1", 2, 9, False) in want
    assert (1, "a4", 11, None, True) in want
    assert not any(k == 2 and cur for (k, _, _, _, cur) in want)


def test_scd2_sink_replay_noop_and_bootstrap(spark, tmp_path):
    path = str(tmp_path / "hist")
    sink = make_scd2_sink(spark, path, keys=("k",))
    b0 = spark.createDataFrame([(1, "a1", "I", 1)], SCHEMA)
    sink(b0, 0)
    assert latest_version(path) == 0
    once = _history(spark, path)
    assert once == {(1, "a1", 1, None, True)}

    sink(b0, 0)  # at-least-once redelivery: strict no-op
    assert _history(spark, path) == once
    assert latest_version(path) == 0


def test_scd2_sink_out_of_order_batch_raises(spark, tmp_path):
    """A batch whose seq is at or below a key's newest existing version
    would silently write valid_to <= valid_from; the sink must raise
    (the streaming twin of the duplicate-seq guard)."""
    import pytest

    path = str(tmp_path / "hist")
    sink = make_scd2_sink(spark, path, keys=("k",))
    sink(spark.createDataFrame([(1, "a1", "I", 5)], SCHEMA), 0)
    with pytest.raises(ValueError, match="globally-increasing-seq"):
        sink(spark.createDataFrame([(1, "a0", "U", 5)], SCHEMA), 1)
    with pytest.raises(ValueError, match="globally-increasing-seq"):
        sink(spark.createDataFrame([(1, "a0", "U", 3)], SCHEMA), 2)
    # history untouched by the rejected batches
    assert _history(spark, path) == {(1, "a1", 5, None, True)}
    assert latest_version(path) == 0
