"""applyInPandasWithState operators: cross-batch dedup emits each key
exactly once; running totals accumulate across micro-batches."""

from __future__ import annotations

import time

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from datawarehouse1_spark.streaming.stateful import (
    stream_dedup_by_key,
    stream_running_totals,
)

SCHEMA = StructType(
    [StructField("k", StringType()), StructField("value", LongType())]
)


def _feed(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_dedup_exactly_once_per_key(spark, tmp_path):
    src = str(tmp_path / "src")
    _feed(spark, src, [("a", 1), ("a", 2), ("b", 3)])

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_dedup_by_key(stream, "k")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.key for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert got == {"a", "b"}

        # second batch: one repeat key, one new key -> only the new emits
        _feed(spark, src, [("a", 9), ("c", 4)])
        q.processAllAvailable()
        rows = spark.sql("SELECT key FROM dedup_out").collect()
        assert sorted(r.key for r in rows) == ["a", "b", "c"]  # 'a' NOT re-emitted
    finally:
        q.stop()


def test_stream_running_totals_accumulate(spark, tmp_path):
    src = str(tmp_path / "src2")
    _feed(spark, src, [("u1", 10), ("u1", 5), ("u2", 1)])

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_running_totals(stream, "k", "value")
        .writeStream.format("memory")
        .queryName("totals_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
        _feed(spark, src, [("u1", 100)])
        q.processAllAvailable()
        time.sleep(0.5)
        # latest state per key (update mode appends new rows to memory sink)
        rows = spark.sql(
            "SELECT key, max(n_events) AS n, max(total) AS t FROM totals_out GROUP BY key"
        ).collect()
        got = {r.key: (r.n, r.t) for r in rows}
        assert got["u1"] == (3, 115)
        assert got["u2"] == (1, 1)
    finally:
        q.stop()


# ---------- transformWithStateInPandas twins ----------

# The TWS runtime serializes state-server messages with protobuf
# (pyspark/sql/streaming/proto/StateMessage_pb2) — google.protobuf is not
# installed in this container, so the twins are verified only where it
# is. The applyInPandasWithState originals above cover the same operator
# semantics unconditionally.
_HAS_PROTOBUF = True
try:  # pragma: no cover - env probe
    import google.protobuf  # noqa: F401
except ImportError:
    _HAS_PROTOBUF = False

tws = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState needs google.protobuf (absent here)",
)


def _with_rocksdb(spark):
    """TWS requires the RocksDB state-store provider (bundled with
    Spark 4); returns the previous provider for restore."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return key, prev


def _restore(spark, key, prev):
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


@tws
def test_tws_dedup_parity(spark, tmp_path):
    from datawarehouse1_spark.streaming.stateful import stream_dedup_by_key_tws

    key, prev = _with_rocksdb(spark)
    src = str(tmp_path / "src_tws")
    _feed(spark, src, [("a", 1), ("a", 2), ("b", 3)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_dedup_by_key_tws(stream, "k")
        .writeStream.format("memory")
        .queryName("tws_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_tws"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.key for r in spark.sql("SELECT * FROM tws_dedup_out").collect()}
        assert got == {"a", "b"}
        _feed(spark, src, [("a", 9), ("c", 4)])
        q.processAllAvailable()
        rows = spark.sql("SELECT key FROM tws_dedup_out").collect()
        assert sorted(r.key for r in rows) == ["a", "b", "c"]
    finally:
        q.stop()
        _restore(spark, key, prev)


@tws
def test_tws_running_totals_parity(spark, tmp_path):
    from datawarehouse1_spark.streaming.stateful import stream_running_totals_tws

    key, prev = _with_rocksdb(spark)
    src = str(tmp_path / "src_tws2")
    _feed(spark, src, [("u1", 10), ("u1", 5), ("u2", 1)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_running_totals_tws(stream, "k", "value")
        .writeStream.format("memory")
        .queryName("tws_totals_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_tws2"))
        .start()
    )
    try:
        q.processAllAvailable()
        _feed(spark, src, [("u1", 100)])
        q.processAllAvailable()
        time.sleep(0.5)
        rows = spark.sql(
            "SELECT key, max(n_events) AS n, max(total) AS t "
            "FROM tws_totals_out GROUP BY key"
        ).collect()
        got = {r.key: (r.n, r.t) for r in rows}
        assert got["u1"] == (3, 115)
        assert got["u2"] == (1, 1)
    finally:
        q.stop()
        _restore(spark, key, prev)
