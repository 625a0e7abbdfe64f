"""Stream-batch parity: running the streaming tumbling-window operator
over the real events table (file source, micro-batched) must produce
exactly the batch query's answer — the Structured Streaming guarantee
the engine's C19 operators rely on, verified on real data."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datawarehouse1_spark.catalog import table
from tests.conftest import SF_DIR

RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as long
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source wants a directory: expose the (read-only) events
    # file through a symlink in a temp dir
    import os

    src_dir = tmp_path / "events_src"
    src_dir.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    from datawarehouse1_spark.functions import ntz_utc

    raw = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
        .withColumn("ts", ntz_utc(F.timestamp_micros(F.expr("ts div 1000"))))
    )
    counts = (
        raw.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events")
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("stream_tumbling_parity")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.hour_start), r.event_type): r.n_events
            for r in spark.sql("SELECT * FROM stream_tumbling_parity").collect()
        }
    finally:
        q.stop()

    ev = table(spark, SF_DIR, "events")
    want = {
        (str(r.hour_start), r.event_type): r.n_events
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events")
        .collect()
    }
    assert got == want and len(got) > 10
