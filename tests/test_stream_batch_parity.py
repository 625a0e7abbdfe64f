"""Stream-batch parity: running the streaming tumbling-window operator
over the real events table (file source, micro-batched) must produce
exactly the batch query's answer — the Structured Streaming guarantee
the engine's C19 operators rely on, verified on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import events_stream_source, table
from tests.conftest import SF_DIR


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    # the file source wants a directory: expose the (read-only) events
    # file through a symlink in a temp dir
    import os

    src_dir = tmp_path / "events_src"
    src_dir.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")

    # schema + ts normalization branch on the file's actual encoding
    # (r4 lesson: the fixture hardcoded TIMESTAMP(NANOS) and broke when
    # the driver re-encoded to timestamp[us])
    raw = events_stream_source(spark, str(src_dir), maxFilesPerTrigger=1)
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
