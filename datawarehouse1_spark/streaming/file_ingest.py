"""Streaming file ingest — the reference's main loop, Spark-native.

Reference (etl/app.py:249-289): poll WATCH_DIRECTORY every
POLLING_INTERVAL seconds, skip `~$` lock files, skip already-processed
files via the file_metadata table, per-file try/except with status
recording, reconnect-with-backoff on errors.

Spark mapping (SURVEY.md E2): Structured Streaming's file source IS that
loop — checkpointed file tracking replaces file_metadata (exactly-once,
etl/app.py:36-89 subsumed), trigger(processingTime) replaces the sleep,
query restart from checkpoint replaces reconnect/backoff. foreachBatch
runs validate-then-write per micro-batch, preserving the reference's
fail-the-file atomicity.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

LOCK_GLOB = "[!~]*"  # `~$` Excel lock-file skip (etl/app.py:262-263)


def stream_ingest(
    spark: SparkSession,
    watch_dir: str,
    schema: StructType,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    fmt: str = "parquet",
    trigger_seconds: int = 60,  # deployed POLLING_INTERVAL (docker-compose.yml:35)
    glob: str = LOCK_GLOB,
    status_dir: str | None = None,
) -> StreamingQuery:
    """Watch a directory, enrich with lineage columns, hand each
    micro-batch to `sink` (typically ingest_sink below). fmt='xlsx'
    routes through the binaryFile source + per-task parse
    (sources/excel.py::xlsx_stream) — the reference's actual input
    format on the streaming path; other formats use the native file
    sources.

    On the xlsx path, files that fail to parse/validate are recorded as
    durable status=error rows in `status_dir` (default:
    `<checkpoint_dir>/file_status`, queryable parquet) — the reference's
    per-file file_metadata status row (etl/app.py:271-275). A log-only
    skip would leave operators with no record of dropped uploads."""
    if fmt == "xlsx":
        from datawarehouse1_spark.sources.excel import xlsx_stream

        # lineage columns are added inside the parse body
        stream = xlsx_stream(
            spark,
            watch_dir,
            schema,
            glob=glob if glob != LOCK_GLOB else "[!~]*.xlsx",
            with_status=True,
        )
        sink = _with_status_sink(
            sink, status_dir or f"{checkpoint_dir.rstrip('/')}/file_status"
        )
    else:
        stream = (
            spark.readStream.schema(schema)
            .format(fmt)
            .option("pathGlobFilter", glob)
            .option("maxFilesPerTrigger", 100)
            .load(watch_dir)
            # O5 enrichment (etl/app.py:158-159), the real nondeterministic form
            .withColumn("source_file", F.input_file_name())
            .withColumn("imported_at", F.current_timestamp())
        )
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def _with_status_sink(
    inner: Callable[[DataFrame, int], None], status_dir: str
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch sink: route parse_error status rows to a
    durable quarantine table (append-only parquet — one row per failed
    file: source_file, parse_error, imported_at, batch_id), pass clean
    rows (parse_error column dropped) to the wrapped sink. The batch is
    persisted because it is consumed twice — without the persist each
    filter would re-run the whole mapInPandas parse."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            errors = batch.filter(F.col("parse_error").isNotNull()).select(
                "source_file",
                "parse_error",
                "imported_at",
                F.lit(batch_id).alias("batch_id"),
                F.lit("error").alias("status"),
            )
            if not errors.isEmpty():
                errors.write.mode("append").parquet(status_dir)
            inner(batch.filter(F.col("parse_error").isNull()).drop("parse_error"), batch_id)
        finally:
            batch.unpersist()

    return sink


def make_ingest_sink(
    table_path: str,
    business_key: str,
    not_null_cols: list[str],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: validate-then-append per micro-batch (the
    transaction-per-file analog). Invalid batches are skipped whole —
    the streaming query keeps running (per-file try/except semantics,
    etl/app.py:271-275)."""
    from datawarehouse1_spark.operators.ingest import append_if_valid

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_if_valid(
            batch,
            table_path,
            business_key,
            not_null_cols,
            source_file=f"batch-{batch_id}",
        )

    return sink


def stream_tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """C19 streaming form: watermarked event-time tumbling aggregation
    (late rows beyond the watermark are dropped, state is bounded)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def stream_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """C20 streaming form: native session_window (gap-based, merging)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )

def stream_dedup_within_watermark(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Built-in bounded-state streaming dedup: dropDuplicatesWithinWatermark
    keeps a key's state only until the watermark passes its event time,
    then evicts it — unlike plain dropDuplicates, whose state grows
    without bound. This is the 100 TB-safe default for deduplicating
    at-least-once sources (file redelivery, Kafka replay); the
    applyInPandasWithState/transformWithState twins in
    streaming/stateful.py are the custom-logic forms of the same shape.

    Spark watermarks require TIMESTAMP (LTZ); an NTZ event-time column
    is cast via the session zone — safe here because watermark logic is
    RELATIVE (event-time ordering and gaps survive any fixed-offset
    reinterpretation), unlike window/date_trunc outputs which must stay
    NTZ (see functions.ntz_utc).
    """
    from pyspark.sql.types import TimestampNTZType

    if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
