"""Event-stream analytics (SURVEY.md C19-C20): tumbling windows and
sessionization over the `events` table — batch-checkable here, with the
true streaming forms (watermark / session_window) in streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import money_sum, sql_money_sum
from datawarehouse1_spark.registry import declared

SESSION_GAP_SECONDS = 1800  # 30 min, the classic web-session gap


def _epoch_secs(c):
    """NTZ timestamp -> whole seconds since epoch, tz-free: truncate to
    the second FIRST (DuckDB's date_diff counts second-boundary
    crossings, not elapsed full seconds), then diff against an NTZ epoch
    literal. NTZ cannot cast to BIGINT, and unix_timestamp would drag in
    the session time zone."""
    return F.timestamp_diff(
        "SECOND",
        F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
        F.date_trunc("second", c),
    )


# --- C19: event-time tumbling window aggregation ---
@declared(
    "q_events_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_money_sum('value', 'total_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window is the native tumbling-window operator (streaming-ready:
    add withWatermark and this same plan handles late data). Oracle twin
    is date_trunc('hour') since 1h windows are epoch-aligned."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --- C20: sessionization via gap detection ---
@declared(
    "q_events_sessionize",
    oracle=f"""
    WITH gaps AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(is_new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS session_id
    FROM gaps
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag-gap > 30min starts a session; running sum of the starts numbers
    sessions per user. Streaming twin: F.session_window (streaming/
    session.py). One shuffle on user_id serves both window passes.

    Oracle casts the windowed SUM to BIGINT: DuckDB SUM(integer) returns
    HUGEINT, which pandas-based fetch paths canonicalize as float64
    ('3.0' vs Spark's long '3') — the r1 driver hash mismatch."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = _epoch_secs(F.col("ts"))
    gap = secs - F.lag(secs).over(w)
    is_new = F.when(
        gap.isNull() | (gap > SESSION_GAP_SECONDS), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select("event_id", "user_id", "ts").withColumn(
        "session_id", F.sum(is_new).over(running)
    )


# --- C20b: session stats (events per session, duration) ---
@declared(
    "q_events_session_stats",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           date_diff('second', MIN(ts), MAX(ts)) AS duration_s,
           {sql_money_sum('value', 'session_value')}
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = _epoch_secs(F.col("ts"))
    gap = secs - F.lag(secs).over(w)
    is_new = F.when(
        gap.isNull() | (gap > SESSION_GAP_SECONDS), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = ev.select("user_id", "ts", "value", "event_id").withColumn(
        "session_id", F.sum(is_new).over(running)
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(_epoch_secs(F.col("ts"))) - F.min(_epoch_secs(F.col("ts")))).alias(
            "duration_s"
        ),
        money_sum("value", "session_value"),
    )


# --- JSON extraction from the props column (C23 family) ---
@declared(
    "q_events_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props is a JSON string (TESTDATA.md); get_json_object is the
    JVM-side extraction path (no Python)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@declared(
    "q_events_resample_ohlc",
    oracle="""
    WITH ranked AS (
      SELECT event_type,
             date_trunc('hour', ts) AS bucket,
             value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events
      WHERE value IS NOT NULL
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM ranked
    GROUP BY event_type, bucket
    """,
)
def q_events_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to OHLC bars (open/high/low/close) per
    event type and hour — the standard resample step for metric and
    market-style series. First/last are made deterministic with the
    explicit (ts, event_id) tiebreak (a bare first_value over ts ties
    is engine-dependent); both row_number windows share one
    (event_type, hour) exchange, the bar aggregate reuses it. At
    100 TB: windows are per-(type, hour) partitions — bounded and
    parallel, never global.

    TZ hardening (r10): Spark's date_trunc coerces TIMESTAMP_NTZ input
    to session-zoned TIMESTAMP; when the session timezone (pinned UTC
    by the tuned session) differs from the PROCESS timezone, collect()
    renders the bucket shifted by the offset. Casting straight back to
    timestamp_ntz round-trips through the same session zone, so the
    bucket stays the naive wall-clock hour under every (session,
    process) timezone combination — pinned by
    tests/test_r10_hardening.py::test_ohlc_bucket_stays_ntz."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = (
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("bucket")
    )
    base = e.select("event_type", bucket, "value", "ts", "event_id")
    w_first = Window.partitionBy("event_type", "bucket").orderBy(
        "ts", "event_id"
    )
    w_last = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = base.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_first") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_last") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )
