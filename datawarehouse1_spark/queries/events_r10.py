"""Round-10 event analytics, batch 4: ordered funnel conversion,
longest consecutive-day streaks, and hopping (sliding) window counts.

Three event-stream reporting shapes every product-analytics serving
layer runs that were missing from the battery:

* **Ordered funnel** — view -> click -> purchase where each step must
  happen AT OR AFTER the previous step's first qualifying event.
  Expressed with running-min windows (the RANGE-default frame both
  engines share): one pass computes, per event row, the earliest view
  so far, then the earliest *qualifying* click so far (a click with a
  view at or before it), then the earliest qualifying purchase. ONE
  user-partitioned sort exchange serves all three window stages and
  the per-user rollup; the final 3-row report is a single tiny
  aggregate. At 100 TB only (user_id, ts, type) tuples for the three
  funnel types ever shuffle — the isin filter pushes to the scan.

* **Longest daily streak** — the classic gaps-and-islands rewrite:
  distinct (user, day), anchor = day - row_number() (constant within
  a consecutive run), runs grouped by (user, anchor), best run per
  user by (length DESC, start ASC) so ties are deterministic.

* **Hopping window** — 1-hour windows sliding every 15 minutes (each
  event lands in exactly 4 windows): the Spark side uses the NATIVE
  F.window(ts, '1 hour', '15 minutes') generator; the oracle derives
  the same window set arithmetically (15-min bucket minus k slides,
  k in 0..3). Both align on wall-clock 15-minute boundaries, so the
  twins agree in any session timezone (events.ts is TIMESTAMP_NTZ via
  the catalog; the output window bounds stay NTZ — SCALE.md rule 25).

Reference parity: the reference ETL (etl/app.py) has no event-stream
surface; SURVEY.md §2C (C19/C20 adjacency) extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

# ---------------------------------------------------------------- 1.

_FUNNEL_REPORT_SQL = """
    SELECT 1 AS step, 'view' AS step_name, n1 AS n_users,
           CAST(NULL AS BIGINT) AS conv_from_prev_e6,
           CAST(NULL AS BIGINT) AS conv_from_first_e6
    FROM t
    UNION ALL
    SELECT 2, 'click', n2,
           CAST(n2 * 1000000 // nullif(n1, 0) AS BIGINT),
           CAST(n2 * 1000000 // nullif(n1, 0) AS BIGINT)
    FROM t
    UNION ALL
    SELECT 3, 'purchase', n3,
           CAST(n3 * 1000000 // nullif(n2, 0) AS BIGINT),
           CAST(n3 * 1000000 // nullif(n1, 0) AS BIGINT)
    FROM t
"""


@declared(
    "q_events_funnel_conversion",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_type
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (
      SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                  OVER (PARTITION BY user_id ORDER BY ts) AS sv
      FROM e
    ),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click'
                          AND sv IS NOT NULL THEN ts END)
                  OVER (PARTITION BY user_id ORDER BY ts) AS qc
      FROM s1
    ),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase'
                          AND qc IS NOT NULL THEN ts END)
                  OVER (PARTITION BY user_id ORDER BY ts) AS qp
      FROM s2
    ),
    u AS (
      SELECT user_id, min(sv) AS t1, min(qc) AS t2, min(qp) AS t3
      FROM s3 GROUP BY user_id
    ),
    t AS (
      SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM u
    )
    {_FUNNEL_REPORT_SQL}
    """,
)
def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel with AT-OR-AFTER step
    semantics: a click only counts if some view happened at or before
    it (same user), a purchase only if some qualifying click did. The
    running-min windows use the default RANGE frame (peers included),
    so a click simultaneous with the first view qualifies — identical
    tie semantics in both engines, deterministic under any intra-peer
    order because min() ignores row order within the frame. Plan: the
    three window stages and the per-user rollup all share ONE
    user-partitioned sort exchange; the 1-row totals aggregate and the
    3-row stack() report are driver-free. The funnel-type isin filter
    pushes down to the scan, so at 100 TB only the three funnel event
    types' (user_id, ts, type) tuples shuffle."""
    e = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .where(F.col("event_type").isin("view", "click", "purchase"))
    )
    w = Window.partitionBy("user_id").orderBy("ts")  # RANGE default frame
    typ = F.col("event_type")
    s1 = e.withColumn("sv", F.min(F.when(typ == "view", F.col("ts"))).over(w))
    s2 = s1.withColumn(
        "qc",
        F.min(
            F.when((typ == "click") & F.col("sv").isNotNull(), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "qp",
        F.min(
            F.when((typ == "purchase") & F.col("qc").isNotNull(), F.col("ts"))
        ).over(w),
    )
    u = s3.groupBy("user_id").agg(
        F.min("sv").alias("t1"), F.min("qc").alias("t2"), F.min("qp").alias("t3")
    )
    t = u.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return t.selectExpr(
        """
        stack(3,
          1, 'view',     n1, CAST(NULL AS BIGINT),
                             CAST(NULL AS BIGINT),
          2, 'click',    n2, n2 * 1000000 div nullif(n1, 0),
                             n2 * 1000000 div nullif(n1, 0),
          3, 'purchase', n3, n3 * 1000000 div nullif(n2, 0),
                             n3 * 1000000 div nullif(n1, 0)
        ) AS (step, step_name, n_users, conv_from_prev_e6,
              conv_from_first_e6)
        """
    )


# ---------------------------------------------------------------- 2.


@declared(
    "q_events_streak_longest",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    runs AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor, COUNT(*) AS streak_days,
             MIN(d) AS streak_start
      FROM runs GROUP BY user_id, anchor
    ),
    best AS (
      SELECT user_id, streak_days, streak_start,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC,
                                         streak_start ASC) AS rn
      FROM streaks
    )
    SELECT user_id, streak_days, streak_start FROM best WHERE rn = 1
    """,
)
def q_events_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands rewrite: within a user's distinct active days
    ordered by date, (day - row_number) is constant exactly along a
    consecutive run, so grouping by that anchor yields the runs without
    any self-join. The winning run per user breaks ties by earliest
    start, so the output is deterministic. Plan: the distinct lands on
    (user, day); the row_number window repartitions by user, and the
    run grouping + best-run window both REUSE that user partitioning
    (hash(user) already clusters (user, anchor)), so fact rows shuffle
    twice total and nothing wider than (user_id, date) ever moves."""
    e = table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    runs = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = runs.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_days"), F.min("d").alias("streak_start")
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), F.col("streak_start").asc()
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start")
    )


# ---------------------------------------------------------------- 3.


@declared(
    "q_events_hopping_window",
    oracle="""
    WITH hops AS (SELECT unnest([0, 1, 2, 3]) AS k),
    b AS (
      SELECT user_id, event_type,
             date_trunc('hour', ts)
               + INTERVAL 15 MINUTE
                 * CAST(EXTRACT(minute FROM ts) // 15 AS INTEGER) AS b15
      FROM events
    )
    SELECT b15 - INTERVAL 15 MINUTE * k AS window_start,
           b15 - INTERVAL 15 MINUTE * k + INTERVAL 60 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM b CROSS JOIN hops
    GROUP BY 1, 2, 3
    """,
)
def q_events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window traffic report: 1-hour windows sliding every 15
    minutes (each event belongs to exactly 4 windows), events and
    distinct users per (window, type) — the smoothed rate curve a
    monitoring dashboard renders where tumbling windows would alias.
    The Spark side is the NATIVE window generator
    F.window(ts, '1 hour', '15 minutes'); the oracle reconstructs the
    identical window set arithmetically (the event's 15-minute bucket
    minus k slides, k=0..3) — both align windows on wall-clock
    15-minute boundaries, and events.ts is TIMESTAMP_NTZ end-to-end so
    the bounds are zone-free (SCALE.md rule 25). Plan: window
    assignment is a narrow 4x explode BEFORE the shuffle; the distinct
    count expands (window, type, user) then aggregates — two bounded
    exchanges carrying (window, type, user) tuples only."""
    e = table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


# ---------------------------------------------------------------- 4.


@declared(
    "q_events_attribution_last_touch",
    oracle="""
    WITH touched AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch
      FROM events
    )
    SELECT coalesce(touch, 'unattributed') AS touch_type,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
             AS value_e6
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY coalesce(touch, 'unattributed')
    """,
)
def q_events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the LAST non-purchase event of the same user at or before it (the
    touchpoint); purchases with no prior touch land in 'unattributed'.
    The running last-non-null rides a ROWS frame ordered by
    (ts, event_id) — the explicit id tie-break makes simultaneous
    touch/purchase pairs deterministic in both engines (a RANGE frame
    would make peer order visible to last_value). Purchase values sum
    as exact floor(v*1e6) integer micro-units. Plan: ONE
    user-partitioned sort exchange for the window, then a tiny
    per-touch-type aggregate — at 100 TB only (user, ts, id, type,
    value) tuples shuffle once."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touched = e.select("event_type", "value", touch.alias("touch"))
    return (
        touched.where(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("touch"), F.lit("unattributed")).alias(
                "touch_type"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long"))
            .cast("long")
            .alias("value_e6"),
        )
    )
