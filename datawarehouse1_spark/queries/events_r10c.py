"""Round-10 events, batch 3: per-user behavioral diversity (Gini).

* **User type Gini** — the Gini impurity of each user's event-type
  distribution: 0 for a user who only ever does one thing (the bot
  signature), approaching 1 - 1/k for a user spread evenly over k
  types.  This is the rational diversity statistic (rule 20: Gini, not
  Shannon entropy — no transcendental touches a hashed output; the
  q_text_char_gini discipline applied to behavior), exact in floored
  micro-units: gini_e6 = (n² - Σ c_t²)·1e6 div n².

Reference parity: the reference ETL (etl/app.py) has no events
surface; SURVEY.md §2D extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared


@declared(
    "q_events_user_type_gini",
    oracle="""
    WITH ut AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST((SUM(c) * SUM(c) - SUM(CAST(c AS HUGEINT) * c)) * 1000000
                // (SUM(c) * SUM(c)) AS BIGINT) AS gini_e6
    FROM ut
    GROUP BY user_id
    """,
)
def q_events_user_type_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type Gini impurity in exact floored micro-units —
    the single-mindedness / bot-behavior screen (gini 0 = one type
    only; uniform over k types = floor((1-1/k)·1e6)).  Two-level
    aggregate (user+type, then user — rule 4: no Expand on the fact
    table); the squared sums ride DECIMAL(38,0) in Spark and native
    HUGEINT in the oracle, so n_events is safe to ~1e18 per user."""
    e = table(spark, sf_dir, "events")
    ut = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    d = "CAST(SUM(c) AS DECIMAL(38,0))"
    return ut.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.expr(
            f"({d} * {d} - SUM(CAST(c AS DECIMAL(19,0)) * c)) * 1000000"
            f" div ({d} * {d})"
        )
        .cast("long")
        .alias("gini_e6"),
    )


# ---------------------------------------------------------------- 2.

_LAGS = (1, 2, 3, 4, 5, 6, 7)


@declared(
    "q_events_autocorr_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    pairs AS (
      SELECT l.k, a.x AS xa, b.x AS xb
      FROM daily a
      CROSS JOIN unnest([{", ".join(str(k) for k in _LAGS)}]) AS l(k)
      JOIN daily b ON b.d = a.d + CAST(l.k AS INT)
    ),
    mom AS (
      SELECT k, COUNT(*) AS n,
             SUM(xa) AS sx, SUM(xb) AS sy,
             SUM(CAST(xa AS HUGEINT) * xa) AS sxx,
             SUM(CAST(xb AS HUGEINT) * xb) AS syy,
             SUM(CAST(xa AS HUGEINT) * xb) AS sxy
      FROM pairs GROUP BY k
    )
    SELECT CAST(k AS INT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
           round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / NULLIF(sqrt(CAST(n * sxx
                                    - CAST(sx AS HUGEINT) * sx AS DOUBLE)),
                          0.0)
                 / NULLIF(sqrt(CAST(n * syy
                                    - CAST(sy AS HUGEINT) * sy AS DOUBLE)),
                          0.0), 6) AS acf
    FROM mom
    """,
)
def q_events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1..7 days — the weekly-rhythm / trend-persistence read a
    time-series monitor starts from (q_orders_seasonality_decompose is
    the month-level decomposition; this is the correlogram).  Convention:
    Pearson r per lag over the (x_t, x_{t+k}) pairs that BOTH exist
    (calendar join on the bounded daily table; gap days pair with
    nothing, identically in both engines).  The q_stats_corr_matrix
    discipline: exact integer co-moments AND first-moment products
    (DECIMAL(38,0) in Spark, HUGEINT in the oracle — a bare BIGINT
    sx*sx overflows past ~3e9 summed daily events), one fixed IEEE
    parenthesization, round to 6 dp; acf is NULL when a lag's series
    is constant or has a single pair (zero variance — rule 27's
    NULLIF convention, never a raised divide-by-zero).  Plan: one fact exchange (the daily aggregate); the lag
    explode and self-join touch only the bounded daily table."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        "d",
        F.col("x").alias("xa"),
        F.explode(F.array(*[F.lit(k) for k in _LAGS])).alias("k"),
    )
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("xb"))
    pairs = a.join(
        F.broadcast(b), F.expr("date_add(d, k) = bd")
    )
    d38 = "CAST({c} AS DECIMAL(38,0))"
    mom = pairs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.expr(f"SUM({d38.format(c='xa')} * xa)").alias("sxx"),
        F.expr(f"SUM({d38.format(c='xb')} * xb)").alias("syy"),
        F.expr(f"SUM({d38.format(c='xa')} * xb)").alias("sxy"),
    )
    return mom.select(
        F.col("k").cast("int").alias("lag_days"),
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(
            "round(CAST(CAST(n AS DECIMAL(38,0)) * sxy"
            " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
            " / NULLIF(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)), 0.0)"
            " / NULLIF(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy"
            " - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)), 0.0), 6)"
        ).alias("acf"),
    )


# ---------------------------------------------------------------- 3.


@declared(
    "q_events_time_to_convert",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS first_view_us
      FROM events
    ),
    conv AS (
      SELECT us - first_view_us AS lat_us,
             (us - first_view_us) // 60000000 AS lat_min
      FROM ordered
      WHERE event_type = 'purchase' AND first_view_us IS NOT NULL
    ),
    hist AS (
      SELECT lat_min, COUNT(*) AS cnt, SUM(lat_us) AS sum_us
      FROM conv GROUP BY lat_min
    ),
    cum AS (
      SELECT lat_min, cnt, sum_us,
             SUM(cnt) OVER () AS n,
             SUM(sum_us) OVER () AS total_us,
             SUM(cnt) OVER (ORDER BY lat_min) AS cumc
      FROM hist
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_conversions,
           CAST(MAX(total_us) // MAX(n) AS BIGINT) AS mean_latency_us,
           CAST(MIN(CASE WHEN cumc * 2 >= n THEN lat_min END) AS BIGINT)
             AS median_latency_min,
           CAST(MIN(CASE WHEN cumc * 10 >= n * 9 THEN lat_min END)
                AS BIGINT) AS p90_latency_min,
           CAST(MAX(lat_min) AS BIGINT) AS max_latency_min
    FROM cum
    """,
)
def q_events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch conversion latency: for every purchase preceded by
    a view from the same user, the exact integer-MICROSECOND gap to
    that user's FIRST view (running min over a ROWS frame with
    (ts, event_id) ordering — the funnel/attribution discipline).
    Summary: exact mean in microseconds (integer div) and exact
    discrete median/p90/max in whole minutes off the bounded
    (lat_min) histogram — latency values are horizon-bounded, so the
    ordered window never touches per-event rows (rule 22).  Plan: one
    user-sorted exchange serves the running-min window; then the
    bounded histogram aggregate."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ts is TIMESTAMP_NTZ (rule 25): microseconds come from a zone-free
    # diff against the NTZ epoch, never a unix_* function that would
    # coerce through the session zone; only DIFFERENCES of this value
    # are consumed anyway
    us = F.expr(
        "timestampdiff(MICROSECOND,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ordered = e.select(
        "event_type",
        us.alias("us"),
        F.min(
            F.when(F.col("event_type") == "view", us)
        ).over(w).alias("first_view_us"),
    )
    conv = ordered.filter(
        (F.col("event_type") == "purchase")
        & F.col("first_view_us").isNotNull()
    ).select(
        (F.col("us") - F.col("first_view_us")).alias("lat_us"),
        F.expr("(us - first_view_us) div 60000000").alias("lat_min"),
    )
    hist = conv.groupBy("lat_min").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("lat_us").alias("sum_us")
    )
    g = Window.partitionBy()
    cum = hist.select(
        "lat_min",
        "cnt",
        F.sum("cnt").over(g).alias("n"),
        F.sum("sum_us").over(g).alias("total_us"),
        F.sum("cnt")
        .over(Window.orderBy("lat_min").rangeBetween(Window.unboundedPreceding, 0))
        .alias("cumc"),
    )
    return cum.agg(
        F.max("n").cast("long").alias("n_conversions"),
        F.expr("MAX(total_us) div MAX(n)").cast("long").alias("mean_latency_us"),
        F.min(F.when(F.col("cumc") * 2 >= F.col("n"), F.col("lat_min")))
        .cast("long")
        .alias("median_latency_min"),
        F.min(F.when(F.col("cumc") * 10 >= F.col("n") * 9, F.col("lat_min")))
        .cast("long")
        .alias("p90_latency_min"),
        F.max("lat_min").cast("long").alias("max_latency_min"),
    )


# ---------------------------------------------------------------- 4.


@declared(
    "q_stats_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    diffs AS (
      SELECT d, x - lag(x) OVER (ORDER BY d) AS dx FROM daily
    ),
    signs AS (
      SELECT d, CASE WHEN dx > 0 THEN 1 ELSE -1 END AS s
      FROM diffs WHERE dx IS NOT NULL AND dx <> 0
    ),
    runs AS (
      SELECT s,
             CASE WHEN s <> lag(s) OVER (ORDER BY d) THEN 1 ELSE 0 END
               AS brk
      FROM signs
    )
    SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_up,
           CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_down,
           CAST(1 + SUM(COALESCE(brk, 0)) AS BIGINT) AS n_runs,
           round((CAST(1 + SUM(COALESCE(brk, 0)) AS DOUBLE)
                  - (1.0 + 2.0 * SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                           * SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                           / COUNT(*)))
                 / NULLIF(sqrt((2.0 * SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                             * SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                         * (2.0 * SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                                * SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                            - COUNT(*)))
                        / NULLIF(CAST(COUNT(*) AS DOUBLE) * COUNT(*)
                                  * (COUNT(*) - 1), 0.0)), 0.0), 6) AS z
    FROM runs
    """,
)
def q_stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily
    event-count direction: day-over-day changes sign to +1/-1 (ties
    dropped — the standard convention), R counts maximal same-sign
    runs, and z standardizes R against the exact null moments
    mu = 1 + 2ab/n, var = 2ab(2ab - n) / (n²(n - 1)).  n_up/n_down/R
    are exact integers (a and b are calendar-bounded, so the double
    products in z never leave the exact-integer range of IEEE754);
    z is NULL when the null variance is zero (a single-direction
    series, or a single usable sign where even the variance
    denominator vanishes) and otherwise one
    fixed IEEE assembly rounded to 6 dp (the welch/
    corr discipline, rule 20).  Every ordered window runs over the
    bounded daily table (rule 22)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    wd = Window.orderBy("d")
    diffs = daily.select(
        "d", (F.col("x") - F.lag("x").over(wd)).alias("dx")
    ).filter(F.col("dx").isNotNull() & (F.col("dx") != 0))
    signs = diffs.select(
        "d", F.when(F.col("dx") > 0, 1).otherwise(-1).alias("s")
    )
    runs = signs.select(
        "s",
        F.when(F.col("s") != F.lag("s").over(wd), 1)
        .otherwise(0)
        .alias("brk"),
    )
    a = "SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)"
    b = "SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)"
    r = "1 + SUM(COALESCE(brk, 0))"
    return runs.agg(
        F.expr(a).cast("long").alias("n_up"),
        F.expr(b).cast("long").alias("n_down"),
        F.expr(r).cast("long").alias("n_runs"),
        F.expr(
            f"round((CAST({r} AS DOUBLE)"
            f" - (1.0 + 2.0 * {a} * {b} / COUNT(*)))"
            f" / NULLIF(sqrt((2.0 * {a} * {b} * (2.0 * {a} * {b}"
            f" - COUNT(*))) / NULLIF(CAST(COUNT(*) AS DOUBLE) * COUNT(*)"
            f" * (COUNT(*) - 1), 0.0)), 0.0), 6)"
        ).alias("z"),
    )
