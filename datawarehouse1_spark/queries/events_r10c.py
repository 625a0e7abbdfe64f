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
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
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
    discipline: exact integer co-moments (DECIMAL(38,0) in Spark,
    HUGEINT in the oracle), one fixed IEEE parenthesization, round to
    6 dp.  Plan: one fact exchange (the daily aggregate); the lag
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
            "round(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
            " / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6)"
        ).alias("acf"),
    )
