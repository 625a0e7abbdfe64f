"""Round-10 analytics, batch 7: weekly retention triangle, fill-rate
SLA, and value-decile reporting.

* **Retention triangle** — the full cohort x weeks-since-first-active
  retention matrix over the event stream (q_events_retention_weekly
  covers only the W -> W+1 edge; q_orders_cohort_ltv is the ORDERS
  revenue triangle — this is the events/activity one). Cohort sizes
  come from the triangle's own age-0 row, so retention_e6 at age 0 is
  exactly 1e6 by construction (law-pinned).

* **Fill-rate SLA** — per priority class: the share of orders fully
  shipped within 30 days of placement (close = max lineitem ship
  date). The service-level metric beside q_orders_ship_latency's full
  histogram.

* **Value deciles** — the classic decile lift table over order value,
  built the rule-22 way: decile BOUNDARIES are exact order statistics
  (percentile_disc — an actual data value, identical in both
  engines), bucketing is a broadcast comparison chain, and the
  share/cumulative windows run on the 10-row aggregate. No global
  sort of fact rows anywhere (ntile would have needed one); ties at a
  boundary fall to the lower decile by the strict > rule, so the
  classes are value-deterministic.

Reference parity: the reference ETL (etl/app.py) has no analytics
surface; SURVEY.md §2C/§2D extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import sql_cents
from datawarehouse1_spark.queries.deciles import (
    decile_bounds,
    decile_bounds_sql,
    decile_expr_sql,
)
from datawarehouse1_spark.registry import declared

_CENTS = sql_cents("o_totalprice")

# ---------------------------------------------------------------- 1.


@declared(
    "q_events_retention_triangle",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    firstw AS (
      SELECT user_id, MIN(wk) AS cohort FROM active GROUP BY user_id
    ),
    tri AS (
      SELECT f.cohort,
             CAST((a.wk - f.cohort) // 7 AS INT) AS age_weeks,
             COUNT(*) AS n_active
      FROM active a JOIN firstw f ON a.user_id = f.user_id
      GROUP BY f.cohort, (a.wk - f.cohort) // 7
    ),
    base AS (
      SELECT cohort, n_active AS cohort_size FROM tri WHERE age_weeks = 0
    )
    SELECT t.cohort, t.age_weeks, t.n_active, b.cohort_size,
           CAST(t.n_active * 1000000 // b.cohort_size AS BIGINT)
             AS retention_e6
    FROM tri t JOIN base b ON t.cohort = b.cohort
    """,
)
def q_events_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by their first
    active ISO week, activity tracked by whole weeks elapsed — the
    (cohort x age) matrix behind every retention curve. Week
    arithmetic stays in dates (Monday-truncated in both engines), so
    the age is an exact integer; retention is floored micro-units of
    the cohort's own age-0 size (exactly 1e6 at age 0 by
    construction). Plan: (user, week) distinct, the per-user first
    week is a WINDOW over the user partition (no groupBy+join-back),
    the bounded (cohort, age) triangle localCheckpoints so its age-0
    base row doesn't recompute the chain (rule 12), and the base
    broadcasts back onto it."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    cohort = F.min("wk").over(Window.partitionBy("user_id"))
    tri = (
        active.withColumn("cohort", cohort)
        .select(
            "cohort",
            F.expr("CAST(datediff(wk, cohort) div 7 AS INT)").alias(
                "age_weeks"
            ),
        )
        .groupBy("cohort", "age_weeks")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .localCheckpoint(eager=True)
    )
    base = tri.where(F.col("age_weeks") == 0).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    return tri.join(F.broadcast(base), "cohort").select(
        "cohort",
        "age_weeks",
        "n_active",
        "cohort_size",
        F.expr("n_active * 1000000 div cohort_size")
        .cast("long")
        .alias("retention_e6"),
    )


# ---------------------------------------------------------------- 2.


@declared(
    "q_orders_fill_rate_sla",
    oracle="""
    WITH close AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_date
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(COUNT(*) FILTER (
                  WHERE c.close_date <= CAST(o.o_orderdate AS DATE) + 30)
                AS BIGINT) AS n_shipped_30d,
           CAST(COUNT(*) FILTER (
                  WHERE c.close_date <= CAST(o.o_orderdate AS DATE) + 30)
                * 1000000 // COUNT(*) AS BIGINT) AS fill_rate_e6
    FROM orders o JOIN close c ON o.o_orderkey = c.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_orders_fill_rate_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day fill rate per priority class: the share of orders whose
    LAST lineitem shipped within 30 days of placement — the
    service-level summary beside q_orders_ship_latency's full
    histogram (orders with no lineitems are excluded by the inner
    join, identically in both engines). Plan: one orderkey exchange
    each for the close aggregate and the orders join side
    (co-partitioned), then a <=5-row priority aggregate; `div`
    operands are positive so the floors agree."""
    li = table(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_date")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("placed"),
    )
    within = F.col("close_date") <= F.date_add(F.col("placed"), 30)
    agg = (
        o.join(close, o.o_orderkey == close.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(within, 1)).alias("n_shipped_30d"),
        )
    )
    # ratio derives from the aggregates, so the SLA predicate exists
    # exactly once above
    return agg.withColumn(
        "fill_rate_e6",
        F.expr("n_shipped_30d * 1000000 div n_orders").cast("long"),
    )


# ---------------------------------------------------------------- 3.

# shared rule-22 decile construction (also q_quality_cumulative_gains)
_BOUNDS_SQL = decile_bounds_sql("o_totalprice")
_DECILE_SQL = decile_expr_sql("o_totalprice")


@declared(
    "q_orders_value_deciles",
    oracle=f"""
    WITH b AS (SELECT {_BOUNDS_SQL} FROM orders),
    d AS (
      SELECT {_DECILE_SQL} AS decile, {_CENTS} AS cents
      FROM orders, b
    ),
    agg AS (
      SELECT decile, COUNT(*) AS n_orders, SUM(cents) AS cents
      FROM d GROUP BY decile
    )
    SELECT decile, n_orders,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(cents * 1000000 // SUM(cents) OVER () AS BIGINT)
             AS share_e6,
           CAST(SUM(cents) OVER (ORDER BY decile) * 1000000
                // SUM(cents) OVER () AS BIGINT) AS cum_share_e6
    FROM agg
    """,
)
def q_orders_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table over order value — the rule-22 construction:
    the nine decile boundaries are exact order statistics
    (percentile_disc picks an actual data value, so both engines agree
    bit-for-bit), each order buckets by a broadcast comparison chain
    (ties at a boundary fall LOW via strict >), and the share /
    cumulative-share windows run on the 10-row aggregate. An ntile()
    formulation would have globally sorted the fact table AND made
    tie placement row-order-dependent; this shape shuffles facts once
    into the decile aggregate. Spark's share multiplies through
    DECIMAL(38,0) (a BIGINT product wraps past ~9.2e12 cents); the
    oracle's native HUGEINT is already exact."""
    o = table(spark, sf_dir, "orders")
    bounds = decile_bounds(o, "o_totalprice")
    d = o.crossJoin(F.broadcast(bounds)).select(
        F.expr(_DECILE_SQL).alias("decile"),
        F.expr(_CENTS).alias("cents"),
    )
    agg = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("cents"),
    )
    dec_cents = "CAST(cents AS DECIMAL(38,0))"
    return agg.select(
        "decile",
        "n_orders",
        F.col("cents").cast("long").alias("revenue_cents"),
        F.expr(
            f"{dec_cents} * 1000000 div SUM(cents) OVER ()"
        )
        .cast("long")
        .alias("share_e6"),
        F.expr(
            f"SUM({dec_cents}) OVER (ORDER BY decile) * 1000000"
            " div SUM(cents) OVER ()"
        )
        .cast("long")
        .alias("cum_share_e6"),
    )
