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
from datawarehouse1_spark.functions.money import (  # noqa: F401
    money_units_long,
    sql_money_sum,
    units_to_money_double,
)
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
    # discounted price as exact integer e4-units (r16, guide §2.3
    # narrower types): 2-dec price x 2-dec discount -> 4-dec product,
    # carried as LONG ten-thousandths. cents x (100 - disc_cents) is
    # the same integer the decimal product denotes; per-ROW it is
    # < 10^9 and the level-0 group is ONE ORDER (line count bounded by
    # basket size), so the long sum cannot overflow at any corpus
    # scale. The fact-grain aggregation stays in codegen's integer
    # fast path instead of non-compact decimal adds (measured: the
    # per-order pre-agg alone 1.12 s decimal vs 0.45 s long; query
    # 2.13 -> 1.78 s at sf0.1, oracle hash unchanged at all SFs).
    ext_c = money_units_long("l_extendedprice")
    disc_c = money_units_long("l_discount")
    rev_e4 = ext_c * (F.lit(100) - disc_c)
    # level 0 (r6): collapse lineitem to one partial row per order
    # BEFORE the fact join — integer/decimal sums are exact and
    # associative, so sum-of-order-sums equals the direct sum
    # bit-for-bit, and the orderkey shuffle carries ~1/4 the rows
    # (the volume argument compounds at 100 TB)
    lvl0 = li.groupBy("l_orderkey").agg(
        F.sum(rev_e4).alias("rev_o_e4"),
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
    # cross-group re-aggregation is UNBOUNDED (orders per customer-
    # month), so above level 0 the e4 units travel as DECIMAL(38,0) —
    # exact at any scale; the single double cast happens once at the end
    lvl1 = joined.groupBy(
        "r_name",
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
        "o_custkey",
    ).agg(
        F.sum(F.col("rev_o_e4").cast("decimal(38,0)")).alias("rev_part_e4"),
        F.sum("n_o").alias("n_part"),
    )
    return lvl1.groupBy("r_name", "order_month").agg(
        units_to_money_double(F.sum("rev_part_e4"), 4).alias("revenue"),
        F.sum("n_part").alias("n_items"),
        F.count(F.lit(1)).alias("n_customers"),
    )
