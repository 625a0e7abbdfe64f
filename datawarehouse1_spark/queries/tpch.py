"""Canonical TPC-H queries expressible over the driver's TPC-H-ish
testdata (TESTDATA.md) — the industry-standard shapes of the warehouse's
analytics class (SURVEY.md §2C). Q1 (pricing summary), Q3 (shipping
priority), Q6 (forecast revenue change), adapted to the available
columns; money arithmetic in exact decimal so both engines agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import (
    money_units_long,
    units_to_money_double,
)
from datawarehouse1_spark.registry import declared

_DEC = "decimal(18,2)"


def _d(col: str) -> F.Column:
    return F.col(col).cast(_DEC)


@declared(
    "q_tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: one scan, one shuffle, all aggregates partial-merged
    map-side. Averages computed as exact-decimal SUM / COUNT (a single
    deterministic double division), never a native double AVG."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    charge = disc_price * (F.lit(1).cast(_DEC) + _d("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_d("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_d("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(_d("l_quantity")).cast("double") / n).alias("avg_qty"),
        (F.sum(_d("l_extendedprice")).cast("double") / n).alias("avg_price"),
        (F.sum(_d("l_discount")).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@declared(
    "q_tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: segment filter pushes into the customer scan, date
    filters into both fact scans, then fact⋈fact on orderkey + top-10 via
    TakeOrderedAndProject (no global sort)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1997-06-01 00:00:00").cast("timestamp")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    # r16 (guide §2.3): the revenue group is ONE ORDER (bounded line
    # count), so the exact-decimal product sums as LONG e4-units with
    # one double cast at the end — bit-identical, ~2.5x cheaper adds
    rev_e4 = money_units_long("l_extendedprice") * (
        F.lit(100) - money_units_long("l_discount")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(units_to_money_double(F.sum(rev_e4), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@declared(
    "q_tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate reaches the parquet scan (PushedFilters),
    then a single global aggregate — the purest pushdown/pruning probe."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_d("l_extendedprice") * _d("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@declared(
    "q_tpch_q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                     AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the deepest star join in the
    canon — two facts and four dims, with the customer-nation ==
    supplier-nation correlation.

    Filter-first shape (r6): both sides of the correlation lie in the
    ASIA nation set, so the region filter pushes onto customer AND
    supplier before any fact join — lineitem shrinks via the broadcast
    region-filtered supplier (which also carries n_name, so no later
    nation join), orders shrinks via the region-filtered customer on
    top of its date filter, and the orderkey fact join carries
    ~(1/|regions|) per side instead of every region's rows. The exact
    c_nationkey == s_nationkey correlation applies at the orderkey
    join, on already-small rows."""
    cutoff_lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cutoff_hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_asia = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    c2 = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n_asia), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
    )
    o2 = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
        )
        .join(c2, F.col("o_custkey") == c2.c_custkey)
        .select("o_orderkey", "c_nationkey")
    )
    s2 = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n_asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    li = table(spark, sf_dir, "lineitem")
    li2 = li.join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
    revenue = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    return (
        li2.join(
            o2,
            (li2.l_orderkey == o2.o_orderkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@declared(
    "q_tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter of orders, only
    returned lines, top-20 customers by lost revenue. returnflag filter
    pushes into the lineitem scan; top-20 via TakeOrderedAndProject
    (revenue ties broken by c_custkey for determinism)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@declared(
    "q_tpch_q14_promo_revenue",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): month of shipments joined to the
    part dim (broadcast), promo share of revenue as one exact-decimal
    conditional aggregate — both sums exact, one double division at the
    end (the testdata's p_type is a plain category, so equality stands
    in for the spec's PROMO%% prefix match)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    disc_price = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(promo).cast("double")
                * 100
                / F.sum(disc_price).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@declared(
    "q_tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): left join so zero-order
    customers count, then the histogram of per-customer order counts —
    the double-aggregation shape (the spec's o_comment NOT LIKE filter is
    dropped: the testdata carries no comment column). First agg shuffles
    on custkey, second on the tiny count domain."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@declared(
    "q_tpch_q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): the IN-subquery over a grouped
    HAVING (orders whose total quantity tops 250 — ~the p99 at any SF of
    this generator) becomes a left-semi join against the aggregated key
    set; quantity summed in exact decimal; top-100 by price with
    orderkey tiebreak.

    Aggregate-carry shape (r8, replacing the r6 semi-join-first shape):
    the HAVING aggregate already computes each qualifying order's total
    quantity, so `big` CARRIES the sum and orders joins it directly —
    the old li_big semi join (a second full lineitem pass) and the
    per-order re-aggregation vanish: sum(quantity over a qualifying
    order's lines) IS the aggregate that qualified it, bit-identical
    exact decimal. One lineitem scan + one agg shuffle total; at 100 TB
    that saves a full fact-table read AND its shuffle. o_orderkey is
    the orders PK, so the big⋈orders join is 1:1 on the ~1% qualifying
    keys — customer joins against one row per qualifying order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # r16 (guide §2.3): per-order quantity sums as LONG integer cents
    # (the group is one order — bounded line count, no overflow at any
    # scale); the HAVING boundary > 250 is exactly cents > 25000, and
    # the carried sum_qty double is the identical one-rounding cast
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money_units_long("l_quantity")).alias("q_c"))
        .filter(F.col("q_c") > 25000)
        .select(
            F.col("l_orderkey").alias("big_key"),
            units_to_money_double("q_c", 2).alias("sum_qty"),
        )
    )
    per_order = o.join(big, o.o_orderkey == big.big_key).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
    )
    return (
        per_order.join(c, per_order.o_custkey == c.c_custkey)
        .withColumn("o_totalprice", F.col("o_totalprice").cast("double"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
    )


@declared(
    "q_tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no orders (the spec's phone-country-code grouping is
    dropped: no phone column in the testdata). The average is computed
    as an exact-decimal SUM over COUNT — one deterministic double — so
    the comparison boundary is identical in both engines; the NOT EXISTS
    is a left-anti join; the scalar threshold broadcasts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0)
    thr = pos.agg(
        (F.sum(_d("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("thr")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_d("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
