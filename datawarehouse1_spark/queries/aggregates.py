"""Aggregation family (SURVEY.md §2C C8-C12): group-by aggregates, distinct
count, HAVING, hierarchy rollup, time-bucketed aggregation.

Spark runs these as partial (map-side) + final hash aggregates
automatically — the scale-relevant property is that only pre-aggregated
partials cross the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import (
    money_avg,
    money_sum,
    sql_money_avg,
    sql_money_sum,
)
from datawarehouse1_spark.registry import declared


# --- C8a: SUM/COUNT group-by (TPC-H Q1 shape — the Metabase "sales by X") ---
@declared(
    "q_agg_group_sum",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_money_sum('l_quantity', 'sum_qty')},
           {sql_money_sum('l_extendedprice', 'sum_base_price')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- C8b: AVG/MIN/MAX group-by ---
@declared(
    "q_agg_avg_min_max",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_money_avg('c_acctbal', 'avg_bal')},
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_agg_avg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        money_avg("c_acctbal", "avg_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# --- C9: exact distinct count (active clients per period) ---
@declared(
    "q_agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact countDistinct is the oracle-matchable form; the 100 TB scale
    path is q_agg_approx_distinct below (approx_count_distinct avoids the
    per-group distinct expansion shuffle)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- C9 scale path: HyperLogLog sketch (rows-only check; sketches differ) ---
@declared("q_agg_approx_distinct", oracle=None)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers")
    )


# --- C10: HAVING — filter on aggregate ---
@declared(
    "q_agg_having",
    oracle=f"""
    SELECT o_custkey,
           {sql_money_sum('o_totalprice', 'total_spent')},
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3 AND SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 500000
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            money_sum("o_totalprice", "total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter((F.col("n_orders") >= 3) & (F.col("total_spent") > 500000))
    )


# --- C11: hierarchy rollup (region -> nation dashboard subtotals) ---
@declared(
    "q_agg_rollup",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {sql_money_sum('c.c_acctbal', 'total_bal')},
           COUNT(*) AS n_customers
    FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            money_sum("c_acctbal", "total_bal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# --- C12: time-bucketed aggregation (sales by month — idx_ventes_date) ---
@declared(
    "q_date_trunc_month",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           {sql_money_sum('o_totalprice', 'revenue')},
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def q_date_trunc_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The access path init-db/init.sql:67 buys with a b-tree on date_vente;
    in Spark the physical analog is partitionBy(month) at write time ->
    partition pruning (see operators/ingest.py)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month")
        )
        .agg(
            money_sum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
