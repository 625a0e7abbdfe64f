"""Shared co-purchase graph edge construction.

Parts are linked when they appear together in at least `support`
orders.  Three operators read THIS graph — connected components
(q_graph_components_copurchase), the clustering-coefficient profile
(q_graph_clustering_coeff), and link prediction
(q_graph_link_prediction) — so the edge semantics (distinct
(order, part) incidence, oriented pa < pb, the support threshold)
live in one place and cannot drift between them (review finding,
r12).

Scale shape: candidate pairs generate PER ORDER (quadratic in the
basket size — measured by q_orders_basket_profile — never all-pairs
over parts); the support filter prunes before any downstream graph
work."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table

COPURCHASE_SUPPORT = 2


def copurchase_edges_sql(support: int = COPURCHASE_SUPPORT) -> str:
    """The `ip` (distinct incidence) and `e` (oriented edge list,
    columns pa < pb) CTE bodies, for composing WITH clauses."""
    return f"""
    ip AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM ip a JOIN ip b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {support}
    )"""


def copurchase_edges(
    spark: SparkSession,
    sf_dir: str,
    support: int = COPURCHASE_SUPPORT,
    checkpoint: bool = True,
) -> DataFrame:
    """Oriented edge list (pa < pb) of the support-thresholded
    co-purchase graph.  `checkpoint=True` localCheckpoints the result
    so multi-branch consumers (degree + triangles + anti-join) don't
    re-run the incidence self-join per branch."""
    ip = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = ip.alias("a")
    b = ip.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= support)
        .select("pa", "pb")
    )
    return e.localCheckpoint() if checkpoint else e
