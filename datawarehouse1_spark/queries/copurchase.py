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
work.  Candidate VOLUME is Σ C(basket, 2) over orders, so one
pathological basket (a 10k-line order) costs ~5·10⁷ candidate rows on
its own — `max_basket` is the explicit skew cap for that case: orders
with more distinct parts are EXCLUDED from edge evidence (loudly, via
log) before the quadratic self-join, bounding per-order candidate
work at C(max_basket, 2).  The graded queries run uncapped (their
oracle SQL is the uncapped twin and the testdata's basket profile is
bounded ~7); tests/test_r13_hardening.py pins the capped/uncapped
behavior under a staged pathological basket.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table

COPURCHASE_SUPPORT = 2

_log = logging.getLogger(__name__)


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


def copurchase_edges_from_incidence(
    ip: DataFrame,
    support: int = COPURCHASE_SUPPORT,
    max_basket: int | None = None,
    order_col: str = "l_orderkey",
    part_col: str = "l_partkey",
) -> DataFrame:
    """Oriented edge list (pa < pb) from a DISTINCT (order, part)
    incidence DataFrame.

    `max_basket`: skew cap — drop orders whose basket exceeds it BEFORE
    the quadratic per-order pair generation, so one monster order cannot
    blow the candidate volume past C(max_basket, 2)·|orders|. Dropping
    an order removes its (weak) co-occurrence evidence, which can lower
    support counts — a recall/cost knob, logged loudly, NOT silent.

    Shape (r13): the incidence reduces to per-order sorted part ARRAYS
    in one exchange, and the C(basket, 2) oriented pairs generate
    MAP-SIDE from each array inside codegen (nested transform +
    flatten) — the candidate volume is identical to the former
    incidence self-join, but the second fact-grain shuffle (the join's
    probe side) and the join itself are gone: one exchange to the order
    grain, one to the (pa, pb) support aggregate. The basket-size guard
    becomes a free `size(parts) <= max_basket` filter on the built
    array instead of a separate counting pass.
    """
    baskets = ip.groupBy(order_col).agg(
        F.array_sort(F.collect_set(part_col)).alias("__parts")
    )
    if max_basket is not None:
        oversized = baskets.filter(F.size("__parts") > max_basket)
        # bounded driver-side read: pathological orders are by
        # definition rare — cap the report at 20 rows, count the rest
        sample = oversized.select(order_col).limit(20).collect()
        if sample:
            n_over = oversized.count()
            _log.warning(
                "copurchase_edges: EXCLUDING %d order(s) with basket > %d "
                "from co-occurrence evidence (quadratic candidate guard); "
                "first ids: %s",
                n_over,
                max_basket,
                [r[order_col] for r in sample],
            )
            baskets = baskets.filter(F.size("__parts") <= max_basket)
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "__parts",
                    lambda x, i: F.transform(
                        F.slice(
                            "__parts", i + 2, F.size("__parts") - i - 1
                        ),
                        lambda y: F.struct(
                            x.alias("pa"), y.alias("pb")
                        ),
                    ),
                )
            )
        ).alias("__pair")
    )
    return (
        pairs.select(F.col("__pair.pa").alias("pa"), F.col("__pair.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= support)
        .select("pa", "pb")
    )


def copurchase_edges(
    spark: SparkSession,
    sf_dir: str,
    support: int = COPURCHASE_SUPPORT,
    checkpoint: bool = True,
    max_basket: int | None = None,
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
    e = copurchase_edges_from_incidence(ip, support, max_basket)
    return e.localCheckpoint() if checkpoint else e
