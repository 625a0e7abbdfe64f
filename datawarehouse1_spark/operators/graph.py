"""Distributed graph analytics: PageRank (power iteration as joins).

Companion to the connected-components operator in operators/dedup.py
(dedup_clusters_from_pairs). The iteration shape is the standard
distributed one (Page et al. 1999; the Pregel formulation): per round,
each node's rank splits over its out-edges (a join keyed on src), the
contributions aggregate per destination (a shuffle keyed on dst), and
the damped update re-attaches to the node list with a left join so
rank sinks with no in-edges still receive the teleport mass. At scale
only (node, rank) and (src, dst) pairs shuffle, and each round is one
join + one aggregate; localCheckpoint keeps the lineage linear in the
round count (same rule as the BPE trainer and min-label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 4,
    damping: float = 0.75,
    id_col: str = "id",
    n_nodes: int | None = None,
) -> DataFrame:
    """(id, rank) after `iterations` synchronous power-iteration rounds.

    `nodes` must have a unique `id_col`; `edges` columns (src, dst).
    Pass `n_nodes` when the caller KNOWS the node count (a declared
    query with a fixed-size contract) — it pins the teleport constant
    independent of the data, so a short node set fails the cross-engine
    check loudly instead of silently shifting the base term, and no
    count() action runs at plan-build time.
    Out-degrees are computed once and joined in, so rank mass splits
    correctly for any degree distribution. Determinism note: with a
    dyadic damping factor (e.g. 0.75), power-of-two node counts and
    out-degrees, every intermediate value is an exactly representable
    dyadic rational, so the float result is bit-identical regardless
    of aggregation order — the property q_graph_pagerank's cross-engine
    hash check rests on. Arbitrary parameters still converge; they are
    just not bit-portable."""
    if n_nodes is None:
        n_nodes = nodes.count()
    if n_nodes <= 0:
        raise ValueError("pagerank needs a non-empty node set")
    base = (1.0 - damping) / n_nodes
    # loop-invariant: the out-degree join is hoisted and materialized
    # once — re-planning it per round would rescan the edge table and
    # re-run the degree shuffle every iteration
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    weighted = edges.join(outdeg, "src").localCheckpoint(eager=True)
    ranks = nodes.select(
        F.col(id_col).alias("id"), F.lit(1.0 / n_nodes).alias("rank")
    )
    for _ in range(iterations):
        ranks = ranks.localCheckpoint(eager=True)
        contribs = (
            weighted.join(ranks, F.col("src") == F.col("id"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("id"))
            .join(contribs, F.col("id") == F.col("dst"), "left")
            .select(
                "id",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
