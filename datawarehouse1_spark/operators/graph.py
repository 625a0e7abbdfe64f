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
) -> DataFrame:
    """(id, rank) after `iterations` synchronous power-iteration rounds.

    `nodes` must have a unique `id_col`; `edges` columns (src, dst).
    Out-degrees are computed once and joined in, so rank mass splits
    correctly for any degree distribution. Determinism note: with a
    dyadic damping factor (e.g. 0.75), power-of-two node counts and
    out-degrees, every intermediate value is an exactly representable
    dyadic rational, so the float result is bit-identical regardless
    of aggregation order — the property q_graph_pagerank's cross-engine
    hash check rests on. Arbitrary parameters still converge; they are
    just not bit-portable."""
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select(
        F.col(id_col).alias("id"), F.lit(1.0 / n_nodes).alias("rank")
    )
    for _ in range(iterations):
        ranks = ranks.localCheckpoint(eager=True)
        contribs = (
            edges.join(outdeg, "src")
            .join(ranks, F.col("src") == F.col("id"))
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
