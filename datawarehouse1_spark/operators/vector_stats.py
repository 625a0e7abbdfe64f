"""Exact vector second-moment statistics over an embedding column.

The scalable PCA/covariance pattern for N >> d: reduce the corpus to
the d(d+1)/2 upper-triangle co-moment cells with ONE map-side pair
expansion (no per-vector shuffle — pairs are generated inside the scan
projection and partial-aggregated before the exchange), plus the d
marginal sums. Components quantize to floor(v * 1e6) integers BEFORE
any aggregation (the q_embedding_centroid_drift money-for-vectors
discipline), so every sum is exact and order-independent; DECIMAL(38,0)
holds to ~1e9 vectors x 1e6 quanta without overflow.

The bounded cell table (d^2 is a config constant, 64^2 here) is the
collectable artifact a driver-side eigensolver needs — the standard
two-phase distributed PCA: cluster-reduce to d x d, driver-solve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table

_DEC = "decimal(38,0)"

# q = the micro-quantized vector; pairs (i, j>=i) generated map-side.
# slice() is 1-based: for 0-based i the tail starting AT element i has
# start i+1 and length size-i, so the inner index k maps to j = i + k
# (the diagonal is included at k = 0).
_PAIR_EXPR = """
inline(flatten(transform(q, (vi, i) ->
  transform(slice(q, i + 1, size(q) - i), (vj, k) ->
    named_struct('i', CAST(i AS BIGINT),
                 'j', CAST(i + k AS BIGINT),
                 'p', CAST(vi * vj AS DECIMAL(38,0)))))))
"""

_QUANT_EXPR = (
    "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000)"
    " AS BIGINT))"
)


def quantized_pair_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle co-moment cells: (i, j, n_vecs, sij) with
    sij = SUM(q_i * q_j) as exact DECIMAL(38,0). The pair expansion is
    map-side (inline over a nested transform) and partial-aggregates
    per partition, so the ONLY exchange carries <= d(d+1)/2 cells per
    partition — vectors themselves never shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    pairs = emb.select(F.expr(_QUANT_EXPR).alias("q")).select(
        F.expr(_PAIR_EXPR.strip())
    )
    return pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("p").cast(_DEC).alias("sij"),
    )


def quantized_marginals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension marginal sums: (d, s) with s = SUM(q_d) as exact
    DECIMAL(38,0); one narrow (dim, int) exchange."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.select(F.posexplode(F.expr(_QUANT_EXPR)).alias("d", "v"))
    return q.groupBy("d").agg(F.sum(F.col("v").cast(_DEC)).alias("s")).select(
        F.col("d").cast("long").alias("d"), "s"
    )
