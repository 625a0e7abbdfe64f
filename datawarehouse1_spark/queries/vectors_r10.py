"""Round-10 vector analytics: exact embedding covariance cells and
driver-solved PCA via power iteration over the cluster-reduced
co-moment matrix.

* **Covariance cells** — the full upper-triangle covariance structure
  of the embedding space as exact integers: components quantize to
  floor(v*1e6) BEFORE aggregation, each partition reduces to its
  integer Gram matrix via ONE Arrow-batched numpy matmul (vectors
  never shuffle; only (i, j, partial-sum) cells do), and the final
  covariance value assembles from one fixed IEEE parenthesization.
  The dimension-correlation health report of an embedding corpus —
  collapsed dimensions, correlated channels, dead axes.

* **PCA top component** — the textbook two-phase distributed PCA:
  the cluster reduces N x d to the d(d+1)/2 exact cells above, the
  driver solves the d x d eigenproblem (power iteration, fixed 200
  steps, deterministic all-ones start, sign fixed by the largest
  loading). d^2 is a config constant (64^2 here), so the collect is
  bounded by construction — the ONLY way a 100 TB corpus gets a PCA.
  Rows-only by design (the eigensolve is not SQL-expressible); the
  staged-geometry pytest pins the axis recovery.

Reference parity: the reference ETL (etl/app.py) has no vector
surface; SURVEY.md §2D similarity/embedding extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.operators.vector_stats import (
    marginals,
    pair_cells,
    quantized_moments,
)
from datawarehouse1_spark.registry import declared

# ---------------------------------------------------------------- 1.


@declared(
    "q_embedding_covariance_exact",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
               AS q
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id,
             unnest(generate_series(0, len(q) - 1)) AS d,
             unnest(q) AS v
      FROM q
    ),
    marg AS (
      SELECT d, SUM(CAST(v AS DECIMAL(38,0))) AS s FROM ex GROUP BY d
    ),
    cells AS (
      SELECT a.d AS i, b.d AS j,
             CAST(COUNT(*) AS BIGINT) AS n_vecs,
             SUM(CAST(a.v * b.v AS DECIMAL(38,0))) AS sij
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.d >= a.d
      GROUP BY a.d, b.d
    )
    SELECT c.i, c.j, c.n_vecs,
           CAST(c.sij AS VARCHAR) AS sij,
           CAST(ma.s AS VARCHAR) AS si,
           CAST(mb.s AS VARCHAR) AS sj,
           round((c.n_vecs * CAST(c.sij AS DOUBLE)
                  - CAST(ma.s AS DOUBLE) * CAST(mb.s AS DOUBLE))
                 / c.n_vecs / c.n_vecs, 2) AS cov12
    FROM cells c
    JOIN marg ma ON ma.d = c.i
    JOIN marg mb ON mb.d = c.j
    """,
)
def q_embedding_covariance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact upper-triangle covariance cells of the embedding space:
    per (i, j<=i..d-1) — vector count, the exact DECIMAL(38,0)
    quantized co-moment sij = SUM(q_i*q_j) and marginals si/sj, and
    cov12 = (n*sij - si*sj)/n² (the covariance scaled by 1e12, one
    fixed IEEE parenthesization rounded to 2dp). Spark reduces each
    partition to its exact integer Gram matrix with ONE Arrow-batched
    numpy matmul (operators/vector_stats.py — vectors never shuffle;
    only (i, j, decimal) partial cells do, and the cell + marginal
    consumers share a single checkpointed scan); the oracle
    reconstructs the same cells by an explicit position self-join.
    The d-row marginal table broadcasts onto the bounded cell table
    twice."""
    mom = quantized_moments(spark, sf_dir)
    cells = pair_cells(mom)
    marg = marginals(mom)
    ma = marg.select(F.col("d").alias("i"), F.col("s").alias("si"))
    mb = marg.select(F.col("d").alias("j"), F.col("s").alias("sj"))
    out = cells.join(F.broadcast(ma), "i").join(F.broadcast(mb), "j")
    nm = F.col("n_vecs")
    cov12 = F.round(
        (nm * F.col("sij").cast("double")
         - F.col("si").cast("double") * F.col("sj").cast("double"))
        / nm
        / nm,
        2,
    )
    # exact decimals project to STRING: DECIMAL output is never-safe in
    # the driver's pandas fetch (DuckDB decimal -> float64 vs Spark
    # scale-keeping strings — the r1 q_cast_types failure class)
    return out.select(
        "i",
        "j",
        "n_vecs",
        F.col("sij").cast("string").alias("sij"),
        F.col("si").cast("string").alias("si"),
        F.col("sj").cast("string").alias("sj"),
        cov12.alias("cov12"),
    )


# ---------------------------------------------------------------- 2.


@declared("q_embedding_pca_power")  # rows-only: driver-side eigensolve
def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus — two-phase
    distributed PCA: the cluster reduces the corpus to the exact
    quantized co-moment cells (pair_cells over quantized_moments —
    the only fact-touching job), the driver assembles the d x d
    covariance and
    power-iterates (200 fixed steps from the all-ones direction —
    deterministic; sign normalized so the largest-|loading| dimension
    is positive). Output: per dimension, the unit-vector loading in
    floored micro-units and the component's explained-variance share
    (same value each row). The d^2 collect is bounded by construction
    (a config constant, 64^2 here) — the documented-allowed collect
    class. Rows-only by design: an eigensolve has no SQL twin; the
    staged-geometry law pytest pins axis recovery and the explained
    share."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("dim", LongType(), False),
            StructField("loading_e6", LongType(), False),
            StructField("explained_share_e6", LongType(), False),
        ]
    )
    mom = quantized_moments(spark, sf_dir)
    cells = pair_cells(mom).collect()
    marg = {int(r.d): int(r.s) for r in marginals(mom).collect()}
    if not cells:
        return spark.createDataFrame([], schema)

    import numpy as np

    from datawarehouse1_spark.operators.vector_stats import assemble_covariance

    cov = assemble_covariance(cells, marg)
    d = cov.shape[0]
    v = np.ones(d, dtype=np.float64) / np.sqrt(d)
    for _ in range(200):
        w = cov @ v
        nrm = float(np.sqrt((w * w).sum()))
        if nrm == 0.0:
            break
        v = w / nrm
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    trace = float(np.trace(cov))
    explained = float(v @ cov @ v) / trace if trace > 0 else 0.0
    exp_e6 = int(np.floor(explained * 1_000_000))
    rows = [
        (int(k), int(np.floor(float(v[k]) * 1_000_000)), exp_e6)
        for k in range(d)
    ]
    return spark.createDataFrame(rows, schema)
