"""Exact vector second-moment statistics over an embedding column.

The scalable PCA/covariance pattern for N >> d: reduce the corpus to
the d(d+1)/2 upper-triangle co-moment cells plus the d marginal sums
in ONE scan. Components quantize to floor(v * 1e6) integers BEFORE
any aggregation (the q_embedding_centroid_drift money-for-vectors
discipline), so every sum is exact and order-independent.

The per-partition reduction is an Arrow-vectorized mapInPandas: each
batch computes the integer Gram matrix Q^T Q with one numpy int64
matmul (exact — products <= ~1e13 and per-batch sums <= ~1e17 fit
int64; cross-batch accumulation promotes to Python ints, so a
partition of any size stays exact) and the column sums, then emits
d(d+1)/2 + d partial rows as DECIMAL(38,0). Vectors never shuffle —
the ONLY exchange carries bounded (i, j, decimal) cells. An earlier
pure-SQL nested-transform pair explode produced the same cells but
generated d(d+1)/2 structs PER VECTOR through codegen (measured 10x
slower at 20k x 64); the Gram-matmul form is why mapInPandas exists.

The bounded cell table (d^2 is a config constant, 64^2 here) is the
collectable artifact a driver-side eigensolver needs — the standard
two-phase distributed PCA: cluster-reduce to d x d, driver-solve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.operators.scale import widen_if_narrow

_DEC = "decimal(38,0)"

# partial-moment rows: j >= 0 -> upper-triangle cell (i, j); j == -1 ->
# marginal sum of dimension i. n_part = vectors reduced by the partition.
_MOMENT_SCHEMA = "i bigint, j bigint, n_part bigint, p decimal(38,0)"


def _reduce_partition(batches):
    import decimal

    import numpy as np
    import pandas as pd

    acc = None  # object-dtype Gram accumulator (exact Python ints)
    marg = None
    cnt = 0
    for pdf in batches:
        if len(pdf) == 0:
            continue
        q = np.floor(
            np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
        ).astype(np.int64)
        g = (q.T @ q).astype(object)  # int64 matmul is exact at batch size
        m = q.sum(axis=0, dtype=np.int64).astype(object)
        acc = g if acc is None else acc + g
        marg = m if marg is None else marg + m
        cnt += q.shape[0]
    if cnt == 0:
        return
    d = acc.shape[0]
    iu, ju = np.triu_indices(d)
    i = np.concatenate([iu, np.arange(d)])
    j = np.concatenate([ju, np.full(d, -1)])
    p = [decimal.Decimal(int(x)) for x in acc[iu, ju]] + [
        decimal.Decimal(int(x)) for x in marg
    ]
    yield pd.DataFrame(
        {
            "i": i.astype("int64"),
            "j": j.astype("int64"),
            "n_part": np.full(len(i), cnt, dtype="int64"),
            "p": p,
        }
    )


def quantized_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan partial moments, localCheckpoint'ed so the cell and
    marginal consumers share the single embeddings pass (SCALE.md rule
    12). widen_if_narrow lifts a small-file scan to full parallelism;
    at production split counts it is a no-op."""
    emb = widen_if_narrow(
        table(spark, sf_dir, "embeddings").select("embedding")
    )
    return emb.mapInPandas(_reduce_partition, schema=_MOMENT_SCHEMA).localCheckpoint(
        eager=True
    )


def pair_cells(moments: DataFrame) -> DataFrame:
    """(i, j, n_vecs, sij): exact DECIMAL(38,0) upper-triangle
    co-moments aggregated from the partition partials."""
    return (
        moments.where(F.col("j") >= 0)
        .groupBy("i", "j")
        .agg(
            F.sum("n_part").cast("long").alias("n_vecs"),
            F.sum("p").cast(_DEC).alias("sij"),
        )
    )


def marginals(moments: DataFrame) -> DataFrame:
    """(d, s): exact DECIMAL(38,0) per-dimension sums."""
    return (
        moments.where(F.col("j") == -1)
        .groupBy(F.col("i").alias("d"))
        .agg(F.sum("p").cast(_DEC).alias("s"))
    )


def assemble_covariance(cells, marg: dict) -> "object":
    """Driver-side d×d covariance from the bounded co-moment cells and
    marginal sums — THE one place the quantized-covariance formula
    lives. q_embedding_pca_power eigensolves it and accuracy.py grades
    that query against numpy's dense eigensolve of the same matrix; a
    second copy of the formula would let the two drift apart and turn
    the alignment metric into a formula-diff detector. Exact integer
    arithmetic up to the final float division; collect is bounded by
    d(d+1)/2 (a config constant, 64² here)."""
    import numpy as np

    d = max(int(r.j) for r in cells) + 1
    n = int(cells[0].n_vecs)
    cov = np.zeros((d, d), dtype=np.float64)
    for r in cells:
        i, j = int(r.i), int(r.j)
        c = (n * float(int(r.sij)) - marg[i] * marg[j]) / n / n
        cov[i, j] = c
        cov[j, i] = c
    return cov
