"""Round-10 vector analytics, batch 2: cluster assignment balance.

* **Cluster balance** — assign every embedding to its nearest of k=8
  fixed centroids (the vectors with vec_id < 8 — deterministic by
  identity, the IVF-training-free baseline) and report per-cluster
  size, corpus share, and mean inertia.  The partition-balance /
  quantization-quality read an IVF or shard-by-cluster layout decision
  needs BEFORE committing to it: a cluster holding half the corpus
  means the centroid set (or k) is wrong.

  Exactness: components quantize to floor(v·1e6) BEFORE any
  arithmetic (the q_embedding_centroid_drift money-for-vectors
  discipline), so every distance is an exact integer (≤ 64·(2e6)² ≈
  2.6e14 — comfortably BIGINT) and ties break to the LOWER centroid
  id via min-over-struct, identical in both engines.  Mean inertia is
  an integer `div` so the per-cluster output never saturates at any
  corpus size (a SUM would overflow BIGINT past ~3.6e4 vectors per
  1e18 — the mean is the consumable anyway).

  Plan shape: the 8 quantized centroids collapse to ONE collected row
  (bounded by construction — the rule-26 bounded-collect class) and
  cross-join-broadcast onto the corpus; the per-vector argmin runs as
  a JVM higher-order fold over the 8-element array (no shuffle, no
  Python); the only exchange is the 8-row cluster aggregate.  At IVF
  scale the same shape holds: k is a config constant, vectors never
  shuffle.

Reference parity: the reference ETL (etl/app.py) has no vector
surface; SURVEY.md §2D similarity/embedding extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

K = 8

_QUANT = (
    "transform(embedding,"
    " v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
)


@declared(
    "q_embedding_cluster_balance",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
               AS q
      FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, q AS cq FROM q WHERE vec_id < {K}),
    d AS (
      SELECT q.vec_id, c.cid,
             CAST(list_sum(list_transform(range(1, len(q.q) + 1),
                    i -> (q.q[i] - c.cq[i]) * (q.q[i] - c.cq[i])))
                  AS BIGINT) AS dist
      FROM q, c
    ),
    best AS (
      SELECT vec_id, (min({{'d': dist, 'cid': cid}})).cid AS cid,
             (min({{'d': dist, 'cid': cid}})).d AS dist
      FROM d GROUP BY vec_id
    ),
    agg AS (
      SELECT cid, COUNT(*) AS n_vecs, SUM(CAST(dist AS HUGEINT)) AS inertia
      FROM best GROUP BY cid
    )
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(n_vecs * 1000000 // SUM(n_vecs) OVER () AS BIGINT)
             AS share_e6,
           CAST(inertia // n_vecs AS BIGINT) AS inertia_mean_q
    FROM agg
    """,
)
def q_embedding_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment balance over k=8 identity-fixed
    centroids: per cluster — member count, floored micro-share of the
    corpus, and mean exact quantized squared-L2 inertia.  Ties go to
    the lower centroid id (min over struct(dist, cid), bit-identical
    across engines).  The centroid set is ONE collected 8-struct row
    broadcast onto the corpus; assignment is a JVM array fold (k and
    d are config constants); the single exchange is the 8-row cluster
    aggregate."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    q = e.select("vec_id", F.expr(_QUANT).alias("q"))
    cents = (
        q.filter(F.col("vec_id") < K)
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cid"), F.col("cq")))
            ).alias("cs")
        )
    )
    best = q.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.expr(
            """
            aggregate(
              cs,
              named_struct('d', CAST(9223372036854775807 AS BIGINT),
                           'cid', CAST(-1 AS BIGINT)),
              (acc, c) -> CASE
                WHEN named_struct(
                       'd', aggregate(zip_with(q, c.cq,
                              (x, y) -> (x - y) * (x - y)),
                            CAST(0 AS BIGINT), (a, b) -> a + b),
                       'cid', c.cid) < acc
                THEN named_struct(
                       'd', aggregate(zip_with(q, c.cq,
                              (x, y) -> (x - y) * (x - y)),
                            CAST(0 AS BIGINT), (a, b) -> a + b),
                       'cid', c.cid)
                ELSE acc END)
            """
        ).alias("b"),
    ).select(
        "vec_id", F.col("b.cid").alias("cid"), F.col("b.d").alias("dist")
    # an empty centroid set leaves the fold at its cid=-1 init value;
    # drop those rows so the degenerate corpus yields ZERO rows exactly
    # like the oracle's empty cross join (review finding)
    ).filter(F.col("cid") >= 0)
    agg = best.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr("SUM(CAST(dist AS DECIMAL(38,0)))").alias("inertia"),
    )
    w = Window.partitionBy()
    return agg.select(
        F.col("cid").cast("long").alias("cluster_id"),
        "n_vecs",
        F.expr("n_vecs * 1000000").alias("_num"),
        F.sum("n_vecs").over(w).alias("_den"),
        F.expr("inertia div n_vecs").cast("long").alias("inertia_mean_q"),
    ).select(
        "cluster_id",
        "n_vecs",
        F.expr("_num div _den").cast("long").alias("share_e6"),
        "inertia_mean_q",
    )
