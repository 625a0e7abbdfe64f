"""Round-10 vector analytics, batch 3: cluster-label purity.

* **Cluster purity** — the unsupervised-vs-labeled agreement report:
  every embedding is assigned to its nearest identity-fixed centroid
  (the q_embedding_cluster_balance assignment, reused verbatim) and
  each cluster reports its majority LABEL and purity — the fraction
  of members carrying it.  This is the evaluation row an
  embedding-quality pipeline reads before trusting cluster-based
  curation (a cluster at 40% purity means the embedding space does
  not separate the classes the labels encode).  Purity is rational
  (member counts over member counts — rule 20: no NMI/entropy
  transcendental); the majority label ties break to the LOWER label
  (min over struct(-count, label), identical in both engines).

Reference parity: the reference ETL (etl/app.py) has no vector
surface; SURVEY.md §2D similarity/embedding extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.queries.vectors_r10b import _QUANT, K
from datawarehouse1_spark.registry import declared


@declared(
    "q_embedding_cluster_purity",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
               AS q
      FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, q AS cq FROM q WHERE vec_id < {K}),
    d AS (
      SELECT q.vec_id, q.label, c.cid,
             CAST(list_sum(list_transform(range(1, len(q.q) + 1),
                    i -> (q.q[i] - c.cq[i]) * (q.q[i] - c.cq[i])))
                  AS BIGINT) AS dist
      FROM q, c
    ),
    best AS (
      SELECT vec_id, label, (min({{'d': dist, 'cid': cid}})).cid AS cid
      FROM d GROUP BY vec_id, label
    ),
    cell AS (
      SELECT cid, label, COUNT(*) AS n FROM best GROUP BY cid, label
    ),
    major AS (
      SELECT cid,
             SUM(n) AS n_members,
             (min({{'negn': -n, 'label': label}})).label AS majority_label,
             -(min({{'negn': -n, 'label': label}})).negn AS n_majority
      FROM cell GROUP BY cid
    )
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(majority_label AS INT) AS majority_label,
           CAST(n_majority AS BIGINT) AS n_majority,
           CAST(n_majority * 1000000 // n_members AS BIGINT)
             AS purity_e6
    FROM major
    """,
)
def q_embedding_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster label purity over the k={K} identity-fixed
    nearest-centroid assignment: member count, the majority label
    (ties to the LOWER label via min over struct(-count, label)), its
    member count, and purity in floored micro-units.  Same exact
    quantized-distance assignment as q_embedding_cluster_balance
    (vectors never shuffle; the centroid set broadcasts as one
    collected row); the (cluster, label) contingency and the majority
    election are bounded aggregates."""
    e = table(spark, sf_dir, "embeddings")
    q = e.select("vec_id", "label", F.expr(_QUANT).alias("q"))
    cents = (
        q.filter(F.col("vec_id") < K)
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("cq"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cid"), F.col("cq")))
            ).alias("cs")
        )
    )
    best = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "label",
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
                    ELSE acc END).cid
                """
            ).alias("cid"),
        )
        .filter(F.col("cid") >= 0)
    )
    cell = best.groupBy("cid", "label").agg(F.count(F.lit(1)).alias("n"))
    major = cell.groupBy("cid").agg(
        F.sum("n").alias("n_members"),
        F.min(
            F.struct((-F.col("n")).alias("negn"), F.col("label"))
        ).alias("m"),
    )
    return major.select(
        F.col("cid").cast("long").alias("cluster_id"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("m.label").cast("int").alias("majority_label"),
        (-F.col("m.negn")).cast("long").alias("n_majority"),
        F.expr("-m.negn * 1000000 div n_members")
        .cast("long")
        .alias("purity_e6"),
    )
