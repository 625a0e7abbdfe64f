"""Round-15 hardening pins (VERDICT r14 + ADVICE r14).

1. rotate_checkpoint bounds executor storage: repeated invocations of
   q_stats_spearman_rho in one session hold exactly ONE checkpointed
   joint (ADVICE r14: blocks previously accumulated until session end,
   and DataFrame.unpersist() is a no-op for localCheckpoint blocks).
2. const_bigint_array rejects values outside signed 64-bit with a
   ValueError naming the offender (ADVICE r14).
3. Per-section bench canaries + hex spread digits are exercised by
   tests/test_accuracy_metrics.py (tail-budget + encoding pins).
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR, compare_query


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_spearman_checkpoint_rotation_bounds_storage(spark, oracle):
    """Three invocations leave the session with no MORE persistent RDDs
    than one invocation did: each rotation unpersists the previous
    joint's blocks by id (other session-scoped state — memoized IVF
    centroids, minhash history — may coexist, so the pin is on growth,
    not an absolute count)."""
    from datawarehouse1_spark import registry

    registry.load_all()
    fn = registry.QUERIES["q_stats_spearman_rho"]

    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    after_one = _persistent_rdd_count(spark)
    for _ in range(2):
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    after_three = _persistent_rdd_count(spark)
    assert after_three <= after_one, (
        f"checkpoint blocks accumulated: {after_one} persistent RDDs "
        f"after one invocation, {after_three} after three"
    )
    # and the rotation must not have perturbed results
    compare_query(
        spark,
        oracle,
        fn,
        registry.ORACLES["q_stats_spearman_rho"],
        SF_DIR,
    )


def _clustered_corpus(spark, n, dim=32, n_clusters=20, seed=7):
    """Mixture-of-gaussians corpus — the production embedding shape
    (real embedding spaces cluster; the near-orthogonal gaussian
    testdata is IVF's worst case and was the r14 grid's blind spot)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n)
    vecs = centers[labels] + 0.25 * rng.normal(size=(n, dim))
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)


def _ivf_recall(corpus, queries, cents, n_c, spill, nprobe, k=5):
    from datawarehouse1_spark.operators.similarity import exact_topk, ivf_topk

    want: dict = {}
    for r in exact_topk(corpus, queries, k).collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict = {}
    approx = ivf_topk(
        corpus, queries, k, n_c, nprobe, centroids=cents, index_spill=spill
    )
    for r in approx.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    per_q = [len(got.get(q, set()) & h) / len(h) for q, h in want.items()]
    return sum(per_q) / len(per_q)


def test_ivf_spill_knee_at_production_ratio(spark):
    """VERDICT r14 #4: re-derive the (spill, nprobe) knee in the regime
    the 100 TB layout actually occupies — nprobe/n_centroids ~
    0.05-0.15 with a clustered corpus — not just the r14 testbed's
    0.375-0.75. The r15 grid (ROUND_NOTES r15) found the knee is
    GRANULARITY-DEPENDENT, which this test pins at matched nominal
    candidate volume (spill*nprobe/n_c = 1/6):

      * n_c ~ intrinsic cluster count (50 clusters, 48 centroids):
        boundary double-assignment matches or beats query-side probing
        — (spill=2, nprobe=4) >= (spill=1, nprobe=8) - 0.03 — while
        reading HALF the lists per query (the binding cost when lists
        are storage partitions), so spill=2 is the operating point;
      * n_c OVERSEGMENTS (20 clusters, 64 centroids — each intrinsic
        cluster split over ~3 lists): true neighbors spread across
        sibling lists that spill's runner-up assignment does not
        reach, so query-side probing wins — (spill=1, nprobe=8) >=
        (spill=2, nprobe=4) - 0.01 (measured +0.046).

    Production rule derived: size n_c to the corpus's cluster
    granularity and take spill=2; if n_c must oversegment (huge corpus,
    bounded list size), buy recall with nprobe, not spill. Seeded
    corpus + deterministic KMeans staging keep the recalls
    reproducible; slacks absorb the 48-query sample."""
    from pyspark.sql import functions as F

    from datawarehouse1_spark.operators.similarity import train_ivf_centroids

    # regime A: centroid count ~ intrinsic cluster count
    corpus = _clustered_corpus(spark, 2000, dim=64, n_clusters=50)
    corpus = corpus.localCheckpoint()
    queries = corpus.orderBy(F.hash("vec_id")).limit(48).localCheckpoint()
    cents = train_ivf_centroids(corpus, 48)
    r_s1 = _ivf_recall(corpus, queries, cents, 48, spill=1, nprobe=8)
    r_s2 = _ivf_recall(corpus, queries, cents, 48, spill=2, nprobe=4)
    assert r_s2 >= r_s1 - 0.03, (
        f"matched-granularity regime: spill=2/nprobe=4 recall "
        f"{r_s2:.3f} fell behind spill=1/nprobe=8 {r_s1:.3f} at "
        "matched candidate volume"
    )

    # regime B: centroids oversegment the intrinsic clusters
    over = _clustered_corpus(spark, 2000, dim=64, n_clusters=20)
    over = over.localCheckpoint()
    oq = over.orderBy(F.hash("vec_id")).limit(48).localCheckpoint()
    ocents = train_ivf_centroids(over, 64)
    o_s1 = _ivf_recall(over, oq, ocents, 64, spill=1, nprobe=8)
    o_s2 = _ivf_recall(over, oq, ocents, 64, spill=2, nprobe=4)
    assert o_s1 >= o_s2 - 0.01, (
        f"oversegmented regime: spill=1/nprobe=8 recall {o_s1:.3f} "
        f"fell behind spill=2/nprobe=4 {o_s2:.3f} — the "
        "probe-not-spill rule no longer holds"
    )


def test_const_bigint_array_int64_contract():
    from datawarehouse1_spark.functions.arrays import const_bigint_array

    with pytest.raises(ValueError, match="9223372036854775808"):
        const_bigint_array([0, 1 << 63])
    with pytest.raises(ValueError, match="does not fit signed 64-bit"):
        const_bigint_array([-(1 << 63) - 1])
    # boundary values are in-contract (LONG_MIN / LONG_MAX round-trip)
    const_bigint_array([-(1 << 63), (1 << 63) - 1, 0])
