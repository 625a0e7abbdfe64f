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


def test_const_bigint_array_int64_contract():
    from datawarehouse1_spark.functions.arrays import const_bigint_array

    with pytest.raises(ValueError, match="9223372036854775808"):
        const_bigint_array([0, 1 << 63])
    with pytest.raises(ValueError, match="does not fit signed 64-bit"):
        const_bigint_array([-(1 << 63) - 1])
    # boundary values are in-contract (LONG_MIN / LONG_MAX round-trip)
    const_bigint_array([-(1 << 63), (1 << 63) - 1, 0])
