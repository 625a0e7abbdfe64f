"""Round-13 hardening: shared persisted-state memo discipline
(VERDICT r12 #3, ADVICE r12 items 1-2), IVF training determinism
staging, and the graph-family skew stress (VERDICT r12 #4).
"""

from __future__ import annotations

import pytest

from datawarehouse1_spark.state_memo import AppScopedMemo


class _FakeSpark:
    """Duck-typed stand-in exposing only sparkContext.applicationId —
    what AppScopedMemo reads. Lets the eviction rules be pinned without
    paying a second real SparkSession per case."""

    def __init__(self, app_id: str) -> None:
        self.sparkContext = type("SC", (), {"applicationId": app_id})()


class _Unpersistable:
    def __init__(self) -> None:
        self.unpersisted = False

    def unpersist(self):
        self.unpersisted = True
        return self


def test_memo_caches_per_app_and_corpus():
    memo = AppScopedMemo()
    spark = _FakeSpark("app-1")
    builds = []

    def build(tag):
        def _b():
            builds.append(tag)
            return tag

        return _b

    assert memo.get_or_build(spark, "/sf0.001", build("a")) == "a"
    assert memo.get_or_build(spark, "/sf0.001", build("a2")) == "a"  # hit
    assert builds == ["a"]


def test_memo_keeps_other_corpora_in_same_app():
    """ADVICE r12: alternating two sf_dirs inside ONE app (accuracy at
    sf0.001 then bench at sf0.1) must not thrash — the old clear()-on-
    miss rebuilt the index on every alternation."""
    memo = AppScopedMemo()
    spark = _FakeSpark("app-1")
    n_builds = {"n": 0}

    def build(val):
        def _b():
            n_builds["n"] += 1
            return val

        return _b

    memo.get_or_build(spark, "/sf0.001", build("x"))
    memo.get_or_build(spark, "/sf0.1", build("y"))
    # alternate: both must be hits
    assert memo.get_or_build(spark, "/sf0.001", build("x2")) == "x"
    assert memo.get_or_build(spark, "/sf0.1", build("y2")) == "y"
    assert n_builds["n"] == 2
    assert len(memo) == 2


def test_memo_new_app_evicts_and_unpersists():
    """VERDICT r12 #3 done-criterion: a new applicationId rebuilds, and
    the evicted entry's checkpoint blocks are released via unpersist."""
    memo = AppScopedMemo()
    old_value = _Unpersistable()
    memo.get_or_build(_FakeSpark("app-1"), "/sf0.01", lambda: old_value)

    new_value = _Unpersistable()
    got = memo.get_or_build(_FakeSpark("app-2"), "/sf0.01", lambda: new_value)
    assert got is new_value
    assert old_value.unpersisted
    assert list(memo.keys()) == [("app-2", "/sf0.01")]


def test_memo_caches_none_result():
    """The IVF empty-corpus fallback memoizes None — a second call must
    NOT re-pay the limit(16).count() guard + training attempt."""
    memo = AppScopedMemo()
    spark = _FakeSpark("app-1")
    n = {"n": 0}

    def build():
        n["n"] += 1
        return None

    assert memo.get_or_build(spark, "/empty", build) is None
    assert memo.get_or_build(spark, "/empty", build) is None
    assert n["n"] == 1


def test_memo_unpersist_failure_is_swallowed():
    memo = AppScopedMemo()

    class _Raises:
        def unpersist(self):
            raise RuntimeError("app already stopped")

    memo.get_or_build(_FakeSpark("app-1"), "/c", lambda: _Raises())
    # must not raise despite the evicted entry's unpersist failing
    assert memo.get_or_build(_FakeSpark("app-2"), "/c", lambda: "fresh") == "fresh"


def test_both_persisted_state_caches_share_the_discipline():
    """The two call sites must actually USE the shared helper — the
    whole point of VERDICT r12 #3 is one eviction rule, not two."""
    from datawarehouse1_spark.queries import dedup_ext, similarity

    assert isinstance(dedup_ext._MINHASH_INDEX_CACHE, AppScopedMemo)
    assert isinstance(similarity._IVF_CENTROIDS, AppScopedMemo)


def test_ivf_training_layout_staged_deterministic(spark):
    """ADVICE r12 item 3: k-means|| with a fixed seed is deterministic
    only for a fixed input partitioning. train_ivf_centroids must stage
    a layout-independent deterministic layout, so training the same
    corpus presented under DIFFERENT upstream layouts yields
    bit-identical centroids."""
    import numpy as np

    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.operators.similarity import train_ivf_centroids

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    a = train_ivf_centroids(emb, n_centroids=8)
    # same data, radically different upstream layout + row order
    shuffled = emb.repartition(13).sortWithinPartitions(
        (emb["vec_id"] * 2654435761) % 97
    )
    b = train_ivf_centroids(shuffled, n_centroids=8)
    assert np.array_equal(a, b), "centroids depend on upstream layout"
