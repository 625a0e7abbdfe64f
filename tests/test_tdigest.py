"""t-digest operator (operators/tdigest.py) — the staged r16 rows-only
scale path for percentiles. Pins the properties a declaration will
lean on: bounded size, merge law, quantile monotonicity, rank-error
accuracy vs the exact answer, and determinism for a fixed layout.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_DIR
from datawarehouse1_spark.operators.tdigest import (
    _compress,
    digest_quantile,
    tdigest_percentiles,
)

PROBS = (0.1, 0.5, 0.9, 0.99)


def test_compress_bounds_size_and_conserves_weight():
    rng = np.random.default_rng(11)
    vals = np.sort(rng.normal(size=20_000))
    m, w = _compress(vals, np.ones_like(vals), delta=100)
    assert len(m) <= 2 * 100  # ~δ centroids, generous bound
    assert w.sum() == pytest.approx(20_000)
    assert np.all(np.diff(m) >= 0)  # means stay sorted


def test_digest_rank_error_within_one_percent():
    rng = np.random.default_rng(7)
    # heavy-tailed: the regime the octave sketch handles poorly
    vals = np.sort(np.exp(rng.normal(size=50_000)))
    m, w = _compress(vals, np.ones_like(vals), delta=100)
    n = len(vals)
    for q in PROBS:
        est = digest_quantile(m, w, q)
        rank = np.searchsorted(vals, est) / n
        assert abs(rank - q) <= 0.01, (q, rank)


def test_merge_law_matches_single_digest_ranks():
    """Digesting two halves and merging must estimate the same ranks
    (within the same error budget) as digesting the whole — the
    property that makes level-1/level-2 distribution sound."""
    rng = np.random.default_rng(3)
    vals = np.sort(rng.gamma(2.0, 3.0, size=40_000))
    h1, h2 = vals[::2], vals[1::2]
    m1, w1 = _compress(np.sort(h1), np.ones_like(h1), 100)
    m2, w2 = _compress(np.sort(h2), np.ones_like(h2), 100)
    mm, mw = _compress(
        np.concatenate([m1, m2]), np.concatenate([w1, w2]), 100
    )
    n = len(vals)
    for q in PROBS:
        est = digest_quantile(mm, mw, q)
        rank = np.searchsorted(vals, est) / n
        assert abs(rank - q) <= 0.015, (q, rank)


def test_spark_grouped_percentiles_accuracy(spark):
    """The full two-level pipeline on lineitem quantity per returnflag:
    every estimate's RANK in the exact sorted group is within 1.5% of
    its target probability, and per-group quantiles are monotone."""
    from datawarehouse1_spark.catalog import table

    li = table(spark, SF_DIR, "lineitem")
    out = tdigest_percentiles(
        li, "l_quantity", PROBS, group_cols=("l_returnflag",)
    ).collect()
    # exact values via a collect of each group's column (test-size data)
    import pyspark.sql.functions as F

    exact = {
        r["l_returnflag"]: np.sort(
            np.array(r["vals"], dtype=float)
        )
        for r in li.groupBy("l_returnflag")
        .agg(F.collect_list("l_quantity").alias("vals"))
        .collect()
    }
    per_group: dict = {}
    for r in out:
        per_group.setdefault(r.l_returnflag, []).append((r.prob, r.est))
        vals = exact[r.l_returnflag]
        rank = np.searchsorted(vals, r.est) / len(vals)
        assert abs(rank - r.prob) <= 0.015, (r.l_returnflag, r.prob, rank)
    for flag, pairs in per_group.items():
        pairs.sort()
        ests = [e for _, e in pairs]
        assert ests == sorted(ests), flag  # monotone quantiles


def test_spark_ungrouped_deterministic_for_fixed_layout(spark):
    from datawarehouse1_spark.catalog import table

    o = table(spark, SF_DIR, "orders").repartition(4, "o_orderkey")
    a = {
        (r.prob): r.est
        for r in tdigest_percentiles(o, "o_totalprice", PROBS).collect()
    }
    b = {
        (r.prob): r.est
        for r in tdigest_percentiles(o, "o_totalprice", PROBS).collect()
    }
    assert a == b
    assert set(a) == set(PROBS)


def test_null_group_keys_form_a_group_like_spark_groupby(spark):
    """ADVICE r15: pandas groupby(dropna=True) silently dropped rows
    with NULL group keys — Spark groupBy semantics keep NULL as a
    group. The digest of the NULL group must exist and estimate from
    exactly the NULL-keyed rows."""
    import pyspark.sql.functions as F

    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") % 3)
        .cast("long")
        .alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    out = tdigest_percentiles(df, "v", [0.5], group_cols=["g"]).collect()
    keys = {r.g for r in out}
    assert None in keys, "NULL group dropped"
    assert keys == {None, 0, 1, 2}
    null_med = next(r.est for r in out if r.g is None)
    # NULL-group values are 0,10,...,990: median ~495, far from the
    # global median only if the group really is just those rows
    assert 400.0 <= null_med <= 600.0


def test_ungrouped_empty_input_yields_zero_rows(spark):
    """ADVICE r15: zero input rows used to crash in pd.concat([]) /
    IndexError in _compress; the contract is zero output rows."""
    import pyspark.sql.functions as F

    df = (
        spark.range(0, 10)
        .select(F.col("id").cast("double").alias("v"))
        .filter(F.col("v") < -1)
    )
    assert tdigest_percentiles(df, "v", PROBS).count() == 0
