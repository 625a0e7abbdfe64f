"""Log2-histogram sketch (operators/sketches.py): exact merge law,
quantile-recovery accuracy against the exact percentile, and plan shape
(one shuffle carrying bucket rows, not data rows)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.operators.sketches import (
    histogram_quantiles,
    log2_histogram,
    merge_histograms,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_law_exact(spark):
    """sketch(A union B) == merge(sketch(A), sketch(B)) — bit-exact,
    the property that makes shard-wise/day-wise re-aggregation safe."""
    li = table(spark, SF_DIR, "lineitem")
    half_a = li.filter("l_orderkey % 2 = 0")
    half_b = li.filter("l_orderkey % 2 = 1")
    whole = log2_histogram(li, "l_extendedprice", ("l_returnflag",))
    merged = merge_histograms(
        log2_histogram(half_a, "l_extendedprice", ("l_returnflag",)),
        log2_histogram(half_b, "l_extendedprice", ("l_returnflag",)),
    )
    assert _canon(whole) == _canon(merged)


def test_merge_is_associative_three_way(spark):
    li = table(spark, SF_DIR, "lineitem")
    parts = [li.filter(f"l_orderkey % 3 = {i}") for i in range(3)]
    sketches = [log2_histogram(p, "l_extendedprice") for p in parts]
    left_assoc = merge_histograms(merge_histograms(sketches[0], sketches[1]), sketches[2])
    flat = merge_histograms(*sketches)
    assert _canon(left_assoc) == _canon(flat)


def test_sketch_size_is_bounded(spark):
    """However many input rows, the sketch has one row per occupied
    octave (money values < 2^31 cents => < 31 buckets)."""
    li = table(spark, SF_DIR, "lineitem")
    n = log2_histogram(li, "l_extendedprice").count()
    assert n < 31


def test_quantile_recovery_within_one_octave(spark):
    """The interpolated p50/p90/p99 must land within the winning octave
    of the exact percentile — the sketch's stated error bound."""
    li = table(spark, SF_DIR, "lineitem")
    sk = log2_histogram(li, "l_extendedprice")
    qs = [0.5, 0.9, 0.99]
    est = {r.quantile: r.est_cents for r in histogram_quantiles(sk, qs).collect()}
    cents = np.array(
        [
            int(r[0])
            for r in li.select(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
            ).collect()
        ]
    )
    for q in qs:
        exact = float(np.percentile(cents, q * 100))
        got = est[q]
        # same octave: ratio within [0.5, 2]
        assert 0.5 <= got / exact <= 2.0, (q, got, exact)
        # and interpolation should usually do much better — pin a
        # regression bound of 30% relative error on this data
        assert abs(got - exact) / exact < 0.30, (q, got, exact)


def test_grouped_quantiles_cover_groups(spark):
    li = table(spark, SF_DIR, "lineitem")
    sk = log2_histogram(li, "l_extendedprice", ("l_returnflag",))
    out = histogram_quantiles(sk, [0.5], group_cols=("l_returnflag",)).collect()
    flags = {r.l_returnflag for r in out}
    assert flags == {r.l_returnflag for r in li.select("l_returnflag").distinct().collect()}
    assert all(r.est_cents > 0 for r in out)


def test_sketch_plan_one_shuffle(spark):
    """The build is a single hash aggregate: exactly one shuffle
    exchange, carrying bucket rows."""
    li = table(spark, SF_DIR, "lineitem")
    plan = (
        log2_histogram(li, "l_extendedprice", ("l_returnflag",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1
    assert "BatchEvalPython" not in plan


def test_zero_and_negative_go_to_sentinel_bucket(spark):
    df = spark.createDataFrame(
        [(0.0,), (-12.5,), (0.01,), (1.0,)], "v double"
    )
    rows = {r.bin: r.n for r in log2_histogram(df, "v").collect()}
    assert rows[-1] == 2  # 0 and negative
    assert rows[0] == 1  # 1 cent -> log2(1) = 0
    assert rows[6] == 1  # 100 cents -> floor(log2(100)) = 6


# ---------- count-min sketch ----------


def test_count_min_never_undercounts(spark):
    """One-sided error: est >= true count for every probed key, and for
    a 256-wide sketch over this keyspace the overestimate stays small."""
    from datawarehouse1_spark.operators.sketches import (
        count_min_estimate,
        count_min_sketch,
    )

    o = table(spark, SF_DIR, "orders")
    sk = count_min_sketch(o, "o_custkey")
    true = {r.o_custkey: r.cnt for r in o.groupBy("o_custkey").agg(F.count("*").alias("cnt")).collect()}
    keys = o.select("o_custkey").distinct().limit(50)
    est = {r.o_custkey: r.est_count for r in count_min_estimate(sk, keys, "o_custkey").collect()}
    total = sum(true.values())
    for k, e in est.items():
        assert e >= true[k], (k, e, true[k])
        # epsilon ~ e/width: overestimate bounded by ~3N/256
        assert e - true[k] <= 3 * total / 256 + 1, (k, e, true[k])


def test_count_min_merge_law_exact(spark):
    from datawarehouse1_spark.operators.sketches import (
        count_min_merge,
        count_min_sketch,
    )

    o = table(spark, SF_DIR, "orders")
    whole = count_min_sketch(o, "o_custkey")
    merged = count_min_merge(
        count_min_sketch(o.filter("o_orderkey % 2 = 0"), "o_custkey"),
        count_min_sketch(o.filter("o_orderkey % 2 = 1"), "o_custkey"),
    )
    assert _canon(whole) == _canon(merged)


def test_count_min_bounded_size(spark):
    from datawarehouse1_spark.operators.sketches import count_min_sketch

    n = count_min_sketch(table(spark, SF_DIR, "orders"), "o_custkey").count()
    assert n <= 3 * 256


def test_count_min_plan_one_shuffle(spark):
    from datawarehouse1_spark.operators.sketches import count_min_sketch

    plan = (
        count_min_sketch(table(spark, SF_DIR, "orders"), "o_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1
    assert "BatchEvalPython" not in plan
