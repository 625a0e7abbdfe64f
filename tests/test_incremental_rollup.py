"""Incremental rollup maintenance: merging per-batch aggregates must be
bit-identical to recomputing over the full history (additivity holds
because sums stay in DECIMAL until serving)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.operators.warehouse import merge_rollup
from tests.conftest import SF_DIR


def _rollup(df):
    return df.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_price"),
    )


def test_merge_rollup_equals_full_recompute(spark):
    o = table(spark, SF_DIR, "orders")
    # simulate two ingest batches interleaved across all months
    batch1 = o.filter(F.col("o_orderkey") % 2 == 0)
    batch2 = o.filter(F.col("o_orderkey") % 2 == 1)

    maintained = merge_rollup(
        None, _rollup(batch1), ["order_month"], ["n_orders", "total_price"]
    )
    maintained = merge_rollup(
        maintained, _rollup(batch2), ["order_month"], ["n_orders", "total_price"]
    )

    full = _rollup(o)
    got = {
        r.order_month: (r.n_orders, r.total_price) for r in maintained.collect()
    }
    want = {r.order_month: (r.n_orders, r.total_price) for r in full.collect()}
    assert got == want  # exact decimal equality, not approx


def test_merge_rollup_three_way_associative(spark):
    o = table(spark, SF_DIR, "orders")
    parts = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    acc = None
    for p in parts:
        acc = merge_rollup(acc, _rollup(p), ["order_month"], ["n_orders", "total_price"])
    assert sorted(
        (r.order_month, r.n_orders, r.total_price) for r in acc.collect()
    ) == sorted(
        (r.order_month, r.n_orders, r.total_price) for r in _rollup(o).collect()
    )
