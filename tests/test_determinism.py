"""Determinism under re-partitioning: declared-query results must be
invariant to shuffle partition count and input partitioning — the
property that makes sf0.01 oracle hashes meaningful for a 1000-executor
run. Exercises the riskiest families: decimal aggregation (order),
window functions (ties), minhash/surrogate determinism."""

from __future__ import annotations

import pytest

from datawarehouse1_spark import registry
from tests.conftest import SF_DIR, rows_to_canon

registry.load_all()

RISKY = [
    "q_flagship_monthly_revenue",  # decimal sums + two-level distinct
    "q_agg_group_sum",
    "q_window_rank_topn",          # rank ties
    "q_surrogate_key",             # row_number totality
    "q_dedup_business_key",
    "q_similarity_cosine_topk",    # double fold order
    "q_llm_curation_pipeline",
    # r3 additions with nontrivial determinism surface:
    "q_dedup_clusters",            # iterative fixpoint + localCheckpoint
    "q_dedup_fuzzy_names",         # blocked self-join
    "q_sample_hash_mixture",       # hash-threshold selection
    "q_tpch_q10_returned_items",   # top-20 revenue ties
    # r4 additions with nontrivial determinism surface:
    "q_tpch_q2_min_cost_supplier",    # min-price ties + LIMIT boundary
    "q_tpch_q15_top_supplier",        # max-equality on derived doubles
    "q_tpch_q17_small_quantity_revenue",  # avg-threshold comparison
    "q_tpch_q21_waiting_supplier",    # numwait ties + LIMIT boundary
    "q_curation_topk_per_lang",       # window rank ties on double score
]


def _canon(df):
    return rows_to_canon(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", RISKY)
def test_result_invariant_to_shuffle_partitions(spark, name):
    fn = registry.QUERIES[name]
    base = _canon(fn(spark, SF_DIR))
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        assert _canon(fn(spark, SF_DIR)) == base, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
