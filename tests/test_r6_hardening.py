"""Round-6 hardening tests: schema-guard drift drills (the r4
events-encoding lesson as regression tests) and semantic-dedup pipeline
composition checks.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


# --- schema guard drills ---


def test_schema_guard_names_a_renamed_column(tmp_path):
    """Drift drill: copy a real testdata table, rename one column, and
    assert the guard names BOTH sides of the rename (old column missing,
    new column unexpected) instead of failing opaquely downstream."""
    import pyarrow.parquet as pq

    from datawarehouse1_spark.schema_guard import check_testdata_schema

    tbl = pq.read_table(f"{SF_DIR}/nation.parquet")
    renamed = tbl.rename_columns(
        ["n_nationkey", "nation_name", "n_regionkey"]  # n_name -> nation_name
    )
    pq.write_table(renamed, tmp_path / "nation.parquet")
    findings = check_testdata_schema(str(tmp_path))
    assert any(f.startswith("nation.n_name: column missing") for f in findings)
    assert any(
        f.startswith("nation: new columns appeared") and "nation_name" in f
        for f in findings
    )


def test_schema_guard_reports_unreadable_footer_as_finding(tmp_path):
    """Regression (ADVICE r5): a corrupt parquet file (or any footer
    pyarrow cannot read) must surface as a drift FINDING from the
    advisory check, not an uncaught exception that crashes the
    entrypoint before any query runs."""
    from datawarehouse1_spark.schema_guard import check_testdata_schema

    shutil.copyfile(f"{SF_DIR}/region.parquet", tmp_path / "region.parquet")
    (tmp_path / "nation.parquet").write_bytes(b"not a parquet file")
    findings = check_testdata_schema(str(tmp_path))
    assert any(f.startswith("nation: footer unreadable") for f in findings)
    # the readable table is still checked normally
    assert not any(f.startswith("region") for f in findings)


# --- semantic dedup pipeline composition ---


def test_semantic_dedup_drops_twins_keeps_min_ids(spark):
    """The composed pipeline must make the actual dedup DECISION: every
    staged perturbed twin (+1000 id) is dropped, its base (the component
    min id) survives and is credited with >= 1 removed near-dup, and
    vectors without near-dups survive untouched with 0."""
    df = registry.QUERIES["q_semantic_dedup_corpus"](spark, SF_DIR)
    rows = {r.vec_id: r.n_dupes_removed for r in df.collect()}
    # no twin id survives
    assert not any(v >= 1000 for v in rows), sorted(rows)
    # every third base vector absorbed at least its twin
    for vid in range(0, 60, 3):
        assert rows.get(vid, 0) >= 1, (vid, rows.get(vid))
    # survivors without a twin absorbed nothing (unless base-base pairs
    # exist, which the staged corpus does not produce at this threshold)
    assert sum(n for v, n in rows.items() if v % 3 != 0) == 0


# ---------- BPE-ish pre-tokenizer (functions/text_tokens.py) ----------


def test_bpe_ish_tokens_match_published_splits(spark):
    """The GPT-2-style pre-tokenizer splits contractions, space-prefixed
    word/digit runs, and punctuation runs as published (minus the
    trailing-space lookahead, documented)."""
    from pyspark.sql import functions as F

    from datawarehouse1_spark.functions.text_tokens import bpe_ish_tokens

    df = spark.createDataFrame(
        [("It's 2026, isn't it?",), ("hello   world",)], "t string"
    )
    rows = df.select(bpe_ish_tokens("t").alias("toks")).collect()
    assert rows[0].toks == ["It", "'s", " 2026", ",", " isn", "'t", " it", "?"]
    # whitespace runs collapse to one token (RE2-safe simplification)
    assert rows[1].toks == ["hello", "   ", "world"]


def test_bpe_ish_stays_jvm_side(spark):
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    plan = (
        QUERIES["q_text_bpe_token_count"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_registry_window_structure():
    """The driver grades queries()[:50]; pin the structural facts the
    rotation docs claim so an edit that accidentally reorders or
    shrinks the window fails here, not in the graded artifact.

    r10 window (ROUND_NOTES r10 rotation): (a) the 3 never-graded
    r9-tail queries grade FIRST; (b) new r10 queries behind them
    (never-graded outranks re-grade); (c) oldest-r6 re-grades fill to
    exactly 50, drawn as a PREFIX of the r6-vintage list in registry
    order so each new query displaces exactly one fill from the tail.
    """
    import json
    import pathlib

    from datawarehouse1_spark.registry import (
        DRIVER_CHECK_ORDER,
        ORACLES,
        QUERIES,
        load_all,
    )

    load_all()
    names = list(QUERIES)
    assert names == list(DRIVER_CHECK_ORDER)
    assert len(names) == len(set(names))
    window = names[:50]

    NEVER_GRADED_R9_TAIL = [
        "q_profile_join_cardinality",
        "q_events_resample_ohlc",
        "q_window_dense_rank_peers",
    ]
    NEW_R10 = [
        # extend as r10 queries land; each displaces one r6 fill
        "q_split_train_holdout",
        "q_text_zipf_fit",
        "q_text_trigram_lang_profile",
        "q_layout_file_prune_stats",
        "q_layout_vacuum_plan",
        "q_orders_cohort_ltv",
        "q_window_cume_dist",
        "q_events_user_lifecycle",
        "q_embedding_centroid_drift",
        "q_text_lang_classify_confusion",
        "q_orders_market_basket",
        "q_stats_welch_ttest",
        "q_supplier_scorecard",
        "q_orders_ship_latency",
        "q_events_interarrival_rate",
        "q_curation_domain_cap_apply",
        "q_events_cusum_changepoint",
        "q_events_funnel_conversion",
        "q_events_streak_longest",
        "q_events_hopping_window",
        "q_orders_open_backlog",
        "q_orders_revenue_trend",
        "q_stats_benford_first_digit",
        "q_text_readability_flesch",
        "q_text_hapax_ratio",
        "q_embedding_covariance_exact",
        "q_embedding_pca_power",
        "q_dedup_containment_subset",
        "q_events_attribution_last_touch",
        "q_orders_seasonality_decompose",
        "q_text_source_vocab_jaccard",
        "q_join_full_outer_reconcile",
        "q_events_retention_triangle",
        "q_orders_fill_rate_sla",
        "q_orders_value_deciles",
        "q_text_successor_diversity",
        "q_events_path_trigrams",
        "q_text_source_divergence",
        "q_dedup_winnowing_fingerprint",
        "q_supplier_concentration_hhi",
        "q_orders_repeat_interval",
        "q_orders_customer_migration",
        "q_stats_mann_whitney",
        "q_text_charset_profile",
        "q_curation_boilerplate_snippets",
        "q_split_kfold_assign",
        "q_embedding_cluster_balance",
    ]
    assert window[:3] == NEVER_GRADED_R9_TAIL
    assert window[3 : 3 + len(NEW_R10)] == NEW_R10

    # the fills are the oldest held verdicts: the r6-vintage queries in
    # registry order, taken as a prefix (computed from the artifacts so
    # the pin can't drift from the data it claims to reflect)
    root = pathlib.Path(__file__).resolve().parents[1]
    vintage = {}
    for r in range(1, 10):
        for k in json.loads((root / f"CORRECTNESS_r0{r}.json").read_text()):
            vintage[k] = r
    r6_order = [n for n in names if vintage.get(n) == 6]
    n_fills = 50 - 3 - len(NEW_R10)
    assert window[3 + len(NEW_R10) :] == r6_order[:n_fills]
    # never-graded queries outside the window are allowed ONLY as the
    # documented r10 TAIL: they landed after the window filled and
    # must sit at positions 51.. so they FRONT the r11 window (the r9
    # positions-51..53 precedent, executed again here)
    R10_TAIL = [
        "q_stats_kendall_tau",
        "q_orders_abc_parts",
        "q_events_user_type_gini",
        "q_split_ngram_leakage",
        "q_events_autocorr_daily",
        "q_docs_oov_rate",
        "q_events_time_to_convert",
        "q_stats_runs_test",
        "q_orders_gini_coefficient",
        "q_orders_theil_sen_trend",
        "q_layout_retention_plan",
        "q_orders_xyz_parts",
        "q_events_bot_verdict",
        "q_embedding_cluster_purity",
    ]
    assert names[50 : 50 + len(R10_TAIL)] == R10_TAIL
    assert not [
        n for n in names[50 + len(R10_TAIL) :] if n not in vintage
    ], "never-graded query left outside the window and the pinned tail"
    # every declared query resolves to a callable, and every oracle
    # belongs to a declared query
    assert set(ORACLES) <= set(QUERIES)
    assert all(callable(QUERIES[n]) for n in names)


def test_declared_outputs_are_driver_safe_types(spark):
    """The driver's canonicalization crashes on list cells and
    hash-mismatches on DECIMAL/struct rendering (CORRECTNESS_r01/r03
    lessons). The parity harness type-gates ORACLE queries, but
    rows-only queries were unguarded — pin the whole surface: every
    declared query's output schema must be scalar, non-decimal."""
    from pyspark.sql.types import (
        ArrayType,
        DecimalType,
        MapType,
        StructType,
    )

    bad = []
    for name, fn in registry.QUERIES.items():
        schema = fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, DecimalType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, bad
