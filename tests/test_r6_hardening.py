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
    """The driver grades queries()[:50]; pin the r12 rotation's structural
    rules (VERDICT r11 #1/#2/#3) in a form DERIVED FROM THE ARTIFACTS, so
    the suite stays green both before AND after the driver drops each
    round's CORRECTNESS_r*.json (the r11 lesson: a hardcoded head list
    went red the moment the driver's post-commit artifact landed).

    Rules pinned:
      (a) never-graded queries (none today; any future adds) must sit
          inside the first-50 window — never stranded behind it;
      (b) every rows-only (oracle=None) query sits behind EVERY
          oracle-bearing query, so graded slots are always hashable;
      (c) oracle-bearing section is stalest-verdict-first: vintages are
          non-decreasing, IGNORING window entries freshly re-graded by
          the newest artifact (that artifact lands after the commit that
          rotated them to the front — by construction they were the
          stalest at rotation time);
      (d) same non-decreasing rule within the rows-only section.
    """
    import json
    import pathlib
    import re

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

    # vintage = latest round each query was graded in, from the
    # artifacts themselves so the pin can't drift from the data
    root = pathlib.Path(__file__).resolve().parents[1]
    vintage = {}
    rounds = []
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", p.stem).group(1))
        rounds.append(r)
        for k in json.loads(p.read_text()):
            vintage[k] = max(vintage.get(k, 0), r)
    max_round = max(rounds)

    # (a) no never-graded query may sit outside the window
    never_graded = [n for n in names if n not in vintage]
    stranded = [n for n in never_graded if n not in window]
    assert not stranded, (
        f"never-graded queries outside the first-50 window: {stranded} "
        "(rotate DRIVER_CHECK_ORDER in the same commit that adds them)"
    )

    # (b) rows-only strictly behind all oracle-bearing (never-graded new
    # queries are exempt: they must front the window regardless)
    graded = [n for n in names if n in vintage]
    n_oracle = sum(1 for n in graded if n in ORACLES)
    assert all(n in ORACLES for n in graded[:n_oracle]), (
        "a rows-only query sits ahead of an oracle-bearing one"
    )
    assert all(n not in ORACLES for n in graded[n_oracle:])

    # (c)/(d) stalest-first within each section. Entries in the window
    # whose vintage equals the newest artifact's round were just
    # re-graded by the driver's post-commit drop — skip them (they were
    # the stalest when the rotation was committed).
    def fresh_skipped(section):
        return [
            vintage[n]
            for n in section
            if not (n in window and vintage[n] == max_round)
        ]

    for section in (graded[:n_oracle], graded[n_oracle:]):
        vs = fresh_skipped(section)
        assert vs == sorted(vs), (
            "section not stalest-verdict-first after skipping "
            f"freshly re-graded window entries: {vs}"
        )

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
