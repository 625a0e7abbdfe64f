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
