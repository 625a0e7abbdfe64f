"""Every declared query with an oracle must hash-match DuckDB at sf0.001
(the driver re-runs the same comparison at sf0.01 → CORRECTNESS_r{N}.json).
Rows-only queries must at least execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from datawarehouse1_spark import registry

registry.load_all()

WITH_ORACLE = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, oracle, name):
    from tests.conftest import compare_query

    compare_query(spark, oracle, registry.QUERIES[name], registry.ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(spark, name):
    from tests.conftest import SF_DIR

    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_key_has_callable():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
