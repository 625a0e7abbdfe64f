"""Driver contract for the spark-graft builder (PySpark target).

Thin views over datawarehouse1_spark.registry: every operator from
SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame callable and, when
SQL-expressible, a DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datawarehouse1_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    import sys

    from datawarehouse1_spark.schema_guard import check_testdata_schema

    # Non-fatal named-diff warning (r4: silent upstream re-encode of
    # events.ts broke 13 queries; the catalog reader is now adaptive, but
    # surface any NEW drift here where it's visible in the driver log).
    for finding in check_testdata_schema("/root/testdata/sf0.001"):
        print(f"[schema-drift] {finding}", file=sys.stderr)

    fn = registry.QUERIES["q_flagship_monthly_revenue"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys missing here are rows-only checked."""
    return dict(registry.ORACLES)
