"""Declared-query registry.

Every operator from SURVEY.md §2 lands here as a named query: a Spark
callable `(spark, sf_dir) -> DataFrame` plus (when SQL-expressible) a
DuckDB oracle SQL string. `__spark_entry__.queries()` / `oracle_sql()`
are thin views over this registry.

Determinism contract (SURVEY.md §5.3):
  * every computed column aliased identically in Spark and SQL
  * money aggregates go through DECIMAL(18,2) sums cast back to DOUBLE
    (exact, order-independent) — see functions/money.py
  * no current_timestamp in hashed output; ties broken by explicit keys
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def declared(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; `oracle=None` => rows-only check
    (non-SQL-expressible ops: streaming, LSH, iterative)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate declared query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side effect: registration)."""
    from datawarehouse1_spark import queries as _q  # noqa: F401
    from datawarehouse1_spark.plans import flagship as _fs  # noqa: F401
    from datawarehouse1_spark.plans import llm_pipeline as _lp  # noqa: F401

    _q.load()
