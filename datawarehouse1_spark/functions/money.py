"""Exact money aggregation.

The reference stores money as Postgres DECIMAL(10,2)
(init-db/init.sql:40,54) so its SUM/AVG are exact decimal arithmetic.
Spark doubles summed in parallel are order-dependent; to reproduce the
reference's exact-decimal semantics (and hash-match the DuckDB oracle)
every money aggregate here goes:

    double column -> cast DECIMAL(18,2) (exact for 2-dec data)
    -> SUM (exact, order-independent decimal addition)
    -> cast DOUBLE (correctly-rounded, deterministic in both engines)

AVG is expressed as exact-decimal SUM cast to double, divided by COUNT
(a single IEEE-754 division — deterministic), never a native AVG whose
intermediate precision differs across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def money_sum_expr(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double")


def money_sum(col: str | Column, alias: str) -> Column:
    return money_sum_expr(col).alias(alias)


def money_avg(col: str | Column, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(MONEY)).cast("double") / F.count(c)).alias(alias)


# The DuckDB-SQL twins of the expressions above (format with the column).
def sql_money_sum(col: str, alias: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def sql_money_avg(col: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col}) AS {alias}"
    )


def sql_cents(col: str = "o_totalprice") -> str:
    """Exact integer cents of a 2-decimal money double — the same
    expression text in Spark SQL and DuckDB (both cast through the
    exact DECIMAL(18,2) first, so no float rounding is involved)."""
    return f"CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
