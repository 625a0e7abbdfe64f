"""Shared rule-22 decile construction (q_orders_value_deciles /
q_quality_cumulative_gains).

The nine decile boundaries are exact order statistics (percentile_disc
picks an actual data value, so Spark and DuckDB agree bit-for-bit);
each row buckets by a broadcast comparison chain with strict `>`, so
ties at a boundary deterministically fall LOW and no global sort ever
touches the fact table.  Both the Spark bounds aggregate and the SQL
text live here so the tie-break semantics cannot drift between the
call sites (review finding, r12)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decile_bounds_sql(col: str) -> str:
    """The nine percentile_disc boundary aggregates, `AS b1..b9`."""
    return ", ".join(
        f"percentile_disc(0.{k}) WITHIN GROUP (ORDER BY {col}) AS b{k}"
        for k in range(1, 10)
    )


def decile_expr_sql(col: str) -> str:
    """Decile 1..10 of `col` against broadcast bounds b1..b9 — strict
    `>` so boundary ties fall LOW, identically in both engines."""
    return (
        "CAST(1 "
        + " ".join(f"+ CAST({col} > b{k} AS INT)" for k in range(1, 10))
        + " AS INT)"
    )


def decile_bounds(df: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame of the nine exact boundary order statistics
    (broadcast this against the fact side)."""
    return df.agg(
        *[
            F.expr(
                f"percentile_disc(0.{k}) WITHIN GROUP (ORDER BY {col})"
            ).alias(f"b{k}")
            for k in range(1, 10)
        ]
    )
