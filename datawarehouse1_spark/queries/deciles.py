"""Shared rule-22 decile construction (q_orders_value_deciles /
q_quality_cumulative_gains).

The nine decile boundaries are exact order statistics (percentile_disc
semantics: the smallest actual data value whose cumulative count
reaches k/10 of the rows, so Spark and DuckDB agree bit-for-bit); each
row buckets by a broadcast comparison chain with strict `>`, so ties
at a boundary deterministically fall LOW and no global sort ever
touches the fact table.  Both the Spark bounds aggregate and the SQL
text live here so the tie-break semantics cannot drift between the
call sites (review finding, r12).

r13: the Spark side no longer evaluates nine `percentile_disc`
aggregates — each of those buffers EVERY value in its own aggregation
buffer (nine copies of the column in executor memory, a sort per
buffer).  The boundaries now come from the repo's two-level rank
construction (the _rank2 shape): one exchange to the distinct-value
marginal, within-bucket cumulative counts (parallel across fixed-width
value buckets; only the bounded bucket summary crosses a global
window), then ONE reduction reads all nine order statistics off the
cumulative table via the integer identity

    percentile_disc(k/10) = min{ v : 10 * cum(v) >= k * n }

(cum and n are exact integers, so no ceil and no float q ever enters).
The DuckDB oracle keeps the literal percentile_disc text — the
identity above IS that function's definition, and the three-SF hash
matches pin the equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def order_stat_bounds(
    df: DataFrame,
    col: str,
    numerators: tuple[int, ...],
    denominator: int,
    bucket_width: float = 1024.0,
) -> DataFrame:
    """One-row DataFrame of exact PERCENTILE_DISC order statistics at
    quantiles k/denominator for k in `numerators`, aliased b<k>
    (broadcast this against the fact side).

    `bucket_width` splits the value domain into fixed-width buckets so
    the within-bucket cumulative windows run in parallel and only the
    bounded bucket-count summary crosses a global window (rule 22);
    any positive width is CORRECT — it only shifts work between the
    two levels — so callers tune it to their column's domain.
    """
    # percentile_disc IGNORES NULLs; without this filter NULL values
    # would form their own marginal row (sorting first in the windows)
    # and inflate n, shifting every boundary (r13 review fix — latent,
    # all current callers feed non-null columns).
    marg = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    b = marg.withColumn(
        "bucket", F.floor(F.col("v") / F.lit(bucket_width)).cast("long")
    )
    borders = b.groupBy("bucket").agg(F.sum("c").alias("bc"))
    prior = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = borders.select(
        "bucket",
        F.coalesce(F.sum("bc").over(prior), F.lit(0)).alias("boff"),
    )
    total = borders.agg(F.sum("bc").alias("n"))
    win = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        b.join(F.broadcast(offsets), "bucket")
        .withColumn("cum", F.col("boff") + F.sum("c").over(win))
        .join(F.broadcast(total))
    )
    bounds = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") * denominator >= F.lit(k) * F.col("n"),
                    F.col("v"),
                )
            ).alias(f"b{k}")
            for k in numerators
        ]
    )
    # rule 12: the ONE-row bounds table materializes here, so consumers
    # broadcast a literal row instead of dragging the whole two-level
    # rank subplan (its bounded exchanges included) into their own plan
    return bounds.localCheckpoint(eager=True)


def decile_bounds(
    df: DataFrame, col: str, bucket_width: float = 1024.0
) -> DataFrame:
    """The nine decile boundaries b1..b9 — see order_stat_bounds."""
    return order_stat_bounds(
        df, col, tuple(range(1, 10)), 10, bucket_width
    )
