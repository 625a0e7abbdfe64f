"""Round-10 layout, batch 2: data-retention (TTL) enforcement plan.

* **Retention plan** — the right-to-be-forgotten / TTL sibling of the
  lakehouse maintenance quartet (q_layout_compaction_plan rewrites
  small files, q_layout_vacuum_plan expires snapshots,
  streaming/zonemap_maintenance.py maintains the pruning stats — this
  plans the DELETE): against a fixed retention cutoff, each month
  partition of the fact table classifies as
    drop_partition  (every row expired — remove the files, no rewrite)
    rewrite         (some rows expired — rewrite the partition
                     keeping survivors)
    keep            (nothing expired — untouched)
  with exact row counts and the floored micro-share of rows the
  rewrite must carry.  A retention job that plans at FILE granularity
  from these rows touches only `rewrite` partitions — the drop and
  keep classes cost a metadata operation and nothing at all,
  respectively; that asymmetry is the whole point of date
  partitioning for compliance workloads (SCALE.md rule 23:
  maintenance decisions are deterministic integer queries, so a
  retried planner plans the identical delete).

Reference parity: the reference ETL keeps full history with no
retention surface; SURVEY.md §2B O17 / §2D layout extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

# fixed, engine-identical retention cutoff: orders strictly older than
# this are expired (the testdata spans 1995-01..2001-08, so all three
# classes are non-vacuous at every SF)
_CUTOFF = "1996-07-15"


@declared(
    "q_layout_retention_plan",
    oracle=f"""
    WITH parts AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS part_month,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_CUTOFF}'
                      THEN 1 ELSE 0 END) AS n_expired
      FROM orders
      GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
    )
    SELECT part_month,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_expired AS BIGINT) AS n_expired,
           CASE WHEN n_expired = n_rows THEN 'drop_partition'
                WHEN n_expired > 0 THEN 'rewrite'
                ELSE 'keep' END AS action,
           CAST((n_rows - n_expired) * 1000000 // n_rows AS BIGINT)
             AS survivor_share_e6
    FROM parts
    """,
)
def q_layout_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL retention enforcement plan over month partitions of orders:
    per partition — row count, expired count (strictly before the
    fixed cutoff), the action class (drop_partition / rewrite / keep),
    and the floored micro-share of rows a rewrite must carry.  Month
    partitions make the plan mostly metadata: cutoff-interior months
    classify drop or keep outright and only the ONE boundary month
    rewrites (law pinned: at most one 'rewrite' partition exists for a
    month-aligned cutoff... the cutoff here is mid-month by design so
    the rewrite class is non-vacuous).  One fact exchange (the month
    aggregate); everything downstream is bounded by the calendar."""
    o = table(spark, sf_dir, "orders")
    parts = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("part_month")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                F.to_date("o_orderdate") < F.lit(_CUTOFF).cast("date"), 1
            ).otherwise(0)
        ).alias("n_expired"),
    )
    return parts.select(
        "part_month",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_expired").cast("long").alias("n_expired"),
        F.when(F.col("n_expired") == F.col("n_rows"), "drop_partition")
        .when(F.col("n_expired") > 0, "rewrite")
        .otherwise("keep")
        .alias("action"),
        F.expr("(n_rows - n_expired) * 1000000 div n_rows")
        .cast("long")
        .alias("survivor_share_e6"),
    )
