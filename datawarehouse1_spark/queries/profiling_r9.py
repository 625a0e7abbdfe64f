"""Round-9 operations profiling: compaction planning and shuffle-skew
diagnostics — the two reports an operator of this engine reads before
touching a 100 TB table's layout.

* **Compaction plan** — the small-files problem: a streaming ingest
  leaves one file per (partition, day); the OPTIMIZE/rewrite step must
  bin-pack them into ~target-size output files WITHOUT a global sort.
  The plan here is the standard first-fit-by-order pack: files order by
  day inside their partition, the running byte total is a per-partition
  cumulative-sum window, and `group = cum_bytes div target` assigns
  each file to its output group (a group can exceed target only by the
  one file that crosses the boundary — exactly how size-based rollover
  packs). Pure integer arithmetic, one exchange, and the grouping is
  deterministic so a re-run plans the identical rewrite.

* **Skew report** — every shuffle shapes its cost by the key
  histogram; this report names the keys that will hot-spot a join
  before the join runs. Per key-column: top heavy-hitter share and a
  p99/median imbalance ratio in floored micro-units — the numbers that
  decide between a plain shuffle join, salting, or AQE skew handling
  (SCALE.md rule 5). Built from ONE narrow count-aggregate per column;
  the quantile over per-key counts crosses a second small aggregate
  whose input is one row per distinct key, never per-row data.

Reference parity: the reference warehouse leaves layout to Postgres
autovacuum and has no shuffle concept; SURVEY.md §2D extension
inventory (observability/operations tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

# Synthetic per-(partition, day) "file" population: one ingest file per
# orders (priority, order day) cell, sized by the exact integer cent
# mass landing in it — deterministic in both engines and realistically
# skewed (day volumes vary). Target output size picked so partitions
# pack into a handful of groups at every SF.
_FILES_SQL = """
    SELECT o_orderpriority AS part,
           CAST(o_orderdate AS DATE) AS file_day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
             AS bytes
    FROM orders
    GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
"""


@declared(
    "q_layout_compaction_plan",
    oracle=f"""
    WITH files AS ({_FILES_SQL}),
    packed AS (
      SELECT part, file_day, bytes,
             SUM(bytes) OVER (PARTITION BY part ORDER BY file_day
                              ROWS UNBOUNDED PRECEDING) AS cum_bytes
      FROM files
    ),
    grouped AS (
      SELECT part, file_day, bytes,
             CAST((GREATEST(cum_bytes, 1) - 1) // 100000000 AS BIGINT)
               AS group_id
      FROM packed
    )
    SELECT part, group_id,
           COUNT(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS group_bytes,
           MIN(file_day) AS first_day,
           MAX(file_day) AS last_day
    FROM grouped
    GROUP BY part, group_id
    """,
)
def q_layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-style compaction plan: pack per-(partition, day) ingest
    files into ~100 MB output groups by first-fit-in-day-order —
    group_id = (cum_bytes - 1) div target over a per-partition
    cumulative-sum window. Report one row per planned output file
    (n_files merged, byte total, day range). Integer-exact (cent-mass
    sizes through DECIMAL sums); TWO exchanges — the (part, day) file
    aggregate and the per-partition window (the report aggregate
    reuses the window's partitioning). At 100 TB the window is
    per-partition, never global — the same bounded discipline as the
    shard writer."""
    o = table(spark, sf_dir, "orders")
    files = o.groupBy(
        F.col("o_orderpriority").alias("part"),
        F.col("o_orderdate").cast("date").alias("file_day"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("bytes")
    )
    w = (
        Window.partitionBy("part")
        .orderBy("file_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = files.select(
        "part",
        "file_day",
        "bytes",
        F.sum("bytes").over(w).alias("cum_bytes"),
    ).select(
        "part",
        "file_day",
        "bytes",
        # greatest(..., 1) guards the cum_bytes == 0 corner (an empty
        # first file): DuckDB's `//` floors -1 // t to -1 while Spark's
        # `div` truncates to 0 — clamping keeps both engines at group 0
        F.expr("(greatest(cum_bytes, 1) - 1) div 100000000")
        .cast("long")
        .alias("group_id"),
    )
    return packed.groupBy("part", "group_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").cast("long").alias("group_bytes"),
        F.min("file_day").alias("first_day"),
        F.max("file_day").alias("last_day"),
    )


@declared(
    "q_profile_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS key, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_suppkey
    ),
    per_count AS (
      SELECT cnt, COUNT(*) AS k FROM per_key GROUP BY cnt
    ),
    cdf AS (
      SELECT cnt, k,
             SUM(k) OVER (ORDER BY cnt ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(k) OVER () AS n_keys,
             SUM(cnt * k) OVER () AS n_rows,
             MAX(cnt) OVER () AS max_cnt
      FROM per_count
    )
    SELECT 'l_suppkey' AS key_col,
           CAST(MAX(n_keys) AS BIGINT) AS n_keys,
           CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           CAST(MAX(max_cnt) AS BIGINT) AS max_cnt,
           CAST(MIN(CASE WHEN cum * 2 >= n_keys THEN cnt END) AS BIGINT)
             AS med_cnt,
           CAST(MIN(CASE WHEN cum * 100 >= n_keys * 99 THEN cnt END)
                AS BIGINT) AS p99_cnt,
           CAST(MAX(max_cnt) * 1000000 // MAX(n_rows) AS BIGINT)
             AS top_share_e6,
           CAST(MIN(CASE WHEN cum * 100 >= n_keys * 99 THEN cnt END)
                * 1000000
                // MIN(CASE WHEN cum * 2 >= n_keys THEN cnt END)
                AS BIGINT) AS p99_over_med_e6
    FROM cdf
    """,
)
def q_profile_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic for a join key: summarize the per-key
    count histogram of l_suppkey to (n_keys, n_rows, max / exact
    discrete median / exact discrete p99 per-key count, top
    heavy-hitter share and p99/median imbalance in floored
    micro-units) — the report that decides plain shuffle vs salting vs
    AQE skew handling BEFORE running the join (SCALE.md rule 5).

    Quantiles are EXACT and rational: the empirical CDF runs over
    distinct per-key COUNT VALUES (the bounded second level — same
    discipline as the KS report, SCALE.md rule 22), and the q-quantile
    is the smallest count value whose cumulative key coverage reaches
    ceil(q * n_keys), expressed as the integer comparison
    cum * denom >= n_keys * num so no float touches the decision.
    Shuffles: per-row data crosses ONE exchange (the per-key count);
    everything after runs over one row per distinct key-count value."""
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_count = per_key.groupBy("cnt").agg(F.count(F.lit(1)).alias("k"))
    w_cum = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = per_count.select(
        "cnt",
        "k",
        F.sum("k").over(w_cum).alias("cum"),
        F.sum("k").over(w_all).alias("n_keys"),
        F.sum(F.col("cnt") * F.col("k")).over(w_all).alias("n_rows"),
        F.max("cnt").over(w_all).alias("max_cnt"),
    )
    med = F.min(
        F.when(F.col("cum") * 2 >= F.col("n_keys"), F.col("cnt"))
    )
    p99 = F.min(
        F.when(F.col("cum") * 100 >= F.col("n_keys") * 99, F.col("cnt"))
    )
    return cdf.agg(
        F.lit("l_suppkey").alias("key_col"),
        F.max("n_keys").cast("long").alias("n_keys"),
        F.max("n_rows").cast("long").alias("n_rows"),
        F.max("max_cnt").cast("long").alias("max_cnt"),
        med.cast("long").alias("med_cnt"),
        p99.cast("long").alias("p99_cnt"),
    ).select(
        "*",
        F.expr("max_cnt * 1000000 div n_rows")
        .cast("long")
        .alias("top_share_e6"),
        F.expr("p99_cnt * 1000000 div med_cnt")
        .cast("long")
        .alias("p99_over_med_e6"),
    )


@declared(
    "q_profile_join_cardinality",
    oracle="""
    WITH a AS (
      SELECT l_orderkey AS key, COUNT(*) AS ca
      FROM lineitem GROUP BY l_orderkey
    ),
    b AS (
      SELECT o_orderkey AS key, COUNT(*) AS cb
      FROM orders GROUP BY o_orderkey
    ),
    m AS (
      SELECT a.key, a.ca, b.cb
      FROM a FULL OUTER JOIN b ON a.key = b.key
    )
    SELECT CAST(SUM(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL
                         THEN ca * cb ELSE 0 END) AS BIGINT) AS join_rows,
           CAST(SUM(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS matched_keys,
           CAST(SUM(CASE WHEN cb IS NULL AND ca IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS left_only_keys,
           CAST(SUM(CASE WHEN ca IS NULL AND cb IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS right_only_keys,
           CAST(MAX(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL
                         THEN ca * cb END) AS BIGINT) AS max_key_rows
    FROM m
    """,
)
def q_profile_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality profile — the planning twin of
    q_profile_skew_report: EXACT output size of lineitem ⋈ orders on
    orderkey (Σ over matched keys of cA·cB), the matched / left-only /
    right-only key containment split, and the heaviest single key's
    output contribution — the numbers that predict whether a join
    explodes and whether a runtime filter (bloom semi join, rule 17)
    would pay, BEFORE running it. Cost: one count aggregate per side
    (rows ∝ distinct keys) + one key-aligned full outer join of the
    two count tables (the key exchange both aggregates already
    produced) + a single-row summary. Per-row data never crosses more
    than its own count exchange."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    a = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = o.groupBy(F.col("o_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    m = a.join(b, "key", "full_outer")
    both = F.col("ca").isNotNull() & F.col("cb").isNotNull()
    return m.agg(
        F.sum(F.when(both, F.col("ca") * F.col("cb")).otherwise(0))
        .cast("long")
        .alias("join_rows"),
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("matched_keys"),
        F.sum(F.when(F.col("cb").isNull() & F.col("ca").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("left_only_keys"),
        F.sum(F.when(F.col("ca").isNull() & F.col("cb").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("right_only_keys"),
        F.max(F.when(both, F.col("ca") * F.col("cb")))
        .cast("long")
        .alias("max_key_rows"),
    )
