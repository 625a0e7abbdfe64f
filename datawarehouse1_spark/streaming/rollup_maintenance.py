"""Continuously-maintained rollup: a streaming foreachBatch that merges
each micro-batch's partial aggregate into a persistent summary table
(operators/warehouse.py::merge_rollup) — the streaming face of the
incremental O(batch) refresh.

This is the Spark-native version of what the reference's consumers get
from Metabase refreshing dashboard queries against Postgres
(readme.md:115-118): instead of re-running the aggregate over history on
every view, the summary table is always current and O(1) to read.

The maintained table keeps additive measures in exact DECIMAL (merge-
and order-independent); serving casts to double. The table rewrite per
batch is a small-table overwrite (summary cardinality = number of
groups, not rows) — same pattern as upsert_small_table, documented as
the Parquet trade-off.

Exactly-once: foreachBatch is at-least-once, and adding a delta is not
idempotent, so the table carries a `_last_batch` metadata column (the
max batch_id already folded in). The guard lives in the same files as
the data — one atomic staging swap covers both — and a replayed batch
is skipped instead of double-counted.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from datawarehouse1_spark.operators.warehouse import merge_rollup


def make_rollup_sink(
    spark: SparkSession,
    rollup_path: str,
    batch_agg: Callable[[DataFrame], DataFrame],
    keys: Sequence[str],
    additive_cols: Sequence[str],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: aggregate ONLY the micro-batch, merge into the
    persistent rollup, atomically swap (write tmp, then overwrite)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        delta = batch_agg(batch)
        old = (
            spark.read.parquet(rollup_path)
            if os.path.exists(rollup_path)
            else None
        )
        # Replay guard: foreachBatch is at-least-once, and ADDING a
        # delta is not idempotent — a checkpoint replay of an
        # already-applied batch would double-count. The last applied
        # batch_id rides INSIDE the rollup table, so guard and data
        # move through the same atomic staging swap and can never
        # disagree. (Pre-guard rollups without the column are
        # grandfathered: first merge stamps them.)
        if old is not None and "_last_batch" in old.columns:
            applied = old.agg({"_last_batch": "max"}).first()[0]
            if applied is not None and applied >= batch_id:
                return
            old = old.drop("_last_batch")
        merged = merge_rollup(old, delta, keys, additive_cols).withColumn(
            "_last_batch", F.lit(batch_id).cast("long")
        )
        tmp = f"{rollup_path}__staging_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        # re-read from staging then overwrite the serving location; the
        # staged copy breaks the read-what-you-overwrite cycle
        spark.read.parquet(tmp).write.mode("overwrite").parquet(rollup_path)
        # the serving copy is durable now — drop the staging dir, or a
        # long-running stream leaks one dir per micro-batch
        shutil.rmtree(tmp, ignore_errors=True)

    return sink


def stream_maintain_rollup(
    spark: SparkSession,
    source: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    batch_agg: Callable[[DataFrame], DataFrame],
    keys: Sequence[str],
    additive_cols: Sequence[str],
    trigger_seconds: int = 60,
) -> StreamingQuery:
    """Attach the rollup maintenance sink to any streaming DataFrame."""
    return (
        source.writeStream.foreachBatch(
            make_rollup_sink(spark, rollup_path, batch_agg, keys, additive_cols)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
