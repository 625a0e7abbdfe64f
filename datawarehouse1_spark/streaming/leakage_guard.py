"""Continuously-maintained eval-contamination guard: the streaming
face of q_split_train_holdout's leakage audit (queries/curation_r10.py).

Documents arrive as a STREAM of (doc_id, text). Each document belongs
to a split — a pure function of doc_id (the same md5 hex-prefix
thresholds as the batch query) — and the guard maintains:

  * the persisted TRAIN text-hash index (distinct md5(text) of every
    train document ingested so far — 32 hex chars per distinct text,
    republished atomically through streaming/snapshot_store.py), and
  * an append-only FLAG log: every val/test document whose exact text
    is already in train (history) or arrives alongside a train twin in
    the same batch — the evaluation rows that would silently inflate
    scores if they reached an eval set.

Per micro-batch the sink

  1. tags the batch with split + md5(text) (narrow, inside the batch's
     own tasks — bodies never shuffle; only 32-hex hashes move),
  2. flags holdout docs against (history-index ∪ this batch's train
     hashes) with one equi-join on the hash,
  3. writes the batch's flags to a CONTENT-KEYED overwrite-idempotent
     dir, then folds the batch's train hashes into the index.

Steady state at 100 TB: per batch the work is one hash equi-join of
the batch's holdout hashes (small) against the index — the index side
never rewrites rows that survive, and the corpus text never shuffles.

Exactly-once — CONTENT-guarded (SCALE.md rule 24): the index fold is a
set UNION (idempotent by algebra), so the sink always recomputes both
effects; the flag dir is keyed by a sha256 of the batch's doc ids, so
a checkpoint replay or a post-rebase redelivery overwrites the same
dir instead of duplicating flags, and the published index version
stays monotonic across a rebase. A crash between flags and index
publish re-applies both on redelivery (flags overwrite, union no-ops).

Law (pinned in tests/test_streaming_leakage.py): the union of all
flag batches equals the batch query's leakage verdicts computed over
the full corpus in one shot (batching invariance).

Reference parity: the reference has no streaming or eval surface;
SURVEY.md §2D extension inventory (LLM-pipeline tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from datawarehouse1_spark.streaming.snapshot_store import (
    latest_version,
    publish_snapshot,
    read_snapshot,
)


def split_col(id_col: str = "doc_id") -> F.Column:
    """The split rule shared with q_split_train_holdout: a pure
    function of the document id (md5 hex-prefix thresholds ~90/5/5)."""
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return (
        F.when(prefix < "e6666666", "train")
        .when(prefix < "f3333333", "val")
        .otherwise("test")
    )


def make_leakage_sink(
    spark: SparkSession,
    index_path: str,
    flags_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "callable":
    """foreachBatch body maintaining the train-hash index and the
    contamination flag log."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        applied = latest_version(index_path)
        tagged = (
            batch.select(
                F.col(id_col).alias("doc_id"),
                split_col(id_col).alias("split"),
                F.md5(text_col).alias("th"),
            )
            .localCheckpoint(eager=True)
        )
        new_train = tagged.filter(F.col("split") == "train").select("th")
        history = read_snapshot(spark, index_path)
        if history is None:
            history = new_train.limit(0)
        known = history.unionByName(new_train).distinct()
        holdout = tagged.filter(F.col("split") != "train")
        flags = holdout.join(known, "th", "left_semi").select(
            "doc_id", "split", "th"
        )
        # content-keyed flag dir: replays and rebased redeliveries of
        # the same document batch overwrite the same dir (idempotent),
        # and never collide with a different batch's flags
        fp = tagged.agg(
            F.sha2(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list("doc_id"))
                ),
                256,
            ).alias("key")
        ).collect()[0]["key"][:16]
        flags.coalesce(1).write.mode("overwrite").parquet(
            f"{flags_path}/batch={fp}"
        )
        # index fold: a set union — idempotent by algebra, so the
        # replay guard is CONTENT-based (SCALE.md rule 24): skip the
        # republish only when the version says replay AND the batch
        # adds no new train hash (a bounded limit(1) probe); a rebased
        # batch with real new content still publishes, at a version
        # that stays monotonic (applied+1)
        maybe_replay = applied is not None and applied >= batch_id
        if maybe_replay:
            added = (
                new_train.join(history, "th", "left_anti")
                .limit(1)
                .collect()
            )
            if not added:
                return  # flags overwrote idempotently; index unchanged
        version = (
            batch_id
            if applied is None or batch_id > applied
            else applied + 1
        )
        publish_snapshot(known, index_path, version=version)

    return sink


def stream_maintain_leakage_guard(
    spark: SparkSession,
    source: DataFrame,
    index_path: str,
    flags_path: str,
    checkpoint_dir: str,
    trigger_seconds: int = 60,
    **kwargs,
) -> StreamingQuery:
    """Attach the leakage-guard sink to a streaming DataFrame of
    (doc_id, text) documents."""
    return (
        source.writeStream.foreachBatch(
            make_leakage_sink(spark, index_path, flags_path, **kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
