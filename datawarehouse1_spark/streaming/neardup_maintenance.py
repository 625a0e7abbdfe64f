"""Continuously-maintained near-dup index: a streaming foreachBatch
that, per arriving micro-batch of documents,

  1. emits the batch's near-dup PAIRS against everything ingested so
     far (operators/dedup.py::minhash_lsh_incremental_pairs — the
     new×history and new×new quadrants only; history×history pairs
     were emitted when those batches arrived), and
  2. folds the batch's signatures into the persisted LSH index
     (build_minhash_index output), republished atomically through
     streaming/snapshot_store.py.

This is the steady-state shape of a continuously-ingesting corpus at
100 TB: per batch, signature compute scales with the batch, the band
join probes the (pre-computable, bucketable) index, and no quadratic
recomputation ever happens. The incremental-equals-full law
(tests/test_r7_hardening.py) is what makes the union of all emitted
pairs equal a full LSH run over the whole corpus.

Exactly-once: foreachBatch is at-least-once, and BOTH effects (pair
append, index grow) are non-idempotent, so the snapshot version — the
producing batch id — guards both: a replayed batch is skipped outright.
Pair output is written to a per-batch subdirectory (pairs/batch=<id>)
BEFORE the index publishes; a crash between the two leaves the pair
dir present but the index version behind, and the replay overwrites
the same pair dir (idempotent per-batch path) then publishes — so the
downstream union of pairs/*/ never double-counts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from datawarehouse1_spark.operators.dedup import (
    build_minhash_index,
    minhash_lsh_incremental_pairs,
)
from datawarehouse1_spark.streaming.snapshot_store import (
    latest_version,
    publish_snapshot,
    read_snapshot,
)


def make_neardup_sink(
    spark: SparkSession,
    index_path: str,
    pairs_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body. Ids must be globally unique across batches
    (the operator contract); banding parameters are fixed for the life
    of the index — changing them invalidates it."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        applied = latest_version(index_path)
        if applied is not None and applied >= batch_id:
            return  # checkpoint replay: pairs + index already landed
        new_index = build_minhash_index(
            batch, text_col, id_col, num_hashes, bands, shingle_n
        ).localCheckpoint(eager=True)
        history = read_snapshot(spark, index_path)
        if history is None:
            # bootstrap: no cross pairs possible; new×new only
            history = new_index.limit(0)
        else:
            # id-disjointness enforcement: a doc id reused across
            # batches would pair with ITSELF at jaccard 1.0 and be
            # indexed twice — fail loudly before any effect lands
            dup = (
                new_index.select("_id")
                .join(history.select("_id"), "_id", "left_semi")
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"neardup sink: batch {batch_id} re-delivers doc id "
                    f"{dup[0]._id} already in the index — ids must be "
                    "globally unique across batches"
                )
        pairs = minhash_lsh_incremental_pairs(
            history,
            batch,
            text_col,
            id_col,
            num_hashes,
            bands,
            shingle_n,
            jaccard_threshold=jaccard_threshold,
            new_index=new_index,  # built once above; no recompute
        )
        # per-batch pair dir: overwrite-idempotent under replay, and
        # written BEFORE the index version commits (see module doc)
        pairs.write.mode("overwrite").parquet(
            f"{pairs_path}/batch={batch_id}"
        )
        publish_snapshot(
            history.unionByName(new_index), index_path, version=batch_id
        )

    return sink


def stream_maintain_neardup_index(
    spark: SparkSession,
    source: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    trigger_seconds: int = 60,
    **lsh_kwargs,
) -> StreamingQuery:
    """Attach the near-dup maintenance sink to a streaming DataFrame of
    (doc_id, text) documents."""
    return (
        source.writeStream.foreachBatch(
            make_neardup_sink(spark, index_path, pairs_path, **lsh_kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
