"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only state is the file_metadata table (etl/app.py:36-89),
which Structured Streaming's checkpoint subsumes (streaming/file_ingest).
These operators cover the state shapes a large-scale pipeline needs
beyond built-in windows: cross-batch exact dedup and per-key running
aggregates.

State bounding: each operator takes `timeout_hours`; when set, idle keys
are evicted via ProcessingTimeTimeout (a 100 TB stream cannot keep every
key forever). Note the operational trade-off: with a processing-time
timeout configured, Spark schedules timeout-firing micro-batches even
when no data arrives (the stream never fully idles) — so the default is
NoTimeout and production deployments opt in.

Physical shape: groupBy(key) shuffles each key to one task; state lives
in the state store (RocksDB/HDFS-backed on a cluster), partitioned the
same way — no driver involvement, Arrow-batched pandas on the hot path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

DEDUP_OUTPUT = StructType(
    [StructField("key", StringType()), StructField("first_seen_batch_rows", LongType())]
)
DEDUP_STATE = StructType([StructField("seen", LongType())])

TOTALS_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total", LongType()),
    ]
)
TOTALS_STATE = StructType(
    [StructField("n_events", LongType()), StructField("total", LongType())]
)


def _timeout_ms(timeout_hours: Optional[float]) -> Optional[int]:
    return None if timeout_hours is None else int(timeout_hours * 3600 * 1000)


def _make_dedup_fn(timeout_ms: Optional[int]):
    def dedup_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Emit the key once — on its first appearance across ALL batches."""
        if state.hasTimedOut:
            state.remove()
            return
        n = sum(len(p) for p in pdfs)
        if not state.exists:
            state.update((1,))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame({"key": [key[0]], "first_seen_batch_rows": [n]})
        # already seen: emit nothing (exact streaming dedup)

    return dedup_fn


def stream_dedup_by_key(
    events: DataFrame, key_col: str, timeout_hours: Optional[float] = None
) -> DataFrame:
    """Cross-batch exact dedup: each key is emitted exactly once over the
    stream's lifetime (or per timeout window when `timeout_hours` is set).
    The streaming analog of q_dedup_business_key — unlike built-in
    dropDuplicates, state here is evictable."""
    tmo = _timeout_ms(timeout_hours)
    keyed = events.selectExpr(f"CAST({key_col} AS STRING) AS key")
    return keyed.groupBy("key").applyInPandasWithState(
        _make_dedup_fn(tmo),
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if tmo is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def _make_totals_fn(timeout_ms: Optional[int]):
    def totals_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-key running (n_events, total) updated each batch."""
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0)
        for p in pdfs:
            n += len(p)
            total += int(p["value"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    return totals_fn


def stream_running_totals(
    events: DataFrame,
    key_col: str,
    value_col: str,
    timeout_hours: Optional[float] = None,
) -> DataFrame:
    """Per-key running count+sum across batches (update-mode analog of a
    continuously-maintained aggregate table)."""
    tmo = _timeout_ms(timeout_hours)
    keyed = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"CAST({value_col} AS LONG) AS value"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _make_totals_fn(tmo),
        outputStructType=TOTALS_OUTPUT,
        stateStructType=TOTALS_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if tmo is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


# --- transformWithStateInPandas twins (Spark 4 successor API) ---
#
# Same two operators on the arbitrary-state API that replaces
# applyInPandasWithState: typed per-key state handles (ValueState) from a
# StatefulProcessorHandle instead of one untyped GroupState tuple.
# Requires the RocksDB state-store provider
# (spark.sql.streaming.stateStore.providerClass =
# ...state.RocksDBStateStoreProvider) — bundled with Spark 4 — and
# google.protobuf on the Python side (the TWS state server speaks
# protobuf; pyspark/sql/streaming/proto). Environments without protobuf
# keep using the applyInPandasWithState originals above; the parity
# tests in tests/test_stateful_streaming.py skip themselves when the
# runtime dependency is absent.


class _DedupProcessor(StatefulProcessor):
    """Emit each key once on first appearance (ValueState marker)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", DEDUP_STATE)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = sum(len(p) for p in rows)
        if not self._seen.exists():
            self._seen.update((1,))
            yield pd.DataFrame({"key": [key[0]], "first_seen_batch_rows": [n]})

    def close(self) -> None:
        pass


class _TotalsProcessor(StatefulProcessor):
    """Per-key running (n_events, total)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._acc = handle.getValueState("acc", TOTALS_STATE)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._acc.get() if self._acc.exists() else (0, 0)
        for p in rows:
            n += len(p)
            total += int(p["value"].sum())
        self._acc.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    def close(self) -> None:
        pass


def stream_dedup_by_key_tws(events: DataFrame, key_col: str) -> DataFrame:
    """stream_dedup_by_key on transformWithStateInPandas."""
    keyed = events.selectExpr(f"CAST({key_col} AS STRING) AS key")
    return keyed.groupBy("key").transformWithStateInPandas(
        _DedupProcessor(),
        outputStructType=DEDUP_OUTPUT,
        outputMode="Append",
        timeMode="None",
    )


def stream_running_totals_tws(
    events: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """stream_running_totals on transformWithStateInPandas."""
    keyed = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"CAST({value_col} AS LONG) AS value"
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        _TotalsProcessor(),
        outputStructType=TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
