"""Temporal join operators: as-of and range joins.

Neither exists in the reference (SURVEY.md §2 negative findings) or as a
Spark built-in, but both are staples of warehouse/event analytics. Each
is built as a composition of existing DataFrame ops with single-shuffle
scale shape — no O(n²) cross product, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Left as-of join (backward): for each left row, attach the right row
    with the same key and the greatest right_ts <= left_ts (NULL payload
    if none). Equivalent of DuckDB/kdb `ASOF LEFT JOIN`.

    Scale shape: tag both sides, union, ONE shuffle on (key) with a
    (ts, side)-ordered window, forward-fill the right payload with
    `last(..., ignorenulls)`, keep left rows. Cost is a single sort-shuffle
    of |L|+|R| rows — same as any groupBy on the key — vs. the naive
    inequality-join which Spark would execute as a cross product.

    The payload is filled as ONE struct per right row, not per-column: a
    right row whose payload value is genuinely NULL still advances the
    fill (the left row gets that NULL), instead of `ignorenulls` skipping
    it and leaking the stale older value forward.

    Right side must be unique per (key, ts); pre-dedup it if not, or the
    fill is nondeterministic. Payload names must not collide with left
    columns (raises; rename on the right side first).
    """
    lcols = left.columns
    collisions = [c for c in right_payload if c in lcols]
    if collisions:
        raise ValueError(
            f"right_payload columns {collisions} collide with left columns; "
            "rename them on the right side before the as-of join"
        )
    payload_type = StructType([right.schema[c] for c in right_payload])
    l_tagged = left.select(
        *lcols,
        F.lit(None).cast(payload_type).alias("__r"),
        F.col(left_key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in right_payload]).alias("__r"),
        F.col(right_key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
    )
    # right rows sort before left rows at equal ts => ties match (<=)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *lcols,
        F.col("__side"),
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r_filled"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__r_filled").getField(c).alias(c) for c in right_payload],
    )


def range_join_broadcast(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Band/range join: match fact rows to [lo, hi) intervals of a SMALL
    bands table. Executed as a BroadcastNestedLoopJoin — fine at any fact
    scale because the inner side is the broadcast bands table (O(|fact| ×
    |bands|) with |bands| tiny, streamed through codegen).

    For large interval tables, pre-bucket both sides on a coarse grid and
    equi-join the bucket first (turns BNLJ into a hash join) — not needed
    for dimension-sized band tables.
    """
    cond = (F.col(value_col) >= bands[lo_col]) & (F.col(value_col) < bands[hi_col])
    return fact.join(F.broadcast(bands), cond, "inner")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    prefix_left: str = "l_",
    prefix_right: str = "r_",
    equi_keys: "Sequence[tuple[str, str]] | None" = None,
) -> DataFrame:
    """INTERVAL × INTERVAL overlap join — all pairs with
    ``l_start < r_end AND r_start < l_end`` (half-open [start, end)),
    the session-overlap / time-correlation primitive Spark has no
    native operator for.

    Scale shape (the standard grid-bucket decomposition): each interval
    explodes to the integer buckets it covers (floor(start/w) ..
    floor((end-1)/w)); candidates come from ONE equi-join on the bucket
    id; the exact overlap predicate then filters. A pair sharing
    several buckets is emitted ONCE, from its canonical bucket — the
    bucket containing max(l_start, r_start), which both intervals
    necessarily cover — so no dedup pass is needed, and (unlike a
    full-row dropDuplicates) genuinely duplicate input rows keep their
    multiplicity, exactly matching the brute-force theta join (two
    identical intervals on one side produce two output pairs).
    Cost is sum over buckets of |L_b|·|R_b| —
    bounded by bucket width, never |L|·|R|. Pick `bucket_width` near
    the TYPICAL interval length: much smaller multiplies the explode
    fan-out (len/w bucket rows per interval), much larger degrades
    toward all-pairs within a bucket. Start/end columns must be
    integer-like (cast timestamps to epoch seconds first); output
    carries every column of both sides under the given prefixes.
    `equi_keys`: optional [(left_col, right_col)] equality conditions
    joined ALONGSIDE the bucket id — per-entity overlap (sessions of
    the same user, ranges of the same device) without a post-filter,
    so bucket occupancy is counted per key and skew stays keyed.
    Equivalence to the brute-force theta join is property-tested."""
    # empty intervals (end <= start) overlap nothing under half-open
    # semantics - and would make F.sequence run BACKWARD (5..3 yields
    # [5,4,3]), fabricating buckets - so both sides drop them up front
    lb = (
        left.select(
            *[F.col(c).alias(prefix_left + c) for c in left.columns]
        )
        .filter(F.col(prefix_left + l_start) < F.col(prefix_left + l_end))
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(prefix_left + l_start) / bucket_width),
                    F.floor(
                        (F.col(prefix_left + l_end) - 1) / bucket_width
                    ),
                )
            ),
        )
    )
    rb = (
        right.select(
            *[F.col(c).alias(prefix_right + c) for c in right.columns]
        )
        .filter(F.col(prefix_right + r_start) < F.col(prefix_right + r_end))
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(prefix_right + r_start) / bucket_width),
                    F.floor(
                        (F.col(prefix_right + r_end) - 1) / bucket_width
                    ),
                )
            ),
        )
    )
    overlap = (
        F.col(prefix_left + l_start) < F.col(prefix_right + r_end)
    ) & (F.col(prefix_right + r_start) < F.col(prefix_left + l_end))
    cond = lb["_bucket"] == rb["_bucket"]
    for lk, rk in equi_keys or ():
        cond = cond & (
            F.col(prefix_left + lk).eqNullSafe(F.col(prefix_right + rk))
        )
    # canonical-bucket discipline: of the (possibly many) buckets a
    # pair shares, keep only the one holding the overlap's start point
    canonical = lb["_bucket"] == F.floor(
        F.greatest(
            F.col(prefix_left + l_start), F.col(prefix_right + r_start)
        )
        / bucket_width
    )
    return lb.join(rb, cond).filter(overlap & canonical).drop("_bucket")
