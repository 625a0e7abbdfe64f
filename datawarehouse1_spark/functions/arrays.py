"""Array-column projection helpers for declared-query output.

The driver's canonicalization hashes each output cell; list-typed cells
crash it (`TypeError: unhashable type: 'list'` — CORRECTNESS_r03 on
q_array_agg_sorted / q_multimodal_*). Declared queries must therefore
emit scalar columns only. These helpers stringify arrays AT THE QUERY
BOUNDARY; the operator layer keeps returning real arrays (tests and
downstream composition use those directly).

Both renderings are deterministic:
  * `array_join_ints` — comma-joined decimal ints; matched in DuckDB by
    `array_to_string(list_sort(...), ',')`.
  * `stringify_array_cols` — JSON rendering via `to_json` for any
    array column (floats included); used on rows-only queries where no
    oracle string must match, so JSON float repr is fine.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def const_bigint_array(values: Sequence[int]) -> Column:
    """Constant array<bigint> column built in ONE py4j round trip.

    Classic PySpark's `F.lit(list)` is sugar for
    `array(*[lit(v) for v in values])` — still one driver->JVM call PER
    ELEMENT (the single-call behavior only holds under Spark Connect;
    pyspark/sql/functions/builtin.py). The 1-d ndarray path of `lit`,
    by contrast, ships the whole array through py4j's array converter
    in one `_invoke_function("lit", col)` call and yields the same
    folded literal plan (verified: LONG_MIN round-trips, plan shows one
    literal array). Use this for any constant array longer than a few
    elements — bloom bitmaps, hash-power tables.

    Contract: every value must fit SIGNED 64-bit (the JVM long the
    literal becomes). Current callers are safe by construction (simhash
    powers <= 1<<62, bloom masks already signed longs); a new caller
    passing a Python int outside that range gets a clear ValueError
    naming the value rather than numpy's bare OverflowError (ADVICE
    r14)."""
    vals = list(values)
    for v in vals:
        if not (-(1 << 63) <= v < (1 << 63)):
            raise ValueError(
                f"const_bigint_array: {v} does not fit signed 64-bit "
                "(values become JVM longs)"
            )
    return F.lit(np.asarray(vals, dtype=np.int64))


def array_join_ints(col: Column, sep: str = ",") -> Column:
    """Render an array<int/long> as a comma-joined string (oracle twin:
    DuckDB `array_to_string(l, ',')`)."""
    return F.array_join(col.cast("array<string>"), sep)


def stringify_array_cols(df: DataFrame) -> DataFrame:
    """Replace every array-typed column with its `to_json` string so the
    driver's per-cell canonicalization never sees a Python list."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    return out


def word_ngrams(tok_col: Column, n: int, sep: str = " ") -> Column:
    """Ordered n-gram strings over a token array, as a zip_with chain of
    n shifted slices. The naive transform(sequence, i -> concat_ws(
    element_at(c, i)...)) form re-walks the array per element_at call
    (O(len) each => O(len²) per doc — measured 10.9 s vs 0.74 s over
    sf0.1 documents); zip_with streams all slices once. Empty when the
    doc has < n tokens (slice length clamps to 0). NOT distinct — wrap
    in array_distinct where shingle-set semantics are wanted."""
    m = F.greatest(F.size(tok_col) - (n - 1), F.lit(0))
    acc = F.slice(tok_col, 1, m)
    for j in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(tok_col, j, m), lambda x, y: F.concat_ws(sep, x, y)
        )
    return acc
