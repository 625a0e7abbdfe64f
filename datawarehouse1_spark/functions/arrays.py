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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


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
