"""Vector expressions over array<float> embedding columns (SURVEY.md C22).

All JVM-side (no Python UDF): `zip_with` + `aggregate` fold left-to-right
in array order, so double arithmetic is bit-deterministic and matches a
DuckDB `list_aggregate(..., 'sum')` fold over the same elements.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ a_i*b_i in double, sequential fold (deterministic)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: str | Column) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB twins (same fold order => bit-identical doubles) ---

def sql_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def sql_norm(a: str) -> str:
    return (
        f"sqrt(list_aggregate(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
