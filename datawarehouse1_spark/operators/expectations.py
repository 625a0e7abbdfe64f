"""Declarative data-quality expectations (Deequ-style validation).

The reference enforces its data contracts with Postgres DDL —
NOT NULL / UNIQUE / FK constraints in init.sql:23,50,58-59 — and with
the required-columns guard in etl/app.py:150-155. Neither scales past a
single node, and neither produces a report: a violation either aborts
the load or silently never happens. This module re-expresses that
contract surface the way a large-scale pipeline does (the public model
is AWS Deequ / Great Expectations): a declarative suite of column
expectations evaluated in ONE aggregate pass over the table, returning
a small report DataFrame (constraint, column, counts, pass/fail) the
pipeline can gate on.

Scale posture (100 TB): every expectation compiles to a conditional
aggregate over the SAME single scan — adding a constraint adds a
column to one agg, not a query; the report is unpivoted from the one
agg row with inline(array(struct...)), so the whole suite is a single
subtree (scan → partial agg → final agg → generate), no union fan-out.
The only wide element is exact uniqueness (count_distinct ⇒ one
Expand); `approx=True` swaps it for approx_count_distinct on the scale
path — the same trade q_profile_columns documents.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative constraint. `kind` names the check; `passed`
    is a boolean Column counting conforming rows (NULL-safe: a NULL
    that should fail must count as False, not NULL)."""

    name: str
    column: str
    kind: str
    passed: Column | None = field(default=None, compare=False)
    unique: bool = False


def expect_complete(column: str) -> Expectation:
    """NOT NULL (init.sql's `NOT NULL` analog)."""
    return Expectation(
        name=f"complete_{column}", column=column, kind="completeness",
        passed=F.col(column).isNotNull(),
    )


def expect_unique(column: str) -> Expectation:
    """UNIQUE / primary-key (init.sql's `PRIMARY KEY` analog): passes
    when the column is fully non-null and every value occurs once."""
    return Expectation(
        name=f"unique_{column}", column=column, kind="uniqueness", unique=True,
    )


def expect_in_range(column: str, lo, hi) -> Expectation:
    """CHECK (lo <= col <= hi). NULLs fail (range implies presence)."""
    return Expectation(
        name=f"range_{column}", column=column, kind="range",
        passed=F.col(column).between(F.lit(lo), F.lit(hi)),
    )


def expect_in_set(column: str, values: tuple) -> Expectation:
    """Enum-membership CHECK (the reference's statut/type columns)."""
    return Expectation(
        name=f"in_set_{column}", column=column, kind="set_membership",
        passed=F.col(column).isin(list(values)),
    )


def expect_matches(column: str, pattern: str) -> Expectation:
    """Format CHECK via regex (codes, ids, clerks)."""
    return Expectation(
        name=f"matches_{column}", column=column, kind="pattern",
        passed=F.col(column).rlike(pattern),
    )


def run_expectations(
    df: DataFrame,
    expectations: list[Expectation],
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Evaluate the whole suite in one aggregate pass and unpivot to a
    report: (constraint, column, kind, n_rows, n_passed, status).
    For row-level checks n_passed counts conforming rows; for
    uniqueness n_passed is the distinct-value count, and the check
    passes iff the column is fully non-null with n_distinct == n_rows
    (the PRIMARY KEY contract). With approx=True the HLL estimate
    carries ±rsd relative error, so the verdict allows a 3·rsd band
    around n_rows — a near-key with few duplicates can pass (inherent
    to sketched uniqueness; the exact path is the authoritative one),
    but a genuinely unique key no longer FAILS just because the
    estimate is off by its published error."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for e in expectations:
        if e.unique:
            distinct = (
                F.approx_count_distinct(e.column, rsd).cast("long")
                if approx
                else F.count_distinct(F.col(e.column))
            )
            aggs.append(distinct.alias(f"__d_{e.name}"))
            aggs.append(F.count(e.column).alias(f"__nn_{e.name}"))
        else:
            aggs.append(
                F.count(F.when(e.passed.eqNullSafe(F.lit(True)), 1)).alias(
                    f"__p_{e.name}"
                )
            )
    row = df.agg(*aggs)

    def report_struct(e: Expectation) -> Column:
        if e.unique:
            n_passed = F.col(f"__d_{e.name}")
            if approx:
                tol = F.ceil(F.col("__n_rows") * (3.0 * rsd))
                distinct_ok = (
                    F.abs(F.col(f"__d_{e.name}") - F.col("__n_rows")) <= tol
                )
            else:
                distinct_ok = F.col(f"__d_{e.name}") == F.col("__n_rows")
            ok = (F.col(f"__nn_{e.name}") == F.col("__n_rows")) & distinct_ok
        else:
            n_passed = F.col(f"__p_{e.name}")
            ok = n_passed == F.col("__n_rows")
        return F.struct(
            F.lit(e.name).alias("constraint"),
            F.lit(e.column).alias("column"),
            F.lit(e.kind).alias("kind"),
            F.col("__n_rows").alias("n_rows"),
            n_passed.cast("long").alias("n_passed"),
            F.when(ok, "pass").otherwise("fail").alias("status"),
        )

    return row.select(
        F.inline(F.array(*[report_struct(e) for e in expectations]))
    )


def run_fk_expectation(
    df: DataFrame, column: str, dim: DataFrame, dim_column: str
) -> DataFrame:
    """REFERENCES constraint (init.sql's FOREIGN KEY analog) — the one
    contract that inherently needs a second table, so it runs as its
    own pass and unions into the suite report: n_passed counts rows
    whose non-null value exists in the dimension (a left join against
    the DISTINCT dim keys — no row multiplication — so total and
    matched counts come from one scan of the fact side; at scale the
    key set broadcasts or the join shuffles on the key only). NULLs
    fail, matching expect_in_range's presence rule."""
    keys = dim.select(F.col(dim_column).alias("__k")).distinct()
    # ONE scan of the fact side: left join against the distinct key set
    # (no row multiplication) yields total and matched counts together
    joined = df.join(keys, F.col(column) == F.col("__k"), "left")
    counted = joined.agg(
        F.count(F.lit(1)).alias("__n_rows"),
        F.count("__k").alias("__matched"),
    )
    return counted.select(
        F.lit(f"fk_{column}").alias("constraint"),
        F.lit(column).alias("column"),
        F.lit("foreign_key").alias("kind"),
        F.col("__n_rows").alias("n_rows"),
        F.col("__matched").cast("long").alias("n_passed"),
        F.when(F.col("__matched") == F.col("__n_rows"), "pass")
        .otherwise("fail")
        .alias("status"),
    )
