"""Batch ingest pipeline: the reference's E2 dataflow (etl/app.py:235-289)
as validate-then-write over Spark tables.

Transaction-per-file semantics (etl/app.py:162,191,220: one to_sql per
file, constraint violation rolls back the whole file) cannot lean on
Parquet transactions — so the pipeline REJECTS BEFORE WRITING: a file's
batch is appended only if every constraint check passes; otherwise the
whole batch is rejected and recorded status=error. Never write-then-clean.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datawarehouse1_spark.operators.warehouse import (
    duplicate_keys,
    fk_orphans,
    null_violations,
)


@dataclass
class IngestResult:
    table: str
    source_file: str
    status: str  # success | error
    n_rows: int = 0
    errors: list[str] = field(default_factory=list)


def validate_batch(
    batch: DataFrame,
    business_key: str,
    not_null_cols: list[str],
    existing: DataFrame | None = None,
    fk_checks: list[tuple[DataFrame, str, str]] | None = None,
) -> list[str]:
    """All constraint checks the reference delegates to Postgres, computed
    in one pass where possible. Returns [] when the batch is appendable."""
    errors: list[str] = []

    n_null = null_violations(batch, not_null_cols).count()
    if n_null:
        errors.append(f"{n_null} rows violate NOT NULL on {not_null_cols}")

    n_dup = duplicate_keys(batch, [business_key]).count()
    if n_dup:
        errors.append(f"{n_dup} duplicate business keys within the batch")

    if existing is not None:
        n_clash = (
            batch.select(business_key)
            .join(existing.select(business_key), business_key, "left_semi")
            .count()
        )
        if n_clash:
            errors.append(
                f"{n_clash} business keys already present (UNIQUE violation)"
            )

    for dim, fact_key, dim_key in fk_checks or []:
        n_orphan = fk_orphans(batch, dim, fact_key, dim_key).count()
        if n_orphan:
            errors.append(f"{n_orphan} orphan {fact_key} values (FK violation)")

    return errors


def append_if_valid(
    batch: DataFrame,
    table_path: str,
    business_key: str,
    not_null_cols: list[str],
    source_file: str,
    table_name: str = "",
    existing: DataFrame | None = None,
    fk_checks: list[tuple[DataFrame, str, str]] | None = None,
    partition_by: list[str] | None = None,
) -> IngestResult:
    """Fail-the-file atomicity: validate everything, then one append.

    partition_by is the physical analog of the reference's date index
    (init-db/init.sql:67): facts partition by month(date) so date-range
    queries prune files instead of scanning."""
    errors = validate_batch(batch, business_key, not_null_cols, existing, fk_checks)
    if errors:
        return IngestResult(table_name, source_file, "error", 0, errors)

    # Row count via observe(): the metric rides the write job itself
    # (the reference logs per-file row counts, etl/app.py; a post-write
    # .count() would re-scan the batch — a second job for a number the
    # write already saw).
    from pyspark.sql import Observation

    obs = Observation(f"ingest-{source_file}")
    observed = batch.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    writer = observed.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_path)
    return IngestResult(
        table_name, source_file, "success", int(obs.get["n_rows"]), []
    )


def with_month_partition(df: DataFrame, ts_col: str, out: str = "month") -> DataFrame:
    """Derive the partition column for fact tables (yyyy-MM string keeps
    partition dirs readable and prunes on date_trunc-month predicates)."""
    return df.withColumn(out, F.date_format(F.col(ts_col), "yyyy-MM"))


def flag_violations(
    batch: DataFrame,
    business_key: str,
    not_null_cols: list[str],
    existing: DataFrame | None = None,
    fk_checks: list[tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Row-level constraint evaluation: returns the batch with a
    `__reasons` array column listing every violated constraint per row
    (empty array = clean). One window + one broadcast join per check —
    no driver round-trips, order-independent.
    """
    from pyspark.sql import Window

    out = batch
    reasons = []

    for c in not_null_cols:
        reasons.append(F.when(F.col(c).isNull(), F.lit(f"null:{c}")))

    w = Window.partitionBy(business_key)
    out = out.withColumn("__key_count", F.count(F.lit(1)).over(w))
    reasons.append(F.when(F.col("__key_count") > 1, F.lit(f"dup_key:{business_key}")))

    helpers = ["__key_count"]

    if existing is not None:
        ex = existing.select(F.col(business_key).alias("__ex_key")).dropDuplicates()
        out = out.join(
            F.broadcast(ex), out[business_key] == F.col("__ex_key"), "left"
        )
        reasons.append(
            F.when(F.col("__ex_key").isNotNull(), F.lit(f"unique_clash:{business_key}"))
        )
        helpers.append("__ex_key")

    for i, (dim, fact_key, dim_key) in enumerate(fk_checks or []):
        dk = f"__dim_key_{i}"
        d = dim.select(F.col(dim_key).alias(dk)).dropDuplicates()
        out = out.join(F.broadcast(d), out[fact_key] == F.col(dk), "left")
        reasons.append(
            F.when(
                F.col(fact_key).isNotNull() & F.col(dk).isNull(),
                F.lit(f"fk_orphan:{fact_key}"),
            )
        )
        helpers.append(dk)

    return out.withColumn(
        "__reasons",
        F.filter(F.array(*reasons), lambda r: r.isNotNull()),
    ).drop(*helpers)


def ingest_with_quarantine(
    batch: DataFrame,
    table_path: str,
    quarantine_path: str,
    business_key: str,
    not_null_cols: list[str],
    source_file: str,
    table_name: str = "",
    existing: DataFrame | None = None,
    fk_checks: list[tuple[DataFrame, str, str]] | None = None,
) -> IngestResult:
    """Row-level variant of append_if_valid for pipeline scale: instead of
    rejecting a whole multi-TB batch for a handful of bad rows (the
    reference's per-file transaction, right for 6-row xlsx files), clean
    rows append and each bad row lands in a quarantine table with its
    violation reasons — the side-channel a 100 TB training-data pipeline
    audits and replays.

    Still write-once per sink: the valid/invalid split is one lazy plan
    evaluated into two writes, no write-then-clean."""
    flagged = flag_violations(batch, business_key, not_null_cols, existing, fk_checks)
    flagged = flagged.withColumn("__is_valid", F.size("__reasons") == 0).cache()
    try:
        valid = flagged.filter("__is_valid").drop("__reasons", "__is_valid")
        invalid = (
            flagged.filter(~F.col("__is_valid"))
            .withColumn("quarantine_reasons", F.col("__reasons"))
            .drop("__reasons", "__is_valid")
            .withColumn("source_file", F.lit(source_file))
        )
        n_valid = valid.count()
        n_invalid = invalid.count()
        if n_valid:
            valid.write.mode("append").parquet(table_path)
        if n_invalid:
            invalid.write.mode("append").parquet(quarantine_path)
        status = "success" if n_invalid == 0 else "partial"
        return IngestResult(
            table_name,
            source_file,
            status,
            n_valid,
            [f"{n_invalid} rows quarantined"] if n_invalid else [],
        )
    finally:
        flagged.unpersist()
