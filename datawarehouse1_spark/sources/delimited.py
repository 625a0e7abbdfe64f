"""CSV / JSONL file sources with the same ingest discipline as the xlsx
path (sources/excel.py): explicit schema, lineage enrichment
(source_file + imported_at — the reference's etl/app.py:158-159
columns), and per-row corrupt-record quarantine instead of silent drops.

Unlike xlsx (opaque bytes → per-task pandas parse), these formats have
NATIVE Spark sources, so parsing stays entirely JVM-side: schema
enforcement, predicate pushdown into the scan, and whole-stage codegen
all apply with zero Python in the path. PERMISSIVE mode routes
malformed rows into a `_corrupt_record` column; `split_corrupt` turns
that into (clean_rows, quarantine_rows) — the row-level analog of the
per-file status=error records on the xlsx path.

At 100 TB: CSV/JSONL scans split by file and by range (uncompressed),
so scan parallelism tracks input size; lineage enrichment is a narrow
projection; the corrupt split is a filter, not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def _lineage(df: DataFrame) -> DataFrame:
    """O5 enrichment: provenance columns on every ingested row."""
    return df.withColumn("source_file", F.input_file_name()).withColumn(
        "imported_at", F.current_timestamp()
    )


def _with_corrupt_field(schema: StructType) -> StructType:
    """PERMISSIVE mode only captures malformed rows when the read schema
    carries the corrupt-record column (copy; .add mutates in place)."""
    return StructType(list(schema.fields)).add(CORRUPT_COL, StringType())


def read_csv_dir(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
    glob: str = "*.csv",
) -> DataFrame:
    """Batch CSV scan: explicit schema (never inferSchema — a second full
    pass over the data AND nondeterministic types at scale), PERMISSIVE
    parse with corrupt capture, lineage columns."""
    return _lineage(
        spark.read.schema(_with_corrupt_field(schema))
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("pathGlobFilter", glob)
        .csv(directory)
    )


def read_jsonl_dir(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    glob: str = "*.jsonl",
) -> DataFrame:
    """Batch JSON-lines scan: one JSON object per line (the standard
    training-data interchange format), explicit schema, corrupt capture,
    lineage columns."""
    return _lineage(
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("pathGlobFilter", glob)
        .json(directory)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column; quarantine
    rows keep the FULL schema — raw malformed line (`raw_record`) plus
    whatever fields PERMISSIVE mode still parsed (CSV keeps the valid
    cells of a partially-bad row) plus lineage — so operators can
    inspect, fix and replay them. Keeping the data columns also matters
    mechanically: Spark refuses a scan whose only referenced column is
    the internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN
    — the alternative is caching the whole input, a non-starter at
    100 TB)."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).withColumnRenamed(
        CORRUPT_COL, "raw_record"
    )
    return clean, bad


def csv_stream(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
    glob: str = "*.csv",
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """Streaming CSV source: checkpointed exactly-once file tracking (the
    reference's polling/file_metadata loop), same schema/corrupt/lineage
    contract as the batch scan."""
    return _lineage(
        spark.readStream.schema(_with_corrupt_field(schema))
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(directory)
    )


def jsonl_stream(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    glob: str = "*.jsonl",
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """Streaming JSONL source, same contract as csv_stream."""
    return _lineage(
        spark.readStream.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(directory)
    )
