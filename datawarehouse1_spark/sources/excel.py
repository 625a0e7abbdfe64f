"""Excel (.xlsx) ingest source.

Reference behavior being re-expressed (not ported):
  * safe_read_excel: read one xlsx into a DataFrame, retrying on locked
    files (etl/app.py:92-141) -> Spark task retries subsume the retry
    loop; the read itself runs inside executors.
  * lock-file skip: `~$`-prefixed names excluded (etl/app.py:262-263)
    -> pathGlobFilter.
  * required-columns check (etl/app.py:150-155,179-184,208-213)
    -> validate_required_columns below, fail-the-file atomicity.

Spark has no built-in xlsx reader, so the distributed shape is:
`binaryFile` source (one row per file: path + bytes) -> mapInPandas
parsing each file's bytes inside the task. Parsing is per-file parallel,
bytes never hit the driver.

The parse itself uses openpyxl when installed, else the vendored
pure-stdlib reader (sources/xlsx_mini.py) — the path runs for real in
any environment; tests drive it end-to-end on the reference's own
data/excel/*.xlsx bytes.
"""

from __future__ import annotations

import io
import os
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

LOCK_GLOB = "[!~]*.xlsx"  # excludes Excel `~$...` lock files


class MissingColumnsError(ValueError):
    """Raised when a file lacks required columns (whole file rejected —
    the reference's fail-the-file semantics, etl/app.py:150-155)."""


def default_xlsx_parser(name: str, data: bytes) -> pd.DataFrame:
    """Parse xlsx bytes with the vendored stdlib reader (xlsx_mini).

    Always the stdlib reader — NOT openpyxl-when-available — so the same
    bytes produce the same values in every environment: pd.read_excel
    converts date-formatted cells to Timestamps where xlsx_mini keeps
    the raw serial floats the pipeline contract expects
    (q_excel_serial_date), and renders empty cells NaN vs None. An
    environment that wants pandas/openpyxl semantics opts in explicitly
    via read_xlsx_dir(..., parser=openpyxl_xlsx_parser)."""
    from datawarehouse1_spark.sources.xlsx_mini import parse_xlsx_bytes

    return parse_xlsx_bytes(data)


def openpyxl_xlsx_parser(name: str, data: bytes) -> pd.DataFrame:
    """Opt-in pandas+openpyxl parser (full xlsx format coverage; value
    conventions differ from the stdlib reader — see default_xlsx_parser).
    Raises if openpyxl is absent."""
    import openpyxl  # noqa: F401  # pragma: no cover - env-dependent

    return pd.read_excel(io.BytesIO(data), engine="openpyxl")


def _xlsx_out_schema(schema: StructType, with_status: bool = False) -> StructType:
    # Every data field is declared NULLABLE here even when the warehouse
    # schema says NOT NULL: status rows (with_status=True) legitimately
    # carry all-null data columns for a failed file, and a nullable=False
    # field receiving one NPEs deep in UnsafeProjection the moment the
    # batch is persisted — killing the stream instead of quarantining the
    # file. NOT NULL is a SINK constraint (validate_batch, mirroring the
    # reference where Postgres enforces it at insert, not in the poller).
    # Fields are rebuilt (not .add on the caller's StructType, which
    # mutates in place and would grow the caller's schema).
    out = StructType(
        [StructField(f.name, f.dataType, True) for f in schema.fields]
    )
    out = out.add("source_file", "string").add("imported_at", "timestamp")
    if with_status:
        out = out.add("parse_error", "string")
    return out


def _coerce_to_fields(out: pd.DataFrame, fields) -> pd.DataFrame:
    """Coerce parsed pandas columns to the DECLARED Spark schema (O6 type
    coercion at the source, the reference's implicit pandas->Postgres
    cast). Without this, Arrow serialization of mapInPandas output fails
    on any dtype drift — e.g. clients.xlsx's telephone parses as a
    NUMBER (Excel stores it numerically) while the warehouse declares
    VARCHAR, and the resulting ArrowTypeError escapes the per-file
    try/except (it happens at batch serialization, after parse) and
    kills the whole stream instead of failing the file. Conversions:

      string    — integral floats render Excel-style ("612345678", not
                  "612345678.0"); everything else str()
      int/long  — nullable Int64 (NaN-safe)
      float     — float64
      decimal   — decimal.Decimal quantized to the declared scale
                  (HALF_UP, the reference's Postgres NUMERIC rounding)
      timestamp — numeric cells are Excel serials on the 1899-12-30
                  epoch (how Excel stores every date); others parse via
                  pandas

    Coercion failures raise inside the caller's per-file try block —
    fail-the-file, never fail-the-stream."""
    import datetime as _dt
    import decimal as _decimal

    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampType,
    )

    def to_str(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, str):
            return v
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        return str(v)

    for f in fields:
        s = out[f.name]
        t = f.dataType
        if isinstance(t, StringType):
            out[f.name] = s.map(to_str)
        elif isinstance(t, (IntegerType, LongType, ShortType, ByteType)):
            out[f.name] = pd.to_numeric(s).astype("Int64")
        elif isinstance(t, (DoubleType, FloatType)):
            out[f.name] = pd.to_numeric(s).astype("float64")
        elif isinstance(t, DecimalType):
            q = _decimal.Decimal(1).scaleb(-t.scale)
            out[f.name] = s.map(
                lambda v, q=q: None
                if v is None or (isinstance(v, float) and pd.isna(v))
                else _decimal.Decimal(str(v)).quantize(
                    q, rounding=_decimal.ROUND_HALF_UP
                )
            )
        elif isinstance(t, TimestampType):
            epoch = _dt.datetime(1899, 12, 30)
            out[f.name] = s.map(
                lambda v: None
                if v is None or (isinstance(v, float) and pd.isna(v))
                else (
                    epoch + _dt.timedelta(seconds=round(float(v) * 86400))
                    if isinstance(v, (int, float))
                    else pd.to_datetime(v).to_pydatetime()
                )
            )
    return out


def _make_xlsx_parse_fn(
    parser,
    col_order: list[str],
    skip_invalid: bool = False,
    with_status: bool = False,
    fields=None,
):
    """The shared per-task parse body: file bytes -> validated rows
    projected to the declared schema + lineage columns. Used by both the
    batch scan (read_xlsx_dir) and the streaming source (xlsx_stream).

    skip_invalid=True is the streaming mode: a file that fails to parse
    or validate must NOT raise — raising inside a streaming micro-batch
    would terminate the query, and the checkpointed source would replay
    the same bad file on every restart, wedging the stream forever.
    Batch mode keeps raising: the caller sees the bad file immediately
    and no checkpoint is involved.

    with_status=True additionally emits ONE status row per failed file
    (data columns null, `parse_error` = path + exception); good rows get
    parse_error NULL. That is the reference's durable status=error
    record per file (etl/app.py:271-275 writes file_metadata rows) —
    a log line alone leaves operators with no queryable record of
    skipped uploads, so the streaming ingest sink routes these rows to
    a quarantine/status table (streaming/file_ingest.py)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import datetime as _dt
        import logging

        now = _dt.datetime.now()
        for pdf in batches:
            for _, row in pdf.iterrows():
                try:
                    parsed = parser(row["path"], row["content"])
                    validate_required_columns(parsed, col_order, row["path"])
                    parsed = parsed[col_order].copy()
                    if fields is not None:
                        parsed = _coerce_to_fields(parsed, fields)
                except Exception as exc:
                    if not skip_invalid:
                        raise
                    logging.getLogger(__name__).exception(
                        "skipping invalid xlsx file %s", row["path"]
                    )
                    if with_status:
                        err = pd.DataFrame(
                            {c: [None] for c in col_order}
                            | {
                                "source_file": [os.path.basename(row["path"])],
                                "imported_at": [now],
                                "parse_error": [f"{row['path']}: {exc!r}"],
                            }
                        )
                        yield err
                    continue
                out = parsed  # already projected to the declared schema
                out["source_file"] = os.path.basename(row["path"])
                out["imported_at"] = now
                if with_status:
                    out["parse_error"] = None
                yield out

    return parse


def read_xlsx_dir(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    parser=default_xlsx_parser,
    glob: str = LOCK_GLOB,
) -> DataFrame:
    """Distributed xlsx scan: binaryFile rows -> per-task pandas parse ->
    rows cast to `schema`, plus lineage columns source_file/imported_at
    (the reference's enrichment, etl/app.py:158-159)."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(directory)
        .select("path", "content")
    )
    col_order = [f.name for f in schema.fields]
    return binary.mapInPandas(
        _make_xlsx_parse_fn(
            parser, col_order, skip_invalid=False, fields=schema.fields
        ),
        schema=_xlsx_out_schema(schema),
    )


def xlsx_stream(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    parser=default_xlsx_parser,
    glob: str = LOCK_GLOB,
    max_files_per_trigger: int = 100,
    with_status: bool = False,
) -> DataFrame:
    """Streaming form of read_xlsx_dir: the binaryFile source watches the
    directory (checkpointed exactly-once file tracking — the reference's
    whole polling/file_metadata loop, etl/app.py:249-289), and each new
    file's bytes parse inside the task with the same shared parse body.
    The reference's actual input format, end-to-end on the streaming
    path. Invalid files never wedge the checkpointed stream: with
    with_status=True (the ingest pipeline's mode) each failed file emits
    a durable parse_error status row for the quarantine sink; with
    False it is logged and skipped."""
    binary = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed, but a streaming source requires
        # it declared explicitly
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(directory)
        .select("path", "content")
    )
    col_order = [f.name for f in schema.fields]
    return binary.mapInPandas(
        _make_xlsx_parse_fn(
            parser,
            col_order,
            skip_invalid=True,
            with_status=with_status,
            fields=schema.fields,
        ),
        schema=_xlsx_out_schema(schema, with_status=with_status),
    )


def validate_required_columns(
    df: pd.DataFrame, required: Sequence[str], path: str = "<df>"
) -> None:
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise MissingColumnsError(f"{path}: missing required columns {missing}")


def route_table(filename: str) -> str | None:
    """File-type dispatch (etl/app.py:235-246): substring of the lowered
    basename -> warehouse table, None = skip with warning."""
    base = os.path.basename(filename).lower()
    if base.startswith("~$"):
        return None
    for marker, tbl in (("client", "clients"), ("produit", "produits"), ("vente", "ventes")):
        if marker in base:
            return tbl
    return None


def route_column(path_col: str = "source_file") -> F.Column:
    """The same dispatch as a vectorized column expression."""
    base = F.lower(F.element_at(F.split(F.col(path_col), "/"), -1))
    return (
        F.when(base.startswith("~$"), F.lit(None).cast("string"))
        .when(base.contains("client"), F.lit("clients"))
        .when(base.contains("produit"), F.lit("produits"))
        .when(base.contains("vente"), F.lit("ventes"))
        .otherwise(F.lit(None).cast("string"))
    )
