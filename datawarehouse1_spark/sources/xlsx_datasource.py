"""`spark.read.format("xlsx")` — a Spark 4 Python DataSource wrapping the
vendored stdlib xlsx parser (sources/xlsx_mini.py).

The reference ingests Excel workbooks with pandas.read_excel on a single
node (etl/app.py:92-141); this connector makes xlsx a first-class Spark
source instead: one input partition PER FILE, so a directory of
workbooks fans out across executors, schema inference runs once on the
driver against the first file only, and lock files (`~$...`) are skipped
at listing time exactly like the reference's skip rule (etl/app.py:262).

Usage:
    spark.dataSource.register(XlsxDataSource)
    df = (spark.read.format("xlsx")
          .option("sheet", 0).option("header", True)
          .load("/path/to/dir_or_file.xlsx"))

Scale notes: xlsx is a zip container — not splittable — so file-level
parallelism is the correct (and only) partitioning; a 100k-workbook
ingest gets 100k independent tasks. Values cross the Python worker
boundary per-partition (this is the Python DataSource API's model); for
the high-volume parquet/CSV paths the JVM sources remain the hot path,
and this source exists for the Excel-shaped edge of ingest where the
reference lives.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _list_xlsx(path: str) -> list[str]:
    """Expand a file/dir/glob path to real workbook files, skipping the
    `~$` lock files Excel leaves while a workbook is open."""
    if os.path.isdir(path):
        cands = sorted(_glob.glob(os.path.join(path, "*.xlsx")))
    elif os.path.isfile(path):
        cands = [path]
    else:
        cands = sorted(_glob.glob(path))
    return [f for f in cands if not os.path.basename(f).startswith("~$")]


def _infer_schema(sample_file: str, sheet: int, header: bool) -> StructType:
    """Driver-side inference from the FIRST workbook only (xlsx has no
    footer statistics; one file is the honest sample)."""
    import pandas as pd

    from datawarehouse1_spark.sources.xlsx_mini import parse_xlsx_bytes

    with open(sample_file, "rb") as fh:
        pdf = parse_xlsx_bytes(fh.read(), sheet=sheet, header=header)
    fields = []
    for col in pdf.columns:
        dtype = pdf[col].dtype
        if pd.api.types.is_bool_dtype(dtype):
            spark_t = BooleanType()
        elif pd.api.types.is_integer_dtype(dtype):
            spark_t = LongType()
        elif pd.api.types.is_float_dtype(dtype):
            spark_t = DoubleType()
        else:
            spark_t = StringType()
        fields.append(StructField(str(col), spark_t, nullable=True))
    return StructType(fields)


class _XlsxPartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class _XlsxReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options.get("path")
        self.sheet = int(options.get("sheet", 0))
        self.header = str(options.get("header", "true")).lower() != "false"

    def partitions(self) -> list[InputPartition]:
        files = _list_xlsx(self.path)
        if not files:
            raise FileNotFoundError(f"no .xlsx files at {self.path!r}")
        return [_XlsxPartition(f) for f in files]

    def read(self, partition: _XlsxPartition) -> Iterator[tuple]:
        import pandas as pd

        from datawarehouse1_spark.sources.xlsx_mini import parse_xlsx_bytes

        with open(partition.file_path, "rb") as fh:
            pdf = parse_xlsx_bytes(fh.read(), sheet=self.sheet, header=self.header)
        cols = [f.name for f in self.schema_.fields]
        types = {f.name: f.dataType for f in self.schema_.fields}
        for _, row in pdf.iterrows():
            out = []
            for c in cols:
                v = row[c] if c in pdf.columns else None
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    out.append(None)
                elif isinstance(types[c], StringType):
                    out.append(str(v))
                elif isinstance(types[c], DoubleType):
                    out.append(float(v))
                elif isinstance(types[c], LongType):
                    out.append(int(v))
                elif isinstance(types[c], BooleanType):
                    out.append(bool(v))
                else:
                    out.append(v)
            yield tuple(out)


def _file_sig(path: str) -> str:
    """Identity of a workbook VERSION: mtime_ns + size. The reference
    re-ingests a file whose mtime moved past its file_metadata row
    (etl/app.py:36-52 file_needs_processing); matching that rule means a
    workbook overwritten in place gets picked up again, which name-only
    identity would miss."""
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


class _XlsxStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the reference's polling loop (etl/app.py:258-282):
    each micro-batch picks up workbooks that are new OR modified since
    the offset, where the offset is a {filename: mtime_ns:size} map in
    Spark's offset log — the streaming twin of the reference's
    file_metadata table (etl/app.py:55-89) including its mtime-based
    re-ingest rule. The offset is COMPACTED to files currently on disk,
    so its size is O(live files), not O(files ever seen); a file that is
    deleted and later restored byte-identical re-ingests (at-least-once
    on restore, exactly-once otherwise). readBetweenOffsets replays a
    committed range deterministically from the offset delta."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options.get("path")
        self.sheet = int(options.get("sheet", 0))
        self.header = str(options.get("header", "true")).lower() != "false"

    def initialOffset(self) -> dict:
        return {"files": {}}

    @staticmethod
    def _sigmap(offset: dict) -> dict[str, "str | None"]:
        """Offset -> {name: sig}. Legacy v1 offsets (a bare name list)
        map every name to None, meaning 'processed, version unknown' —
        grandfathered as matching whatever is on disk now."""
        files = offset.get("files", {})
        if isinstance(files, list):
            return {name: None for name in files}
        return dict(files)

    def _rows_of(self, files: list[str]) -> list[tuple]:
        reader = _XlsxReader(self.schema_, {"path": self.path, "sheet": self.sheet,
                                            "header": self.header})
        out: list[tuple] = []
        for f in files:
            out.extend(reader.read(_XlsxPartition(f)))
        return out

    def read(self, start: dict):
        seen = self._sigmap(start)
        on_disk = {f: _file_sig(f) for f in _list_xlsx(self.path)}
        new = sorted(
            f for f, sig in on_disk.items()
            if f not in seen or (seen[f] is not None and seen[f] != sig)
        )
        # Compaction: the end offset carries only files still on disk
        # (legacy None sigs are upgraded to the observed sig).
        end = {"files": on_disk}
        return iter(self._rows_of(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = self._sigmap(start)
        target = self._sigmap(end)
        delta = sorted(
            f for f, sig in target.items()
            if f not in seen or (seen[f] is not None and seen[f] != sig)
        )
        return iter(self._rows_of(delta))


class XlsxDataSource(DataSource):
    """xlsx source: `spark.read.format("xlsx")` (batch) and
    `spark.readStream.format("xlsx")` (directory-polling stream)."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> StructType:
        path = self.options.get("path")
        files = _list_xlsx(path)
        if not files:
            raise FileNotFoundError(f"no .xlsx files at {path!r}")
        return _infer_schema(
            files[0],
            int(self.options.get("sheet", 0)),
            str(self.options.get("header", "true")).lower() != "false",
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _XlsxReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _XlsxStreamReader(schema, dict(self.options))
