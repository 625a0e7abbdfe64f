"""Streaming media ingest: the decode tier under Structured Streaming.

A training-data collection pipeline receives media as FILES landing in
object storage; the Spark-native shape is the `binaryFile` streaming
source (checkpointed file tracking = exactly-once per file, the same
guarantee the reference's file_metadata table hand-rolls for xlsx —
etl/app.py:36-89) feeding the SAME Arrow-batched decode operators the
batch tier uses (multimodal/binary_columns.py). Payload bytes cross
Arrow once per asset inside each micro-batch and never shuffle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# binaryFile source schema is fixed by Spark
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("error", StringType(), True),
    ]
)


def media_file_stream(
    spark: SparkSession, watch_dir: str, path_glob: str | None = None
) -> DataFrame:
    """Checkpointable stream of binary files landing in watch_dir."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 32)
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(watch_dir)


def decode_media_stream(
    files: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 16,
) -> DataFrame:
    """binaryFile rows -> sniffed mime + real decoded features, fail-soft
    per file (a corrupt upload must quarantine, not kill the stream —
    the reference's per-file error discipline, etl/app.py:120-134)."""
    from datawarehouse1_spark.multimodal.codecs import sniff_mime, stdlib_decode

    decode = decode_fn or stdlib_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("path", "mime", "n_bytes", "feature", "error")}
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                rows["path"].append(path)
                rows["n_bytes"].append(len(payload))
                rows["mime"].append(sniff_mime(payload))
                try:
                    rows["feature"].append(decode(payload, dim).tolist())
                    rows["error"].append(None)
                except Exception as exc:  # fail-soft per file
                    rows["feature"].append(None)
                    rows["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(
        run, schema=MEDIA_FEATURE_SCHEMA
    )


def run_media_ingest(
    spark: SparkSession,
    watch_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Wire source -> decode -> parquet append sink. The parquet file
    sink supports checkpoint RECOVERY (the memory sink does not), so a
    restarted query resumes from the tracked file offsets — exactly
    once per landed file, end to end."""
    stream = decode_media_stream(media_file_stream(spark, watch_dir))
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
