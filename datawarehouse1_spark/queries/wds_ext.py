"""WebDataset tar-shard extraction query (sources/webdataset.py).

Round-trip oracle design, same as the WARC query: documents pack into
deterministic tar shards executor-side (8 samples per shard; each
sample = .txt text + .json {"lang", "n_chars"} sidecar + a REAL PNG
member for even doc_ids), then Spark must run the full real chain —
tar walk, basename sample grouping, JSON sidecar parse, PNG decode of
the image member — to reproduce what DuckDB reads straight off the
documents table. Shard bytes cross Arrow once and never shuffle; the
packing groupBy is the only exchange.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

_SHARD_SCHEMA = StructType(
    [
        StructField("shard_id", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("n_chars", LongType(), True),
        StructField("has_image", BooleanType(), False),
        StructField("image_ok", BooleanType(), False),
    ]
)


def synthesize_wds_shards(docs: DataFrame, samples_per_shard: int = 8) -> DataFrame:
    """Pack documents into WebDataset tar shards (deterministic bytes;
    even doc_ids get a real 8x8 PNG member so image decoding is
    exercised inside the sample walk)."""
    import numpy as np

    from datawarehouse1_spark.multimodal.codecs import encode_png
    from datawarehouse1_spark.sources.webdataset import build_tar_shard

    def build(key, pdf):
        pdf = pdf.sort_values("doc_id")
        samples = []
        for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            doc_id = int(doc_id)
            text = text if text is not None else ""
            members = {
                "txt": text.encode("utf-8"),
                "json": json.dumps(
                    {"lang": lang, "n_chars": len(text)}, sort_keys=True
                ).encode("utf-8"),
            }
            if doc_id % 2 == 0:
                rng = np.random.default_rng(doc_id)
                img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                members["png"] = encode_png(img)
            samples.append((f"{doc_id:09d}", members))
        return pd.DataFrame(
            {"shard_id": [int(key[0])], "payload": [build_tar_shard(samples)]}
        )

    grouped = docs.select(
        (F.col("doc_id") / samples_per_shard).cast("bigint").alias("shard_id"),
        "doc_id",
        "text",
        "lang",
    )
    return grouped.groupBy("shard_id").applyInPandas(build, schema=_SHARD_SCHEMA)


def wds_extract_samples(shards: DataFrame) -> DataFrame:
    """The real extraction chain: tar walk -> sample grouping -> JSON
    sidecar -> PNG validity check. Fan-out happens inside mapInPandas."""
    from datawarehouse1_spark.multimodal.codecs import decode_png
    from datawarehouse1_spark.sources.webdataset import (
        parse_tar_samples,
        sample_metadata,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "text", "lang", "n_chars", "has_image", "image_ok",
            )}
            for payload in pdf["payload"]:
                for key, members in parse_tar_samples(bytes(payload)):
                    meta = sample_metadata(members)
                    rows["doc_id"].append(int(key))
                    rows["text"].append(members.get("txt", b"").decode("utf-8"))
                    rows["lang"].append(meta.get("lang"))
                    rows["n_chars"].append(meta.get("n_chars"))
                    has_image = "png" in members
                    rows["has_image"].append(has_image)
                    ok = False
                    if has_image:
                        try:
                            ok = decode_png(members["png"]).shape == (8, 8, 3)
                        except ValueError:
                            ok = False
                    rows["image_ok"].append(ok)
            yield pd.DataFrame(rows)

    return shards.select("payload").mapInPandas(run, schema=_SAMPLE_SCHEMA)


@declared(
    "q_wds_extract_samples",
    oracle="""
    SELECT doc_id,
           COALESCE(text, '') AS text,
           lang,
           CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars,
           (doc_id % 2 = 0) AS has_image,
           (doc_id % 2 = 0) AS image_ok
    FROM documents
    WHERE doc_id < 400
    """,
)
def q_wds_extract_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard extraction, hash-matched end-to-end: Spark packs
    and then walks real tar shards (text + JSON sidecar + real PNG
    members), DuckDB reads the same values straight from the source
    table — any bug in the tar walk, sample grouping, sidecar parse, or
    PNG decode shows up as a value mismatch. Bounded to 400 documents."""
    docs = table(spark, sf_dir, "documents").filter("doc_id < 400")
    return wds_extract_samples(synthesize_wds_shards(docs))
