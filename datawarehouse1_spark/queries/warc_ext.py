"""WARC web-archive extraction query: the container format of web-crawl
training corpora (Common Crawl), parsed by the pure-stdlib reader in
sources/warc.py.

Round-trip oracle design: documents are packed into synthetic WARC
archives executor-side (8 pages per archive, one gzip member per record
— the Common Crawl layout), each page wrapping the document text in
escaped HTML with a script block. Spark must then do the full real
pipeline — split gzip members, frame records by Content-Length, parse
WARC headers, strip the HTTP response header, drop script subtrees,
strip tags, unescape entities, and recover doc_id from the target URI —
to reproduce what DuckDB reads straight off the documents table. Any
bug anywhere in that chain is a value mismatch, not a rows-only shrug.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

_ARCHIVE_SCHEMA = StructType(
    [
        StructField("archive_id", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("uri", StringType(), False),
        StructField("text", StringType(), True),
    ]
)


def synthesize_warc_archives(docs: DataFrame, docs_per_archive: int = 8) -> DataFrame:
    """Pack documents into WARC archives (gzip member per record). The
    grouping shuffle carries only (archive_id, doc_id, text) — at scale
    you'd read real WARC bytes from object storage instead; this stage
    exists to exercise the reader on genuine container bytes at any SF."""
    from datawarehouse1_spark.sources.warc import encode_warc, wrap_html

    def build(key, pdf):
        pdf = pdf.sort_values("doc_id")
        pages = [
            (
                f"http://corpus.local/doc/{int(doc_id)}",
                "2026-01-01T00:00:00Z",
                wrap_html(text if text is not None else ""),
            )
            for doc_id, text in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            {"archive_id": [int(key[0])], "payload": [encode_warc(pages)]}
        )

    grouped = docs.select(
        (F.col("doc_id") / docs_per_archive).cast("bigint").alias("archive_id"),
        "doc_id",
        "text",
    )
    return grouped.groupBy("archive_id").applyInPandas(build, schema=_ARCHIVE_SCHEMA)


def warc_extract_documents(archives: DataFrame) -> DataFrame:
    """The real extraction pipeline: gzip-member split -> WARC framing
    -> HTTP body -> boilerplate-stripped text. Fan-out (one archive in,
    N documents out) happens inside mapInPandas; archive bytes cross
    Arrow once and never shuffle."""
    from datawarehouse1_spark.sources.warc import (
        extract_text,
        http_response_body,
        parse_warc,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, uris, texts = [], [], []
            for payload in pdf["payload"]:
                for rec in parse_warc(bytes(payload)):
                    if rec.warc_type != "response":
                        continue
                    uri = rec.target_uri or ""
                    ids.append(int(uri.rsplit("/", 1)[-1]))
                    uris.append(uri)
                    texts.append(extract_text(http_response_body(rec.body)))
            yield pd.DataFrame({"doc_id": ids, "uri": uris, "text": texts})

    return archives.select("payload").mapInPandas(run, schema=_DOC_SCHEMA)


@declared(
    "q_warc_extract_text",
    oracle="""
    SELECT doc_id,
           'http://corpus.local/doc/' || CAST(doc_id AS VARCHAR) AS uri,
           COALESCE(text, '') AS text
    FROM documents
    WHERE doc_id < 400
    """,
)
def q_warc_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-archive text extraction, hash-matched end-to-end: Spark runs
    the full WARC pipeline (gzip members -> record framing -> HTTP ->
    HTML text) over genuine container bytes; DuckDB reads the same text
    straight from the source table. Bounded to 400 documents — the
    point is the extraction chain, not volume."""
    docs = table(spark, sf_dir, "documents").filter("doc_id < 400")
    return warc_extract_documents(synthesize_warc_archives(docs))


@declared(
    "q_compressed_blob_extract",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'gzip' WHEN 1 THEN 'bz2'
                ELSE 'xz' END AS codec,
           COALESCE(text, '') AS text
    FROM documents
    WHERE doc_id < 400
    """,
)
def q_compressed_blob_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed text blobs, hash-matched round trip: each document is
    stored as a gzip/bz2/xz blob (codec cycled by id — the three stdlib
    compression containers raw corpora actually use), sniffed by magic
    bytes and decompressed executor-side; DuckDB reads the plain text.
    Compression and decompression both happen inside mapInPandas — the
    blob crosses Arrow once and never shuffles."""
    import bz2 as _bz2
    import gzip as _gzip
    import lzma as _lzma

    out_schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("codec", StringType(), False),
            StructField("text", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "codec": [], "text": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                raw = (text or "").encode("utf-8")
                blob = (
                    _gzip.compress(raw, 6) if doc_id % 3 == 0
                    else _bz2.compress(raw) if doc_id % 3 == 1
                    else _lzma.compress(raw)
                )
                # sniff + decompress (magic bytes: published container ids)
                if blob[:2] == b"\x1f\x8b":
                    codec, out = "gzip", _gzip.decompress(blob)
                elif blob[:3] == b"BZh":
                    codec, out = "bz2", _bz2.decompress(blob)
                elif blob[:6] == b"\xfd7zXZ\x00":
                    codec, out = "xz", _lzma.decompress(blob)
                else:
                    raise ValueError("unknown compression container")
                rows["doc_id"].append(doc_id)
                rows["codec"].append(codec)
                rows["text"].append(out.decode("utf-8"))
            yield pd.DataFrame(rows)

    docs = table(spark, sf_dir, "documents").filter("doc_id < 400")
    return docs.select("doc_id", "text").mapInPandas(run, schema=out_schema)
