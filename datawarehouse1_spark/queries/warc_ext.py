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
           text
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
