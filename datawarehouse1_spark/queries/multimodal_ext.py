"""Multimodal plumbing queries over a deterministic asset table
synthesized from documents (no binary fixtures in the testdata). The
JVM-side metadata pass is oracle-checked; the Arrow decode path is
rows-only (stub decoder, engine-specific)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.arrays import stringify_array_cols
from datawarehouse1_spark.multimodal.binary_columns import (
    extract_features,
    frame_sample,
    payload_metadata,
    synthesize_assets_from_documents,
    synthesize_media_assets,
)
from datawarehouse1_spark.registry import declared


@declared(
    "q_multimodal_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata entirely JVM-side (length + md5 over the
    payload bytes) — the cheap pre-filter that runs before any decode."""
    assets = synthesize_assets_from_documents(table(spark, sf_dir, "documents"))
    return payload_metadata(assets)


@declared("q_multimodal_features", oracle=None)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode -> feature vectors (stub decoder, real batch
    plumbing; deterministic across runs via sha256-seeded fake). The
    feature array is emitted as its JSON string — driver canon crashes
    on list cells (CORRECTNESS_r03); operators keep real arrays."""
    assets = synthesize_assets_from_documents(table(spark, sf_dir, "documents"))
    return stringify_array_cols(extract_features(assets))


@declared("q_multimodal_real_decode", oracle=None)
def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode end-to-end: genuine WAV/BMP/PNG/JPEG container bytes
    are synthesized executor-side (multimodal/binary_columns.py::
    synthesize_media_assets), then decoded by this repo's own codecs
    (multimodal/codecs.py — wave module, BITMAPINFO structs, zlib
    inflate + the five PNG row filters; multimodal/jpeg.py — a pure
    numpy baseline T.81 codec: Huffman entropy decode, dequantize,
    8×8 IDCT, YCbCr→RGB) into genuine signal/pixel features. No stub
    anywhere in this path; bounded to 200 assets because the point is
    the decode tier, not volume."""
    from datawarehouse1_spark.multimodal.codecs import stdlib_decode

    docs = table(spark, sf_dir, "documents").filter("doc_id < 200")
    assets = synthesize_media_assets(docs)
    return stringify_array_cols(extract_features(assets, decode_fn=stdlib_decode))


@declared(
    "q_multimodal_mp4_demux",
    oracle="""
    SELECT doc_id AS asset_id,
           'mp4v' AS codec,
           CAST(5 + doc_id % 10 AS BIGINT) AS n_samples,
           CAST(floor((5 + doc_id % 10 + 3) / 4.0) AS BIGINT) AS n_keyframes,
           CAST(40 * (5 + doc_id % 10) AS BIGINT) AS duration_ms,
           CAST((5 + doc_id % 10) * (20 + doc_id % 50) AS BIGINT)
             AS total_sample_bytes
    FROM documents
    WHERE doc_id < 300
    """,
)
def q_multimodal_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 demux, hash-matched: containers are synthesized with
    closed-form sample tables (multimodal/binary_columns.py::
    synthesize_video_assets), then the pure-stdlib ISO-BMFF demuxer
    (multimodal/mp4.py) recovers sample/keyframe counts, duration, and
    encoded-byte totals by actually walking stts/stsz/stsc/stco/stss —
    while DuckDB computes the same numbers from the generating formulas.
    A parser bug anywhere in the box walk shows up as a value mismatch,
    not a rows-only shrug. Bounded to 300 assets; the payload crosses
    Arrow once per asset and never shuffles."""
    from datawarehouse1_spark.multimodal.binary_columns import (
        demux_stats,
        synthesize_video_assets,
    )

    docs = table(spark, sf_dir, "documents").filter("doc_id < 300")
    return demux_stats(synthesize_video_assets(docs))


@declared("q_multimodal_frame_sample", oracle=None)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out: one row per sampled frame."""
    assets = synthesize_assets_from_documents(
        table(spark, sf_dir, "documents")
    ).filter("modality = 'video'").limit(50)
    return stringify_array_cols(frame_sample(assets, every_ms=5000))
