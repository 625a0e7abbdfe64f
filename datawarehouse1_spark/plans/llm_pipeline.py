"""Composed training-data curation plan — the north-star extension
surface in ONE pipeline: quality-filter -> exact dedup -> curated corpus
manifest. (The reference's analog is its whole reason-for-being: land
raw files, validate, keep the clean rows — etl/app.py:144-232 — here
re-expressed over documents at corpus scale.)

Plan shape: one scan of documents; quality scoring is pure narrow
expressions (no shuffle); the only shuffle is the dedup hash-groupBy,
and only (fingerprint, doc_id, small stats) cross it — never document
bodies. The near-dup (MinHash) and embedding stages chain after this
manifest in the non-oracle scale path (operators/dedup.py,
operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

MIN_TOKENS, MAX_TOKENS = 10, 100_000
MIN_CPT, MAX_CPT = 3.0, 12.0  # chars per token


@declared(
    "q_llm_curation_pipeline",
    oracle=rf"""
    WITH scored AS (
      SELECT doc_id, lang, length(text) AS n_chars,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                 t -> t <> '')) AS n_tokens,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    ),
    quality AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
        AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN {MIN_CPT} AND {MAX_CPT}
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY fp) AS n_copies
      FROM quality
    )
    SELECT doc_id, lang, n_chars, n_tokens, fp, n_copies
    FROM ranked WHERE rn = 1
    """,
)
def q_llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-corpus manifest: quality gate (token count + chars/token
    band) then exact dedup keeping the lowest doc_id per fingerprint,
    recording how many copies each keeper represents."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    scored = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.md5(normalized).alias("fp"),
    )
    quality = scored.filter(
        F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
        & (F.col("n_chars").cast("double") / F.col("n_tokens")).between(
            MIN_CPT, MAX_CPT
        )
    )
    w = Window.partitionBy("fp")
    ranked = quality.withColumn(
        "rn", F.row_number().over(w.orderBy("doc_id"))
    ).withColumn("n_copies", F.count(F.lit(1)).over(w))
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id", "lang", "n_chars", "n_tokens", "fp", "n_copies"
    )


def _mixture_threshold_sql() -> str:
    from datawarehouse1_spark.queries.dedup_ext import MIXTURE_RATES

    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in MIXTURE_RATES.items()
    )
    return f"CASE lang {whens} ELSE '00000000' END"


def _pipeline_v2_oracle() -> str:
    return rf"""
    WITH scored AS (
      SELECT doc_id, lang, length(text) AS n_chars,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                 t -> t <> '')) AS n_tokens,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    ),
    quality AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
        AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN {MIN_CPT} AND {MAX_CPT}
    ),
    keepers AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ),
    sampled AS (
      SELECT * FROM keepers
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              <= {_mixture_threshold_sql()}
    ),
    packed AS (
      SELECT lang, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0)
                  AS BIGINT) AS chunk_id
      FROM sampled
    )
    SELECT lang, chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY lang, chunk_id
    """


@declared("q_llm_pipeline_packed", oracle=_pipeline_v2_oracle())
def q_llm_pipeline_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline ending in training sequences: quality
    gate -> exact-dedup keepers -> per-language hash-mixture sampling ->
    concat-and-chunk 2048-token packing -> per-(lang, chunk) manifest.
    Composes q_llm_curation_pipeline + q_sample_hash_mixture +
    q_curation_pack_chunks into ONE plan: a single documents scan, the
    dedup window's fp shuffle, then the per-lang pack sort — bodies
    never shuffle, every stage is engine-stable (md5 prefixes, integer
    token counts, unique-key ordering)."""
    from datawarehouse1_spark.queries.dedup_ext import MIXTURE_RATES

    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    scored = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.md5(normalized).alias("fp"),
    )
    quality = scored.filter(
        F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
        & (F.col("n_chars").cast("double") / F.col("n_tokens")).between(
            MIN_CPT, MAX_CPT
        )
    )
    keepers = (
        quality.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    threshold = F.lit("00000000")
    for k, v in MIXTURE_RATES.items():
        threshold = F.when(F.col("lang") == k, F.lit(v)).otherwise(threshold)
    sampled = keepers.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) <= threshold
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = sampled.select(
        "lang",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0
        ).cast("long").alias("chunk_id"),
    )
    return packed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
