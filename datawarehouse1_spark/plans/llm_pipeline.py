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
