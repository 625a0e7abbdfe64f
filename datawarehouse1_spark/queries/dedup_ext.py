"""North-star dedup extension queries: the approximate tiers (MinHash LSH,
SimHash). Rows-only checks — bucket/bit layouts are engine-specific — but
deterministic across runs (fixed seeds); tests/test_dedup.py asserts their
recall against the exact-Jaccard baseline (q_dedup_ngram_jaccard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_dedup,
)
from datawarehouse1_spark.registry import declared


@declared("q_dedup_minhash_lsh", oracle=None)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs over documents augmented with exact
    duplicates (so collisions exist at any SF): banded signature buckets
    generate candidates, exact Jaccard verifies."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = d.unionByName(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    return minhash_lsh_pairs(
        staged, num_hashes=16, bands=4, shingle_n=3, jaccard_threshold=0.5
    )


@declared("q_dedup_simhash", oracle=None)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints with keeper/copy marking over documents plus
    injected exact dupes."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = d.unionByName(
        d.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    return simhash_dedup(staged)
