"""Text-analysis queries over `documents` (SURVEY.md C21 + north-star
extensions): tokenize/word-count, token stats & quality scoring,
language-ID scoring, fingerprinting, exact-hash dedup.

All JVM-side expressions (split/explode/regexp/md5) — the hot path stays
in whole-stage codegen; no Python in any of these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.arrays import word_ngrams
from datawarehouse1_spark.functions.text_tokens import BPE_ISH_PATTERN
from datawarehouse1_spark.registry import declared

# the pattern contains contraction apostrophes: escape for SQL literals
_BPE_SQL = BPE_ISH_PATTERN.replace("'", "''")

# Tiny English stopword list for quality scoring (deterministic, shared
# verbatim with the SQL oracle).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


# --- C21: tokenize + word count (the canonical explode/groupBy) ---
@declared(
    "q_text_tokenize_wordcount",
    oracle=r"""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
)
def q_text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- ext: per-document token counting (whitespace tokenizer) ---
@declared(
    "q_text_token_count",
    oracle=r"""
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''))
             AS n_tokens,
           length(text) AS n_chars
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget accounting for a training-data pipeline: cheap
    whitespace tokens per doc (the BPE-ish GPT-2-style pre-tokenizer is
    functions/text_tokens.py, counted by q_text_bpe_token_count)."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


# --- ext: quality scoring (length / stopword-ratio / mean token length) ---
@declared(
    "q_text_quality_score",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, length(text) AS n_chars,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tokens
      FROM documents
    )
    SELECT doc_id, n_chars,
           len(tokens) AS n_tokens,
           len(list_filter(tokens,
               t -> list_contains({list(STOPWORDS)!r}, t))) AS n_stopwords,
           CAST(len(list_filter(tokens,
               t -> list_contains({list(STOPWORDS)!r}, t))) AS DOUBLE)
             / len(tokens) AS stopword_ratio,
           CAST(n_chars AS DOUBLE) / len(tokens) AS chars_per_token,
           (len(tokens) BETWEEN 10 AND 100000)
             AND (CAST(n_chars AS DOUBLE) / len(tokens) BETWEEN 3.0 AND 12.0)
             AS quality_ok
    FROM toks
    WHERE len(tokens) > 0
    """,
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality gates: doc length, stopword ratio,
    mean token length — the pre-training filter battery, all as codegen'd
    array expressions."""
    d = table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    out = (
        d.select("doc_id", F.length("text").alias("n_chars"), toks.alias("tokens"))
        .filter(F.size("tokens") > 0)
        .select(
            "doc_id",
            "n_chars",
            F.size("tokens").alias("n_tokens"),
            F.size(F.filter("tokens", lambda t: F.array_contains(stop, t))).alias(
                "n_stopwords"
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.col("n_stopwords").cast("double") / F.col("n_tokens"),
        )
        .withColumn(
            "chars_per_token", F.col("n_chars").cast("double") / F.col("n_tokens")
        )
        .withColumn(
            "quality_ok",
            F.col("n_tokens").between(10, 100000)
            & F.col("chars_per_token").between(3.0, 12.0),
        )
    )
    return out


# --- ext: language-ID scoring (stopword-hit heuristic) ---
@declared(
    "q_text_lang_score",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tokens
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(list_filter(tokens,
                t -> list_contains({list(STOPWORDS)!r}, t))) AS DOUBLE)
             / len(tokens) AS en_score,
           CAST(len(list_filter(tokens,
                t -> list_contains({list(STOPWORDS)!r}, t))) AS DOUBLE)
             / len(tokens) >= 0.05 AS looks_english
    FROM toks WHERE len(tokens) > 0
    """,
)
def q_text_lang_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic (the testdata text is synthetic
    word salad, so the interesting part is the deterministic scoring
    plumbing; a real corpus would carry per-language marker lists)."""
    d = table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    scored = (
        d.select("doc_id", "lang", toks.alias("tokens"))
        .filter(F.size("tokens") > 0)
        .select(
            "doc_id",
            "lang",
            (
                F.size(F.filter("tokens", lambda t: F.array_contains(stop, t))).cast(
                    "double"
                )
                / F.size("tokens")
            ).alias("en_score"),
        )
        .withColumn("looks_english", F.col("en_score") >= 0.05)
    )
    return scored


# --- ext: document fingerprinting (normalized md5) + exact-hash dedup ---
@declared(
    "q_text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize (lower, trim, collapse whitespace) then md5 — the content
    fingerprint used by the exact-dedup path; md5 hex matches DuckDB's."""
    d = table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


@declared(
    "q_dedup_exact_hash",
    oracle=r"""
    WITH staged AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
    ),
    hashed AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM staged
    )
    SELECT fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM hashed GROUP BY fp
    """,
)
def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at scale: hash-groupBy on the md5 fingerprint, keep the
    smallest doc_id. Only (hash, id) pairs cross the shuffle — not the
    document bodies — which is what survives 100 TB."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = d.unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        staged.select("doc_id", F.md5(normalized).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- ext: n-gram (shingle) Jaccard near-dup on a bounded pair set ---
@declared(
    "q_dedup_ngram_jaccard",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 40
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text || ' zebra quill oxcart' AS text
      FROM documents WHERE doc_id < 40 AND doc_id % 3 = 0
    ),
    shingled AS (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingles
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')
                     AS toks
            FROM base)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))) AS jaccard
    FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
    WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
      AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))) >= 0.1
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-word shingle Jaccard similarity, exact, on a bounded doc subset
    (pairwise is O(n²) — this is the small-scale oracle twin; the scale
    path is MinHash+LSH in operators/dedup.py, rows-only checked).

    The synthetic word salad in testdata has no organic near-dup pairs at
    threshold 0.1, so (like q_dedup_exact_hash) every 3rd subset doc is
    staged again with a 3-token suffix — a guaranteed ~0.9-Jaccard
    near-dup — making the oracle comparison non-vacuous at any SF."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    base = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zebra quill oxcart")).alias("text"),
        )
    )
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    docs = base.select("doc_id", toks.alias("toks"))
    # zip_with chain (functions/arrays.py::word_ngrams): same strings
    # as the oracle's range()+concat_ws, empty below 3 tokens (the slice
    # length clamps to 0, matching range(1, greatest(len-2,0)+1)).
    shingles = F.array_distinct(word_ngrams(F.col("toks"), 3))
    sh = docs.select("doc_id", shingles.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union_sz = F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")) - inter
    jac = inter.cast("double") / union_sz
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
    )


# --- ext: group-wise top-k curation (keep best N docs per language) ---
@declared(
    "q_curation_topk_per_lang",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS tokens
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(tokens,
                  t -> list_contains({list(STOPWORDS)!r}, t))) AS DOUBLE)
               / len(tokens) AS score
      FROM toks WHERE len(tokens) > 0
    )
    SELECT lang, doc_id, score,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY score DESC, doc_id) AS rk
    FROM scored
    QUALIFY rk <= 20
    """,
)
def q_curation_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation: keep the best-scoring N documents per
    language bucket — the group-wise top-k that follows quality scoring
    in a pre-training pipeline ("best 10% per language/domain"). One
    window over (lang) with a deterministic double score (stopword-hit
    ratio) and doc_id tiebreak; at 100 TB the rank shuffle carries only
    (lang, doc_id, score), never document bodies, and per-lang
    partitions rank independently."""
    d = table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    scored = (
        d.select("doc_id", "lang", toks.alias("tokens"))
        .filter(F.size("tokens") > 0)
        .select(
            "doc_id",
            "lang",
            (
                F.size(F.filter("tokens", lambda t: F.array_contains(stop, t)))
                .cast("double") / F.size("tokens")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", "score", "rk")
    )


# --- ext: BPE-ish pre-tokenizer budget accounting (r6) ---
@declared(
    "q_text_bpe_token_count",
    oracle=rf"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_bpeish,
           len(list_filter(string_split_regex(lower(text), '\s+'),
                           t -> t <> '')) AS n_ws,
           CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS DOUBLE)
             / greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
                                        t -> t <> '')), 1) AS bpeish_per_word
    FROM documents
    """,
)
def q_text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting with the GPT-2-style pre-tokenizer
    (functions/text_tokens.py: contractions / letter runs / digit runs /
    punctuation runs — RE2-safe, so Spark's Java regex and DuckDB's RE2
    count IDENTICAL token streams and this hash-matches) next to the
    cheap whitespace count; bpeish_per_word is the fertility proxy a
    mixture planner budgets with."""
    from datawarehouse1_spark.functions.text_tokens import bpe_ish_token_count

    d = table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    return d.select(
        "doc_id",
        bpe_ish_token_count("text").alias("n_bpeish"),
        F.size(ws).alias("n_ws"),
        (
            bpe_ish_token_count("text").cast("double")
            / F.greatest(F.size(ws), F.lit(1))
        ).alias("bpeish_per_word"),
    )
