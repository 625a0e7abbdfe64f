"""Round-10 text/curation, batch 10: script-class charset profile,
header/footer boilerplate detection, and deterministic k-fold split
balance.

* **Charset profile** — per-source character composition (ASCII
  letters, digits, spaces, CJK, Cyrillic, other) in exact floored
  micro-shares: the routing signal for script-specific tokenizers and
  the "mojibake / wrong-language ingest" tripwire.  A fixed
  multi-script suffix is staged onto every 7th doc so the CJK and
  Cyrillic classes are non-vacuous at any SF.

* **Boilerplate snippets** — repeated HEADER/FOOTER token windows per
  source (the CCNet/RefinedWeb boilerplate-strip precursor): a 5-token
  prefix/suffix snippet shared by >= 3 docs and >= 10% of its source
  is boilerplate a stripper should remove before dedup inflates on
  it.  A fixed footer is staged onto every 3rd doc so detection is
  non-vacuous.  This is the per-source high-frequency report —
  distinct from q_dedup_paragraphs, which globally dedups exact
  paragraph copies.

* **K-fold split** — fold = md5-derived 24-bit key mod 5 (pure
  function of doc identity — the q_split_train_holdout discipline),
  reported as the (fold, lang) balance matrix with per-lang shares:
  the stratification-quality check cross-validation assumes.

Reference parity: the reference ETL (etl/app.py) has no text surface;
SURVEY.md §2D curation extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

# ---------------------------------------------------------------- 1.

# staged multi-script suffix (identical literal in both twins)
_ML_SUFFIX = " 世界汉字 русский мир 12345."

# character classes counted as length(t) - length(regexp_replace(t, cls, ''))
# NOTE: '[ ]' not '\\s' — Java \\s includes \\x0B, RE2's does not.
_CLASSES = (
    ("alpha", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("space", "[ ]"),
    ("cjk", r"[\x{4e00}-\x{9fff}]"),
    ("cyr", r"[\x{0400}-\x{04ff}]"),
)


def _duck_counts() -> str:
    return ", ".join(
        f"SUM(length(text) - length(regexp_replace(text, '{pat}', '', 'g')))"
        f" AS c_{name}"
        for name, pat in _CLASSES
    )


@declared(
    "q_text_charset_profile",
    oracle=f"""
    WITH base AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT source, text || '{_ML_SUFFIX}' AS text
      FROM documents WHERE doc_id % 7 = 0
    ),
    agg AS (
      SELECT source, COUNT(*) AS n_docs, SUM(length(text)) AS total,
             {_duck_counts()}
      FROM base GROUP BY source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total AS BIGINT) AS n_chars,
           CAST(c_alpha * 1000000 // total AS BIGINT) AS alpha_e6,
           CAST(c_digit * 1000000 // total AS BIGINT) AS digit_e6,
           CAST(c_space * 1000000 // total AS BIGINT) AS space_e6,
           CAST(c_cjk * 1000000 // total AS BIGINT) AS cjk_e6,
           CAST(c_cyr * 1000000 // total AS BIGINT) AS cyr_e6,
           CAST((total - c_alpha - c_digit - c_space - c_cjk - c_cyr)
                * 1000000 // total AS BIGINT) AS other_e6
    FROM agg
    """,
)
def q_text_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source script-class character shares in floored micro-units:
    ASCII letters/digits/spaces, CJK (U+4E00..9FFF), Cyrillic
    (U+0400..04FF), and the exact remainder ('other' is total minus
    the named classes, so the six counts partition every character —
    closure law pinned).  Character counting is length-difference
    after class removal — identical codepoint semantics in Java regex
    and RE2 for these explicit ranges (the '[ ]' class dodges the
    Java-vs-RE2 \\s divergence on \\x0B).  Plan: one scan, narrow
    per-doc counts, a single bounded per-source exchange."""
    d = table(spark, sf_dir, "documents")
    base = d.select("source", "text").unionByName(
        d.filter(F.col("doc_id") % 7 == 0).select(
            "source", F.concat(F.col("text"), F.lit(_ML_SUFFIX)).alias("text")
        )
    )
    counts = [
        F.sum(
            F.length("text")
            - F.length(F.regexp_replace("text", pat, ""))
        ).alias(f"c_{name}")
        for name, pat in _CLASSES
    ]
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total"),
        *counts,
    )
    named = [
        F.expr(f"c_{name} * 1000000 div total").cast("long").alias(f"{name}_e6")
        for name, _ in _CLASSES
    ]
    return agg.select(
        "source",
        "n_docs",
        F.col("total").cast("long").alias("n_chars"),
        *named,
        F.expr(
            "(total - c_alpha - c_digit - c_space - c_cjk - c_cyr)"
            " * 1000000 div total"
        )
        .cast("long")
        .alias("other_e6"),
    )


# ---------------------------------------------------------------- 2.

_FOOTER = "subscribe to our newsletter today"


@declared(
    "q_curation_boilerplate_snippets",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' {_FOOTER}' ELSE text END AS text
      FROM documents
    ),
    toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS tk
      FROM base
    ),
    snips AS (
      SELECT source, 'header' AS kind,
             concat_ws(' ', tk[1], tk[2], tk[3], tk[4], tk[5]) AS snippet
      FROM toks WHERE len(tk) >= 10
      UNION ALL
      SELECT source, 'footer' AS kind,
             concat_ws(' ', tk[-5], tk[-4], tk[-3], tk[-2], tk[-1]) AS snippet
      FROM toks WHERE len(tk) >= 10
    ),
    src AS (SELECT source, COUNT(*) AS n_src_docs FROM base GROUP BY source),
    freq AS (
      SELECT source, kind, snippet, COUNT(*) AS n_docs
      FROM snips GROUP BY source, kind, snippet
    )
    SELECT f.source, f.kind, f.snippet,
           CAST(f.n_docs AS BIGINT) AS n_docs,
           CAST(f.n_docs * 1000000 // s.n_src_docs AS BIGINT) AS share_e6
    FROM freq f JOIN src s ON f.source = s.source
    WHERE f.n_docs >= 3
      AND f.n_docs * 1000000 // s.n_src_docs >= 100000
    """,
)
def q_curation_boilerplate_snippets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeated header/footer detection per source: the first and last
    5-token windows of each doc (docs with >= 10 tokens, so the two
    windows never overlap) are candidate boilerplate; a snippet
    appearing in >= 3 docs AND >= 10% of its source is reported with
    its doc count and floored micro-share.  Every 3rd doc is staged
    with a fixed appended footer so detection is non-vacuous at any
    SF.  This is the strip-before-dedup report (boilerplate inflates
    every similarity tier); q_dedup_paragraphs is the orthogonal
    global exact-paragraph dedup.  Plan: one scan; narrow (source,
    kind, snippet) tuples through one bounded aggregate; per-source
    doc totals broadcast."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" " + _FOOTER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    tk = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    toks = base.select("source", tk.alias("tk")).filter(F.size("tk") >= 10)
    snips = toks.select(
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit("header").alias("kind"),
                    F.array_join(F.slice("tk", 1, 5), " ").alias("snippet"),
                ),
                F.struct(
                    F.lit("footer").alias("kind"),
                    F.array_join(F.slice("tk", -5, 5), " ").alias("snippet"),
                ),
            )
        ).alias("s"),
    ).select("source", "s.kind", "s.snippet")
    src = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_src_docs"))
    freq = snips.groupBy("source", "kind", "snippet").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        freq.join(F.broadcast(src), "source")
        .withColumn(
            "share_e6",
            F.expr("n_docs * 1000000 div n_src_docs").cast("long"),
        )
        .filter((F.col("n_docs") >= 3) & (F.col("share_e6") >= 100000))
        .select("source", "kind", "snippet", "n_docs", "share_e6")
    )


# ---------------------------------------------------------------- 3.

# 24-bit md5 key (shared Spark/DuckDB text from functions/checksum.py),
# then mod 5: bias is 2^24 mod 5 = 1 part in 16.7M — negligible and
# deterministic
from datawarehouse1_spark.functions.checksum import hexn_to_int_sql

_KEY24 = hexn_to_int_sql("md5(CAST(doc_id AS {S}))", 6)


@declared(
    "q_split_kfold_assign",
    oracle=f"""
    WITH folded AS (
      SELECT doc_id, lang, n_chars,
             {_KEY24.format(S='VARCHAR')} % 5 AS fold
      FROM documents
    ),
    cell AS (
      SELECT fold, lang, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
      FROM folded GROUP BY fold, lang
    )
    SELECT CAST(fold AS INT) AS fold, lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_docs * 1000000
                // SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
             AS share_in_lang_e6
    FROM cell
    """,
)
def q_split_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment: fold =
    md5-derived 24-bit key mod 5 — a pure function of doc identity
    (the q_split_train_holdout discipline: reruns, engines, and
    retried tasks agree; adding docs never moves existing ones) —
    reported as the (fold, lang) balance matrix with each cell's
    floored micro-share of its language.  The stratification-quality
    read: a fold whose share strays far from 200000 flags a skewed
    split.  Plan: one scan, one bounded (fold, lang) aggregate; the
    share window runs on the bounded cell table."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    folded = d.select(
        "lang",
        "n_chars",
        (F.expr(_KEY24.format(S="STRING")) % 5).alias("fold"),
    )
    cell = folded.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    w = Window.partitionBy("lang")
    return cell.select(
        F.col("fold").cast("int").alias("fold"),
        "lang",
        "n_docs",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.expr("n_docs * 1000000")
        .cast("long")
        .alias("_num"),
        F.sum("n_docs").over(w).alias("_den"),
    ).select(
        "fold",
        "lang",
        "n_docs",
        "n_chars",
        F.expr("_num div _den").cast("long").alias("share_in_lang_e6"),
    )


# ---------------------------------------------------------------- 4.

_VOCAB_K = 1000


@declared(
    "q_docs_oov_rate",
    oracle=f"""
    WITH toks AS (
      SELECT source, token, COUNT(*) AS c
      FROM (SELECT source,
                   unnest(list_filter(
                     string_split_regex(lower(text), '\\s+'),
                     t -> t <> '')) AS token
            FROM documents)
      GROUP BY source, token
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token,
               ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, token) AS r
        FROM toks GROUP BY token
      ) WHERE r <= {_VOCAB_K}
    )
    SELECT t.source,
           CAST(SUM(t.c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN t.c ELSE 0 END)
                AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.token IS NULL THEN t.c ELSE 0 END)
                * 1000000 // SUM(t.c) AS BIGINT) AS oov_share_e6
    FROM toks t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.source
    """,
)
def q_docs_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus' own
    top-1000 (_VOCAB_K) token vocabulary (rank by count desc, ties by token
    asc — a total order, so the vocabulary is value-deterministic):
    the share of token OCCURRENCES falling outside the head — the
    rare-word / domain-drift signal beside the TVD divergence report
    (q_text_source_divergence measures distribution distance; this
    measures tail mass).  Plan: the (source, token) count table is the
    single fact aggregate and localCheckpoints (rule 12) to feed BOTH
    the global vocabulary roll-up and the per-source OOV join; the
    vocabulary is a bounded TakeOrderedAndProject broadcast; floored
    micro-units."""
    d = table(spark, sf_dir, "documents")
    tok = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    toks = (
        d.select("source", F.explode(tok).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), "token")
        .limit(_VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "token", "left_outer")
    oov_c = F.when(F.col("in_vocab").isNull(), F.col("c")).otherwise(F.lit(0))
    return joined.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(oov_c).cast("long").alias("n_oov"),
        F.expr(
            "SUM(CASE WHEN in_vocab IS NULL THEN c ELSE 0 END)"
            " * 1000000 div SUM(c)"
        )
        .cast("long")
        .alias("oov_share_e6"),
    )
