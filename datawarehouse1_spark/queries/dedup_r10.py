"""Round-10 dedup: asymmetric shingle CONTAINMENT — the subset-dup
tier Jaccard misses.

A short document pasted inside a long one has tiny Jaccard (the union
is dominated by the long doc) but containment(short -> long) = 1.0:
containment(a -> b) = |shingles(a) ∩ shingles(b)| / |shingles(a)|.
This is the near-SUBSET tier of the dedup battery (Lee et al.'s
suffix-array work targets the same failure mode at substring
granularity; this is its shingle-set form).

The Spark side generates candidates by the shingle EQUI-join — exact
by construction (any pair with containment > 0 shares at least one
shingle, so the equi-join enumerates every qualifying pair; the
grouped match count IS |intersection| because shingle sets are
distinct per doc). No all-pairs product appears in the plan. The
oracle recomputes all-pairs containment from list_intersect on the
same staged base. Like q_dedup_ngram_jaccard (queries/text.py), the
exact tier runs on a bounded doc subset with staged subset-dups (a
10-token PREFIX of every 4th doc — guaranteed containment 1.0) so the
comparison is non-vacuous at any SF; the production-scale form is the
MinHash/LSH incremental battery in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.arrays import word_ngrams
from datawarehouse1_spark.registry import declared


@declared(
    "q_dedup_containment_subset",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 40
      UNION ALL
      SELECT doc_id + 20000 AS doc_id,
             array_to_string(
               (list_filter(string_split_regex(lower(text), '\s+'),
                            t -> t <> ''))[1:10], ' ') AS text
      FROM documents WHERE doc_id < 40 AND doc_id % 4 = 0
    ),
    shingled AS (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(toks) - 2, 0) + 1),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
               AS shingles
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t <> '') AS toks
            FROM base)
    )
    SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT)
             AS n_common,
           CAST(len(a.shingles) AS BIGINT) AS n_src_shingles,
           CAST(len(list_intersect(a.shingles, b.shingles)) * 1000000
                // len(a.shingles) AS BIGINT) AS containment_e6
    FROM shingled a JOIN shingled b ON a.doc_id <> b.doc_id
    WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
      AND len(list_intersect(a.shingles, b.shingles)) * 1000000
            // len(a.shingles) >= 800000
    """,
)
def q_dedup_containment_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-word-shingle containment pairs at threshold 0.8:
    (src, dst) where at least 80% of src's distinct shingles also
    appear in dst — the subset-duplicate report (a doc that is a
    near-prefix/excerpt of another). Candidates come from the shingle
    EQUI-join (exact: containment > 0 implies a shared shingle;
    distinct shingles make the per-pair match count the intersection
    size); per-doc shingle counts broadcast; both `div` operands are
    positive so the floors agree. Every 4th subset doc is staged again
    as its own 10-token prefix — a guaranteed containment-1.0 subset
    pair — keeping the oracle comparison non-vacuous at any SF."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    prefix_text = F.array_join(F.slice(toks, 1, 10), " ")
    base = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            prefix_text.alias("text"),
        )
    )
    shingles = F.array_distinct(word_ngrams(toks, 3))
    # the bounded staged table (<= 50 rows) feeds BOTH join sides and
    # the count broadcast; localCheckpoint runs the corpus scan +
    # tokenize ONCE instead of once per consumer (SCALE.md rule 12 —
    # measured 11.7 s -> ~2 s at the staged 10x dir, where the fat
    # single-file text scan would otherwise re-decode serially 3x)
    sh = (
        base.select("doc_id", shingles.alias("shingles"))
        .filter(F.size("shingles") > 0)
        .localCheckpoint(eager=True)
    )
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("src_doc"),
            F.col("b.doc_id").alias("dst_doc"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    counts = sh.select(
        F.col("doc_id").alias("src_doc"),
        F.size("shingles").cast("long").alias("n_src_shingles"),
    )
    return (
        pairs.join(F.broadcast(counts), "src_doc")
        .withColumn(
            "containment_e6",
            F.expr("n_common * 1000000 div n_src_shingles").cast("long"),
        )
        .filter(F.col("containment_e6") >= 800_000)
        .select(
            "src_doc", "dst_doc", "n_common", "n_src_shingles",
            "containment_e6",
        )
    )
