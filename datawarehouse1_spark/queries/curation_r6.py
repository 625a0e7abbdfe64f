"""Round-6 curation operators — the steps a web-scale training-data
pipeline runs between raw extraction and tokenization:

  q_dedup_paragraphs    paragraph-level first-occurrence dedup
                        (the RefinedWeb/CCNet step) + per-doc reassembly
  q_text_pii_redact     email/phone/IPv4 detection + masking
  q_text_bigram_novelty LM-lite quality gate: fraction of bigrams
                        outside the corpus frequent-bigram vocabulary
  q_bpe_learn_merges    distributed BPE tokenizer TRAINING (first 3
                        merge rounds, Sennrich et al. 2016)
  q_bpe_apply_encode    the trained tokenizer APPLIED: per-doc
                        post-merge token counts

The dedup/PII queries stage their inputs deterministically IN BOTH
ENGINES (the documents testdata is single-paragraph word salad with no
PII, so un-staged versions would be vacuous — the same twin-staging
convention as dedup_ext.py). Reference parity: the reference ETL
(etl/app.py) has no text-curation surface; this belongs to the
LLM-pipeline extension inventory (SURVEY.md §2D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

# Boilerplate lines injected as the shared duplicate mass: every web
# corpus is full of these, and paragraph dedup exists to strip them.
_BOILER = (
    "subscribe to our newsletter for updates",
    "all rights reserved by the site owner",
    "click here to accept cookies and continue",
)


def _staged_paragraphs(docs: DataFrame) -> DataFrame:
    """(doc_id, para_idx, para): 3 paragraphs per doc — two doc-text
    slices around one boilerplate line chosen by doc_id % 3. The same
    construction is written in SQL inside the oracles below; both
    engines must see byte-identical paragraphs."""
    boiler = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_BOILER[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_BOILER[1]))
        .otherwise(F.lit(_BOILER[2]))
    )
    paras = F.array(
        F.substring("text", 1, 60),
        boiler,
        F.substring("text", 61, 60),
    )
    return docs.select(
        "doc_id", F.posexplode(paras).alias("para_idx", "para")
    ).filter(F.trim("para") != "")


_PARAS_SQL = """
      SELECT doc_id, para_idx, para
      FROM (
        SELECT doc_id,
               unnest(ARRAY[
                 substr(text, 1, 60),
                 CASE doc_id % 3
                   WHEN 0 THEN 'subscribe to our newsletter for updates'
                   WHEN 1 THEN 'all rights reserved by the site owner'
                   ELSE 'click here to accept cookies and continue'
                 END,
                 substr(text, 61, 60)
               ]) AS para,
               unnest([0, 1, 2]) AS para_idx
        FROM documents
      )
      WHERE trim(para) <> ''
"""


@declared(
    "q_dedup_paragraphs",
    oracle=f"""
    WITH paras AS ({_PARAS_SQL}),
    ranked AS (
      SELECT doc_id, para_idx, para,
             row_number() OVER (
               PARTITION BY regexp_replace(lower(trim(para)), '\\s+', ' ', 'g')
               ORDER BY doc_id, para_idx) AS rn
      FROM paras
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
           coalesce(
             string_agg(para, chr(10) ORDER BY para_idx)
               FILTER (WHERE rn = 1),
             '') AS kept_text
    FROM ranked
    GROUP BY doc_id
    """,
)
def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (the RefinedWeb/CCNet step): split
    each document into paragraphs, keep only the GLOBALLY first
    occurrence of each normalized paragraph (ordered by doc_id then
    position), and reassemble the surviving text per document.

    Scale posture: paragraphs shuffle once, keyed by their normalized
    form, to elect the keeper (groupBy-min of the (doc_id, para_idx)
    struct — partial aggregation absorbs hot boilerplate keys map-side,
    and AQE skew-join splits them on the join-back); at 100 TB you'd
    key by a 128-bit hash of the paragraph so
    only (hash, doc_id, idx) triples shuffle in the election — the
    election join back to occurrences then carries the winner ids, and
    the reassembly groupBy is per-doc (co-partitioned with the explode's
    source). No driver-side state, no all-pairs step anywhere."""
    paras = _staged_paragraphs(table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("para")), r"\s+", " ")
    occ = paras.withColumn("norm", norm)
    keepers = occ.groupBy("norm").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("first_occ")
    )
    kept_flag = occ.join(keepers, "norm").withColumn(
        "is_kept",
        (F.col("doc_id") == F.col("first_occ.doc_id"))
        & (F.col("para_idx") == F.col("first_occ.para_idx")),
    )
    return kept_flag.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.count(F.when(F.col("is_kept"), 1)).alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_kept"),
                                F.struct("para_idx", "para"),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                "\n",
            ),
            F.lit(""),
        ).alias("kept_text"),
    )


# PII staged into the text as closed-form functions of doc_id: an email,
# a phone, and an IPv4 — the three canonical scrub targets. Patterns are
# written in the common subset of Java regex (Spark) and RE2 (DuckDB).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"
_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_PII_TEXT_SQL = """
      text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@mail.example.com or call 555-0'
           || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
           || ' node 10.' || CAST(doc_id % 200 AS VARCHAR)
           || '.' || CAST((doc_id * 7) % 250 AS VARCHAR) || '.25 end'
"""


@declared(
    "q_text_pii_redact",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, {_PII_TEXT_SQL} AS pii_text FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(pii_text, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(pii_text, '{_IPV4_RE}')) AS BIGINT)
             AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(pii_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
             '{_IPV4_RE}', '<IP>', 'g') AS redacted
    FROM staged
    """,
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (pre-release scrub): count and mask
    emails, phone numbers, and IPv4 addresses with JVM-side regexes.
    The staged text embeds one of each as closed-form functions of
    doc_id, so the redaction is non-vacuous at any SF and both engines
    scrub byte-identical inputs. Narrow per-row projection — no
    shuffle, no Python; at 100 TB this is pure map-side codegen."""
    docs = table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call 555-0"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit(" node 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 250).cast("string"),
        F.lit(".25 end"),
    )
    staged = docs.select("doc_id", pii_text.alias("pii_text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("pii_text", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IPV4_RE,
        "<IP>",
    )
    return staged.select(
        "doc_id",
        F.regexp_count("pii_text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("pii_text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_count("pii_text", F.lit(_IPV4_RE)).alias("n_ips"),
        redacted.alias("redacted"),
    )


@declared(
    "q_text_bigram_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')
               AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                            i -> concat_ws(' ', t[i], t[i+1])) AS bgs
      FROM toks WHERE len(t) >= 2
    ),
    exploded AS (
      SELECT doc_id, len(bgs) AS n_bigrams, unnest(bgs) AS bg FROM grams
    ),
    vocab AS (
      SELECT bg FROM exploded GROUP BY bg HAVING COUNT(*) >= 3
    )
    SELECT e.doc_id,
           CAST(e.n_bigrams AS BIGINT) AS n_bigrams,
           CAST(count(*) FILTER (WHERE v.bg IS NULL) AS BIGINT) AS n_novel,
           CAST(floor(count(*) FILTER (WHERE v.bg IS NULL)
                      * 1000000.0 / e.n_bigrams) AS BIGINT) AS novelty_e6
    FROM exploded e LEFT JOIN vocab v ON e.bg = v.bg
    GROUP BY e.doc_id, e.n_bigrams
    """,
)
def q_text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-novelty quality signal (LM-lite perplexity proxy): the
    fraction of a document's bigrams that fall outside the corpus's
    frequent-bigram vocabulary (count >= 3). High novelty flags
    gibberish/OCR noise exactly the way an n-gram LM's high perplexity
    would — but the statistic stays in INTEGER micro-units (count
    ratio, floored), so no cross-engine float accumulation can diverge.

    Scale shape: one bigram-count aggregate builds the vocab (only
    (bigram, partial count) pairs shuffle); per-doc novelty is an
    explode → broadcast-friendly anti-lookup → per-doc count. The
    exploded rows carry (doc_id, bigram) — never document bodies."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    from datawarehouse1_spark.functions.arrays import word_ngrams

    grams = d.select("doc_id", toks.alias("t")).filter(
        F.size("t") >= 2
    ).select("doc_id", word_ngrams(F.col("t"), 2).alias("bgs"))
    exploded = grams.select(
        "doc_id", F.size("bgs").alias("n_bigrams"), F.explode("bgs").alias("bg")
    )
    # one pass: the corpus frequency of each bigram is a window count
    # over the exploded rows (single shuffle keyed on bg), so the
    # explode is computed once instead of feeding both a vocab
    # aggregate and a join back (2.3 s -> one scan at sf0.1)
    from pyspark.sql import Window

    freq = F.count(F.lit(1)).over(Window.partitionBy("bg"))
    flagged = exploded.withColumn("_known", freq >= 3)
    return flagged.groupBy("doc_id", "n_bigrams").agg(
        F.count(F.when(~F.col("_known"), 1)).alias("n_novel")
    ).select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("n_novel").alias("n_novel"),
        F.floor(F.col("n_novel") * 1000000.0 / F.col("n_bigrams"))
        .cast("long")
        .alias("novelty_e6"),
    )


def _bpe_pairs(words: DataFrame) -> DataFrame:
    """(l, r, n): adjacent-symbol pair counts weighted by word count,
    from the wrapped representation ('<s><p><a>...')."""
    s = F.split(
        F.col("repr").substr(F.lit(2), F.length("repr") - 2), "><"
    )
    m = F.greatest(F.size(s) - 1, F.lit(0))
    zipped = F.zip_with(
        F.slice(s, 1, m),
        F.slice(s, 2, m),
        lambda x, y: F.struct(x.alias("l"), y.alias("r")),
    )
    return (
        words.select("cnt", F.explode(zipped).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("n"))
    )


def _learn_merges(words: DataFrame, rounds: int = 3):
    """The shared BPE training loop (used by both the learn and apply
    queries so merge semantics and tie-breaking can never diverge):
    per round, checkpoint the vocabulary-sized word table (keeps
    lineage linear), take the weighted-count argmax pair with
    lexicographic tie-break, and apply the merge corpus-wide via a
    broadcast single-row join. Extra columns on `words` (e.g. the raw
    word) ride along untouched. Returns (words_after, [merge rows])."""
    merges = []
    for i in range(1, rounds + 1):
        words = words.localCheckpoint(eager=True)
        best = (
            _bpe_pairs(words)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
        )
        merges.append(best.select(F.lit(i).alias("rank"), "l", "r", "n"))
        pattern = F.concat(
            F.lit("<"), F.col("l"), F.lit("><"), F.col("r"), F.lit(">")
        )
        merged = F.concat(F.lit("<"), F.col("l"), F.col("r"), F.lit(">"))
        keep = [
            F.replace("repr", pattern, merged).alias("repr")
            if c == "repr"
            else F.col(c)
            for c in words.columns
        ]
        words = words.crossJoin(F.broadcast(best)).select(*keep)
    return words, merges


_BPE_ORACLE = r"""
    WITH words AS (
      SELECT t AS word, COUNT(*) AS cnt FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS t
        FROM documents
      ) GROUP BY t
    ),
    r0 AS (SELECT cnt, regexp_replace(word, '(.)', '<\1>', 'g') AS repr
           FROM words),
    {iters}
    SELECT * FROM (
      SELECT 1 AS rank, l, r, n FROM b1
      UNION ALL SELECT 2, l, r, n FROM b2
      UNION ALL SELECT 3, l, r, n FROM b3
    )
"""

_BPE_ITER = r"""
    s{i} AS (
      SELECT cnt, string_split(substr(repr, 2, length(repr) - 2), '><') AS s
      FROM r{prev}
    ),
    p{i} AS (
      SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS n FROM (
        SELECT cnt, s[j] AS l, s[j+1] AS r
        FROM s{i}, unnest(range(1, greatest(len(s) - 1, 0) + 1)) AS t(j)
      ) GROUP BY l, r
    ),
    b{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1),
    r{i} AS (
      SELECT cnt,
             replace(repr,
                     '<' || (SELECT l FROM b{i}) || '><'
                         || (SELECT r FROM b{i}) || '>',
                     '<' || (SELECT l FROM b{i})
                         || (SELECT r FROM b{i}) || '>') AS repr
      FROM r{prev}
    )
"""


@declared(
    "q_bpe_learn_merges",
    oracle=_BPE_ORACLE.format(
        iters=",\n".join(
            _BPE_ITER.format(i=i, prev=i - 1) for i in (1, 2, 3)
        )
    ),
)
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BPE vocabulary induction — the first 3 merge rounds
    of byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016),
    run as a dataflow: word counts → per-round weighted adjacent-pair
    counts → argmax pair (ties broken lexicographically) → merge
    applied to every word's symbol string. Symbols are wrapped as
    '<s><p>...' so the merge is a plain non-overlapping left-to-right
    replace of '<l><r>' with '<lr>' — identical semantics in Spark's
    replace() and DuckDB's — and the oracle unrolls the same three
    rounds as CTEs. Each round's chosen pair re-enters the plan via a
    broadcast single-row join (no driver collect): at 100 TB only
    (pair, count) rows shuffle per round, never word strings, and the
    word table itself stays partition-parallel through every replace."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    words = (
        d.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "cnt",
            F.regexp_replace("word", "(.)", "<$1>").alias("repr"),
        )
    )
    _, merges = _learn_merges(words)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


@declared(
    "q_bpe_apply_encode",
    oracle=_BPE_ORACLE.format(
        iters=",\n".join(_BPE_ITER.format(i=i, prev=i - 1) for i in (1, 2, 3))
    ).replace(
        """    SELECT * FROM (
      SELECT 1 AS rank, l, r, n FROM b1
      UNION ALL SELECT 2, l, r, n FROM b2
      UNION ALL SELECT 3, l, r, n FROM b3
    )""",
        r"""    , vocab AS (
      SELECT replace(replace(repr, '<', ''), '>', '') AS word,
             len(string_split(substr(repr, 2, length(repr) - 2), '><'))
               AS ntok
      FROM r3
    ),
    doc_words AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS word
      FROM documents
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(v.ntok) AS BIGINT) AS n_bpe_tokens
    FROM doc_words d JOIN vocab v ON v.word = d.word
    GROUP BY d.doc_id""",
    ),
)
def q_bpe_apply_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY side of the trained tokenizer: encode every document with
    the 3 learned BPE merges and report its post-merge token count —
    the number a packing/budgeting pipeline actually consumes. The
    vocabulary (word → merged symbol count) is computed once by the
    same training loop and broadcast back onto the exploded corpus
    words; the oracle replays the identical rounds and joins the same
    way (a word's unmerged spelling is recovered by stripping the
    symbol separators)."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    words = (
        d.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "word",
            "cnt",
            F.regexp_replace("word", "(.)", "<$1>").alias("repr"),
        )
    )
    words, _ = _learn_merges(words)
    vocab = words.select(
        "word",
        F.size(
            F.split(F.col("repr").substr(F.lit(2), F.length("repr") - 2), "><")
        ).alias("ntok"),
    )
    doc_words = d.select("doc_id", F.explode(toks).alias("word"))
    return (
        doc_words.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("ntok").alias("n_bpe_tokens"),
        )
    )


# --- Gopher-style document-shape rules (Rae et al. 2021, appendix A1) ---
# The testdata documents are single-line word salad, so the LINE
# structure is staged deterministically in both engines (same twin
# convention as the paragraph dedup above): three lines per doc — a
# text slice, a slice that doc_id%4 turns into a bullet line ('- ') or
# an ellipsis line ('...'), and a slice that doc_id%5 turns into an
# exact duplicate of line one. Fractions are floored integer
# micro-units and every rule threshold compares integers, so the keep
# verdict cannot diverge on float rendering.
_GOPHER_LINES_SQL = """
      SELECT doc_id,
             list_filter(ARRAY[
               substr(text, 1, 50),
               CASE WHEN doc_id % 4 = 0 THEN '- ' || substr(text, 51, 30)
                    WHEN doc_id % 4 = 1 THEN substr(text, 51, 30) || '...'
                    ELSE substr(text, 51, 30) END,
               CASE WHEN doc_id % 5 = 0 THEN substr(text, 1, 50)
                    ELSE substr(text, 81, 40) END
             ], l -> trim(l) <> '') AS lines
      FROM documents
"""


@declared(
    "q_curation_gopher_rules",
    oracle=rf"""
    WITH staged AS ({_GOPHER_LINES_SQL}),
    feat AS (
      SELECT doc_id, lines,
             -- coalesce: duckdb array_to_string([]) is NULL where spark
             -- array_join([]) is '' — a zero-line doc must get 0 tokens
             -- (not NULL) in both engines
             list_filter(string_split_regex(
               coalesce(lower(array_to_string(lines, chr(10))), ''), '\s+'),
               t -> t <> '') AS toks
      FROM staged
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(floor(1000000.0 * len(list_filter(lines,
                    l -> l LIKE '- %' OR l LIKE '* %')) / nullif(len(lines), 0))
                  AS BIGINT) AS bullet_frac_e6,
             CAST(floor(1000000.0 * len(list_filter(lines,
                    l -> l LIKE '%...')) / nullif(len(lines), 0))
                  AS BIGINT) AS ellipsis_frac_e6,
             CAST(floor(1000000.0 * (1.0 -
                    CAST(len(list_distinct(lines)) AS DOUBLE)
                    / nullif(len(lines), 0)))
                  AS BIGINT) AS dup_line_frac_e6,
             CAST(floor(1000000.0 *
                    list_sum(list_transform(toks, t -> length(t)))
                    / nullif(len(toks), 0)) AS BIGINT) AS mean_word_len_e6
      FROM feat
    )
    SELECT *,
           (n_tokens BETWEEN 50 AND 100000)
             AND (mean_word_len_e6 BETWEEN 3000000 AND 10000000)
             AND bullet_frac_e6 <= 900000
             AND ellipsis_frac_e6 <= 300000
             AND dup_line_frac_e6 <= 300000 AS gopher_keep
    FROM scored
    """,
)
def q_curation_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-shape quality rules (word-count band, mean word
    length band, bullet-line / ellipsis-line / duplicate-line caps) —
    the published MassiveText filter battery, per doc. Entirely narrow
    higher-order array expressions over the staged lines: no shuffle,
    no explode, no Python. Complements q_text_quality_score (token-level
    signals) with the LINE-level signals; q_text_repetition_score owns
    the n-gram repetition family."""
    d = table(spark, sf_dir, "documents")
    slice2 = F.substring("text", 51, 30)
    line2 = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("- "), slice2))
        .when(F.col("doc_id") % 4 == 1, F.concat(slice2, F.lit("...")))
        .otherwise(slice2)
    )
    line3 = F.when(
        F.col("doc_id") % 5 == 0, F.substring("text", 1, 50)
    ).otherwise(F.substring("text", 81, 40))
    lines = F.filter(
        F.array(F.substring("text", 1, 50), line2, line3),
        lambda l: F.trim(l) != "",
    )
    staged = d.select("doc_id", lines.alias("lines"))
    toks = F.filter(
        F.split(F.lower(F.array_join("lines", "\n")), r"\s+"),
        lambda t: t != "",
    )
    feat = staged.withColumn("toks", toks)

    n_lines = F.size("lines")

    # Degenerate-doc guard (r6 ADVICE): an empty/whitespace-only doc has
    # zero lines/tokens, and 0.0/0 diverges across engines (Spark NULL
    # or ANSI error vs DuckDB ieee inf) — both sides agree on NULL via
    # an explicit emptiness gate here and nullif() in the oracle.
    def frac_e6(cnt):
        return F.when(
            n_lines > 0, F.floor(F.lit(1000000.0) * cnt / n_lines)
        ).cast("long")

    bullet = F.size(
        F.filter(
            F.col("lines"),
            lambda l: l.startswith("- ") | l.startswith("* "),
        )
    )
    ellipsis = F.size(F.filter(F.col("lines"), lambda l: l.endswith("...")))
    dup_frac = F.when(
        n_lines > 0,
        F.floor(
            F.lit(1000000.0)
            * (
                F.lit(1.0)
                - F.size(F.array_distinct("lines")).cast("double") / n_lines
            )
        ),
    ).cast("long")
    word_len_sum = F.aggregate(
        F.col("toks"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_word_len = F.when(
        F.size("toks") > 0,
        F.floor(F.lit(1000000.0) * word_len_sum / F.size("toks")),
    ).cast("long")
    scored = feat.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        F.size("toks").cast("long").alias("n_tokens"),
        frac_e6(bullet).alias("bullet_frac_e6"),
        frac_e6(ellipsis).alias("ellipsis_frac_e6"),
        dup_frac.alias("dup_line_frac_e6"),
        mean_word_len.alias("mean_word_len_e6"),
    )
    return scored.withColumn(
        "gopher_keep",
        F.col("n_tokens").between(50, 100000)
        & F.col("mean_word_len_e6").between(3000000, 10000000)
        & (F.col("bullet_frac_e6") <= 900000)
        & (F.col("ellipsis_frac_e6") <= 300000)
        & (F.col("dup_line_frac_e6") <= 300000),
    )
