"""Round-7 curation: the composed keep/drop verdict.

A real curation run doesn't ship one heuristic — it ships a FILTER
STACK: every rule scored per document, one calibrated verdict, and
per-rule attribution so corpus engineers can see exactly why mass was
dropped (the published pipelines — C4, Gopher/MassiveText, RefinedWeb —
all report per-rule removal rates). The individual signals exist as
standalone queries (q_text_quality_score, q_text_lang_score,
q_text_repetition_score, q_text_bigram_novelty); this composes them
into one verdict without re-reading the corpus once per rule.

Scale shape: ONE narrow pass computes every per-document signal
(token/char shape, stopword language score, within-doc repetition) as
higher-order array expressions — no shuffle, no Python. The only
corpus-level signal (bigram novelty) adds the same two exchanges the
standalone query pays (bigram-frequency window + doc_id join-back);
document bodies never shuffle. At 100 TB the verdict costs one corpus
scan per branch + (doc_id, bigram) pairs — not five scans for five
rules.

All fractions are floored integer micro-units and every threshold is
an integer compare, so the keep verdict cannot diverge on float
rendering between engines. Thresholds are calibrated against the
testdata signal distributions (probed at sf0.01: stopword-score p10
~15k µ, dup-token median ~538k µ / p90 ~679k µ, dup-bigram p90 ~65k µ,
novelty median 0) so every rule has real discriminating power — each
fires on some documents and passes others.

Reference parity: the reference ETL (etl/app.py) has no curation
surface; SURVEY.md §2D extension inventory (LLM-pipeline tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.arrays import word_ngrams
from datawarehouse1_spark.queries.text import STOPWORDS
from datawarehouse1_spark.registry import declared

# (rule, failure label) in attribution order. Labels are data: they
# appear verbatim in fail_reasons on both engines.
_RULES = (
    ("rule_tokens", "tokens"),
    ("rule_word_shape", "word_shape"),
    ("rule_lang", "lang"),
    ("rule_repetition", "repetition"),
    ("rule_novelty", "novelty"),
)

_VERDICT_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id, length(text) AS n_chars,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')
               AS t
      FROM documents
    ),
    narrow AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(floor(1000000.0 * n_chars / nullif(len(t), 0)) AS BIGINT)
               AS chars_per_token_e6,
             CAST(floor(1000000.0 * len(list_filter(t,
                    x -> list_contains({list(STOPWORDS)!r}, x)))
                  / nullif(len(t), 0)) AS BIGINT) AS stop_score_e6,
             CAST(floor(1000000.0 * (1.0 -
                    CAST(len(list_distinct(t)) AS DOUBLE) / nullif(len(t), 0)))
                  AS BIGINT) AS dup_token_frac_e6,
             list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                            i -> concat_ws(' ', t[i], t[i+1])) AS bgs
      FROM toks
    ),
    exploded AS (
      SELECT doc_id, len(bgs) AS nb, unnest(bgs) AS bg
      FROM narrow WHERE len(bgs) >= 1
    ),
    vocab AS (SELECT bg FROM exploded GROUP BY bg HAVING COUNT(*) >= 3),
    nov AS (
      SELECT e.doc_id,
             CAST(floor(1000000.0 * (1.0 -
                    CAST(len(list_distinct(list(e.bg))) AS DOUBLE) / e.nb))
                  AS BIGINT) AS dup_bigram_frac_e6,
             CAST(floor(count(*) FILTER (WHERE v.bg IS NULL)
                    * 1000000.0 / e.nb) AS BIGINT) AS novelty_e6
      FROM exploded e LEFT JOIN vocab v ON e.bg = v.bg
      GROUP BY e.doc_id, e.nb
    ),
    scored AS (
      SELECT n.doc_id, n.n_tokens, n.chars_per_token_e6, n.stop_score_e6,
             n.dup_token_frac_e6, v.dup_bigram_frac_e6, v.novelty_e6,
             coalesce(n.n_tokens BETWEEN 10 AND 100000, FALSE) AS rule_tokens,
             coalesce(n.chars_per_token_e6 BETWEEN 3000000 AND 10000000, FALSE)
               AS rule_word_shape,
             coalesce(n.stop_score_e6 >= 30000, FALSE) AS rule_lang,
             coalesce(n.dup_token_frac_e6 <= 600000, FALSE)
               AND coalesce(v.dup_bigram_frac_e6 <= 150000, TRUE)
               AS rule_repetition,
             coalesce(v.novelty_e6 <= 100000, TRUE) AS rule_novelty
      FROM narrow n LEFT JOIN nov v ON n.doc_id = v.doc_id
    )
    SELECT *,
           CAST(5 - (CAST(rule_tokens AS INT) + CAST(rule_word_shape AS INT)
               + CAST(rule_lang AS INT) + CAST(rule_repetition AS INT)
               + CAST(rule_novelty AS INT)) AS BIGINT) AS n_rules_failed,
           concat_ws(',',
             CASE WHEN NOT rule_tokens THEN 'tokens' END,
             CASE WHEN NOT rule_word_shape THEN 'word_shape' END,
             CASE WHEN NOT rule_lang THEN 'lang' END,
             CASE WHEN NOT rule_repetition THEN 'repetition' END,
             CASE WHEN NOT rule_novelty THEN 'novelty' END) AS fail_reasons,
           rule_tokens AND rule_word_shape AND rule_lang
             AND rule_repetition AND rule_novelty AS keep
    FROM scored
"""


@declared("q_curation_quality_verdict", oracle=_VERDICT_ORACLE)
def q_curation_quality_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed filter stack: five calibrated rules, one verdict,
    per-rule attribution. Missing-evidence semantics, applied uniformly
    in both engines:

      * a doc too degenerate to measure a PER-DOC signal (0 tokens)
        FAILS the rules that need it — there is nothing to keep;
      * a doc too short to measure a CORPUS-RELATIVE signal (<2 tokens,
        so no bigrams) PASSES repetition/novelty — insufficient
        evidence is not evidence of badness, and the token-band rule
        already owns the too-short case."""
    d = table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")

    n_tokens = F.size("t")

    def per_tok_e6(expr):
        return F.when(n_tokens > 0, F.floor(expr)).cast("long")

    narrow = d.select(
        "doc_id", F.length("text").alias("n_chars"), toks.alias("t")
    ).select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        per_tok_e6(F.lit(1000000.0) * F.col("n_chars") / n_tokens).alias(
            "chars_per_token_e6"
        ),
        per_tok_e6(
            F.lit(1000000.0)
            * F.size(F.filter("t", lambda x: F.array_contains(stop, x)))
            / n_tokens
        ).alias("stop_score_e6"),
        per_tok_e6(
            F.lit(1000000.0)
            * (
                F.lit(1.0)
                - F.size(F.array_distinct("t")).cast("double") / n_tokens
            )
        ).alias("dup_token_frac_e6"),
        word_ngrams(F.col("t"), 2).alias("bgs"),
    )

    # corpus-relative branch: bigram frequency via a window over the
    # exploded pairs (single shuffle keyed on bg — same shape as
    # q_text_bigram_novelty), folded back per doc. The per-doc distinct
    # bigram count stays a count_distinct AGGREGATE on purpose: the
    # tempting "narrow" alternative — size(array_distinct(bgs)) in the
    # same projection as the explode — gets collapsed into the Generate
    # by Catalyst and recomputed per EXPLODED row, O(tokens²) per doc
    # (measured 3.10 s vs 1.20 s at sf0.1 — keep the aggregate)
    exploded = narrow.filter(F.size("bgs") >= 1).select(
        "doc_id", F.size("bgs").alias("nb"), F.explode("bgs").alias("bg")
    )
    freq = F.count(F.lit(1)).over(Window.partitionBy("bg"))
    nov = (
        exploded.withColumn("_known", freq >= 3)
        .groupBy("doc_id", "nb")
        .agg(
            F.count_distinct("bg").alias("_n_distinct"),
            F.count(F.when(~F.col("_known"), 1)).alias("_n_novel"),
        )
        .select(
            "doc_id",
            F.floor(
                F.lit(1000000.0)
                * (
                    F.lit(1.0)
                    - F.col("_n_distinct").cast("double") / F.col("nb")
                )
            )
            .cast("long")
            .alias("dup_bigram_frac_e6"),
            F.floor(F.col("_n_novel") * F.lit(1000000.0) / F.col("nb"))
            .cast("long")
            .alias("novelty_e6"),
        )
    )

    scored = (
        narrow.drop("bgs")
        .join(nov, on="doc_id", how="left")
        .withColumn(
            "rule_tokens",
            F.coalesce(F.col("n_tokens").between(10, 100000), F.lit(False)),
        )
        .withColumn(
            "rule_word_shape",
            F.coalesce(
                F.col("chars_per_token_e6").between(3000000, 10000000),
                F.lit(False),
            ),
        )
        .withColumn(
            "rule_lang",
            F.coalesce(F.col("stop_score_e6") >= 30000, F.lit(False)),
        )
        .withColumn(
            "rule_repetition",
            F.coalesce(F.col("dup_token_frac_e6") <= 600000, F.lit(False))
            & F.coalesce(F.col("dup_bigram_frac_e6") <= 150000, F.lit(True)),
        )
        .withColumn(
            "rule_novelty",
            F.coalesce(F.col("novelty_e6") <= 100000, F.lit(True)),
        )
    )
    flags = [F.col(rule) for rule, _ in _RULES]
    n_failed = F.lit(len(_RULES)) - sum(
        flag.cast("int") for flag in flags
    )
    reasons = F.concat_ws(
        ",", *[F.when(~F.col(rule), F.lit(label)) for rule, label in _RULES]
    )
    keep = flags[0]
    for flag in flags[1:]:
        keep = keep & flag
    return scored.select(
        "*",
        n_failed.cast("long").alias("n_rules_failed"),
        reasons.alias("fail_reasons"),
        keep.alias("keep"),
    )


@declared(
    "q_sample_stratified_exact",
    oracle="""
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 20
    """,
)
def q_sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: exactly 20 docs per language, chosen
    as the k smallest md5(doc_id) — deterministic across runs,
    partitionings, and engines (no rand()), the eval-set / human-review
    draw a curation run needs to be reproducible. Declared path is the
    plain per-stratum window (operators/sampling.py::stratified_sample,
    oversample=0); the exact-or-loud prefilter scale path (sorts
    ~oversample*k candidates per stratum instead of the whole stratum)
    is the same operator with oversample>0 — path equivalence is
    pytest-pinned."""
    from datawarehouse1_spark.operators.sampling import stratified_sample

    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(d, strata=("lang",), key="doc_id", k=20).select(
        "doc_id", "lang", F.col("sample_rank").cast("long").alias("sample_rank")
    )


# Target mixture for the token-budget plan: micro-unit weights, sum 1e6.
# Static data shared verbatim with the oracle below.
_MIX_W_E6 = {"en": 400000, "zh": 200000, "de": 150000, "fr": 150000, "es": 100000}

_MIX_WEIGHTS_SQL = "(VALUES " + ", ".join(
    f"('{lang}', {w})" for lang, w in sorted(_MIX_W_E6.items())
) + ") AS w(lang, w_e6)"


@declared(
    "q_mixture_token_budget",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang,
             CAST(SUM(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> t <> ''))) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY lang
    ),
    avail AS (
      SELECT w.lang, w.w_e6, coalesce(p.avail_tokens, 0) AS avail_tokens
      FROM {_MIX_WEIGHTS_SQL} LEFT JOIN per_lang p ON w.lang = p.lang
    ),
    capped AS (
      SELECT *,
             CAST(floor(avail_tokens * CAST(1000000 AS DECIMAL(38,0)) / w_e6)
                  AS BIGINT) AS budget_cap
      FROM avail
    ),
    solved AS (
      SELECT *, MIN(budget_cap) OVER () AS t_max FROM capped
    )
    SELECT lang, w_e6, avail_tokens, budget_cap,
           CAST(floor(CAST(w_e6 AS DECIMAL(38,0)) * t_max / 1000000) AS BIGINT)
             AS allotted_tokens,
           CAST(floor(CAST(floor(CAST(w_e6 AS DECIMAL(38,0)) * t_max / 1000000)
                           AS DECIMAL(38,0))
                * 1000000 / nullif(avail_tokens, 0)) AS BIGINT)
             AS sample_rate_e6,
           budget_cap = t_max AS binding
    FROM solved
    """,
)
def q_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture PLANNING — the arithmetic a training run does before
    sampling: given target mixture weights per language and the tokens
    actually available, the largest total budget T the mixture can
    support is min over strata of avail/weight; each stratum is then
    allotted weight*T tokens, giving its sampling rate, and `binding`
    marks the stratum that limits the whole mixture (what you must
    source more of to scale the run). One token-count aggregate (the
    only shuffle) + a 5-row window; all ratios in integer micro-units
    through DECIMAL(38,0) intermediates so no engine can diverge on
    float rounding or int64 overflow."""
    d = table(spark, sf_dir, "documents")
    w = spark.createDataFrame(
        sorted(_MIX_W_E6.items()), "lang string, w_e6 long"
    )
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    # weights drive the join (left from w): a TARGET language with zero
    # available tokens must surface as avail=0 and force T=0 — an inner
    # join would silently drop the stratum and "solve" an unsatisfiable
    # mixture (pinned in test_r7_hardening.py)
    per_lang = d.groupBy("lang").agg(
        F.sum(F.size(toks)).cast("long").alias("avail_tokens")
    )
    avail = w.join(per_lang, "lang", "left").select(
        "lang", "w_e6", F.coalesce("avail_tokens", F.lit(0)).alias("avail_tokens")
    )
    dec = "decimal(38,0)"
    capped = avail.withColumn(
        "budget_cap",
        F.floor(
            F.col("avail_tokens").cast(dec)
            * F.lit(1000000).cast(dec)
            / F.col("w_e6")
        ).cast("long"),
    )
    solved = capped.withColumn(
        "t_max", F.min("budget_cap").over(Window.partitionBy())
    )
    # floor() explicitly before every decimal->long cast: Spark's cast
    # TRUNCATES a fractional decimal while DuckDB's cast ROUNDS — floor
    # is the only semantics both engines share
    allotted = F.floor(
        F.col("w_e6").cast(dec) * F.col("t_max") / F.lit(1000000)
    ).cast("long")
    return solved.select(
        "lang",
        "w_e6",
        "avail_tokens",
        "budget_cap",
        allotted.alias("allotted_tokens"),
        F.floor(
            allotted.cast(dec)
            * F.lit(1000000)
            / F.nullif(F.col("avail_tokens"), F.lit(0))
        )
        .cast("long")
        .alias("sample_rate_e6"),
        (F.col("budget_cap") == F.col("t_max")).alias("binding"),
    )


@declared(
    "q_curation_chunk_sliding",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')
               AS t
      FROM documents
    ),
    chunked AS (
      SELECT doc_id, len(t) AS n_tokens,
             unnest(list_transform(
               range(0, CAST(floor((len(t) - 1) / 48) AS BIGINT) + 1),
               i -> struct_pack(
                 chunk_idx := CAST(i AS BIGINT),
                 chunk := array_to_string(t[i*48 + 1 : i*48 + 64], ' ')
               ))) AS c
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           c.chunk_idx,
           c.chunk,
           CAST(len(list_filter(string_split_regex(c.chunk, ' '),
                                x -> x <> '')) AS BIGINT) AS chunk_tokens
    FROM chunked
    """,
)
def q_curation_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token windows, stride 48 →
    16-token overlap): the context-window segmentation step both RAG
    indexing and long-doc pretraining run, DISTINCT from sequence
    packing (q_curation_pack_chunks packs whole docs into fixed
    budgets; this splits single docs into overlapping windows).
    Entirely narrow — slice/transform on the token array, one explode,
    zero exchanges; chunk text is re-joined so the full chunk content
    hash-matches across engines. The last window is partial by design
    (every token appears in ≥1 chunk; stride < size ⇒ boundary tokens
    appear in 2)."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    size, stride = 64, 48
    staged = d.select("doc_id", toks.alias("t")).filter(F.size("t") > 0)
    chunks = F.transform(
        F.sequence(F.lit(0), F.floor((F.size("t") - 1) / stride)),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(F.col("t"), i * stride + 1, size)
            ).alias("chunk"),
        ),
    )
    out = staged.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.explode(chunks).alias("c"),
    )
    chunk_toks = F.filter(F.split(F.col("c.chunk"), " "), lambda x: x != "")
    return out.select(
        "doc_id",
        "n_tokens",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk").alias("chunk"),
        F.size(chunk_toks).cast("long").alias("chunk_tokens"),
    )


@declared(
    "q_curation_decontaminate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')
               AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 2),
               i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      FROM toks WHERE len(t) >= 3
    ),
    ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
    tr AS (SELECT DISTINCT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
    hits AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_shingle_hits
      FROM tr t JOIN ev e ON t.sh = e.sh GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           coalesce(h.n_eval_shingle_hits, 0) AS n_eval_shingle_hits,
           coalesce(h.n_eval_shingle_hits, 0) >= 3 AS drop_doc
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def q_curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval DECONTAMINATION — the filter the overlap REPORT
    (q_text_contamination_overlap) informs: every training document
    scored by how many distinct 3-token shingles it shares with the
    held-out eval set (doc_id % 97), with the drop verdict at ≥3
    shared shingles (calibrated: 171/494 train docs share ≥1 shingle
    on this dense synthetic vocabulary — dropping those would gut the
    corpus — but only 10 share ≥3; real corpora use 8-13-gram
    shingles where ≥1 is the standard). Scale shape identical to the
    report: md5 shingle hashes equi-join, (hash, doc_id) pairs
    shuffle, never text; the eval side is the small, broadcastable
    side."""
    d = table(spark, sf_dir, "documents")
    toks_col = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    shingled = d.select("doc_id", toks_col.alias("t")).filter(
        F.size("t") >= 3
    ).select(
        "doc_id",
        F.explode(F.transform(word_ngrams(F.col("t"), 3), F.md5)).alias("sh"),
    )
    ev = shingled.filter(F.col("doc_id") % 97 == 0).select("sh").distinct()
    tr = shingled.filter(F.col("doc_id") % 97 != 0).distinct()
    hits = (
        tr.join(ev, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_eval_shingle_hits"))
    )
    train_docs = d.filter(F.col("doc_id") % 97 != 0).select("doc_id")
    return train_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_eval_shingle_hits", F.lit(0)).alias(
            "n_eval_shingle_hits"
        ),
        (F.coalesce("n_eval_shingle_hits", F.lit(0)) >= 3).alias("drop_doc"),
    )
