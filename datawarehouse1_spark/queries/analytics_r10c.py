"""Round-10 analytics, batch 6: classical seasonality decomposition,
source-vocabulary overlap, and full-outer snapshot reconciliation.

* **Seasonality decompose** — the ratio-to-moving-average step of the
  classical decomposition: monthly revenue (exact integer cents), a
  12-month trailing-centered trend (ROWS 5 preceding .. 6 following —
  NULL until the window is complete), and the seasonal ratio in
  floored micro-units. The monthly series is bounded (one row per
  month), so the unpartitioned ordered window runs on a <=100-row
  table — the SCALE.md rule-22 shape, never on fact rows.

* **Source vocabulary Jaccard** — which providers publish overlapping
  language: distinct word sets per source, pairwise overlap via the
  word equi-join (exact — any overlapping pair shares a word), Jaccard
  in floored micro-units. The provider-redundancy screen beside the
  doc-level dedup tiers; output is bounded by (#sources choose 2).

* **Full-outer reconcile** — the snapshot-diff report every warehouse
  sync runs: two staged order snapshots FULL OUTER joined on the key,
  each key classified matched / changed / left_only / right_only,
  with exact-decimal value deltas. Completes the declared join
  battery's outer-join coverage (left/semi/anti/interval/asof/bloom
  already certified; full outer was only exercised inside the drift
  monitor).

Reference parity: the reference ETL (etl/app.py) has no analytics
surface; SURVEY.md §2C/§2D extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import sql_cents
from datawarehouse1_spark.registry import declared

_CENTS = sql_cents("o_totalprice")

# ---------------------------------------------------------------- 1.


@declared(
    "q_orders_seasonality_decompose",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             SUM({_CENTS}) AS y
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT month, y,
             CASE WHEN COUNT(*) OVER w = 12
                  THEN CAST(SUM(y) OVER w // 12 AS BIGINT)
             END AS trend_cents
      FROM m
      WINDOW w AS (ORDER BY month
                   ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
    )
    SELECT month, CAST(y AS BIGINT) AS revenue_cents, trend_cents,
           CAST(y * 1000000 // nullif(trend_cents, 0) AS BIGINT)
             AS seasonal_e6
    FROM t
    """,
)
def q_orders_seasonality_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical ratio-to-moving-average seasonality: per month — exact
    integer-cents revenue, the 12-month centered trend (ROWS 5
    preceding .. 6 following; NULL until all 12 months exist, so edge
    months never carry a partial trend), and the seasonal ratio in
    floored micro-units (>1e6 = above trend). All arithmetic is
    integer `div` on positive operands, so both engines floor
    identically; the ratio's y*1e6 multiply stays exact at any scale
    on BOTH sides — Spark through DECIMAL(38,0) (a BIGINT product
    would wrap past a ~9.2e12-cent month), DuckDB through its native
    HUGEINT sum (casting THAT to DECIMAL would demote the division to
    DOUBLE and floor off-by-one — found by the parity gate).
    Plan: ONE month aggregate is the only exchange that sees fact
    rows; the ordered window and the ratio run on the bounded monthly
    table (rule 22)."""
    o = table(spark, sf_dir, "orders")
    m = (
        o.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.expr(_CENTS).alias("cents"),
        )
        .groupBy("month")
        .agg(F.sum("cents").alias("y"))
    )
    w = Window.orderBy("month").rowsBetween(-5, 6)
    trend = F.when(
        F.count(F.lit(1)).over(w) == 12,
        F.expr("sum(y) OVER (ORDER BY month ROWS BETWEEN 5 PRECEDING"
               " AND 6 FOLLOWING) div 12").cast("long"),
    )
    t = m.withColumn("trend_cents", trend)
    return t.select(
        "month",
        F.col("y").cast("long").alias("revenue_cents"),
        "trend_cents",
        F.expr(
            "CAST(y AS DECIMAL(38,0)) * 1000000 div nullif(trend_cents, 0)"
        )
        .cast("long")
        .alias("seasonal_e6"),
    )


# ---------------------------------------------------------------- 2.


@declared(
    "q_text_source_vocab_jaccard",
    oracle=r"""
    WITH tok AS (
      SELECT DISTINCT source,
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
      FROM documents
    ),
    wc AS (SELECT source, word FROM tok WHERE word <> ''),
    sizes AS (SELECT source, COUNT(*) AS n_words FROM wc GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_common
      FROM wc a JOIN wc b ON a.word = b.word AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT p.source_a, p.source_b, p.n_common,
           sa.n_words AS n_words_a, sb.n_words AS n_words_b,
           CAST(p.n_common * 1000000
                // (sa.n_words + sb.n_words - p.n_common) AS BIGINT)
             AS jaccard_e6
    FROM pairs p
    JOIN sizes sa ON sa.source = p.source_a
    JOIN sizes sb ON sb.source = p.source_b
    """,
)
def q_text_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources: distinct word sets
    per provider, overlap counted by the word EQUI-join (exact — a
    pair overlaps iff it shares a word, and distinct (source, word)
    rows make the grouped join count the intersection size), Jaccard
    in floored micro-units. The provider-redundancy screen: two
    sources whose vocabularies coincide are mirrors even when no
    single document duplicates. Plan: bodies tokenize map-side and
    only (source, word) tuples shuffle; the pair aggregate's output is
    bounded by (#sources choose 2); per-source sizes broadcast. A
    corpus-wide stop-word shared by all S sources contributes S(S-1)/2
    pair rows — the same class as the output itself, not a quadratic
    blowup in the corpus."""
    d = table(spark, sf_dir, "documents")
    word = F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias(
        "word"
    )
    # the distinct (source, word) set feeds three consumers (both join
    # sides + the size table); localCheckpoint runs the tokenize +
    # distinct ONCE (SCALE.md rule 12) instead of once per consumer
    wc = (
        d.select("source", word)
        .filter(F.col("word") != "")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = wc.groupBy("source").agg(F.count(F.lit(1)).alias("n_words"))
    a = wc.alias("a")
    b = wc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_words").alias("n_words_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_words").alias("n_words_b")
    )
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_words_a",
            "n_words_b",
            F.expr(
                "n_common * 1000000 div (n_words_a + n_words_b - n_common)"
            )
            .cast("long")
            .alias("jaccard_e6"),
        )
    )


# ---------------------------------------------------------------- 3.


@declared(
    "q_join_full_outer_reconcile",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey AS k, {_CENTS} AS v FROM orders
      WHERE o_orderkey % 3 <> 0
    ),
    b AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN {_CENTS} + 100
                  ELSE {_CENTS} END AS v
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    j AS (
      SELECT CASE WHEN a.k IS NULL THEN 'right_only'
                  WHEN b.k IS NULL THEN 'left_only'
                  WHEN a.v = b.v THEN 'matched'
                  ELSE 'changed' END AS status,
             coalesce(a.v, 0) AS av, coalesce(b.v, 0) AS bv
      FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT status, COUNT(*) AS n_keys,
           CAST(SUM(bv - av) AS BIGINT) AS value_delta_cents
    FROM j GROUP BY status
    """,
)
def q_join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via FULL OUTER join — the diff report a
    warehouse sync runs between yesterday's and today's extracts: two
    staged order snapshots (every 3rd key missing on the left, every
    5th on the right, every 7th value bumped 100 cents on the right)
    joined full-outer on the key, each key classified matched /
    changed / left_only / right_only with the exact integer-cents
    value delta per class. Completes the outer-join coverage of the
    declared join battery. Plan: both snapshot sides shuffle once on
    the key (full outer cannot broadcast — the drift-monitor finding,
    ADVICE r9); the class aggregate is bounded at 4 rows."""
    o = table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS)
    a = o.where(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"), cents.alias("av")
    )
    b = o.where(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 7 == 0, cents + 100)
        .otherwise(cents)
        .alias("bv"),
    )
    j = a.join(b, "k", "full_outer").select(
        F.when(F.col("av").isNull(), "right_only")
        .when(F.col("bv").isNull(), "left_only")
        .when(F.col("av") == F.col("bv"), "matched")
        .otherwise("changed")
        .alias("status"),
        F.coalesce(F.col("av"), F.lit(0)).alias("av"),
        F.coalesce(F.col("bv"), F.lit(0)).alias("bv"),
    )
    return j.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("bv") - F.col("av")).cast("long").alias(
            "value_delta_cents"
        ),
    )
