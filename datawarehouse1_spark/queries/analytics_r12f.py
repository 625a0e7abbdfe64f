"""Round-12 analytics, batch 6: rank-ANOVA, forecast decomposition,
threshold sweeps, graph degree profiling, and kNN label agreement.

Five operators extending the model-eval / graph / stats surface:

* **Kruskal-Wallis H** — the NONPARAMETRIC twin of q_stats_eta_squared's
  one-way ANOVA: does the categorical factor shift the numeric column's
  DISTRIBUTION, judged on ranks (immune to the money columns' heavy
  tails)?  Same integer 2r average-rank machinery as Spearman/AUC
  (2r = 2·cnt_less + cnt_eq + 1), so H and its tie-corrected form are
  exact floored e6 in both engines.

* **Brier score + Murphy decomposition** — the proper-scoring-rule
  companion to q_quality_auc_by_source (ranking) and
  q_quality_calibration_bins (binned rates): Brier = reliability −
  resolution + uncertainty, decomposed over the DISTINCT forecast
  values (so the classic Murphy identity holds exactly, no within-bin
  variance term).  The crude length→English forecast p = min(n_chars,
  8192)/8192 is rational, hence every component is an exact ppm.

* **Precision/recall threshold sweep** — the deployment-side read of
  the same signal: TP/FP/FN and exact-ppm precision, recall, and F1 at
  nine length cutoffs.  AUC ranks the signal, calibration bins place
  it, this sweep PICKS the operating point.

* **Graph degree distribution** — profile of the supplier→customer
  bipartite graph induced by lineitem⋈orders: per-supplier distinct
  customer degree, histogrammed in floor-log2 buckets (length(bin(d))−1,
  no libm).  The first thing a graph pipeline checks before joining on
  an entity key: is the degree distribution heavy-tailed enough to need
  skew handling?

* **kNN label agreement** — leave-one-out 5-NN majority-vote label
  consistency over the embeddings table: for each query vector, do its
  nearest neighbors' labels agree with its own?  The standard
  embedding-quality probe (a good space puts same-label points
  together).  Reuses the exact-cosine baseline's deterministic fold +
  (cos DESC, neighbor_id) tie-break, so the vote is engine-portable;
  the agreement rate is an exact ppm.

Exactness discipline as batches 1-5 (SCALE.md rules 20/22/27/30):
integer/DECIMAL(38,0) sums, per-group floors via engine-identical
Spark subtract-modulo vs DuckDB HUGEINT `//` (numerators provably
non-negative), no libm in hashed output.

Reference parity: the reference ETL (etl/app.py) has no analytics
surface; SURVEY.md §2C/§2D extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.vector import cosine, sql_cosine
from datawarehouse1_spark.queries.analytics_r12 import (
    _cents,
    _cents_sql,
    _rank2,
    _rank2_grouped,
)
from datawarehouse1_spark.queries.similarity import N_QUERY_VECTORS, TOP_K
from datawarehouse1_spark.registry import declared

_DEC = "decimal(38,0)"


def _exact_floor_div(num: str, den: str) -> F.Column:
    """Exact floor(num/den) KEPT IN DECIMAL(38,0) for non-negative
    decimal `num` (Spark `div` returns BIGINT and overflows loudly past
    9.2e18; the subtract-modulo form makes the scale-6 decimal divide
    exact, so no rounding can occur — the r12e lesson)."""
    return F.expr(f"CAST(({num} - {num} % {den}) / {den} AS DECIMAL(38,0))")


# ---------------------------------------------------------------------------
# 1. Kruskal-Wallis rank ANOVA (exact, tie-corrected)
# ---------------------------------------------------------------------------

# (label, table, group column, numeric column, rank-bucket width in cents)
_KW_CASES = (
    ("acctbal_by_segment", "customer", "c_mktsegment", "c_acctbal", 25_000),
    ("totalprice_by_priority", "orders", "o_orderpriority", "o_totalprice",
     1_000_000),
)


def _kw_arm_sql(label: str, tbl: str, grp: str, num: str) -> str:
    cents = _cents_sql(num)
    return f"""
    SELECT '{label}' AS case_name,
           CAST(n AS BIGINT) AS n_rows,
           CAST(k AS BIGINT) AS n_groups,
           CAST(h6 AS BIGINT) AS h_e6,
           CAST(h6 * (n * n * n - n)
                // NULLIF((n * n * n - n) - t, 0) AS BIGINT) AS h_adj_e6
    FROM (
      SELECT n, k, t,
             GREATEST(CAST(0 AS HUGEINT),
                      (3 * a) // (n * (n + 1))
                      - 3 * (n + 1) * 1000000) AS h6
      FROM (
        SELECT SUM(ng) AS n, COUNT(*) AS k,
               SUM(r2g * r2g * 1000000 // ng) AS a
        FROM (
          SELECT g, SUM(cnt * r2) AS r2g, SUM(cnt) AS ng
          FROM (
            SELECT {grp} AS g, {cents} AS v,
                   CAST(COUNT(*) AS HUGEINT) AS cnt
            FROM {tbl} GROUP BY 1, 2
          ) j
          JOIN (
            SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r2
            FROM (
              SELECT {cents} AS v, CAST(COUNT(*) AS HUGEINT) AS c
              FROM {tbl} GROUP BY 1
            )
          ) r USING (v)
          GROUP BY g
        )
      ),
      (
        SELECT SUM(c * c * c - c) AS t
        FROM (
          SELECT CAST(COUNT(*) AS HUGEINT) AS c FROM {tbl} GROUP BY {cents}
        )
      )
    )"""


def _kw_arm(
    spark: SparkSession, sf_dir: str, label: str, tbl: str, grp: str,
    num: str, width: int
) -> DataFrame:
    t = table(spark, sf_dir, tbl)
    joint = (
        t.select(F.col(grp).alias("g"), _cents(num).alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    marg = joint.groupBy(F.col("v").alias("v")).agg(F.sum("cnt").alias("c"))
    r2 = _rank2(marg, width)
    grps = (
        joint.join(r2, "v")
        .groupBy("g")
        .agg(
            F.sum(F.col("cnt").cast(_DEC) * F.col("r2")).alias("r2g"),
            F.sum(F.col("cnt").cast(_DEC)).alias("ng"),
        )
    )
    # per-group floor of R2g²·1e6/n_g: exact engine-identical floor via
    # subtract-modulo (numerator is a square, provably >= 0 — rule 27)
    scored = grps.select(
        "ng",
        (F.col("r2g") * F.col("r2g") * F.lit(1000000)).alias("_x"),
    ).select("ng", _exact_floor_div("_x", "ng").alias("ag"))
    agg = scored.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).cast(_DEC).alias("k"),
        F.sum("ag").alias("a"),
    )
    cd = F.col("c").cast(_DEC)
    ties = marg.agg(F.sum(cd * cd * cd - cd).alias("t"))
    h = (
        agg.crossJoin(F.broadcast(ties))
        .select(
            "n",
            "k",
            "t",
            (F.col("a") * 3).alias("_hx"),
            (F.col("n") * (F.col("n") + 1)).alias("_hd"),
        )
        .select(
            "n",
            "k",
            "t",
            F.greatest(
                F.lit(0).cast(_DEC),
                _exact_floor_div("_hx", "_hd")
                - (F.col("n") + 1) * 3 * F.lit(1000000),
            ).alias("h6"),
        )
    )
    n3 = F.col("n") * F.col("n") * F.col("n") - F.col("n")
    return h.select(
        F.lit(label).alias("case_name"),
        F.col("n").cast("long").alias("n_rows"),
        F.col("k").cast("long").alias("n_groups"),
        F.col("h6").cast("long").alias("h_e6"),
        (F.col("h6") * n3).alias("_ax"),
        F.nullif(n3 - F.col("t"), F.lit(0).cast(_DEC)).alias("_ad"),
    ).select(
        "case_name",
        "n_rows",
        "n_groups",
        "h_e6",
        _exact_floor_div("_ax", "_ad").cast("long").alias("h_adj_e6"),
    )


@declared(
    "q_stats_kruskal_wallis",
    oracle="\nUNION ALL\n".join(
        _kw_arm_sql(label, tbl, grp, num) for label, tbl, grp, num, _ in
        _KW_CASES
    ),
)
def q_stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank ANOVA — the nonparametric twin of
    q_stats_eta_squared: H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1) on
    average ranks, plus the tie-corrected H/(1 − ΣT/(N³−N)).  With
    ranks carried as integer 2r (R_g = R2_g/2, the /4 folding into
    12/4 = 3), every term is an integer/DECIMAL(38,0) sum; the two
    convention points are the per-group floor of R2_g²·1e6/n_g and the
    final quotients — all engine-identical exact floors on provably
    non-negative numerators (squares; any-ranks-sum ≥ the minimum sum
    makes H ≥ 0, clamped at 0 against floor dust — rules 27/30).
    Width bound, documented: R2_g² ≤ (N(N+1))², so the e6 scaling
    holds to N ≈ 1e8 rows per arm in DECIMAL(38,0)/HUGEINT; beyond
    that, drop to e4.  Scale shape (rule 22): one exchange to the
    (group, value) joint; ranks from the two-level cumsum over the
    bounded VALUE marginal (only bucket summaries cross a window);
    the group table is |groups| rows.

    r16 (guide §2.4 shared-exchange consolidation — the same pid
    merge spearman got in r14): the arms' joints union into ONE
    pid-tagged table, so the marginal aggregate, the two-level rank
    cumsums (_rank2_grouped, per-pid bucket widths riding a literal
    array), the tie sum, and the moment reduction each run ONCE over
    the union instead of once per arm — the per-arm downstream
    machinery (~12 small exchanges) collapses to ~7. The per-table
    scans are unchanged (the arms read different tables). Measured
    3.13→2.83 s min / 3.85→3.21 s median interleaved at sf0.1; the
    oracle text stays the per-arm UNION ALL and the hash match pins
    the rewrite. _kw_arm remains the single-arm reference twin the
    law tests drive directly.

    r17 (VERDICT r16 #4's pattern, applied here too): the bounded
    group breakdown (≤5 groups per arm) rides the value marginal as a
    collect_list payload through _rank2_grouped, so the rank table is
    never joined back onto the (pid, g, v) joint — see the inline
    comment; the moment sums are value-identical by reassociation.

    Empty-arm assumption (ADVICE r16): the merged pipeline groups by
    pid, so an arm whose SOURCE TABLE is empty would emit no row where
    the per-arm oracle (global aggregate per arm + UNION ALL) emits a
    NULL-stats row. _KW_CASES reads customer and orders — never empty
    in any declared testdata or at any TPC-H SF — so the shapes agree;
    re-pointing _KW_CASES at an emptiable table requires a literal pid
    spine left-join first (the _kw_arm twin shows the per-arm shape)."""
    joint = None
    for pid, (label, tbl, grp, num, width) in enumerate(_KW_CASES):
        t = table(spark, sf_dir, tbl)
        j = (
            t.select(
                F.lit(pid).alias("pid"),
                F.col(grp).alias("g"),
                _cents(num).alias("v"),
            )
            .groupBy("pid", "g", "v")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        joint = j if joint is None else joint.unionByName(j)
    # r17 (guide §2.4, the spearman payload-fold pattern): the group
    # domain is BOUNDED (≤5 mktsegments / ≤5 orderpriorities per arm),
    # so the per-value group breakdown rides the marginal as a tiny
    # array and the former (pid, v)-grain join-back of the rank table
    # onto the joint — fact-grain for the near-unique o_totalprice —
    # vanishes, along with one full scan+agg pass over both source
    # tables (the old `grps` consumer). Exactness is reassociation
    # only: Σ_joint cnt·r2 per (pid, g) = Σ_v r2(v)·cnt(g, v), every
    # sum still exact DECIMAL(38,0); collect_list order is irrelevant
    # (the explode feeds order-insensitive sums).
    marg = joint.groupBy("pid", F.col("v").alias("v")).agg(
        F.sum("cnt").alias("c"),
        F.collect_list(F.struct(F.col("g"), F.col("cnt"))).alias("gs"),
    )
    w_arr = F.array(*[F.lit(w) for _, _, _, _, w in _KW_CASES])
    r2 = _rank2_grouped(
        marg, F.element_at(w_arr, F.col("pid") + 1), payload=("gs",)
    )
    ge = F.explode("gs")
    grps = (
        r2.select("pid", "r2", ge.alias("e"))
        .groupBy("pid", F.col("e").getField("g").alias("g"))
        .agg(
            F.sum(
                F.col("e").getField("cnt").cast(_DEC) * F.col("r2")
            ).alias("r2g"),
            F.sum(F.col("e").getField("cnt").cast(_DEC)).alias("ng"),
        )
    )
    scored = grps.select(
        "pid",
        "ng",
        (F.col("r2g") * F.col("r2g") * F.lit(1000000)).alias("_x"),
    ).select("pid", "ng", _exact_floor_div("_x", "ng").alias("ag"))
    agg = scored.groupBy("pid").agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).cast(_DEC).alias("k"),
        F.sum("ag").alias("a"),
    )
    cd = F.col("c").cast(_DEC)
    ties = marg.groupBy("pid").agg(F.sum(cd * cd * cd - cd).alias("t"))
    h = (
        agg.join(F.broadcast(ties), "pid")
        .select(
            "pid",
            "n",
            "k",
            "t",
            (F.col("a") * 3).alias("_hx"),
            (F.col("n") * (F.col("n") + 1)).alias("_hd"),
        )
        .select(
            "pid",
            "n",
            "k",
            "t",
            F.greatest(
                F.lit(0).cast(_DEC),
                _exact_floor_div("_hx", "_hd")
                - (F.col("n") + 1) * 3 * F.lit(1000000),
            ).alias("h6"),
        )
    )
    n3 = F.col("n") * F.col("n") * F.col("n") - F.col("n")
    labels = F.array(*[F.lit(label) for label, _, _, _, _ in _KW_CASES])
    return h.select(
        F.element_at(labels, F.col("pid") + 1).alias("case_name"),
        F.col("n").cast("long").alias("n_rows"),
        F.col("k").cast("long").alias("n_groups"),
        F.col("h6").cast("long").alias("h_e6"),
        (F.col("h6") * n3).alias("_ax"),
        F.nullif(n3 - F.col("t"), F.lit(0).cast(_DEC)).alias("_ad"),
    ).select(
        "case_name",
        "n_rows",
        "n_groups",
        "h_e6",
        _exact_floor_div("_ax", "_ad").cast("long").alias("h_adj_e6"),
    )


# ---------------------------------------------------------------------------
# 2. Brier score with Murphy decomposition
# ---------------------------------------------------------------------------

_BRIER_CAP = 8192  # chars; forecast p = min(n_chars, CAP)/CAP


@declared(
    "q_quality_brier_decomposition",
    oracle=f"""
    WITH b AS (
      SELECT LEAST(n_chars, {_BRIER_CAP}) AS m,
             CAST(COUNT(*) AS HUGEINT) AS nb,
             CAST(COUNT(*) FILTER (WHERE coalesce(lang, '') = 'en')
                  AS HUGEINT) AS eb
      FROM documents GROUP BY 1
    ),
    t AS (SELECT SUM(nb) AS n, SUM(eb) AS te FROM b),
    s AS (
      SELECT n, te,
             SUM((nb * m - {_BRIER_CAP} * eb) * (nb * m - {_BRIER_CAP} * eb)
                 * 1000000 // nb) AS srel,
             SUM((n * eb - nb * te) * (n * eb - nb * te)
                 * 1000000 // nb) AS sres,
             SUM((eb * (m - {_BRIER_CAP}) * (m - {_BRIER_CAP})
                  + (nb - eb) * m * m) * 1000000) AS sbr
      FROM b, t GROUP BY n, te
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(sbr // (n * {_BRIER_CAP} * {_BRIER_CAP}) AS BIGINT)
             AS brier_ppm,
           CAST(srel // (n * {_BRIER_CAP} * {_BRIER_CAP}) AS BIGINT)
             AS reliability_ppm,
           CAST(sres // (n * n * n) AS BIGINT) AS resolution_ppm,
           CAST(te * (n - te) * 1000000 // (n * n) AS BIGINT)
             AS uncertainty_ppm
    FROM s
    """,
)
def q_quality_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brier score of the crude length→English forecast p =
    min(n_chars, 8192)/8192 with its Murphy decomposition — the
    proper-scoring-rule companion to AUC (ranking) and the calibration
    bins (rates): reliability (calibration error, lower better) −
    resolution (sharpness, higher better) + uncertainty (the data's
    irreducible ȳ(1−ȳ)).  Decomposing over DISTINCT forecast values
    makes the classic identity Brier = REL − RES + UNC hold exactly
    (no within-bin variance term); with p rational (denominator 8192)
    and y ∈ {0,1}, every component is an exact ppm — the only
    convention points are the two per-value floors of squared-error
    sums over n_b (squares: non-negative numerators, rule 27), both
    engine-identical.  Plan: ONE exchange to the ≤8193-row distinct-
    forecast grain; totals window and both reductions run over that
    bounded table only."""
    d = table(spark, sf_dir, "documents")
    is_en = F.coalesce(F.col("lang"), F.lit("")) == "en"
    cap = F.lit(_BRIER_CAP)
    bins = d.groupBy(
        F.least(F.col("n_chars"), cap).cast(_DEC).alias("m")
    ).agg(
        F.count(F.lit(1)).cast(_DEC).alias("nb"),
        F.count(F.when(is_en, 1)).cast(_DEC).alias("eb"),
    )
    tot = Window.partitionBy()
    enriched = bins.select(
        "m",
        "nb",
        "eb",
        F.sum("nb").over(tot).alias("n"),
        F.sum("eb").over(tot).alias("te"),
    )
    capd = F.lit(_BRIER_CAP).cast(_DEC)
    rel_num = F.col("nb") * F.col("m") - capd * F.col("eb")
    res_num = F.col("n") * F.col("eb") - F.col("nb") * F.col("te")
    per = enriched.select(
        "n",
        "te",
        "nb",
        (rel_num * rel_num * 1000000).alias("_xrel"),
        (res_num * res_num * 1000000).alias("_xres"),
        (
            (
                F.col("eb") * (F.col("m") - capd) * (F.col("m") - capd)
                + (F.col("nb") - F.col("eb")) * F.col("m") * F.col("m")
            )
            * 1000000
        ).alias("sbr_term"),
    ).select(
        "n",
        "te",
        "sbr_term",
        _exact_floor_div("_xrel", "nb").alias("rel_term"),
        _exact_floor_div("_xres", "nb").alias("res_term"),
    )
    s = per.groupBy("n", "te").agg(
        F.sum("rel_term").alias("srel"),
        F.sum("res_term").alias("sres"),
        F.sum("sbr_term").alias("sbr"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_docs"),
        "srel",
        "sres",
        "sbr",
        (F.col("n") * _BRIER_CAP * _BRIER_CAP).alias("_dcap"),
        (F.col("n") * F.col("n") * F.col("n")).alias("_d3"),
        (F.col("te") * (F.col("n") - F.col("te")) * 1000000).alias("_xu"),
        (F.col("n") * F.col("n")).alias("_d2"),
    ).select(
        "n_docs",
        _exact_floor_div("sbr", "_dcap").cast("long").alias("brier_ppm"),
        _exact_floor_div("srel", "_dcap").cast("long")
        .alias("reliability_ppm"),
        _exact_floor_div("sres", "_d3").cast("long").alias("resolution_ppm"),
        _exact_floor_div("_xu", "_d2").cast("long").alias("uncertainty_ppm"),
    )


# ---------------------------------------------------------------------------
# 3. Precision/recall/F1 threshold sweep
# ---------------------------------------------------------------------------

_PR_STEP = 1024  # chars per threshold step
_PR_MAX = 8  # thresholds k·1024 for k = 0..8


@declared(
    "q_quality_pr_threshold_sweep",
    oracle=f"""
    WITH bins AS (
      SELECT LEAST(n_chars // {_PR_STEP}, {_PR_MAX}) AS b,
             CAST(COUNT(*) FILTER (WHERE coalesce(lang, '') = 'en')
                  AS HUGEINT) AS p,
             CAST(COUNT(*) FILTER (WHERE coalesce(lang, '') <> 'en')
                  AS HUGEINT) AS q
      FROM documents GROUP BY 1
    ),
    sweep AS (
      SELECT t.range AS k,
             SUM(CASE WHEN b >= t.range THEN p ELSE CAST(0 AS HUGEINT) END)
               AS tp,
             SUM(CASE WHEN b >= t.range THEN q ELSE CAST(0 AS HUGEINT) END)
               AS fp,
             SUM(p) AS pos
      FROM range(0, {_PR_MAX + 1}) t CROSS JOIN bins
      GROUP BY t.range
    )
    SELECT CAST(k * {_PR_STEP} AS BIGINT) AS threshold_chars,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(pos - tp AS BIGINT) AS fn,
           CAST(tp * 1000000 // NULLIF(tp + fp, 0) AS BIGINT)
             AS precision_ppm,
           CAST(tp * 1000000 // NULLIF(pos, 0) AS BIGINT) AS recall_ppm,
           CAST(2 * tp * 1000000 // NULLIF(tp + fp + pos, 0) AS BIGINT)
             AS f1_ppm
    FROM sweep
    """,
)
def q_quality_pr_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Precision / recall / F1 of "predict English when n_chars ≥ t"
    at nine thresholds t = 0..8·1024 — the operating-point sweep that
    complements AUC (threshold-free ranking) and the calibration bins
    (rates): which cutoff would a filtering pipeline actually deploy?
    F1 = 2TP/(2TP+FP+FN) and both rates are exact floored ppm on
    non-negative integer counts (rule 27).  Plan: one exchange to the
    ≤9-row capped length-bucket grain, then a 9×9 broadcast cross of
    thresholds × buckets — nothing row-scale past the first
    aggregate."""
    d = table(spark, sf_dir, "documents")
    is_en = F.coalesce(F.col("lang"), F.lit("")) == "en"
    bins = d.groupBy(
        F.least(
            F.expr(f"n_chars div {_PR_STEP}"), F.lit(_PR_MAX).cast("long")
        ).alias("b")
    ).agg(
        F.count(F.when(is_en, 1)).alias("p"),
        F.count(F.when(~is_en, 1)).alias("q"),
    )
    ks = spark.range(0, _PR_MAX + 1).select(F.col("id").alias("k"))
    sweep = (
        ks.crossJoin(F.broadcast(bins))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("b") >= F.col("k"), F.col("p")).otherwise(0))
            .alias("tp"),
            F.sum(F.when(F.col("b") >= F.col("k"), F.col("q")).otherwise(0))
            .alias("fp"),
            F.sum("p").alias("pos"),
        )
    )
    return sweep.select(
        (F.col("k") * _PR_STEP).cast("long").alias("threshold_chars"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        (F.col("pos") - F.col("tp")).cast("long").alias("fn"),
        F.expr(
            "CAST((tp * 1000000) div NULLIF(tp + fp, 0) AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr("CAST((tp * 1000000) div NULLIF(pos, 0) AS BIGINT)").alias(
            "recall_ppm"
        ),
        F.expr(
            "CAST((2 * tp * 1000000) div NULLIF(tp + fp + pos, 0) AS BIGINT)"
        ).alias("f1_ppm"),
    )


# ---------------------------------------------------------------------------
# 4. Graph degree distribution (supplier→customer bipartite)
# ---------------------------------------------------------------------------


@declared(
    "q_graph_degree_distribution",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_suppkey, o_custkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    deg AS (
      SELECT l_suppkey, COUNT(*) AS degree FROM edges GROUP BY l_suppkey
    )
    SELECT (length(bin(degree)) - 1) AS deg_log2,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MIN(degree) AS BIGINT) AS min_degree,
           CAST(MAX(degree) AS BIGINT) AS max_degree,
           CAST(SUM(degree) AS BIGINT) AS n_edges
    FROM deg GROUP BY 1
    """,
)
def q_graph_degree_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree distribution of the supplier→customer bipartite graph
    induced by lineitem⋈orders (edge = the pair traded at least once),
    histogrammed in floor-log2 buckets (length(bin(d))−1 — pure
    integer, no libm).  The pre-flight check every graph/join pipeline
    runs on an entity key: a heavy tail here is the signal to reach
    for q_join_salted_skew's salting.  Plan: orderkey equi-join (both
    sides shuffle on the join key once), one exchange to the distinct
    (supp, cust) pair, one to the supplier grain, and a ≤~20-row log2
    histogram."""
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_suppkey", "o_custkey")
        .distinct()
    )
    deg = edges.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy(
        (F.length(F.bin(F.col("degree"))) - 1).cast("long").alias("deg_log2")
    ).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
        F.sum("degree").alias("n_edges"),
    )


# ---------------------------------------------------------------------------
# 5. kNN label agreement (leave-one-out majority vote)
# ---------------------------------------------------------------------------


@declared(
    "q_embedding_knn_label_agreement",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS q_label
      FROM embeddings WHERE vec_id < {N_QUERY_VECTORS}
    ),
    c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv, label AS n_label
      FROM embeddings
    ),
    top AS (
      SELECT query_id, q_label, n_label FROM (
        SELECT query_id, q_label, n_label,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY {sql_cosine('qv', 'cv')} DESC, neighbor_id
               ) AS rnk
        FROM q CROSS JOIN c WHERE query_id <> neighbor_id
      ) WHERE rnk <= {TOP_K}
    ),
    votes AS (
      SELECT query_id, q_label, n_label, COUNT(*) AS cnt
      FROM top GROUP BY 1, 2, 3
    ),
    maj AS (
      SELECT query_id, q_label, n_label AS maj_label FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cnt DESC, n_label
        ) AS rn FROM votes
      ) WHERE rn = 1
    )
    SELECT q_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COUNT(*) FILTER (WHERE maj_label = q_label) AS BIGINT)
             AS n_agree,
           CAST(COUNT(*) FILTER (WHERE maj_label = q_label)
                * CAST(1000000 AS HUGEINT) // COUNT(*) AS BIGINT)
             AS agree_ppm
    FROM maj GROUP BY q_label
    """,
)
def q_embedding_knn_label_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leave-one-out 5-NN majority-vote label consistency per label —
    the standard embedding-space quality probe (a good space places
    same-label points together), and the supervised companion to
    q_embedding_cluster_purity.  The vote is engine-portable because
    the neighbor rank reuses q_similarity_cosine_topk's deterministic
    left-to-right double fold with the (cos DESC, neighbor_id)
    tie-break, and the majority pick breaks count ties on the smaller
    label; the agreement rate is an exact floored ppm.  Plan: broadcast
    the bounded query set against candidate partitions (the big side
    never shuffles — the LSH/IVF operators are the corpus² scale
    path); every later stage is over q·k rows."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("q_label"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("n_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "q_label",
            "n_label",
            "neighbor_id",
            cosine("qv", "cv").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    top = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )
    votes = top.groupBy("query_id", "q_label", "n_label").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cnt"), F.asc("n_label")
    )
    maj = (
        votes.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select("query_id", "q_label", F.col("n_label").alias("maj_label"))
    )
    return maj.groupBy(F.col("q_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.count(F.when(F.col("maj_label") == F.col("q_label"), 1)).alias(
            "n_agree"
        ),
        F.expr(
            "CAST((count(CASE WHEN maj_label = q_label THEN 1 END)"
            " * 1000000) div count(1) AS BIGINT)"
        ).alias("agree_ppm"),
    )
