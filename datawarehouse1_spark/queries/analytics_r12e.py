"""Round-12 analytics, batch 5: the cat→num effect size and forecast
backtesting.

* **Correlation ratio η²** — completes the association-measure triple:
  Pearson/Spearman cover numeric↔numeric, Cramér's V categorical↔
  categorical, and η² = SS_between/SS_total is the categorical→numeric
  rung (one-way ANOVA effect size).  Two declared arms: does market
  segment explain account balance, does order priority explain order
  value.  Exactness: with integer-cents sums, n·SS_B = Σ_g S_g²·n/n_g
  − S² and n·SS_T = n·Q − S²; the only non-integer step is the
  per-group S_g²·n div n_g floor (engine-identical `div`//`//`,
  error ≤ |groups| vs ~1e20 magnitudes, clamped at 0 — rule 27).

* **Seasonal-naive forecast backtest** — the forecasting-evaluation
  operator: predict month m's revenue as month m−12's (the standard
  naive-seasonal baseline every real forecast must beat), and report
  the per-month absolute percentage error over the backtest window as
  exact ppm.  The join is a linear month-index self-shift on the
  bounded monthly table; money stays exact DECIMAL cents until the
  display cast.

Exactness discipline as batches 1-4 (SCALE.md rules 20/27/30).

Reference parity: the reference ETL (etl/app.py) has no analytics
surface; SURVEY.md §2C/§2D extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared

_DEC = "decimal(38,0)"

# ---------------------------------------------------------------------------
# 1. Correlation ratio (eta squared)
# ---------------------------------------------------------------------------

# (label, table, group column, numeric column)
_ETA_CASES = (
    ("acctbal_by_segment", "customer", "c_mktsegment", "c_acctbal"),
    ("totalprice_by_priority", "orders", "o_orderpriority", "o_totalprice"),
)


def _eta_arm_sql(label: str, tbl: str, grp: str, num: str) -> str:
    cents = f"CAST(CAST({num} AS DECIMAL(18,2)) * 100 AS HUGEINT)"
    return f"""
    SELECT '{label}' AS case_name,
           CAST(n AS BIGINT) AS n_rows,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(GREATEST(CAST(0 AS HUGEINT), a - s * s) * 1000000
                // NULLIF(n * q - s * s, 0) AS BIGINT) AS eta2_e6
    FROM (
      SELECT SUM(ng) AS n,
             COUNT(*) AS n_groups,
             SUM(sg) AS s,
             SUM(qg) AS q,
             SUM(ag) AS a
      FROM (
        SELECT ng, sg, qg,
               sg * sg * (SUM(ng) OVER ()) // ng AS ag
        FROM (
          SELECT CAST(COUNT(*) AS HUGEINT) AS ng,
                 SUM({cents}) AS sg,
                 SUM({cents} * {cents}) AS qg
          FROM {tbl} GROUP BY {grp}
        )
      )
    )"""


@declared(
    "q_stats_eta_squared",
    oracle="\nUNION ALL\n".join(_eta_arm_sql(*c) for c in _ETA_CASES),
)
def q_stats_eta_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation ratio η² = SS_between/SS_total — the one-way-ANOVA
    effect size for a categorical→numeric pair, completing the
    association triple beside Pearson/Spearman (num↔num) and Cramér's
    V (cat↔cat): how much of the account-balance / order-value
    variance does the segment / priority explain?  Exact integer
    cents throughout; the single convention point is the per-group
    floor of S_g²·n/n_g (error bounded by the group count against
    ~1e20 sums), computed as DuckDB HUGEINT `//` vs Spark's
    subtract-modulo decimal form — `div` itself would overflow BIGINT
    at this quotient's width (SCALE.md rule 30 corollary); the
    numerator clamps at 0 so the final quotient never goes negative
    (rule 27), and a zero-variance column yields NULL via NULLIF.
    Plan per arm: one exchange to the group grain (the window for n
    runs over the |groups|-row aggregate), one 1-row reduction."""
    out = None
    for label, tbl, grp, num in _ETA_CASES:
        t = table(spark, sf_dir, tbl)
        cents = (F.col(num).cast("decimal(18,2)") * 100).cast(_DEC)
        groups = t.groupBy(grp).agg(
            F.count(F.lit(1)).cast(_DEC).alias("ng"),
            F.sum(cents).alias("sg"),
            F.sum(cents * cents).alias("qg"),
        )
        tot = Window.partitionBy()
        scored = groups.select(
            "ng",
            "sg",
            "qg",
            (F.col("sg") * F.col("sg") * F.sum("ng").over(tot)).alias("_anum"),
            F.col("ng").alias("_aden"),
        ).select(
            "ng",
            "sg",
            "qg",
            # exact floor division KEPT IN DECIMAL: Spark's `div` returns
            # BIGINT and this quotient (~sg²·n/n_g) can exceed it. After
            # subtracting the positive modulo the division is exact, so
            # the scale-6 decimal divide introduces no rounding.
            F.expr(
                "CAST((_anum - _anum % _aden) / _aden AS DECIMAL(38,0))"
            ).alias("ag"),
        )
        arm = (
            scored.agg(
                F.sum("ng").alias("n"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum("sg").alias("s"),
                F.sum("qg").alias("q"),
                F.sum("ag").cast(_DEC).alias("a"),
            )
            .select(
                F.lit(label).alias("case_name"),
                F.col("n").cast("long").alias("n_rows"),
                F.col("n_groups").cast("long").alias("n_groups"),
                (
                    F.greatest(
                        F.lit(0).cast(_DEC),
                        F.col("a") - F.col("s") * F.col("s"),
                    )
                    * F.lit(1000000)
                ).alias("_num"),
                F.nullif(
                    F.col("n") * F.col("q") - F.col("s") * F.col("s"),
                    F.lit(0).cast(_DEC),
                ).alias("_den"),
            )
            .select(
                "case_name",
                "n_rows",
                "n_groups",
                F.expr("_num div _den").cast("long").alias("eta2_e6"),
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# ---------------------------------------------------------------------------
# 2. Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------


@declared(
    "q_orders_seasonal_naive_backtest",
    oracle="""
    WITH monthly AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m_idx,
             year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
      FROM orders GROUP BY 1, 2
    )
    SELECT cur.ym,
           CAST(cur.rev_d AS DOUBLE) AS actual_revenue,
           CAST(prev.rev_d AS DOUBLE) AS forecast_revenue,
           CAST(abs(CAST(cur.rev_d * 100 AS HUGEINT)
                    - CAST(prev.rev_d * 100 AS HUGEINT)) * 1000000
                // NULLIF(CAST(cur.rev_d * 100 AS HUGEINT), 0) AS BIGINT)
             AS ape_ppm
    FROM monthly cur JOIN monthly prev ON cur.m_idx = prev.m_idx + 12
    """,
)
def q_orders_seasonal_naive_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Backtest of the seasonal-naive forecast (month m's revenue
    predicted by month m−12's — the baseline every real forecasting
    model must beat) over all months with a year-ago observation: per
    month, actual, forecast, and the absolute percentage error as
    exact ppm of integer cents.  The |error| numerator is non-negative
    by construction so the floored quotient is portable (rule 27/30).
    Plan: ONE month-grain aggregate of the fact, then a self-join on
    the linear month index over that bounded (~#months-row) table —
    the fact is touched once."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m_idx"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"))
    cur = monthly.select(
        "m_idx", "ym", F.col("rev_d").alias("cur_d")
    )
    prev = monthly.select(
        (F.col("m_idx") + 12).alias("m_idx"), F.col("rev_d").alias("prev_d")
    )
    joined = cur.join(prev, "m_idx")
    return joined.select(
        "ym",
        F.col("cur_d").cast("double").alias("actual_revenue"),
        F.col("prev_d").cast("double").alias("forecast_revenue"),
        F.abs(
            (F.col("cur_d") * 100).cast(_DEC)
            - (F.col("prev_d") * 100).cast(_DEC)
        ).alias("_anum0"),
        F.nullif((F.col("cur_d") * 100).cast(_DEC), F.lit(0).cast(_DEC)).alias(
            "_aden"
        ),
    ).select(
        "ym",
        "actual_revenue",
        "forecast_revenue",
        F.expr("(_anum0 * 1000000) div _aden").cast("long").alias("ape_ppm"),
    )
