"""Round-10 analytics, batch 4: as-of open-order backlog, per-region
revenue trend (exact OLS co-moments), and a Benford first-digit audit.

* **Open backlog** — "how many orders were open (placed but not yet
  fully shipped) as of each month-end?": per-order close date is the
  max lineitem ship date; each order then contributes to every
  month-end boundary in [placed, close). The boundary list is derived
  from the data itself (distinct month-ends of order dates) and is
  tiny at any scale, so the interval containment join is a BROADCAST
  inequality join — the corpus-side shape a real as-of inventory takes
  at 100 TB (facts never re-shuffle to answer an as-of question).

* **Revenue trend** — per-region OLS slope of monthly revenue over a
  month index. The money discipline applied to regression: monthly
  revenue is summed in exact integer cents, the five co-moments
  (n, Sx, Sy, Sxy, Sxx) are exact DECIMAL sums, and the slope then
  assembles from ONE fixed parenthesization of IEEE double ops both
  engines evaluate identically (the q_stats_welch_ttest discipline).
  The month index origin is a FIXED epoch (1992-01), not a data-driven
  min — OLS slope is shift-invariant, and a constant origin removes
  the global-min broadcast a data-driven origin would need.

* **Benford audit** — first-significant-digit distribution of order
  totals vs Benford's law expectation. Digits come from the exact
  integer cents (first digit of cents == first significant digit for
  any amount >= $0.01); expected shares are fixed micro-unit constants
  floor(1e6*log10(1+1/d)) embedded verbatim in both twins. A
  fraud/synthetic-data screen in one fact scan plus a 9-row window.

Reference parity: the reference ETL (etl/app.py) has no analytics
surface; SURVEY.md §2C/§2D extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import (
    sql_cents,
    sql_money_sum,
)
from datawarehouse1_spark.registry import declared

# ---------------------------------------------------------------- 1.


@declared(
    "q_orders_open_backlog",
    oracle=f"""
    WITH close AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_date
      FROM lineitem GROUP BY l_orderkey
    ),
    o AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS placed, o_totalprice
      FROM orders
    ),
    b AS (
      SELECT DISTINCT last_day(CAST(o_orderdate AS DATE)) AS as_of
      FROM orders
    )
    SELECT b.as_of,
           COUNT(*) AS n_open,
           {sql_money_sum('o.o_totalprice', 'value_open')}
    FROM o
    JOIN close c ON o.o_orderkey = c.l_orderkey
    JOIN b ON o.placed <= b.as_of AND b.as_of < c.close_date
    GROUP BY b.as_of
    """,
)
def q_orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog as of each month-end: an order is open on
    boundary B iff placed <= B < close, where close is the max lineitem
    ship date of the order (orders with no lineitems never report as
    open — the inner join makes that explicit in both engines). The
    month-end boundary list derives from the order dates themselves
    (bounded: one row per month in the data).

    Sweep-line decomposition (r13; previously a
    BroadcastNestedLoopJoin that fanned every order row out to every
    boundary — |orders| x #months predicate work): with all boundaries
    at month-ends, placed <= B iff last_day(placed) <= B and close <= B
    iff last_day(close) <= B, so each order contributes
    (+1, +price) at last_day(placed) and (-1, -price) at
    last_day(close), and the backlog at B is the PREFIX SUM of those
    month deltas — indicator(placed <= B < close) = indicator(placed
    <= B) - indicator(close <= B), valid because rows with close <=
    placed (present in the synthetic data) are filtered out exactly as
    the original interval join ignores them (empty interval). Money
    deltas stay DECIMAL end-to-end, so the +/- cancellation is exact
    and the final double cast matches the oracle's direct sum
    bit-for-bit. Plan: ONE orderkey exchange each for the lineitem
    close aggregate and the orders side (co-partitioned equi-join);
    fact rows then reduce to <=2 delta rows each in one exchange to the
    ~#months grain; the running sum and the boundary semi-join ride
    that bounded table (rule 22; the ORDER BY key is unique per group,
    rule 31). At 100 TB the fact flows through exactly once — no
    per-boundary fan-out at all. Sum-widths: Spark widens the decimal
    sums automatically; months carry at most |orders|·max_price <<
    10^26."""
    li = table(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_date")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("placed"),
        "o_totalprice",
    )
    j = (
        o.join(close, o.o_orderkey == close.l_orderkey, "inner")
        .filter(F.col("close_date") > F.col("placed"))
        .select(
            F.last_day("placed").alias("m_open"),
            F.last_day("close_date").alias("m_close"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    )
    opens = j.select(
        F.col("m_open").alias("m"),
        F.lit(1).cast("long").alias("dn"),
        F.col("price").alias("dv"),
    )
    closes = j.select(
        F.col("m_close").alias("m"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col("price")).alias("dv"),
    )
    b = (
        table(spark, sf_dir, "orders")
        .select(F.last_day(F.to_date("o_orderdate")).alias("as_of"))
        .distinct()
    )
    # Every boundary month must appear in the event table even when it
    # contributes no open/close delta (all its orders degenerate with
    # close <= placed, or lineitem-less): such a month still inherits
    # the CARRIED cumulative backlog from earlier months. Zero-delta
    # rows for each boundary make the prefix sum defined there; months
    # never in b are still dropped by the final semi-join (r13 review
    # fix — the delta-only table silently omitted carried-positive
    # boundary months). Deliberately NOT deduplicated: duplicate zero
    # rows vanish in the groupBy's map-side partial aggregate, so this
    # arm adds no exchange of its own (a distinct here re-shuffled the
    # month column and blew the pinned 5-exchange budget).
    zeros = table(spark, sf_dir, "orders").select(
        F.last_day(F.to_date("o_orderdate")).alias("m"),
        F.lit(0).cast("long").alias("dn"),
        F.lit(0).cast("decimal(18,2)").alias("dv"),
    )
    ev = (
        opens.unionByName(closes)
        .unionByName(zeros)
        .groupBy("m")
        .agg(F.sum("dn").alias("nd"), F.sum("dv").alias("vd"))
    )
    w = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = ev.select(
        "m",
        F.sum("nd").over(w).alias("n_open"),
        F.sum("vd").over(w).alias("v_open"),
    )
    return (
        cum.join(F.broadcast(b), cum.m == b.as_of, "inner")
        .filter(F.col("n_open") > 0)
        .select(
            "as_of",
            "n_open",
            F.col("v_open").cast("double").alias("value_open"),
        )
    )


# ---------------------------------------------------------------- 2.

_CENTS = sql_cents("o_totalprice")


@declared(
    "q_orders_revenue_trend",
    oracle=f"""
    WITH m AS (
      SELECT r.r_name,
             (EXTRACT(year FROM o.o_orderdate) - 1992) * 12
               + (EXTRACT(month FROM o.o_orderdate) - 1) AS x,
             SUM({_CENTS}) AS y
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, x
    ),
    mom AS (
      SELECT r_name,
             CAST(COUNT(*) AS BIGINT) AS n_months,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx
      FROM m GROUP BY r_name
    )
    SELECT r_name,
           n_months,
           round((n_months * sxy - sx * sy)
                 / nullif(n_months * sxx - sx * sx, 0), 6)
             AS slope_cents_per_month6,
           round(sy / n_months / 100, 2) AS mean_monthly_revenue
    FROM mom
    """,
)
def q_orders_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region OLS slope of monthly revenue vs month index — "is
    this region's business growing, and how fast per month?". Exactness
    discipline (q_stats_welch_ttest): monthly revenue is an exact
    integer-cents sum; the co-moments are exact DECIMAL(38,0) sums
    (order-independent in both engines); only then does ONE fixed
    parenthesization of IEEE double ops assemble the slope, rounded to
    6dp. The month index is anchored at the fixed 1992-01 epoch — the
    slope is shift-invariant, so no data-driven global min (and its
    broadcast) is needed. Plan: one custkey shuffle joins orders to
    customer; nation/region broadcast; the (region, month) and region
    aggregates are narrow and bounded (#regions x #months rows)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    x = (
        (F.year("o_orderdate") - F.lit(1992)) * 12
        + (F.month("o_orderdate") - 1)
    ).alias("x")
    cents = F.expr(_CENTS)
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", x, cents.alias("cents"))
        .groupBy("r_name", "x")
        .agg(F.sum("cents").alias("y"))
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    mom = m.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * F.col("x")).cast("double").alias("sxx"),
    )
    nm = F.col("n_months")
    num = nm * F.col("sxy") - F.col("sx") * F.col("sy")
    den = nm * F.col("sxx") - F.col("sx") * F.col("sx")
    return mom.select(
        "r_name",
        "n_months",
        F.round(num / F.nullif(den, F.lit(0)), 6).alias(
            "slope_cents_per_month6"
        ),
        F.round(F.col("sy") / nm / 100, 2).alias("mean_monthly_revenue"),
    )


# ---------------------------------------------------------------- 3.

# floor(1e6 * log10(1 + 1/d)) for d = 1..9 — Benford's law expected
# first-digit shares in micro-units (fixed public constants, embedded
# verbatim in both twins so no engine evaluates a log).
_BENFORD_E6 = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({v} AS BIGINT)" for d, v in enumerate(_BENFORD_E6, 1)
) + " END"


@declared(
    "q_stats_benford_first_digit",
    oracle=f"""
    WITH cents AS (
      SELECT {_CENTS} AS c FROM orders WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM cents
    ),
    counts AS (
      SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY digit
    ),
    shares AS (
      SELECT digit, n_orders,
             CAST(n_orders * 1000000 // SUM(n_orders) OVER () AS BIGINT)
               AS share_e6
      FROM counts
    )
    SELECT digit, n_orders, share_e6,
           {_BENFORD_CASE_SQL} AS expected_e6,
           share_e6 - {_BENFORD_CASE_SQL} AS excess_e6
    FROM shares
    """,
)
def q_stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    fraud / synthetic-data screen: organically-grown amounts follow
    P(d) = log10(1+1/d); fabricated ones usually don't. The first
    significant digit is read off the EXACT integer cents (first digit
    of cents == first significant digit of the amount for anything
    >= $0.01), so no float formatting is involved; observed shares are
    floored micro-units and the expected shares are fixed public
    constants embedded verbatim in both twins. Plan: one fact scan
    partial-aggregates to <=9 digit rows; the total-over-window and
    the expectation lookup run on that 9-row table (the unpartitioned
    window is bounded by construction — SCALE.md rule 22 shape)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(F.expr(_CENTS).cast("string"), 1, 1).cast("int")
    counts = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    shares = counts.withColumn(
        "share_e6",
        F.expr("n_orders * 1000000 div sum(n_orders) OVER ()").cast("long"),
    )
    expected = F.expr(_BENFORD_CASE_SQL)
    return shares.select(
        "digit",
        "n_orders",
        "share_e6",
        expected.alias("expected_e6"),
        (F.col("share_e6") - expected).alias("excess_e6"),
    )
