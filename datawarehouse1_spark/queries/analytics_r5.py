"""Round-5 analytics battery: window-function extensions, statistical
aggregates, gap-filled time series, SCD-2 history, RFM/Pareto customer
analytics, and deeper LLM-pipeline text ops (bigrams, TF-IDF,
train/test contamination, token histograms, int8 quantization error).

These extend the dashboard-analytics class the reference delegates to
Metabase (readme.md:115-118) and the training-data-curation surface
(SURVEY.md "beyond the reference" section). Every query here is
hash-matched against a DuckDB oracle; determinism discipline follows
SURVEY.md §5.3 (unique-key tie-breaks, exact-decimal money, explicit
rounding wherever two engines' float accumulation orders could differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import (
    MONEY,
    money_sum,
    sql_money_sum,
)
from datawarehouse1_spark.registry import declared


# ---------------------------------------------------------------------------
# Window-function extensions (beyond C13-C15: ntile / percent_rank /
# first-last / moving average)
# ---------------------------------------------------------------------------


@declared(
    "q_window_ntile_quartile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
    """,
)
def q_window_ntile_quartile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-height quartile bucketing of customers by balance. ntile is
    a single global sort — at 100 TB swap for approx_percentile cutoffs
    (3 numbers broadcast) + a narrow CASE; the exact form here is the
    oracle-checkable semantics."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("quartile")
    )


@declared(
    "q_window_percent_rank",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           percent_rank() OVER (ORDER BY s_acctbal, s_suppkey) AS pct_rank,
           cume_dist() OVER (ORDER BY s_acctbal, s_suppkey) AS cume
    FROM supplier
    """,
)
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist: (rank-1)/(n-1) and rank/n — single IEEE
    divisions of small integers, bit-identical across engines."""
    s = table(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@declared(
    "q_window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order_key,
           last_value(o_orderkey)  OVER w AS last_order_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last order per customer carried onto every row — the
    window-frame form of a groupBy+join, one shuffle instead of two."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order_key"),
        F.last("o_orderkey").over(w).alias("last_order_key"),
    )


@declared(
    "q_window_moving_avg",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             {sql_money_sum("o_totalprice", "revenue")}
      FROM orders GROUP BY 1
    )
    SELECT day, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS ma7
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue. The moving SUM runs over
    DECIMAL (order-independent exact addition) and only the final
    divide is IEEE — deterministic in both engines. Daily pre-agg
    shrinks the window input to one row/day before the single sort."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(money_sum("o_totalprice", "revenue"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "revenue",
        (
            F.sum(F.col("revenue").cast(MONEY)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma7"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates
# ---------------------------------------------------------------------------


@declared(
    "q_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS qty_stddev,
           round(var_samp(l_quantity), 6)    AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment battery (stddev/variance/correlation) per return
    flag. Rounded to 6 dp: both engines use numerically-stable one-pass
    co-moment updates whose float noise lives far below 1e-6 for this
    data's magnitudes. Single scan, partial-aggregated."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@declared(
    "q_stats_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    ranked AS (
      SELECT l_returnflag, l_quantity, cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity) AS rnk
      FROM counts
    )
    SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
    FROM ranked WHERE rnk = 1
    """,
)
def q_stats_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value per group with a DETERMINISTIC tie-break (smallest
    value wins) — both engines' native mode() picks an arbitrary tied
    winner, which can never hash-match, so the mode is expressed as
    count + rank. Two chained aggregations: the second input is one row
    per distinct (group, value), tiny vs the fact table."""
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# Gap-filled time series (dimension completion)
# ---------------------------------------------------------------------------


@declared(
    "q_date_gapfill_months",
    oracle=f"""
    WITH big AS (
      SELECT * FROM orders WHERE o_totalprice > 400000
    ),
    bounds AS (
      SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
      FROM orders
    ),
    months AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE)
               AS month
      FROM bounds
    ),
    rev AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             {sql_money_sum("o_totalprice", "revenue")},
             COUNT(*) AS n_orders
      FROM big GROUP BY 1
    )
    SELECT m.month,
           COALESCE(r.revenue, 0.0) AS revenue,
           COALESCE(r.n_orders, 0) AS n_orders
    FROM months m LEFT JOIN rev r ON m.month = r.month
    """,
)
def q_date_gapfill_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled monthly revenue of big-ticket orders: the month spine
    is generated from the FULL table's bounds, so months where no order
    clears the threshold appear with 0 — the classic reporting
    dimension-completion the reference gets from Metabase date
    bucketing. The spine is a one-row aggregate exploded driver-free
    (sequence + explode), broadcast into the left join; the fact scan
    is filtered before its one shuffle."""
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    months = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month")
    )
    rev = big.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        money_sum("o_totalprice", "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        months.join(rev, "month", "left")
        .select(
            "month",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Event-stream analytics extensions
# ---------------------------------------------------------------------------


@declared(
    "q_events_hourly_heatmap",
    oracle=f"""
    SELECT isodow(ts) AS dow, hour(ts) AS hr,
           COUNT(*) AS n_events,
           {sql_money_sum("value", "total_value")}
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap (ISO dow, Monday=1). Spark's
    dayofweek is Sunday=1, remapped arithmetically to ISO to match
    DuckDB's isodow. One scan, 168-cell output — pure partial agg."""
    ev = table(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).alias("dow")
    return ev.groupBy(iso_dow, F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value", "total_value"),
    )


@declared(
    "q_events_variant_extract",
    oracle="""
    WITH extracted AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(k) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MAX(k) AS max_k
    FROM extracted GROUP BY event_type
    """,
)
def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via VARIANT (Spark 4's native JSON type):
    parse_json once, variant_get typed paths — the columnar-shredding
    path for JSON at scale, vs get_json_object's per-call string
    re-parse (q_events_json_extract covers that legacy form). Stays
    entirely in the JVM; oracle twin is DuckDB's json_extract."""
    ev = table(spark, sf_dir, "events")
    extracted = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return extracted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@declared(
    "q_events_gap_histogram",
    oracle="""
    WITH gaps AS (
      SELECT date_diff('second', lag(ts) OVER w, ts) AS gap_sec
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(floor(gap_sec / 600.0) AS BIGINT) * 600 AS gap_bucket_sec,
           COUNT(*) AS n_gaps
    FROM gaps WHERE gap_sec IS NOT NULL
    GROUP BY 1
    """,
)
def q_events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-gap distribution (10-minute buckets) — the data
    profile that justifies the 30-min session gap. Gap seconds follow
    the NTZ discipline (truncate to second, diff against epoch) so both
    engines count boundary crossings identically."""
    from datawarehouse1_spark.queries.events import _epoch_secs

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = _epoch_secs(F.col("ts"))
    gap = (secs - F.lag(secs).over(w)).alias("gap_sec")
    return (
        ev.select(gap)
        .filter(F.col("gap_sec").isNotNull())
        .groupBy(
            (F.floor(F.col("gap_sec") / 600) * 600).alias("gap_bucket_sec")
        )
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


@declared(
    "q_events_dau_wau",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    bounds AS (SELECT MAX(day) AS max_day FROM user_days),
    contrib AS (
      SELECT user_id,
             CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM user_days
    ),
    wau AS (
      SELECT day, COUNT(DISTINCT user_id) AS wau
      FROM contrib, bounds WHERE day <= max_day GROUP BY day
    ),
    dau AS (
      SELECT day, COUNT(*) AS dau FROM user_days GROUP BY day
    )
    SELECT w.day, COALESCE(d.dau, 0) AS dau, w.wau
    FROM wau w LEFT JOIN dau d ON w.day = d.day
    """,
)
def q_events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU per day. Rolling DISTINCT can't ride a
    window frame, so each active (user, day) is exploded to the 7
    target days it supports — a 7× fan-out of the already-deduped
    user-day set (tiny vs raw events), then one distinct-count. This
    shape stays linear at 100 TB; the naive alternative (range
    self-join) is quadratic in active days."""
    ev = table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    bounds = user_days.agg(F.max("day").alias("max_day"))
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(
                "day",
                F.date_add("day", 6),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    wau = (
        contrib.join(F.broadcast(bounds))
        .filter(F.col("day") <= F.col("max_day"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    dau = user_days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        wau.join(dau, "day", "left")
        .select("day", F.coalesce("dau", F.lit(0)).alias("dau"), "wau")
    )


@declared(
    "q_scd2_user_state",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_change
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM marked WHERE is_change = 1
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to
    FROM changes
    """,
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: collapse each user's event stream into
    [valid_from, valid_to) state intervals, opening a row only when the
    state actually changes (lag comparison) and closing it with the
    next change's timestamp (lead). The type-2 companion to
    q_upsert_latest's type-1 overwrite — both shuffles share the
    user_id partitioning, so AQE coalesces them onto one exchange."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
        ).cast("int").alias("is_change"),
    )
    changes = marked.filter(F.col("is_change") == 1).select(
        "user_id", "event_type", F.col("ts").alias("valid_from"), "event_id"
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


_HIERARCHY_SQL = """
    WITH RECURSIVE nodes AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey < 10 THEN NULL
                  ELSE CAST(floor(c_custkey / 10.0) AS BIGINT) END AS parent
      FROM customer WHERE c_custkey < 1000
    ),
    chain(id, root, depth) AS (
      SELECT id, id, 0 FROM nodes WHERE parent IS NULL
      UNION ALL
      SELECT n.id, c.root, c.depth + 1
      FROM nodes n JOIN chain c ON n.parent = c.id
    )
    SELECT id, root, depth FROM chain
"""


@declared("q_hierarchy_recursive_cte", oracle=_HIERARCHY_SQL)
def q_hierarchy_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal via WITH RECURSIVE (Spark 4's recursive CTE
    support — the org-chart/category-tree rollup class BI tools emit).
    The tree is derived deterministically from customer keys (parent =
    floor(id/10), forest rooted at ids < 10), so both engines recurse
    over identical edges; recursion depth is the tree height (~3), and
    each iteration is one bounded join — the same iterate-join shape as
    operators/dedup.py::dedup_clusters_from_pairs, here expressed in
    pure SQL and hash-matched against DuckDB's recursive CTE."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_HIERARCHY_SQL)


# ---------------------------------------------------------------------------
# Customer-value analytics (RFM, Pareto)
# ---------------------------------------------------------------------------


@declared(
    "q_rfm_segmentation",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_order_day,
             COUNT(*) AS frequency,
             {sql_money_sum("o_totalprice", "monetary")}
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, last_order_day, frequency, monetary,
           ntile(4) OVER (ORDER BY last_order_day, o_custkey) AS r_score,
           ntile(4) OVER (ORDER BY frequency, o_custkey)      AS f_score,
           ntile(4) OVER (ORDER BY monetary, o_custkey)       AS m_score
    FROM per_cust
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency/frequency/monetary quartile
    scores (4 = most recent / most frequent / highest spend). One
    fact-table shuffle to per-customer grain, then three global ntiles
    over the small per-customer set; ties pinned by custkey."""
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order_day"),
        F.count(F.lit(1)).alias("frequency"),
        money_sum("o_totalprice", "monetary"),
    )
    return per_cust.select(
        "o_custkey",
        "last_order_day",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("last_order_day", "o_custkey"))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy("frequency", "o_custkey"))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy("monetary", "o_custkey"))
        .alias("m_score"),
    )


@declared(
    "q_orders_pareto",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, {sql_money_sum("o_totalprice", "revenue")}
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
                  OVER (ORDER BY revenue DESC, o_custkey) AS DOUBLE)
             / CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER () AS DOUBLE)
             AS cum_share
    FROM per_cust
    """,
)
def q_orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto curve: customers ranked by spend with their running share
    of total revenue ('which customers make up the first 80%?'). Both
    the running and the grand-total sums are exact DECIMAL; the single
    final division is the only float op. The grand total rides an
    unpartitioned window over the per-customer grain (small), not the
    fact table."""
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(money_sum("o_totalprice", "revenue"))
    rev_dec = F.col("revenue").cast(MONEY)
    w_run = Window.orderBy(F.desc("revenue"), F.asc("o_custkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per_cust.select(
        "o_custkey",
        "revenue",
        (
            F.sum(rev_dec).over(w_run).cast("double")
            / F.sum(rev_dec).over(w_all).cast("double")
        ).alias("cum_share"),
    )
