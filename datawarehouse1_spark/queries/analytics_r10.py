"""Round-10 analytics: cohort lifetime-value matrix, cumulative
distribution windows, user-lifecycle growth accounting, and embedding
centroid drift.

Four reporting shapes every analytics serving layer runs that were
missing from the battery:

* **Cohort LTV matrix** — customers grouped by first-order month,
  revenue tracked by months-since-first (the retention/LTV triangle
  every subscription dashboard renders). Two exchanges: the
  first-order window on o_custkey, then the (cohort, age) aggregate —
  both narrow; revenue exact via the DECIMAL(18,2) money discipline.

* **cume_dist + revenue share** — the "what fraction of orders sit at
  or below this price" curve per priority class, with the cumulative
  revenue share beside it (the Lorenz/Pareto view). cume_dist depends
  only on the ORDER value so it is deterministic under ties; the
  running revenue uses the default RANGE frame (peers included) in
  both engines, from exact decimal sums.

* **User lifecycle (growth accounting)** — per day: new / retained /
  resurrected active users (the standard DAU decomposition: first-ever
  day, consecutive-day return, gap return). Per-user day sequences via
  one (user, day) distinct + a lag window sharing the user exchange;
  the day-level rollup is the third narrow shuffle.

* **Embedding centroid drift** — per-label centroid vs the global
  centroid, as cosine in exact micro-units: every component is
  quantized to floor(v * 1e6) FIRST, so all sums are integers (exact,
  order-independent in both engines — the same reason money goes
  through DECIMAL) and the only float ops are one sqrt + one divide at
  the end. The report a curation pipeline reads to see whether one
  slice of the corpus is drifting away from the population in
  embedding space.

Reference parity: the reference ETL (etl/app.py) has no analytics
surface; SURVEY.md §2C/§2D extension inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import money_sum, sql_money_sum
from datawarehouse1_spark.registry import declared

_DEC = "decimal(38,0)"

# ---------------------------------------------------------------- 1.


@declared(
    "q_orders_cohort_ltv",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey, o_totalprice,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
             CAST(MIN(date_trunc('month', o_orderdate))
                    OVER (PARTITION BY o_custkey) AS DATE) AS cm
      FROM orders
    )
    SELECT cm AS cohort_month,
           CAST(datediff('month', cm, om) AS INT) AS age_months,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           {sql_money_sum('o_totalprice', 'revenue')}
    FROM base
    GROUP BY cm, datediff('month', cm, om)
    """,
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers bucketed by the month
    of their FIRST order (the cohort), revenue and activity tracked by
    months elapsed since that first month — the (cohort x age)
    triangle behind every retention/LTV dashboard. age is exact
    calendar months between month-start dates, so months_between /
    datediff('month') agree as whole integers. TWO exchanges: the
    min-over-customer window on o_custkey, then the (cohort, age)
    aggregate — at 100 TB both shuffles carry only
    (custkey, month, price) tuples, and the first could be removed
    entirely by bucketing orders on o_custkey."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    base = o.select(
        "o_custkey",
        "o_totalprice",
        F.date_trunc("month", "o_orderdate").cast("date").alias("om"),
        F.min(F.date_trunc("month", "o_orderdate"))
        .over(w)
        .cast("date")
        .alias("cm"),
    )
    age = F.months_between(F.col("om"), F.col("cm")).cast("int")
    return (
        base.select("o_custkey", "o_totalprice", "cm", age.alias("age_months"))
        .groupBy(F.col("cm").alias("cohort_month"), "age_months")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "revenue"),
        )
    )


# ---------------------------------------------------------------- 2.


@declared(
    "q_window_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           round(cume_dist() OVER
                   (PARTITION BY o_orderpriority ORDER BY o_totalprice),
                 6) AS cd6,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                        (PARTITION BY o_orderpriority ORDER BY o_totalprice)
                      AS DOUBLE)
                 / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                          (PARTITION BY o_orderpriority)
                        AS DOUBLE), 6) AS rev_share6
    FROM orders
    """,
)
def q_window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per priority class over order value, with the
    cumulative revenue share beside it — together the Lorenz view
    ("orders at or below this price carry X% of revenue"). cume_dist
    and the default RANGE frame both depend only on the ORDER value,
    so ties are deterministic in both engines; the running and total
    revenue are exact decimal sums divided once in IEEE doubles. ONE
    exchange: all three windows share the o_orderpriority partition
    (the ordered windows sort within it; the total-revenue window
    needs no order)."""
    o = table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    wo = wp.orderBy("o_totalprice")
    money = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.cume_dist().over(wo), 6).alias("cd6"),
        F.round(
            F.sum(money).over(wo).cast("double")
            / F.sum(money).over(wp).cast("double"),
            6,
        ).alias("rev_share6"),
    )


# ---------------------------------------------------------------- 3.


@declared(
    "q_events_user_lifecycle",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    seq AS (
      SELECT user_id, d,
             LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d,
             MIN(d) OVER (PARTITION BY user_id) AS first_d
      FROM days
    )
    SELECT d AS day,
           COUNT(*) AS n_active,
           CAST(COUNT(*) FILTER (WHERE d = first_d) AS BIGINT) AS n_new,
           CAST(COUNT(*) FILTER (WHERE datediff('day', prev_d, d) = 1)
                AS BIGINT) AS n_retained,
           CAST(COUNT(*) FILTER (WHERE datediff('day', prev_d, d) > 1)
                AS BIGINT) AS n_resurrected
    FROM seq
    GROUP BY d
    """,
)
def q_events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting lifecycle report: per day, active users split
    into NEW (first-ever active day), RETAINED (also active the
    previous calendar day), and RESURRECTED (returning after a gap) —
    the standard DAU decomposition, and the classes partition
    n_active exactly (law pinned in pytest). Exchanges: the
    (user, day) distinct, the per-user windows (lag + min share one
    user exchange), and the day rollup — three, all narrow; event
    payloads never shuffle."""
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    wu = Window.partitionBy("user_id")
    wo = wu.orderBy("d")
    seq = days.select(
        "d",
        F.lag("d").over(wo).alias("prev_d"),
        F.min("d").over(wu).alias("first_d"),
    )
    diff = F.datediff(F.col("d"), F.col("prev_d"))
    return seq.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("n_active"),
        F.count(F.when(F.col("d") == F.col("first_d"), 1)).alias("n_new"),
        F.count(F.when(diff == 1, 1)).alias("n_retained"),
        F.count(F.when(diff > 1, 1)).alias("n_resurrected"),
    )


# ---------------------------------------------------------------- 4.


@declared(
    "q_embedding_centroid_drift",
    oracle="""
    WITH q AS (
      SELECT label, CAST(i AS INT) AS dim,
             CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                        * 1000000) AS BIGINT) AS qv
      FROM embeddings, UNNEST(range(len(embedding))) AS u(i)
    ),
    lab AS (
      SELECT label, dim,
             CAST(SUM(qv) AS HUGEINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM q GROUP BY label, dim
    ),
    gdim AS (
      SELECT dim, CAST(SUM(s) AS HUGEINT) AS g FROM lab GROUP BY dim
    ),
    gn AS (
      SELECT SUM(g * g) AS g2 FROM gdim
    ),
    per AS (
      SELECT label,
             SUM(s * g) AS dot,
             SUM(s * s) AS l2,
             MAX(n_rows) AS n_vecs
      FROM lab JOIN gdim USING (dim)
      GROUP BY label
    )
    SELECT label,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(floor(CAST(dot AS DOUBLE) * 1000000
                      / sqrt(CAST(l2 AS DOUBLE) * CAST(g2 AS DOUBLE)))
                AS BIGINT) AS cos_e6
    FROM per, gn
    """,
)
def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift against the global centroid, as cosine
    similarity in exact micro-units — the slice-health report a
    curation pipeline reads to catch a corpus subset drifting in
    embedding space. Exactness: components quantize to
    floor(v * 1e6) integers BEFORE any aggregation, so every sum is
    exact and order-independent in both engines (the money-discipline
    argument applied to vectors); scale cancels in the cosine, so the
    centroids' 1/n never needs to materialize; the only float ops are
    one sqrt and one divide on the final 10 rows. Plan: quantized
    components aggregate per (label, dim) — the ONLY exchange that
    sees per-row data; the global centroid re-aggregates the 640-row
    label sums; the cosine assembles from a dim-aligned join of two
    bounded summaries plus a 1-row broadcast of the global norm. At
    100 TB nothing wider than (label, dim, int64) ever shuffles, and
    the DECIMAL(38,0) co-moments hold to ~1e9 vectors x 1e6 quanta
    without overflow."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        "dim",
        F.floor(F.col("v").cast("double") * 1000000).alias("qv"),
    )
    # lab is bounded (|labels| x |dims| rows) and feeds BOTH the global
    # centroid and the per-label co-moments; localCheckpoint runs the
    # wide posexplode aggregate ONCE instead of once per consumer (the
    # minhash/video-temporal pattern, SCALE.md rule 12).
    lab = (
        q.groupBy("label", "dim")
        .agg(
            F.sum("qv").cast(_DEC).alias("s"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .localCheckpoint(eager=True)
    )
    glob = (
        lab.groupBy("dim")
        .agg(F.sum("s").cast(_DEC).alias("g"))
        .localCheckpoint(eager=True)
    )
    gn = glob.agg(F.sum(F.col("g") * F.col("g")).alias("g2"))
    per = (
        lab.join(F.broadcast(glob), "dim")
        .groupBy("label")
        .agg(
            F.sum(F.col("s") * F.col("g")).alias("dot"),
            F.sum(F.col("s") * F.col("s")).alias("l2"),
            F.max("n_rows").alias("n_vecs"),
        )
    )
    return per.crossJoin(F.broadcast(gn)).select(
        "label",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.floor(
            F.col("dot").cast("double")
            * 1000000
            / F.sqrt(F.col("l2").cast("double") * F.col("g2").cast("double"))
        )
        .cast("long")
        .alias("cos_e6"),
    )


# ---------------------------------------------------------------- 5.


@declared(
    "q_orders_market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    totals AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items
    ),
    part_n AS (
      SELECT l_partkey, COUNT(*) AS n FROM items GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b,
           CAST(n_ab AS BIGINT) AS n_ab,
           CAST(na.n AS BIGINT) AS n_a,
           CAST(nb.n AS BIGINT) AS n_b,
           CAST((CAST(n_ab AS HUGEINT) * t.n_orders * 1000000)
                // (CAST(na.n AS HUGEINT) * nb.n) AS BIGINT) AS lift_e6
    FROM pairs
    JOIN part_n na ON pairs.part_a = na.l_partkey
    JOIN part_n nb ON pairs.part_b = nb.l_partkey
    CROSS JOIN totals t
    WHERE n_ab >= 3
    ORDER BY n_ab DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
)
def q_orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over lineitem: the top-20 part pairs
    co-purchased in the same order (support >= 3), with exact lift in
    floored micro-units — lift = N * n_ab / (n_a * n_b), the
    association-rule statistic, computed entirely in integer
    arithmetic (HUGEINT/DECIMAL products, integer div) so both engines
    emit identical values. Plan: pair generation is an equi-self-join
    on l_orderkey (bounded fan-out: k items per order produce k²/2
    pairs, k is small by construction of a retail basket), pair and
    per-part counts aggregate narrowly, the per-part counts broadcast
    back onto the 20-row candidate set, and the top-20 is
    TakeOrderedAndProject — no global sort. At 100 TB the orderkey
    self-join co-partitions both sides on the same key (one shuffle
    each) and nothing wider than (orderkey, partkey) moves."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=True
    )
    totals = items.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    part_n = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    na = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a")
    )
    nb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .crossJoin(F.broadcast(totals))
    )
    lift = F.expr(
        "CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000"
        " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
    ).cast("long")
    return (
        out.select(
            "part_a", "part_b", "n_ab", "n_a", "n_b", lift.alias("lift_e6")
        )
        .orderBy(F.col("n_ab").desc(), F.col("part_a"), F.col("part_b"))
        .limit(20)
    )


# ---------------------------------------------------------------- 6.

_CENTS38 = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))"


@declared(
    "q_stats_welch_ttest",
    oracle=f"""
    WITH sums AS (
      SELECT
        CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT) AS n_a,
        CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 <> 0) AS BIGINT) AS n_b,
        CAST(SUM({_CENTS38}) FILTER (WHERE o_orderkey % 2 = 0)
             AS DOUBLE) AS s_a,
        CAST(SUM({_CENTS38}) FILTER (WHERE o_orderkey % 2 <> 0)
             AS DOUBLE) AS s_b,
        CAST(SUM({_CENTS38} * {_CENTS38}) FILTER (WHERE o_orderkey % 2 = 0)
             AS DOUBLE) AS q_a,
        CAST(SUM({_CENTS38} * {_CENTS38}) FILTER (WHERE o_orderkey % 2 <> 0)
             AS DOUBLE) AS q_b
      FROM orders
    )
    SELECT n_a, n_b,
           round((s_a / n_a - s_b / n_b)
                 / sqrt((q_a - s_a * (s_a / n_a)) / (n_a - 1) / n_a
                        + (q_b - s_b * (s_b / n_b)) / (n_b - 1) / n_b)
                 , 6) AS t6,
           round((s_a / n_a - s_b / n_b) / 100, 2) AS mean_diff_dollars
    FROM sums
    """,
)
def q_stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic between the even/odd orderkey
    halves of o_totalprice (the same A/B split the drift battery
    uses) — the hypothesis-testing rung between the chi-square
    (categorical) and KS (distributional) reports. All moments are
    EXACT integer-cents sums (DECIMAL(38,0)); the t statistic then
    assembles with a fixed parenthesization of IEEE double ops that
    both engines evaluate identically, rounded to 6dp. ONE exchange:
    a single partial-aggregated scan collects all six moments (the
    FILTER clauses fold into one aggregate). A true A/B difference in
    means shows as |t| >> 2; the staged halves of a uniform synthetic
    table sit near 0."""
    o = table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(_DEC)
    even = F.col("o_orderkey") % 2 == 0
    sums = o.agg(
        F.count(F.when(even, 1)).alias("n_a"),
        F.count(F.when(~even, 1)).alias("n_b"),
        F.sum(F.when(even, cents)).cast("double").alias("s_a"),
        F.sum(F.when(~even, cents)).cast("double").alias("s_b"),
        F.sum(F.when(even, cents * cents)).cast("double").alias("q_a"),
        F.sum(F.when(~even, cents * cents)).cast("double").alias("q_b"),
    )
    mean_a = F.col("s_a") / F.col("n_a")
    mean_b = F.col("s_b") / F.col("n_b")
    var_term_a = (
        (F.col("q_a") - F.col("s_a") * mean_a)
        / (F.col("n_a") - 1)
        / F.col("n_a")
    )
    var_term_b = (
        (F.col("q_b") - F.col("s_b") * mean_b)
        / (F.col("n_b") - 1)
        / F.col("n_b")
    )
    return sums.select(
        "n_a",
        "n_b",
        F.round(
            (mean_a - mean_b) / F.sqrt(var_term_a + var_term_b), 6
        ).alias("t6"),
        F.round((mean_a - mean_b) / 100, 2).alias("mean_diff_dollars"),
    )


# ---------------------------------------------------------------- 7.


@declared(
    "q_supplier_scorecard",
    oracle="""
    WITH per_supp AS (
      SELECT l_suppkey,
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS revenue,
             CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') * 1000000
                  // COUNT(*) AS BIGINT) AS return_share_e6
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT n.n_name AS nation, s.s_name AS supplier,
           p.n_lines, p.revenue, p.return_share_e6,
           CAST(row_number() OVER
                  (PARTITION BY n.n_name
                   ORDER BY p.revenue DESC, s.s_suppkey ASC)
                AS INT) AS nation_rank
    FROM per_supp p
    JOIN supplier s ON s.s_suppkey = p.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    """,
)
def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard: per supplier — line count, exact-decimal
    discounted revenue, return-rate in floored micro-units
    (returnflag='R' share), and the supplier's revenue rank within its
    nation — the vendor-management report a procurement dashboard
    serves. Plan: ONE lineitem pass partial-aggregates per suppkey
    (the only exchange that sees fact rows); supplier and nation
    broadcast onto the bounded per-supplier table; the nation ranking
    window rides a second narrow exchange. Rank ties break on suppkey
    so the row set is deterministic."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(rev).cast("double").alias("revenue"),
        F.expr(
            "count(case when l_returnflag = 'R' then 1 end) * 1000000"
            " div count(1)"
        )
        .cast("long")
        .alias("return_share_e6"),
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    joined = per_supp.join(
        F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey")
    ).join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue").desc(), F.col("s_suppkey").asc()
    )
    return joined.select(
        F.col("n_name").alias("nation"),
        F.col("s_name").alias("supplier"),
        "n_lines",
        "revenue",
        "return_share_e6",
        F.row_number().over(w).cast("int").alias("nation_rank"),
    )


# ---------------------------------------------------------------- 8.

_LAT_BUCKET = """
    CASE WHEN {d} <= 7 THEN '0-7d'
         WHEN {d} <= 30 THEN '8-30d'
         WHEN {d} <= 90 THEN '31-90d'
         ELSE '90d+' END
"""


@declared(
    "q_orders_ship_latency",
    oracle=f"""
    WITH gaps AS (
      SELECT o.o_orderpriority,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS gap_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    bucketed AS (
      SELECT o_orderpriority,
             {_LAT_BUCKET.format(d='gap_days')} AS bucket
      FROM gaps
    ),
    counts AS (
      SELECT o_orderpriority, bucket, COUNT(*) AS n_lines
      FROM bucketed GROUP BY o_orderpriority, bucket
    )
    SELECT o_orderpriority, bucket,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_lines * 1000000
                // SUM(n_lines) OVER (PARTITION BY o_orderpriority)
                AS BIGINT) AS share_e6
    FROM counts
    """,
)
def q_orders_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency histogram: line items bucketed by days
    between order date and ship date, per order priority, with each
    bucket's share of its priority class in floored micro-units — the
    operational SLA report. Day gaps are date-boundary counts
    (identical semantics both engines); shares are integer `div`
    against the priority total carried by a window over the bounded
    (priority, bucket) count table. Exchanges: the orderkey fact join
    (both sides) + the bucket aggregate + the tiny share window — only
    (orderkey, date) tuples cross the fact shuffles."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    gaps = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("gap_days"),
    )
    bucketed = gaps.select(
        "o_orderpriority",
        F.expr(_LAT_BUCKET.format(d="gap_days")).alias("bucket"),
    )
    counts = bucketed.groupBy("o_orderpriority", "bucket").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    w = Window.partitionBy("o_orderpriority")
    return counts.select(
        "o_orderpriority",
        "bucket",
        "n_lines",
        F.expr("n_lines * 1000000").cast("long").alias("_num"),
        F.sum("n_lines").over(w).alias("_den"),
    ).select(
        "o_orderpriority",
        "bucket",
        "n_lines",
        F.expr("_num div _den").cast("long").alias("share_e6"),
    )


# ---------------------------------------------------------------- 9.


@declared(
    "q_events_interarrival_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             date_diff('microsecond',
                       LAG(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
           CAST(SUM(gap_us) // COUNT(gap_us) AS BIGINT) AS mean_gap_us,
           CAST(CAST(COUNT(gap_us) AS HUGEINT) * 3600000000 * 1000000
                // NULLIF(SUM(gap_us), 0) AS BIGINT) AS rate_per_hour_e6
    FROM seq
    GROUP BY event_type
    """,
)
def q_events_interarrival_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event inter-arrival rate: gaps measured per
    (user, type) stream (a per-TYPE total order would funnel each
    type through one task — the window partitions by user instead,
    bounded and parallel), aggregated into exact integer microsecond sums;
    the arrival rate is the rational lambda = n/sum in events-per-hour
    micro-units via integer `div` (NULLIF-guarded for the all-ties
    corner). Wall-clock microsecond diffs on the NTZ column are
    timezone-independent by construction (SCALE.md rule 25). Two
    exchanges: the (user, type) window and the per-type aggregate."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    # microsecond gaps: the NTZ values are microsecond-quantized, so
    # the "complete microseconds" (Spark timestampdiff) and
    # "microsecond boundaries crossed" (DuckDB date_diff) conventions
    # coincide exactly — second-level diffs would NOT (0.9s -> 1.1s is
    # one crossed boundary but zero complete seconds)
    seq = e.select(
        "event_type",
        F.timestamp_diff(
            "MICROSECOND", F.lag("ts").over(w), F.col("ts")
        ).alias("gap_us"),
    )
    agg = seq.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").alias("sum_gap_us"),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        "sum_gap_us",
        F.expr("sum_gap_us div n_gaps").cast("long").alias("mean_gap_us"),
        # n * (3.6e9 us/hour) * 1e6 overflows int64 -> DECIMAL(38,0)
        F.expr(
            "cast(n_gaps as decimal(38,0)) * 3600000000 * 1000000"
            " div nullif(sum_gap_us, 0)"
        )
        .cast("long")
        .alias("rate_per_hour_e6"),
    )


# ---------------------------------------------------------------- 10.


@declared(
    "q_events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    tot AS (
      SELECT event_type,
             SUM(n) AS total_n,
             COUNT(*) AS n_days
      FROM daily GROUP BY event_type
    ),
    cusum AS (
      SELECT d.event_type, d.day, d.n,
             SUM(CAST(d.n AS DECIMAL(38,0)) * t.n_days - t.total_n)
               OVER (PARTITION BY d.event_type ORDER BY d.day) AS s
      FROM daily d JOIN tot t ON d.event_type = t.event_type
    ),
    best AS (
      SELECT event_type, day, n, s,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(s) DESC, day ASC) AS r
      FROM cusum
    )
    SELECT event_type,
           day AS changepoint_day,
           CAST(n AS BIGINT) AS day_events,
           CAST(s AS BIGINT) AS s_scaled,
           CAST(abs(s) AS BIGINT) AS s_abs
    FROM best WHERE r = 1
    """,
)
def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily event volume per type —
    the sequential-monitoring rung of the drift battery (TVD /
    chi-square / KS test DISTRIBUTIONS; CUSUM finds WHEN a rate
    shifted): the day maximizing |Σ_{d<=k} (n_d - mean)| marks the
    most likely level change. Exactness: the partial sums are scaled
    by n_days (S_k = Σ (n_d * D - N), an integer multiple of the
    textbook CUSUM that preserves the argmax), so every value is an
    exact DECIMAL integer and the argmax + earliest-day tie-break is
    deterministic in both engines. Plan: the daily aggregate is the
    only exchange that sees event rows; the per-type totals join back
    onto the bounded (type, day) table and the cumulative/argmax
    windows ride its per-type partitions (bounded: |types| x |days|
    rows)."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = daily.groupBy("event_type").agg(
        F.sum("n").alias("total_n"), F.count(F.lit(1)).alias("n_days")
    )
    joined = daily.join(F.broadcast(tot), "event_type")
    w_cum = Window.partitionBy("event_type").orderBy("day")
    cusum = joined.select(
        "event_type",
        "day",
        "n",
        F.sum(
            F.col("n").cast(_DEC) * F.col("n_days") - F.col("total_n")
        )
        .over(w_cum)
        .alias("s"),
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.col("day").asc()
    )
    return (
        cusum.select(
            "event_type",
            "day",
            "n",
            "s",
            F.row_number().over(w_best).alias("r"),
        )
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.col("n").alias("day_events"),
            F.col("s").cast("long").alias("s_scaled"),
            F.abs(F.col("s")).cast("long").alias("s_abs"),
        )
    )
