"""Dashboard-class analytics the reference serves via Metabase
(readme.md:115-118) that go beyond single-block SQL: funnel conversion,
weekly retention cohorts, and pivoted cross-tabs. All pure built-ins,
one or two shuffles each, oracle-matched."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.registry import declared


@declared(
    "q_events_funnel",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_views,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           (MIN(ts) FILTER (WHERE event_type = 'view')
              < MIN(ts) FILTER (WHERE event_type = 'purchase')) AS converted
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY user_id
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel per user (first view strictly before first
    purchase): conditional aggregation in ONE groupBy — no self-join of
    the events table against itself."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    is_view = F.col("event_type") == "view"
    is_buy = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count(F.when(is_view, 1)).alias("n_views"),
        F.count(F.when(is_buy, 1)).alias("n_purchases"),
        (
            F.min(F.when(is_view, F.col("ts"))) < F.min(F.when(is_buy, F.col("ts")))
        ).alias("converted"),
    )


@declared(
    "q_events_retention_weekly",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    )
    SELECT a.week,
           COUNT(*) AS n_active,
           COUNT(b.user_id) AS n_retained
    FROM active a
      LEFT JOIN active b
        ON b.user_id = a.user_id AND b.week = a.week + INTERVAL 7 DAY
    GROUP BY a.week
    """,
)
def q_events_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort: of the users active in week W, how many
    are also active in W+1. Self-join of the (user, week) DISTINCT set —
    tiny compared to raw events, so the retention join never touches the
    event log twice."""
    ev = table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    nxt = active.select(
        F.col("user_id").alias("user_id_b"), F.col("week").alias("week_b")
    )
    return (
        active.join(
            nxt,
            (F.col("user_id_b") == F.col("user_id"))
            & (F.col("week_b") == F.date_add(F.col("week"), 7)),
            "left",
        )
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count("user_id_b").alias("n_retained"),
        )
    )


@declared(
    "q_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab via pivot with EXPLICIT value list (an implicit pivot
    adds a distinct-value collection job and nondeterministic column
    order — never do that at scale)."""
    o = table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


# --- ext: event-sequence transition matrix (path analysis) ---
@declared(
    "q_events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style path analysis: counts of consecutive event-type
    transitions per user — the sequence-analytics shape behind funnels
    and session-flow dashboards. One window shuffle on user_id (events
    already cluster by user at scale if the table is user-bucketed),
    then a tiny (|types|²-row) aggregate; (ts, event_id) ordering makes
    the LAG total even when timestamps tie."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


_RECURSIVE_TREE_SQL = """
    WITH RECURSIVE walk(doc_id, anc, depth) AS (
      SELECT doc_id, doc_id AS anc, 0 AS depth
      FROM documents WHERE doc_id < 127
      UNION ALL
      SELECT doc_id, CAST(floor((anc - 1) / 2.0) AS BIGINT) AS anc, depth + 1
      FROM walk WHERE anc > 0
    )
    SELECT doc_id,
           MAX(depth) AS depth,
           MIN(anc) AS root_id,
           COUNT(*) AS n_ancestors
    FROM walk
    GROUP BY doc_id
"""


@declared("q_hierarchy_sql_recursive", oracle=_RECURSIVE_TREE_SQL)
def q_hierarchy_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE SQL recursion (WITH RECURSIVE, new in Spark 4): walk the
    implicit binary-tree ancestry of doc ids (parent = floor((id-1)/2))
    to the root and report depth / root / ancestor count per doc. The
    IDENTICAL query text runs on both engines — Spark's recursive-CTE
    executor vs DuckDB's — so this certifies the recursion semantics
    themselves, complementing q_hierarchy_recursive_cte which certifies
    the DataFrame-loop re-expression of iterative reachability. Bounded
    to 127 docs (7 levels); each iteration is a narrow self-union."""
    from datawarehouse1_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_TREE_SQL)


@declared(
    "q_unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT n.n_name,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
             CAST(COUNT(DISTINCT o.o_custkey) AS DOUBLE) AS n_customers
      FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, metric, value FROM (
      SELECT n_name, 'n_orders' AS metric, n_orders AS value FROM wide
      UNION ALL
      SELECT n_name, 'revenue', revenue FROM wide
      UNION ALL
      SELECT n_name, 'n_customers', n_customers FROM wide
    )
    """,
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (the inverse of q_pivot_status_by_priority): a
    wide per-nation metrics row becomes (nation, metric, value) long
    form — the shape metric stores and BI exports want. Uses the native
    DataFrame unpivot (Expand under the hood: one pass, no self-union);
    the oracle spells the same melt as UNION ALL. Money goes through
    the exact-decimal sum before the double projection, per the
    determinism contract."""
    from datawarehouse1_spark.functions.money import money_sum

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            money_sum("o_totalprice", "revenue"),
            F.count_distinct("o_custkey").cast("double").alias("n_customers"),
        )
    )
    return wide.unpivot(
        ["n_name"], ["n_orders", "revenue", "n_customers"], "metric", "value"
    )


@declared(
    "q_events_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    tot AS (
      SELECT COUNT(*) AS n_days,
             SUM(n_events) AS s,
             SUM(CAST(n_events AS HUGEINT) * n_events) AS q
      FROM daily
    )
    SELECT day, n_events,
           CAST(n_days * n_events - s AS HUGEINT)
             * CAST(n_days * n_events - s AS HUGEINT)
             > 4 * (CAST(n_days AS HUGEINT) * q
                    - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS is_anomaly
    FROM daily, tot
    """,
)
def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly flags (the ops dashboard check): a day is
    anomalous when its count deviates from the mean by more than two
    population standard deviations. The 2σ test is algebraically
    rearranged to EXACT INTEGER form — (N·n_d − S)² > 4·(N·Q − S²) with
    S=Σn, Q=Σn² — so both engines compare exact integers and no
    floating-point variance accumulation order can diverge. The wide
    products run in DECIMAL(38,0) (Spark) vs HUGEINT (DuckDB): int64
    would overflow N·Q once daily counts pass ~10⁷ over multi-year
    spans, and Spark wraps silently where DuckDB raises — 128-bit
    integers keep the test exact to ~10¹² events/day. Stats come from
    one single-row aggregate broadcast-joined back to the daily counts
    (the scalar-subquery shape); at 100 TB only per-day counts
    shuffle."""
    D = "decimal(20,0)"
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events").cast(D) * F.col("n_events")).alias("q"),
    )
    dev = (F.col("n_days") * F.col("n_events") - F.col("s")).cast(D)
    var_n2 = (
        F.col("n_days").cast(D) * F.col("q")
        - F.col("s").cast(D) * F.col("s").cast(D)
    )
    return daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n_events",
        (dev * dev > 4 * var_n2).alias("is_anomaly"),
    )



_LATERAL_SQL = """
    SELECT n.n_name, top.c_name, top.bal
    FROM nation n,
    LATERAL (
      SELECT c.c_name, CAST(c.c_acctbal AS DOUBLE) AS bal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c.c_acctbal DESC, c.c_custkey
      LIMIT 2
    ) AS top
"""


@declared("q_lateral_topn_per_nation", oracle=_LATERAL_SQL)
def q_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation) — the
    IDENTICAL query text on Spark's lateral-join planner and DuckDB.
    Spark decorrelates this into the same window-rank shape as
    q_window_rank_topn; this query certifies the SQL surface itself, as
    with q_hierarchy_sql_recursive."""
    from datawarehouse1_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_SET_ALL_SQL = """
    SELECT o_orderpriority, 'both_months' AS tag FROM (
      SELECT o_orderpriority FROM orders WHERE month(o_orderdate) = 1
      INTERSECT ALL
      SELECT o_orderpriority FROM orders WHERE month(o_orderdate) = 2
    )
    UNION ALL
    SELECT o_orderpriority, 'jan_surplus' AS tag FROM (
      SELECT o_orderpriority FROM orders WHERE month(o_orderdate) = 1
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE month(o_orderdate) = 2
    )
"""


@declared("q_set_ops_all", oracle=_SET_ALL_SQL)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    multiplicity-preserving overlap and surplus of order priorities
    between two months — identical SQL text on both engines,
    complementing the DISTINCT-semantics q_set_intersect/q_set_except.
    Spark plans these as aggregate+generate (count-min replication),
    one shuffle each."""
    from datawarehouse1_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SET_ALL_SQL)


def _pagerank_iter_sql(i: int) -> str:
    return f"""
    r{i} AS (
      SELECT n.id,
             CAST(0.25 / 64 AS DOUBLE) + 0.75 * coalesce(c.c, 0) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst, SUM(r.rank / 2) AS c
        FROM edges e JOIN r{i - 1} r ON r.id = e.src
        GROUP BY e.dst
      ) c ON c.dst = n.id
    )"""


@declared(
    "q_graph_pagerank",
    oracle="""
    WITH nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 64),
    edges AS (
      SELECT id AS src,
             unnest(ARRAY[(2 * id + 1) % 64, (3 * id + 2) % 64]) AS dst
      FROM nodes
    ),
    r0 AS (SELECT id, CAST(1.0 / 64 AS DOUBLE) AS rank FROM nodes),
    """
    + ",".join(_pagerank_iter_sql(i) for i in (1, 2, 3, 4))
    + """
    SELECT id, rank FROM r4
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank (operators/graph.py), HASH-MATCHED down to
    the float bits: the synthetic graph is 64 nodes with out-degree 2
    (edges i → (2i+1)%64 and (3i+2)%64) and damping 3/4, so every
    intermediate — 1/64 start, rank/2 splits, 0.75·x damping, 2⁻⁸
    teleport — is an exactly representable dyadic rational and float
    addition is associative over them. Both engines therefore compute
    IDENTICAL doubles after 4 rounds regardless of aggregation order,
    turning an iterative float algorithm into a full value-hash
    verdict (the same trick as q_dedup_clusters for iterative integer
    reachability). The general operator takes any damping/degrees;
    only the bit-portability needs the dyadic choice."""
    from datawarehouse1_spark.operators.graph import pagerank

    nodes = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select(F.col("doc_id").alias("id"))
    )
    edges = nodes.select(
        F.col("id").alias("src"),
        F.explode(
            F.array((2 * F.col("id") + 1) % 64, (3 * F.col("id") + 2) % 64)
        ).alias("dst"),
    )
    return pagerank(nodes, edges, iterations=4, damping=0.75, n_nodes=64)


@declared(
    "q_graph_triangles",
    oracle="""
    WITH nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 64),
    raw AS (
      SELECT id AS src,
             unnest(ARRAY[(2 * id + 1) % 64, (3 * id + 2) % 64]) AS dst
      FROM nodes
    ),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges
    FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (the clustering-coefficient building block) on
    the same synthetic 64-node graph as q_graph_pagerank: canonicalize
    to undirected a<b edges, then the standard two-join wedge-close
    (e1.b=e2.a, close with (e1.a, e2.b)) — each triangle counted once
    because a<b<c. Pure integer output. At scale this is the
    node-iterator algorithm: edges shuffle on their endpoints only,
    and the usual high-degree mitigation (orient edges low→high
    degree) drops in without changing results."""
    nodes = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select(F.col("doc_id").alias("id"))
    )
    raw = nodes.select(
        F.col("id").alias("src"),
        F.explode(
            F.array((2 * F.col("id") + 1) % 64, (3 * F.col("id") + 2) % 64)
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return tri.crossJoin(
        F.broadcast(und.agg(F.count(F.lit(1)).alias("n_edges")))
    ).select("n_triangles", "n_edges")


_EWMA_LAGS = 20


@declared(
    "q_events_ewma_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT day, n_events,
           """
    + " + ".join(
        f"coalesce(lag(n_events, {k}) OVER (ORDER BY day), 0) * {2.0 ** -(k + 1)!r}"
        for k in range(_EWMA_LAGS)
    )
    + """ AS ewma
    FROM daily
    """,
)
def q_events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential smoothing of the daily event volume (the ops
    trendline / naive next-day forecast): a 20-lag TRUNCATED EWMA with
    dyadic α = 1/2, written as an explicit fixed-order sum of LAG
    terms. Every term x·2⁻ᵏ is an exactly representable dyadic and
    every partial sum stays under 2⁵³, so the float result is
    bit-identical across engines and independent of any accumulation
    reordering — and unlike the closed-form Σx·2ʲ rewrite, truncation
    keeps the arithmetic exact for arbitrarily long series (the weight
    tail beyond 20 lags is < 2⁻²⁰ of mass, below one event for any
    realistic daily count). One window sort on day; at 100 TB the
    daily table is already tiny."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.orderBy("day")
    terms = [
        F.coalesce(F.lag("n_events", k).over(w), F.lit(0)) * F.lit(2.0 ** -(k + 1))
        for k in range(_EWMA_LAGS)
    ]
    ewma = terms[0]
    for t in terms[1:]:
        ewma = ewma + t
    return daily.select("day", "n_events", ewma.alias("ewma"))


@declared(
    "q_stats_winsorized",
    oracle="""
    WITH bounds AS (
      SELECT o_orderpriority,
             quantile_disc(o_totalprice, 0.05) AS lo,
             quantile_disc(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(CASE WHEN o.o_totalprice < b.lo
                             OR o.o_totalprice > b.hi THEN 1 END) AS BIGINT)
             AS n_clipped,
           CAST(SUM(CAST(
                 CASE WHEN o.o_totalprice < b.lo THEN b.lo
                      WHEN o.o_totalprice > b.hi THEN b.hi
                      ELSE o.o_totalprice END AS DECIMAL(18,2)))
                AS DOUBLE) / COUNT(*) AS winsorized_mean
    FROM orders o JOIN bounds b ON o.o_orderpriority = b.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
)
def q_stats_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per priority class — the robust-statistics
    variant of the plain average (clip to the exact p05/p95 ORDER
    STATISTICS, then mean). percentile_disc returns an actual data
    value (no interpolation), so both engines pick the identical
    bound; the clipped sum goes through the exact-decimal money path.
    Two passes over orders: a per-group bounds aggregate (broadcast
    back — group count is tiny) and the clipped aggregate. The
    quality-filter analog in a curation pipeline: robust corpus stats
    that one garbage document cannot drag."""
    o = table(spark, sf_dir, "orders")
    bounds = o.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("lo"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("hi"),
    )
    clipped = (
        F.when(F.col("o_totalprice") < F.col("lo"), F.col("lo"))
        .when(F.col("o_totalprice") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("o_totalprice"))
    )
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(
                F.when(
                    (F.col("o_totalprice") < F.col("lo"))
                    | (F.col("o_totalprice") > F.col("hi")),
                    1,
                )
            ).alias("n_clipped"),
            (
                F.sum(clipped.cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("winsorized_mean"),
        )
    )


@declared(
    "q_stats_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             quantile_disc(o_totalprice, 0.5) AS med
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT o.o_orderpriority, m.med,
             abs(o.o_totalprice - m.med) AS abs_dev
      FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
    ),
    mad AS (
      SELECT o_orderpriority, quantile_disc(abs_dev, 0.5) AS mad
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           d.med, a.mad,
           CAST(COUNT(CASE WHEN d.abs_dev > CAST(3.0 AS DOUBLE) * a.mad
                           THEN 1 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a ON d.o_orderpriority = a.o_orderpriority
    GROUP BY d.o_orderpriority, d.med, a.mad
    """,
)
def q_stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier flags per priority class — the
    robust companion to q_stats_winsorized (which owns the clipped
    mean). Both the median and the MAD are exact DISCRETE order
    statistics (percentile_disc picks an actual data value, so both
    engines agree bitwise), the deviations are plain double arithmetic
    on identical inputs, and the 3×MAD gate compares those exact
    doubles. Two tiny per-group aggregates broadcast back over one
    orders scan shape — same plan family as the winsorized query."""
    o = table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").withColumn(
        "abs_dev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_dev)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(
                F.when(F.col("abs_dev") > F.lit(3.0) * F.col("mad"), 1)
            ).alias("n_outliers"),
        )
        .select("o_orderpriority", "n_orders", "med", "mad", "n_outliers")
    )
