"""Scale/temporal extension queries: skew-salted join, cube, set ops,
array aggregation, as-of join, band (range) join.

None of these exist in the reference (SURVEY.md §2 negative findings) —
they're the operations the same warehouse needs at 100 TB event/fact
scale, each built shuffle-consciously (see operators/scale.py and
operators/temporal.py for the physical rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.arrays import array_join_ints
from datawarehouse1_spark.functions.money import money_sum
from datawarehouse1_spark.operators.scale import salted_join
from datawarehouse1_spark.operators.temporal import asof_join_backward, range_join_broadcast
from datawarehouse1_spark.registry import declared


@declared(
    "q_join_salted_skew",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈fact join — result identical to the plain join
    (the oracle IS the plain join); the salt spreads any hot orderkey over
    8 reducers. See operators/scale.py::salted_join."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8).select(
        "l_orderkey", "l_linenumber", "o_orderstatus", "o_orderpriority"
    )


@declared(
    "q_agg_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 family: CUBE = all 2^k grouping sets in one pass (Expand +
    single shuffle — not 4 separate scans)."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice", "total_price"),
    )


@declared(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers having both open and fulfilled orders.
    Catalyst plans INTERSECT as an aggregate+semi-join, not a sort."""
    o = table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(done)


@declared(
    "q_set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: customers with open orders and no fulfilled ones (anti-join
    shape at the set level)."""
    o = table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(done)  # EXCEPT (distinct) — matches SQL EXCEPT


@declared(
    "q_array_agg_sorted",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
           len(list(l_linenumber)) AS n_lines,
           list_max(list(l_linenumber)) AS max_line
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-order sorted line-number list + array
    functions (deterministic: collect_list is order-free only after
    sort_array). The list is emitted comma-joined — the driver's
    canonicalization crashes on list cells (CORRECTNESS_r03), so
    declared output must be scalar; array ops stay real upstream."""
    li = table(spark, sf_dir, "lineitem")
    lst = F.collect_list("l_linenumber")
    return li.groupBy("l_orderkey").agg(
        array_join_ints(F.sort_array(lst)).alias("lines"),
        F.size(lst).alias("n_lines"),
        F.array_max(lst).alias("max_line"),
    )


@declared(
    "q_join_asof",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate AS ots, max(o_orderkey) AS okey
      FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts, r.okey AS last_orderkey, r.ots AS last_orderdate
    FROM events e ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.ots
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each event gets the user's most recent order
    at-or-before the event time — one shuffle, no inequality cross-join.
    See operators/temporal.py::asof_join_backward (right side pre-deduped
    per (key, ts) for determinism)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    right = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.col("o_orderdate").alias("ots"))
        .agg(F.max("o_orderkey").alias("okey"))
    )
    out = asof_join_backward(
        ev, right, "user_id", "o_custkey", "ts", "ots", ["okey", "ots"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("okey").alias("last_orderkey"),
        F.col("ots").alias("last_orderdate"),
    )


@declared(
    "q_join_range_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 50000.0),
             ('mid', 50000.0, 200000.0),
             ('large', 200000.0, 1000000.0)
    )
    SELECT b.band,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q_join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: orders matched to price intervals via a
    broadcast nested-loop join against the tiny bands dim — the interval
    side broadcasts, the fact side streams (scale-safe)."""
    o = table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("mid", 50000.0, 200000.0), ("large", 200000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        range_join_broadcast(o, bands, "o_totalprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "total_price"),
        )
    )


@declared(
    "q_sketch_log_histogram",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM lineitem
    )
    SELECT l_returnflag,
           CASE WHEN c <= 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(FLOOR(LOG2(CAST(c AS DOUBLE))) AS BIGINT) END AS bin,
           COUNT(*) AS n,
           MIN(c) AS min_cents,
           MAX(c) AS max_cents,
           CAST(SUM(c) AS BIGINT) AS sum_cents
    FROM cents
    GROUP BY l_returnflag, bin
    """,
)
def q_sketch_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log2-histogram sketch over money cents, grouped by
    returnflag — the bounded-size quantile summary that replaces a full
    sort at 100 TB (operators/sketches.py: one shuffle carrying one row
    per group x occupied octave; merge law + quantile-recovery accuracy
    pinned in tests/test_sketches.py). Deterministic integer binning, so
    the DuckDB oracle reproduces the sketch exactly — unlike HLL, this
    sketch hash-matches."""
    from datawarehouse1_spark.operators.sketches import log2_histogram

    li = table(spark, sf_dir, "lineitem")
    sk = log2_histogram(li, "l_extendedprice", group_cols=("l_returnflag",))
    return sk.select(
        "l_returnflag",
        "bin",
        "n",
        "min_cents",
        "max_cents",
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
    )


@declared(
    "q_sketch_count_min",
    oracle="""
    WITH k AS (SELECT CAST(o_custkey AS BIGINT) AS key FROM orders),
    cells AS (
      SELECT 0 AS row, ((1103515245 * key + 12345) % 2147483647) % 256 AS col FROM k
      UNION ALL
      SELECT 1, ((69069 * key + 362437) % 2147483647) % 256 FROM k
      UNION ALL
      SELECT 2, ((134775813 * key + 1) % 2147483647) % 256 FROM k
    )
    SELECT row, col, COUNT(*) AS n
    FROM cells
    GROUP BY row, col
    """,
)
def q_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over order custkeys — the bounded-size frequency
    summary for heavy-hitter detection at 100 TB (operators/sketches.py:
    one explode + one groupBy; the shuffle carries at most d x width
    counter rows after map-side combine). Carter-Wegman integer hashing
    keeps every bucket index reproducible in DuckDB, so the sketch
    HASH-matches — estimates' one-sided error and exact merge law are
    pinned in tests/test_sketches.py."""
    from datawarehouse1_spark.operators.sketches import count_min_sketch

    return count_min_sketch(table(spark, sf_dir, "orders"), "o_custkey")


@declared(
    "q_partition_boundaries",
    oracle="""
    WITH cuts AS (
      SELECT quantile_disc(o_totalprice,
               [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS qs,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders
    )
    SELECT CAST(i - 1 AS BIGINT) AS bucket_idx,
           CASE WHEN i = 1 THEN NULL ELSE qs[i - 1] END AS lower_bound,
           CASE WHEN i = 8 THEN NULL ELSE qs[i] END AS upper_bound,
           n_rows
    FROM cuts, generate_series(1, 8) AS t(i)
    """,
)
def q_partition_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition boundary PLANNING: the exact 8-way order
    statistics of the partition key (percentile_disc — actual data
    values, so Spark and DuckDB agree exactly), emitted as
    (bucket_idx, lower, upper) rows with open ends as NULL. This is
    the report a pipeline materializes before `repartitionByRange` /
    writer bucketing on a skew-prone key: Spark's own range
    partitioner samples per-run (nondeterministic splits); planning
    from exact (or, at 100 TB, approx_percentile t-digest — same
    query shape) boundaries makes file layout reproducible run to
    run. r13: the seven order statistics read off the bounded
    two-level rank table (queries/deciles.py::order_stat_bounds,
    percentile_disc(k/8) = min{v : 8·cum >= k·n}) instead of seven
    value-buffering percentile aggregates; the 8-row explode is
    driver-trivial."""
    from datawarehouse1_spark.queries.deciles import order_stat_bounds

    d = table(spark, sf_dir, "orders")
    bounds = order_stat_bounds(
        d, "o_totalprice", tuple(range(1, 8)), 8
    )
    n_rows = d.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    cuts = bounds.join(F.broadcast(n_rows)).select(
        F.array(*[F.col(f"b{k}") for k in range(1, 8)]).alias("qs"),
        "n_rows",
    )
    idx = F.explode(F.sequence(F.lit(1), F.lit(8))).alias("i")
    rows = cuts.select("qs", "n_rows", idx)
    return rows.select(
        (F.col("i") - 1).cast("long").alias("bucket_idx"),
        F.when(F.col("i") > 1, F.col("qs")[F.col("i") - 2]).alias("lower_bound"),
        F.when(F.col("i") < 8, F.col("qs")[F.col("i") - 1]).alias("upper_bound"),
        "n_rows",
    )


_INTERVALS_SQL = """
      SELECT o_orderkey AS id,
             CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS start_day,
             CAST(epoch(o_orderdate) / 86400 AS BIGINT)
               + (o_orderkey % 5) + 1 AS end_day
      FROM orders
      WHERE o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-04-01'
"""


@declared(
    "q_join_interval_overlap",
    oracle=f"""
    WITH iv AS ({_INTERVALS_SQL}),
    l AS (SELECT * FROM iv WHERE id % 2 = 0),
    r AS (SELECT * FROM iv WHERE id % 2 = 1)
    SELECT l.id AS l_id, l.start_day AS l_start_day, l.end_day AS l_end_day,
           r.id AS r_id, r.start_day AS r_start_day, r.end_day AS r_end_day
    FROM l JOIN r
      ON l.start_day < r.end_day AND r.start_day < l.end_day
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL × INTERVAL overlap join (half-open [start, end) day
    intervals staged from one month of orders, 1-5 days long, split by
    key parity): all cross-side pairs whose intervals intersect —
    operators/temporal.py::interval_overlap_join. Spark plans the raw
    theta join as a broadcast NESTED LOOP (every l×r pair tested); the
    grid-bucket decomposition turns it into ONE equi-join on bucket id
    + an exact post-filter, cost bounded by per-bucket occupancy.

    Honest local measurement (ROUND_NOTES r7): up to ~31M pair tests
    the codegen'd NLJ actually WINS on this box (0.53 s vs 1.28 s at
    5.5k×5.6k) — broadcastable sides + integer predicates are cheap.
    The bucketized form is not a micro-optimization; it is the shape
    that SURVIVES when neither side broadcasts: NLJ then degenerates
    to a shuffled cartesian whose pair tests grow as |L|·|R| (10¹² at
    1M×1M), while the bucket join stays one keyed exchange + per-bucket
    work. The DuckDB oracle runs the plain predicate join — same rows,
    different physical plan, which is exactly the point."""
    from datawarehouse1_spark.operators.temporal import interval_overlap_join

    o = table(spark, sf_dir, "orders")
    iv = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-03-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    ).select(
        F.col("o_orderkey").alias("id"),
        F.floor(
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) / 86400
        ).cast("long").alias("start_day"),
        (
            F.floor(
                F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) / 86400
            )
            + (F.col("o_orderkey") % 5)
            + 1
        ).cast("long").alias("end_day"),
    )
    left = iv.filter(F.col("id") % 2 == 0)
    right = iv.filter(F.col("id") % 2 == 1)
    out = interval_overlap_join(
        left, right, "start_day", "end_day", "start_day", "end_day",
        bucket_width=3,
    )
    return out.select(
        "l_id", "l_start_day", "l_end_day", "r_id", "r_start_day", "r_end_day"
    )


@declared(
    "q_join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_acctbal > 9000)
    """,
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter semi join: orders of high-balance customers via
    operators/scale.py::bloom_semi_join — the dim's key set folds into
    an 8 KiB md5 bloom bitmap inlined as a literal (the hand-rolled
    form of Spark's bloom runtime filtering), the fact side drops
    non-members with a NARROW filter before the shuffle, and the exact
    semi join removes the <1% false positives. Result is bit-identical
    to the plain EXISTS (law also pinned in
    tests/test_scale_temporal_ops.py); at 100 TB the orderkey shuffle
    carries ~selectivity·|orders| instead of |orders|."""
    from datawarehouse1_spark.operators.scale import bloom_semi_join

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    rich = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return bloom_semi_join(o, rich, "o_custkey", "c_custkey").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


def _zorder_sql(x: str, y: str, bits: int = 8) -> str:
    """Bit-interleave two small non-negative ints into a Z-order
    (Morton) key as portable integer arithmetic — DuckDB form."""
    terms = []
    for i in range(bits):
        # NB each term fully parenthesized: SQL gives '+' higher
        # precedence than '<<', so a bare chain reassociates the shifts
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _zorder_spark(x: F.Column, y: F.Column, bits: int = 8) -> F.Column:
    z = F.lit(0)
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


@declared(
    "q_layout_zorder_cells",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(o_custkey % 256 AS INTEGER) AS xb,
             CAST((CAST(strftime(o_orderdate, '%Y') AS INTEGER) * 12
                   + CAST(strftime(o_orderdate, '%m') AS INTEGER) - 1) % 256
                  AS INTEGER) AS yb,
             o_totalprice
      FROM orders
    )
    SELECT xb, yb,
           CAST({_zorder_sql('xb', 'yb')} AS BIGINT) AS zvalue,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS cell_revenue
    FROM cells GROUP BY xb, yb
    """,
)
def q_layout_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) layout planning: the multi-dimensional
    clustering key Delta/Iceberg OPTIMIZE ZORDER BY computes, derived
    as portable integer arithmetic (bit-interleave of the 8-bit
    customer and month buckets) so any engine produces the identical
    key. Writing the fact sorted by zvalue co-clusters BOTH dimensions,
    so either a customer-range or a date-range predicate prunes most
    files — the thing a single-column sort can only do for one of
    them. The query materializes the cell map (z key + per-cell count
    and exact-decimal revenue) that the writer's repartitionByRange
    consumes and that the layout planner inspects for skewed cells.
    One aggregate exchange on (xb, yb); the interleave itself is
    narrow codegen arithmetic, free at any scale."""
    o = table(spark, sf_dir, "orders")
    xb = (F.col("o_custkey") % 256).cast("int")
    yb = (
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1) % 256
    ).cast("int")
    cells = o.select(
        xb.alias("xb"), yb.alias("yb"), F.col("o_totalprice")
    )
    return cells.groupBy("xb", "yb").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        money_sum("o_totalprice", "cell_revenue"),
    ).select(
        "xb",
        "yb",
        _zorder_spark(F.col("xb"), F.col("yb")).cast("long").alias("zvalue"),
        "n_orders",
        "cell_revenue",
    )
