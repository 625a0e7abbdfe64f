"""Data profiling + full GROUPING SETS — warehouse operations the
reference delegates to eyeballing Metabase dashboards (readme.md:115-118)
and to Postgres constraints; here first-class, one scan each.

Profiling at 100 TB: one pass computes every column's stats in parallel
(a single aggregate over the scan — NOT one query per column); distinct
counts switch to approx_count_distinct on the scale path (the exact
variant here is oracle-matched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.functions.money import money_sum
from datawarehouse1_spark.registry import declared

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


@declared(
    "q_profile_columns",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT({c}) AS n_nonnull,
               COUNT(DISTINCT {c}) AS n_distinct,
               MIN({c}) AS min_v,
               MAX({c}) AS max_v
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (nulls / distinct / min / max) for the fact table's
    numeric columns. Implementation note: all three profiles come from
    ONE aggregate over ONE scan, unpivoted to the narrow (col_name,
    stats) shape by exploding an array of structs built from the single
    agg row. A union-of-selects over the agg would NOT keep it single:
    Catalyst specializes each union branch down to its own column and
    plans three scans (observed: 3 FileScans, 6 exchanges); the explode
    keeps the agg subtree shared (1 scan). The oracle's UNION ALL of
    three scans is the semantic twin, not the physical plan."""
    li = table(spark, sf_dir, "lineitem")
    agg_exprs = []
    for c in _PROFILE_COLS:
        agg_exprs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.min(c).alias(f"{c}__min_v"),
            F.max(c).alias(f"{c}__max_v"),
        ]
    wide = li.agg(*agg_exprs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__n_rows").alias("n_rows"),
                F.col(f"{c}__n_nonnull").alias("n_nonnull"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_v").alias("min_v"),
                F.col(f"{c}__max_v").alias("max_v"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(rows).alias("s")).select("s.*")


@declared(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube C11),
    expressed through the SQL front door — one Expand + one shuffle, not
    three scans."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@declared(
    "q_upsert_partition_rollup",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def q_upsert_partition_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintainable monthly rollup: the full-history result
    here is the oracle anchor; operators/warehouse.py::merge_rollup keeps
    the same table current by recomputing ONLY the months present in each
    new batch (partition-overwrite semantics) instead of rescanning
    history — tested in tests/test_incremental_rollup.py."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice", "total_price"),
    )


@declared(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.9) AS p90,
           quantile_cont(l_quantity, 0.99) AS p99,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`, verified bit-equal). Scale path: exact
    percentile needs the group's values collected per partition —
    switch to approx_percentile (t-digest, mergeable) when groups stop
    fitting; same query shape."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90"),
        F.expr("percentile(l_quantity, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- ext: heavy-hitter / skew diagnosis report ---
@declared(
    "q_heavy_hitters",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey, COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS key_revenue
      FROM lineitem GROUP BY l_orderkey
    ),
    tot AS (SELECT COUNT(*) AS total_lines FROM lineitem)
    SELECT l_orderkey, n_lines, key_revenue,
           CAST(n_lines AS DOUBLE) / total_lines AS share
    FROM per_key, tot
    ORDER BY n_lines DESC, key_revenue DESC, l_orderkey
    LIMIT 20
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis: the top-N join keys by row count with their share
    of the table — the report you run BEFORE picking a salting factor or
    trusting AQE's skew-join split. Partial-aggregated groupBy, a 1-row
    total broadcast for the share, and TakeOrderedAndProject for the
    top-N (no global sort); total order via (n_lines, key_revenue,
    l_orderkey)."""
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("key_revenue"),
    )
    total = li.agg(F.count(F.lit(1)).alias("total_lines"))
    return (
        per_key.join(F.broadcast(total))
        .select(
            "l_orderkey",
            "n_lines",
            "key_revenue",
            (F.col("n_lines").cast("double") / F.col("total_lines")).alias("share"),
        )
        .orderBy(F.desc("n_lines"), F.desc("key_revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


@declared(
    "q_expectations_orders",
    oracle="""
    WITH m AS (
      SELECT count(*) AS n_rows,
             count(o_custkey) AS nn_custkey,
             count(o_orderdate) AS nn_orderdate,
             count(DISTINCT o_orderkey) AS d_orderkey,
             count(o_orderkey) AS nn_orderkey,
             count(CASE WHEN o_totalprice BETWEEN 0 AND 500000 THEN 1 END)
               AS p_totalprice,
             count(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END)
               AS p_status,
             count(CASE WHEN regexp_matches(o_orderpriority, '^[1-3]-')
                        THEN 1 END) AS p_priority
      FROM orders
    )
    SELECT 'complete_o_custkey' AS constraint, 'o_custkey' AS "column",
           'completeness' AS kind, n_rows, nn_custkey AS n_passed,
           CASE WHEN nn_custkey = n_rows THEN 'pass' ELSE 'fail' END AS status
    FROM m
    UNION ALL
    SELECT 'complete_o_orderdate', 'o_orderdate', 'completeness',
           n_rows, nn_orderdate,
           CASE WHEN nn_orderdate = n_rows THEN 'pass' ELSE 'fail' END
    FROM m
    UNION ALL
    SELECT 'unique_o_orderkey', 'o_orderkey', 'uniqueness',
           n_rows, d_orderkey,
           CASE WHEN nn_orderkey = n_rows AND d_orderkey = n_rows
                THEN 'pass' ELSE 'fail' END
    FROM m
    UNION ALL
    SELECT 'range_o_totalprice', 'o_totalprice', 'range',
           n_rows, p_totalprice,
           CASE WHEN p_totalprice = n_rows THEN 'pass' ELSE 'fail' END
    FROM m
    UNION ALL
    SELECT 'in_set_o_orderstatus', 'o_orderstatus', 'set_membership',
           n_rows, p_status,
           CASE WHEN p_status = n_rows THEN 'pass' ELSE 'fail' END
    FROM m
    UNION ALL
    SELECT 'matches_o_orderpriority', 'o_orderpriority', 'pattern',
           n_rows, p_priority,
           CASE WHEN p_priority = n_rows THEN 'pass' ELSE 'fail' END
    FROM m
    UNION ALL
    SELECT 'fk_o_custkey', 'o_custkey', 'foreign_key',
           n_rows,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IN (SELECT c_custkey FROM customer)),
           CASE WHEN (SELECT COUNT(*) FROM orders o
                      WHERE o.o_custkey IN (SELECT c_custkey FROM customer))
                     = n_rows
                THEN 'pass' ELSE 'fail' END
    FROM m
    """,
)
def q_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative validation suite over orders — the
    scalable re-expression of the reference's Postgres DDL contract
    surface (init.sql NOT NULL / PRIMARY KEY / CHECK semantics) as ONE
    aggregate pass + an inline() unpivot (operators/expectations.py).
    The o_orderpriority pattern check fails BY DESIGN (priorities 4/5
    exist), so the report's fail path is non-vacuous and the driver
    hash pins both verdict branches. The FOREIGN KEY constraint — the
    one init.sql contract that needs a second table — runs as its own
    left-semi pass (run_fk_expectation) and unions into the report."""
    from datawarehouse1_spark.operators.expectations import (
        expect_complete,
        expect_in_range,
        expect_in_set,
        expect_matches,
        expect_unique,
        run_expectations,
    )

    suite = [
        expect_complete("o_custkey"),
        expect_complete("o_orderdate"),
        expect_unique("o_orderkey"),
        expect_in_range("o_totalprice", 0, 500000),
        expect_in_set("o_orderstatus", ("O", "F", "P")),
        expect_matches("o_orderpriority", "^[1-3]-"),
    ]
    from datawarehouse1_spark.operators.expectations import run_fk_expectation

    orders = table(spark, sf_dir, "orders")
    report = run_expectations(orders, suite)
    fk = run_fk_expectation(
        orders, "o_custkey", table(spark, sf_dir, "customer"), "c_custkey"
    )
    return report.unionByName(fk)


@declared(
    "q_drift_tvd_report",
    oracle="""
    WITH binned AS (
      SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bin,
             o_orderkey % 2 = 0 AS in_a
      FROM orders
    ),
    per_bin AS (
      SELECT bin,
             CAST(COUNT(*) FILTER (WHERE in_a) AS BIGINT) AS cnt_a,
             CAST(COUNT(*) FILTER (WHERE NOT in_a) AS BIGINT) AS cnt_b
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT *,
             SUM(cnt_a) OVER () AS n_a, SUM(cnt_b) OVER () AS n_b
      FROM per_bin
    ),
    numd AS (
      SELECT *,
             SUM(abs(CAST(cnt_a AS DECIMAL(38,0)) * n_b
                     - CAST(cnt_b AS DECIMAL(38,0)) * n_a)) OVER () AS num
      FROM tot
    )
    SELECT bin, cnt_a, cnt_b,
           CAST(floor(CAST(num AS DECIMAL(38,0)) * 1000000
                      / (2 * CAST(n_a AS DECIMAL(38,0)) * n_b))
                AS BIGINT) AS tvd_e6
    FROM numd
    """,
)
def q_drift_tvd_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two snapshots of a column (the
    data-quality check a pipeline runs on every refresh): fixed decile
    bins over o_totalprice, per-bin counts for each snapshot half, and
    the total-variation distance ½·Σ|p_A − p_B| in floored micro-units.
    TVD instead of PSI/KS on purpose: it is a RATIONAL statistic —
    computed as Σ|cntA·nB − cntB·nA| / (2·nA·nB) entirely in
    DECIMAL(38,0) integer arithmetic — so both engines produce the
    identical number, where PSI's ln() can differ in the last ulp
    between libms. One aggregate + one tiny window over ≤10 bin rows;
    at 100 TB the bin counts are the only thing that shuffles."""
    o = table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / 50000).cast("long"), F.lit(9)
        ).alias("bin"),
        (F.col("o_orderkey") % 2 == 0).alias("in_a"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.when(F.col("in_a"), 1)).cast("long").alias("cnt_a"),
        F.count(F.when(~F.col("in_a"), 1)).cast("long").alias("cnt_b"),
    )
    w = Window.partitionBy()
    dec = "decimal(38,0)"
    n_a = F.sum("cnt_a").over(w)
    n_b = F.sum("cnt_b").over(w)
    num = F.sum(
        F.abs(
            F.col("cnt_a").cast(dec) * n_b - F.col("cnt_b").cast(dec) * n_a
        )
    ).over(w)
    return per_bin.select(
        "bin",
        "cnt_a",
        "cnt_b",
        F.floor(
            num.cast(dec)
            * F.lit(1000000)
            / (F.lit(2) * n_a.cast(dec) * n_b)
        )
        .cast("long")
        .alias("tvd_e6"),
    )
