"""The engine's second front door: plain Spark SQL over the registered
views (catalog.register_views) must agree with the DataFrame API — the
E3 consumer path (SURVEY.md §3) where a BI tool sends SQL text, as
Metabase does against the reference's Postgres."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import register_views, table
from tests.conftest import SF_DIR, rows_to_canon


def _canon(df):
    return rows_to_canon(df.columns, [tuple(r) for r in df.collect()])


def test_sql_star_join_agg_matches_dataframe(spark):
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT n.n_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    o = table(spark, SF_DIR, "orders")
    c = table(spark, SF_DIR, "customer")
    n = table(spark, SF_DIR, "nation")
    df = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )
    assert _canon(sql) == _canon(df)


def test_sql_window_and_cte(spark):
    register_views(spark, SF_DIR)
    out = spark.sql(
        """
        WITH ranked AS (
          SELECT c_mktsegment, c_name, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rnk
          FROM customer
        )
        SELECT * FROM ranked WHERE rnk <= 3
        """
    )
    rows = out.collect()
    segs = {r.c_mktsegment for r in rows}
    assert all(r.rnk <= 3 for r in rows)
    assert len(rows) <= 3 * len(segs) and rows


def test_sql_ddl_catalog_roundtrip(spark, tmp_path):
    """E1 analog: CREATE TABLE via SQL DDL, insert, query back."""
    spark.sql("CREATE DATABASE IF NOT EXISTS warehouse_sql_test")
    try:
        spark.sql(
            f"""
            CREATE TABLE warehouse_sql_test.clients
              (client_id STRING, nom STRING, date_creation TIMESTAMP)
            USING parquet LOCATION '{tmp_path}/clients'
            """
        )
        spark.sql(
            "INSERT INTO warehouse_sql_test.clients "
            "VALUES ('CLI001', 'Dupont', TIMESTAMP'2025-04-10 14:30:00')"
        )
        got = spark.sql(
            "SELECT client_id, nom FROM warehouse_sql_test.clients"
        ).collect()
        assert [(r.client_id, r.nom) for r in got] == [("CLI001", "Dupont")]
    finally:
        spark.sql("DROP TABLE IF EXISTS warehouse_sql_test.clients")
        spark.sql("DROP DATABASE IF EXISTS warehouse_sql_test")


def test_sql_pipe_syntax(spark):
    """Spark 4's SQL pipe syntax (|>) front door: a piped
    filter->aggregate must agree with the classic form — BI tools and
    notebooks increasingly emit this dialect."""
    register_views(spark, SF_DIR)
    piped = spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity > 45
        |> AGGREGATE COUNT(*) AS n GROUP BY l_returnflag
        """
    )
    classic = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem WHERE l_quantity > 45 GROUP BY l_returnflag
        """
    )
    assert _canon(piped) == _canon(classic)


def test_sql_group_by_all(spark):
    """GROUP BY ALL (grouping keys inferred from the select list) — the
    DuckDB-popularized shorthand Spark 4 supports."""
    register_views(spark, SF_DIR)
    ga = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY ALL
        """
    )
    classic = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
        """
    )
    assert _canon(ga) == _canon(classic)


def test_sql_unpivot_matches_dataframe_melt(spark):
    """SQL UNPIVOT == DataFrame unpivot (melt): the wide-to-long
    reshaping surface used by metric dashboards."""
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT l_orderkey, l_linenumber, metric, val
        FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount
              FROM lineitem WHERE l_orderkey < 100)
        UNPIVOT (val FOR metric IN (l_quantity, l_discount))
        """
    )
    li = (
        table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )
    melted = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount"],
        "metric",
        "val",
    )
    assert _canon(sql) == _canon(melted)
