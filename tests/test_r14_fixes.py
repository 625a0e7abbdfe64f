"""Round-14 review-fix regression tests (the three r13 ADVICE items):

1. q_orders_open_backlog must report a boundary month that contributes
   NO open/close delta event of its own but inherits carried backlog
   (the r13 sweep-line rewrite silently dropped such months).
2. deciles.order_stat_bounds must IGNORE NULLs exactly like
   percentile_disc (NULLs used to inflate n and shift every boundary).
3. functions.arrays.const_bigint_array must round-trip the full int64
   domain as a folded array<bigint> literal (the genuinely-one-py4j-call
   replacement for the F.lit(list) loop).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from datawarehouse1_spark import registry
from datawarehouse1_spark.functions.arrays import const_bigint_array
from datawarehouse1_spark.queries.deciles import order_stat_bounds

registry.load_all()


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))


# ------------------------------------------------- backlog carried month


def test_open_backlog_carried_month_without_delta_events(spark, tmp_path):
    """ADVICE r13 counterexample: order A placed Jan 10 closes Mar 10;
    the ONLY February order closes the day it is placed (degenerate,
    filtered exactly as the interval join ignores an empty interval).
    February is a boundary month (an order was placed in it) but
    contributes no +/- delta event — it must still report the CARRIED
    backlog of 1 open order from January."""
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string"
    )
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz"
    )
    d = datetime.datetime
    orders = [
        (1, 1, "O", 100.0, d(2026, 1, 10), "1-URGENT"),
        (2, 1, "O", 400.0, d(2026, 2, 10), "1-URGENT"),
    ]
    li = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d(2026, 3, 10)),
        # close == placed: empty interval, never open anywhere
        (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", d(2026, 2, 10)),
    ]
    _write(spark, tmp_path, "orders", orders, o_schema)
    _write(spark, tmp_path, "lineitem", li, li_schema)
    got = {
        r.as_of: (r.n_open, r.value_open)
        for r in registry.QUERIES["q_orders_open_backlog"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        datetime.date(2026, 1, 31): (1, 100.0),
        # the carried month the delta-only table used to omit
        datetime.date(2026, 2, 28): (1, 100.0),
    }


# ------------------------------------------------- order stats vs NULLs


def test_order_stat_bounds_ignores_nulls(spark):
    """percentile_disc ignores NULLs: median over [1..10] plus two
    NULLs must be 5 (k=5,d=10 over n=10 non-null rows), not the 4 a
    NULL-inflated n=12 would produce."""
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 11)] + [(None,), (None,)],
        "x double",
    )
    row = order_stat_bounds(df, "x", (5,), 10).first()
    assert row["b5"] == 5.0
    # and the all-NULL column yields NULL bounds, not a crash
    empty = spark.createDataFrame([(None,), (None,)], "x double")
    assert order_stat_bounds(empty, "x", (5,), 10).first()["b5"] is None


# ------------------------------------------------- const bigint arrays


def test_const_bigint_array_roundtrips_int64_domain(spark):
    vals = [0, 1, -1, (1 << 63) - 1, -(1 << 63), 42]
    df = spark.range(1).select(const_bigint_array(vals).alias("a"))
    field = df.schema["a"]
    assert isinstance(field.dataType, ArrayType)
    assert isinstance(field.dataType.elementType, LongType)
    assert df.first()["a"] == vals
    # folded to a literal: no per-element expression tree survives
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "element_at" not in plan


def test_const_bigint_array_matches_per_element_route(spark):
    vals = [1 << i for i in range(63)]
    a = spark.range(1).select(const_bigint_array(vals).alias("a")).first()["a"]
    b = (
        spark.range(1)
        .select(F.array(*[F.lit(v).cast("long") for v in vals]).alias("a"))
        .first()["a"]
    )
    assert a == b
