"""Columnar interchange formats beyond parquet: ORC is a first-class
warehouse citizen in this Spark build (read/write, predicate pushdown,
column pruning, partition pruning) — a consumer migrating an
ORC-based lake onto this engine needs no conversion step. Avro is
ENV-GATED: the spark-avro module jar is not bundled in this
distribution (probed r8 — same discipline as the protobuf-gated
transformWithState twins); the test self-activates if the jar
appears."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_orc_round_trip_is_exact(spark, tmp_path):
    li = table(spark, SF_DIR, "lineitem").limit(2000)
    p = str(tmp_path / "li.orc")
    li.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == li.schema
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    li = table(spark, SF_DIR, "lineitem")
    p = str(tmp_path / "li.orc")
    li.write.orc(p)
    q = (
        spark.read.orc(p)
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(q)
    assert "GreaterThan(l_quantity" in plan, "filter not pushed to ORC scan"
    # ReadSchema must carry only the projected+filter columns, never the
    # full 11-column row
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    want = (
        li.filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
        .collect()
    )
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, want))


def test_orc_partitioned_write_prunes_partitions(spark, tmp_path):
    o = table(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    p = str(tmp_path / "orders_by_year.orc")
    o.write.partitionBy("o_year").orc(p)
    q = spark.read.orc(p).filter(F.col("o_year") == 1995)
    # partition pruning is a planning fact: the year predicate must be a
    # PartitionFilter on the scan (directory pruning), not a data filter
    plan = _plan(q)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_year" in pf and "1995" in pf, f"not pruned: {pf}"
    assert q.count() == o.filter("o_year = 1995").count()


def _avro_available(spark) -> bool:
    try:
        spark.range(1).write.format("avro").save("/tmp/_avro_probe_nonexistent")
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)
    return True


def test_avro_env_gated_round_trip(spark, tmp_path):
    if not _avro_available(spark):
        pytest.skip(
            "spark-avro module jar absent in this distribution (probed r8); "
            "test self-activates when the jar ships"
        )
    li = table(spark, SF_DIR, "lineitem").limit(500)
    p = str(tmp_path / "li.avro")
    li.write.format("avro").save(p)
    back = spark.read.format("avro").load(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))
