"""CSV/JSONL sources: native-JVM parse, explicit schema, corrupt-row
quarantine, lineage enrichment, and streaming pickup — the same ingest
discipline as the xlsx path over the formats a training-data pipeline
actually exchanges."""

from __future__ import annotations

import time

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datawarehouse1_spark.sources.delimited import (
    CORRUPT_COL,
    csv_stream,
    jsonl_stream,
    read_csv_dir,
    read_jsonl_dir,
    split_corrupt,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("amount", DoubleType()),
    ]
)


def test_csv_roundtrip_with_lineage(spark, tmp_path):
    d = tmp_path / "csv_in"
    d.mkdir()
    (d / "a.csv").write_text("id,name,amount\n1,alpha,10.5\n2,beta,20.25\n")
    (d / "b.csv").write_text("id,name,amount\n3,gamma,30.0\n")

    df = read_csv_dir(spark, str(d), SCHEMA)
    rows = {r.id: r for r in df.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].name == "alpha" and rows[2].amount == 20.25
    assert rows[3].source_file.endswith("b.csv")
    assert rows[1].imported_at is not None


def test_csv_corrupt_rows_quarantined_not_dropped(spark, tmp_path):
    d = tmp_path / "csv_bad"
    d.mkdir()
    # row 2 has a non-numeric id -> schema violation -> corrupt capture
    (d / "mix.csv").write_text(
        "id,name,amount\n1,ok,1.0\nnot_a_number,broken,2.0\n3,ok2,3.0\n"
    )
    clean, bad = split_corrupt(read_csv_dir(spark, str(d), SCHEMA))
    assert sorted(r.id for r in clean.collect()) == [1, 3]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "not_a_number" in bad_rows[0].raw_record
    assert bad_rows[0].source_file.endswith("mix.csv")
    # PERMISSIVE keeps the valid cells of the partially-bad row
    assert bad_rows[0].name == "broken" and bad_rows[0].amount == 2.0
    assert CORRUPT_COL not in clean.columns


def test_jsonl_roundtrip_and_corrupt(spark, tmp_path):
    d = tmp_path / "jsonl_in"
    d.mkdir()
    (d / "docs.jsonl").write_text(
        '{"id": 1, "name": "x", "amount": 1.5}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "y", "amount": 2.5}\n'
    )
    clean, bad = split_corrupt(read_jsonl_dir(spark, str(d), SCHEMA))
    assert sorted(r.id for r in clean.collect()) == [1, 2]
    bad_rows = bad.collect()
    assert [r.raw_record for r in bad_rows] == ["this is not json at all"]
    assert bad_rows[0].id is None  # nothing parseable on a non-JSON line


def test_csv_scan_stays_jvm_side(spark, tmp_path):
    """The whole point of the native source: no Python eval anywhere in
    the scan plan, and the projection prunes to the read columns."""
    d = tmp_path / "csv_plan"
    d.mkdir()
    (d / "a.csv").write_text("id,name,amount\n1,alpha,10.5\n")
    df = read_csv_dir(spark, str(d), SCHEMA).select("id", "amount")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_jsonl_stream_picks_up_new_files(spark, tmp_path):
    watch = tmp_path / "watch_jsonl"
    watch.mkdir()
    out = str(tmp_path / "out_parquet")
    (watch / "first.jsonl").write_text('{"id": 1, "name": "a", "amount": 1.0}\n')

    stream = jsonl_stream(spark, str(watch), SCHEMA)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.read.parquet(out).count() == 1
        (watch / "second.jsonl").write_text(
            '{"id": 2, "name": "b", "amount": 2.0}\n'
        )
        deadline = time.time() + 30
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.read.parquet(out).count() == 2:
                break
            time.sleep(0.5)
        got = {r.id for r in spark.read.parquet(out).collect()}
        assert got == {1, 2}  # checkpoint: first file not re-ingested
    finally:
        q.stop()


def test_csv_stream_source_starts(spark, tmp_path):
    watch = tmp_path / "watch_csv"
    watch.mkdir()
    (watch / "a.csv").write_text("id,name,amount\n5,e,5.0\n")
    stream = csv_stream(spark, str(watch), SCHEMA)
    q = (
        stream.writeStream.format("memory")
        .queryName("csv_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_csv"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM csv_stream_out").collect()
        assert [r.id for r in rows] == [5]
        assert rows[0].source_file.endswith("a.csv")
    finally:
        q.stop()


def test_orc_roundtrip_parity_with_parquet(spark, tmp_path):
    """ORC is a first-class Spark-native columnar source: writing any
    warehouse table to ORC and reading it back must reproduce the
    parquet-sourced rows and schema exactly (including NTZ timestamps
    — the events drift lesson applies to every columnar sink)."""
    from datawarehouse1_spark.catalog import table

    for name in ("nation", "orders", "events"):
        src = table(spark, "/root/testdata/sf0.001", name)
        path = str(tmp_path / f"{name}_orc")
        src.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        assert back.schema == src.schema, name
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, src.collect())
        ), name


def test_orc_predicate_pushdown(spark, tmp_path):
    """Filters must reach the ORC reader (searchArgument/pushdown), same
    contract the parquet plan-shape tests pin."""
    from datawarehouse1_spark.catalog import table

    src = table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(path)
    df = spark.read.orc(path).filter("o_custkey = 7").select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split("PushedFilters")[1][:80]


def test_avro_gated_honestly(spark):
    """spark-avro is an external package; absent here. The failure mode
    must be Spark's loud AnalysisException naming the format, not a
    silent fallback."""
    import pytest
    from pyspark.errors import AnalysisException

    # pin the DATA_SOURCE error condition, not the path string — a
    # container WITH spark-avro would raise PATH_NOT_FOUND here, which
    # must FAIL this test (the gate would no longer be true)
    with pytest.raises(
        AnalysisException, match="DATA_SOURCE|Failed to find.*avro"
    ):
        spark.read.format("avro").load("/tmp/nonexistent.avro")
