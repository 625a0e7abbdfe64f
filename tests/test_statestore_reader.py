"""State-store reader certification (Spark 4 `statestore` /
`state-metadata` batch sources): streaming state is INSPECTABLE as a
table — the ops surface for debugging a stuck stateful stream (what
keys are held? how big is the state?) without touching the running
query. The reference has no analog (its only state is the
file_metadata table); this is the Spark-native upgrade of being able
to SELECT from it.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_statestore_reader_exposes_agg_state(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
    ).write.parquet(src + "/b0")

    stream = spark.readStream.schema("k string, v long").parquet(src + "/*")
    q = (
        stream.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .writeStream.format("memory")
        .queryName("state_reader_agg")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
        # feed a second batch so state reflects an UPDATE, not only inserts
        spark.createDataFrame([("a", 10)], "k string, v long").write.parquet(
            src + "/b1"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    # operator inventory: exactly one stateful operator, id 0
    meta = spark.read.format("state-metadata").load(ck)
    ops = {(r.operatorId, r.operatorName) for r in meta.collect()}
    assert ops == {(0, "stateStoreSave")}

    # the state itself: per-key aggregate buffers, matching the stream's
    # own output exactly. Buffer fields carry the aggregate FUNCTION
    # names (count/sum), not the query aliases — the store holds the
    # physical buffer, not the projection
    state = spark.read.format("statestore").load(ck)
    got = {(r.key.k, r.value["count"], r.value["sum"]) for r in state.collect()}
    assert got == {("a", 3, 13), ("b", 1, 3)}

    # and it is a real DataFrame: filterable/projectable like any table
    big = state.filter(F.col("value.count") > 1).select("key.k").collect()
    assert [r.k for r in big] == ["a"]
