"""Round-17 hardening: catalog plan-memo fingerprint edge cases.

VERDICT r16 #7: `_path_fingerprint` stats only direct children, so a
nested/partitioned directory table whose depth-2 files change without
renaming the depth-1 entries would NOT re-key the memo and would serve
a stale file listing. The fix bypasses the memo for any directory with
a directory child; these tests pin the bypass and the overwrite-eviction
behavior (ADVICE r16: one live entry per (session, path))."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datawarehouse1_spark import catalog
from datawarehouse1_spark.catalog import _path_fingerprint, table


def test_cluster_shortcut_same_fixpoint_fewer_rounds(spark):
    """r17 pointer-doubling (operators/dedup.py): on a deep path graph
    the shortcut must (a) reach the IDENTICAL component-min fixpoint
    and (b) materialize strictly fewer label-propagation rounds than
    plain triple-hop. Rounds are counted as localCheckpoint() calls
    minus the two fixed ones (sym + init labels) — the r17 loop lazily
    checkpoints once per round, materialized inside the round's
    convergence-sum job."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from datawarehouse1_spark.operators.dedup import (
        dedup_clusters_from_pairs,
    )

    # path 0-1-...-13 plus a disjoint triangle 100-101-102
    edges = [(i, i + 1) for i in range(13)] + [
        (100, 101), (101, 102), (100, 102)
    ]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])

    def run(shortcut):
        orig = CDF.localCheckpoint
        calls = [0]

        def counting(self, *a, **kw):
            calls[0] += 1
            return orig(self, *a, **kw)

        CDF.localCheckpoint = counting
        try:
            rows = sorted(
                (r["id"], r["keeper"])
                for r in dedup_clusters_from_pairs(
                    pairs, shortcut=shortcut
                ).collect()
            )
        finally:
            CDF.localCheckpoint = orig
        return rows, calls[0] - 2  # minus sym + init labels

    plain, plain_rounds = run(False)
    jumped, jump_rounds = run(True)
    assert plain == jumped
    assert all(k == 0 for i, k in plain if i < 100)
    assert all(k == 100 for i, k in plain if i >= 100)
    assert jump_rounds < plain_rounds


def test_fingerprint_flat_file_and_dir(tmp_path):
    f = tmp_path / "orders.parquet"
    f.write_bytes(b"x" * 16)
    fp = _path_fingerprint(str(f))
    assert fp is not None and fp[0] == "orders.parquet"

    d = tmp_path / "flat.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"a" * 8)
    (d / "_SUCCESS").write_bytes(b"")
    fp2 = _path_fingerprint(str(d))
    assert fp2 is not None and len(fp2) == 2

    # content change under the SAME names re-keys (sizes/mtimes differ)
    (d / "part-0.parquet").write_bytes(b"bbbb" * 8)
    assert _path_fingerprint(str(d)) != fp2


def test_fingerprint_bypasses_nested_partition_dirs(tmp_path):
    """A directory table with partition subdirs must NOT be memoized: a
    deep file can change without touching any depth-1 stat."""
    d = tmp_path / "events.parquet"
    sub = d / "dt=2024-01-01"
    sub.mkdir(parents=True)
    (sub / "part-0.parquet").write_bytes(b"a" * 8)
    assert _path_fingerprint(str(d)) is None


def test_fingerprint_missing_path_is_none(tmp_path):
    assert _path_fingerprint(str(tmp_path / "nope.parquet")) is None


def test_table_memo_nested_dir_always_rereads(spark, tmp_path):
    """Staged partitioned table: overwrite a DEEP file in place (no
    depth-1 rename) and verify table() serves the fresh rows — i.e. the
    memo was bypassed, not stale."""
    path = str(tmp_path / "customer.parquet")
    spark.range(3).select(
        F.col("id").alias("c_custkey"), F.lit("AAA").alias("c_name")
    ).write.mode("overwrite").format("parquet").partitionBy(
        "c_name"
    ).save(path)
    df1 = table(spark, str(tmp_path), "customer")
    assert df1.count() == 3

    spark.range(5).select(
        F.col("id").alias("c_custkey"), F.lit("AAA").alias("c_name")
    ).write.mode("overwrite").format("parquet").partitionBy(
        "c_name"
    ).save(path)
    assert table(spark, str(tmp_path), "customer").count() == 5


def test_table_memo_overwrite_evicts_not_accumulates(spark, tmp_path):
    """Flat staged table overwritten repeatedly: the memo keeps ONE
    live entry per (session, path) — insert replaces the stale
    fingerprint's entry (ADVICE r16 growth concern)."""
    path = str(tmp_path / "region.parquet")
    key_count_for_path = lambda: sum(  # noqa: E731
        1 for k in catalog._TABLE_MEMO if k[2] == os.path.abspath(path)
    )
    for n in (2, 4, 6):
        spark.range(n).select(
            F.col("id").alias("r_regionkey"),
            F.lit("x").alias("r_name"),
            F.lit("y").alias("r_comment"),
        ).coalesce(1).write.mode("overwrite").parquet(path)
        got = table(spark, str(tmp_path), "region")
        assert got.count() == n
        assert key_count_for_path() <= 1
