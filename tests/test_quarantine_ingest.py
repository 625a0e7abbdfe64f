"""Row-level quarantine ingest: clean rows append, bad rows land in the
quarantine table with per-row violation reasons — the at-scale
alternative to the reference's fail-the-whole-file transaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark.operators.ingest import (
    flag_violations,
    ingest_with_quarantine,
)


@pytest.fixture()
def batch(spark):
    return spark.createDataFrame(
        [
            ("V1", "C1", 10),    # clean
            ("V2", None, 20),    # null client_id
            ("V3", "C9", 30),    # FK orphan (C9 not in dims)
            ("V4", "C1", 40),    # clean
            ("V4", "C2", 50),    # dup business key with previous row
            ("V5", "C1", None),  # null amount
        ],
        "vente_id string, client_id string, amount int",
    )


@pytest.fixture()
def clients(spark):
    return spark.createDataFrame([("C1",), ("C2",)], "client_id string")


def test_flag_violations_reasons(spark, batch, clients):
    flagged = flag_violations(
        batch,
        "vente_id",
        ["client_id", "amount"],
        fk_checks=[(clients, "client_id", "client_id")],
    )
    got = {
        (r.vente_id, r.client_id): sorted(r["__reasons"]) for r in flagged.collect()
    }
    assert got[("V1", "C1")] == []
    assert got[("V2", None)] == ["null:client_id"]  # null FK is not an orphan
    assert got[("V3", "C9")] == ["fk_orphan:client_id"]
    assert got[("V4", "C1")] == ["dup_key:vente_id"]
    assert got[("V4", "C2")] == ["dup_key:vente_id"]
    assert got[("V5", "C1")] == ["null:amount"]


def test_quarantine_split_and_write(spark, batch, clients, tmp_path):
    table_path = str(tmp_path / "ventes")
    qpath = str(tmp_path / "quarantine")
    res = ingest_with_quarantine(
        batch,
        table_path,
        qpath,
        "vente_id",
        ["client_id", "amount"],
        source_file="ventes_2025.xlsx",
        fk_checks=[(clients, "client_id", "client_id")],
    )
    assert res.status == "partial"
    assert res.n_rows == 1  # only V1 is clean (both V4 rows are dup-key)

    good = spark.read.parquet(table_path)
    bad = spark.read.parquet(qpath)
    assert {r.vente_id for r in good.collect()} == {"V1"}
    assert good.count() == 1
    assert bad.count() == 5
    reasons = {tuple(sorted(r.quarantine_reasons)) for r in bad.collect()}
    assert ("dup_key:vente_id",) in reasons
    assert all(r.source_file == "ventes_2025.xlsx" for r in bad.collect())


def test_quarantine_all_clean_no_quarantine_dir(spark, clients, tmp_path):
    clean = spark.createDataFrame(
        [("V1", "C1", 1), ("V2", "C2", 2)], "vente_id string, client_id string, amount int"
    )
    res = ingest_with_quarantine(
        clean,
        str(tmp_path / "t"),
        str(tmp_path / "q"),
        "vente_id",
        ["client_id"],
        source_file="f.xlsx",
        fk_checks=[(clients, "client_id", "client_id")],
    )
    assert res.status == "success" and res.n_rows == 2
    import os

    assert not os.path.exists(str(tmp_path / "q"))


def test_quarantine_unique_clash_against_existing(spark, tmp_path):
    existing = spark.createDataFrame([("V1",)], "vente_id string")
    batch = spark.createDataFrame(
        [("V1", 1), ("V2", 2)], "vente_id string, amount int"
    )
    res = ingest_with_quarantine(
        batch,
        str(tmp_path / "t"),
        str(tmp_path / "q"),
        "vente_id",
        [],
        source_file="f2.xlsx",
        existing=existing,
    )
    assert res.status == "partial" and res.n_rows == 1
    bad = spark.read.parquet(str(tmp_path / "q")).collect()
    assert [r.vente_id for r in bad] == ["V1"]
    assert bad[0].quarantine_reasons == ["unique_clash:vente_id"]
