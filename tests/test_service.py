"""The runnable ingest service (python -m datawarehouse1_spark.service):
argument wiring + an end-to-end run against a watch directory."""

from __future__ import annotations

import pytest

from datawarehouse1_spark.schemas import PRODUITS
from datawarehouse1_spark.service import build_parser, run_service


def test_parser_defaults_honor_reference_env(monkeypatch):
    monkeypatch.setenv("WATCH_DIRECTORY", "/custom/in")
    monkeypatch.setenv("POLLING_INTERVAL", "7")
    args = build_parser().parse_args(
        ["--table-root", "/wh", "--table", "produits", "--business-key", "produit_id"]
    )
    assert args.watch_dir == "/custom/in"
    assert args.interval == 7


def test_service_ingests_files(spark, tmp_path):
    watch = tmp_path / "incoming"
    watch.mkdir()
    from decimal import Decimal

    rows = [
        ("P1", "USB", "cables", Decimal("9.99"), 5, "usb cable"),
        ("P2", "HDMI", "cables", Decimal("19.99"), 3, "hdmi cable"),
    ]
    spark.createDataFrame(rows, PRODUITS).coalesce(1).write.mode("overwrite").parquet(
        str(watch / "produits_1.parquet")
    )
    args = build_parser().parse_args(
        [
            "--watch-dir", f"{watch}/*",
            "--table-root", str(tmp_path / "wh"),
            "--table", "produits",
            "--business-key", "produit_id",
            "--not-null", "produit_id,nom",
            "--interval", "1",
        ]
    )
    q = run_service(args, spark=spark)
    try:
        q.processAllAvailable()
        out = spark.read.parquet(str(tmp_path / "wh" / "produits"))
        assert {r.produit_id for r in out.collect()} == {"P1", "P2"}
        assert "imported_at" in out.columns
    finally:
        q.stop()
