"""Round-10 hardening: regression tests for the three ADVICE r9
findings (JPEG marker-walk tolerance in exif.py, durable no-op audit
proof in takedown_maintenance.py, no ignored broadcast hint in
drift_monitor.py)."""

from __future__ import annotations

import glob

import pytest


def test_exif_tolerates_fill_bytes_and_standalone_markers():
    """ADVICE r9 (exif.py): real-world camera JPEGs may carry 0xFF fill
    bytes before a marker (T.81 B.1.1.2) and standalone markers with
    NO length field (TEM 0x01, RSTn 0xD0-0xD7; B.1.1.3). The marker
    walk must step over both instead of declaring sync loss."""
    import numpy as np

    from datawarehouse1_spark.multimodal.exif import (
        encode_exif_app1,
        insert_app1,
        parse_exif,
    )
    from datawarehouse1_spark.multimodal.jpeg import encode_jpeg

    plain = encode_jpeg(np.full((8, 8, 3), 99, dtype=np.uint8), quality=96)
    app1 = encode_exif_app1("CamY", "M-10", 1, "2026:08:15 01:02:03")
    tagged = insert_app1(plain, app1)

    want = {
        "make": "CamY",
        "model": "M-10",
        "orientation": 1,
        "datetime": "2026:08:15 01:02:03",
    }

    # (a) fill bytes: repeated 0xFF padding before the APP1 marker
    padded = tagged[:2] + b"\xff\xff\xff" + tagged[2:]
    assert parse_exif(padded) == want

    # (b) standalone markers before APP1: TEM and an RST marker, each
    # exactly 2 bytes with no length field
    standalone = tagged[:2] + b"\xff\x01" + b"\xff\xd3" + tagged[2:]
    assert parse_exif(standalone) == want

    # (c) both at once, interleaved
    mixed = tagged[:2] + b"\xff\xff" + b"\xff\x01" + b"\xff" + tagged[2:]
    assert parse_exif(mixed) == want

    # (d) genuine sync loss still raises — tolerance must not become
    # silent acceptance of a corrupt stream
    broken = tagged[:2] + b"\x00\x00" + tagged[2:]
    with pytest.raises(ValueError, match="marker sync lost"):
        parse_exif(broken)


def test_takedown_noop_proof_row_is_durable_and_idempotent(spark, tmp_path):
    """ADVICE r9 (takedown_maintenance.py): a batch skipped because all
    its tombstones were already absent must still leave a durable audit
    row (n_removed=0), keyed by the tombstone content hash so replays
    stay overwrite-idempotent. Distinct no-op requests get distinct
    proof dirs; the published snapshot version never moves."""
    from datawarehouse1_spark.streaming import takedown_maintenance as tdm
    from datawarehouse1_spark.streaming.snapshot_store import latest_version

    corpus = spark.range(40).withColumnRenamed("id", "doc_id")
    corpus_path = str(tmp_path / "corpus")
    audit_path = str(tmp_path / "audit")
    sink = tdm.make_takedown_sink(spark, corpus_path, audit_path, corpus)

    def tomb(ids):
        return spark.createDataFrame([(i,) for i in ids], "doc_id long")

    sink(tomb([5, 6]), 0)
    assert latest_version(corpus_path) == 0

    # replayed batch: all ids already gone -> skip path -> proof row
    sink(tomb([5, 6]), 0)
    dirs = sorted(glob.glob(f"{audit_path}/batch=noop-*"))
    assert len(dirs) == 1
    row = spark.read.parquet(dirs[0]).collect()[0]
    assert (row.batch_id, row.n_tombstones, row.n_removed, row.n_remaining) == (
        -1,
        2,
        0,
        38,
    )
    assert latest_version(corpus_path) == 0  # no version bump on skip

    # same request again: same dir overwritten, nothing accumulates
    sink(tomb([5, 6]), 0)
    assert sorted(glob.glob(f"{audit_path}/batch=noop-*")) == dirs

    # a DIFFERENT all-no-op request gets its own proof dir
    sink(tomb([5]), 0)
    assert len(glob.glob(f"{audit_path}/batch=noop-*")) == 2


def test_drift_monitor_full_outer_join_has_no_broadcast(spark):
    """ADVICE r9 (drift_monitor.py): Spark cannot run a FULL OUTER join
    as broadcast-hash, so the old F.broadcast hint was silently ignored
    and misdocumented the plan. Pin the honest plan: no broadcast node
    in the join, and the null-safe full-outer parity with the batch
    report is unchanged."""
    from datawarehouse1_spark.streaming.drift_monitor import chisq_vs_reference

    b = spark.createDataFrame(
        [("a", 10), (None, 3)], "bin string, cnt_batch long"
    )
    r = spark.createDataFrame(
        [("a", 12), ("b", 4), (None, 2)], "bin string, cnt_ref long"
    )
    out = chisq_vs_reference(b, r)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert "BroadcastHashJoin" not in plan

    rows = {x["bin"]: (x["cnt_batch"], x["cnt_ref"]) for x in out.collect()}
    # NULL bin stays ONE matched row; the absent bin zero-fills
    assert rows[None] == (3, 2)
    assert rows["a"] == (10, 12)
    assert rows["b"] == (0, 4)
