"""WebDataset tar shards (sources/webdataset.py): sample grouping,
deterministic shard bytes, sidecar metadata, and the Spark extraction
pipeline including real PNG members."""

from __future__ import annotations

import tarfile

import numpy as np
import pytest

from datawarehouse1_spark.sources.webdataset import (
    build_tar_shard,
    parse_tar_samples,
    sample_metadata,
)


def _samples():
    return [
        ("000000001", {"txt": b"hello", "json": b'{"lang": "en"}'}),
        ("000000002", {"txt": b"welt", "json": b'{"lang": "de"}', "png": b"fakepng"}),
        ("000000003", {"txt": b""}),
    ]


def test_roundtrip_grouping_and_order():
    shards = build_tar_shard(_samples())
    back = parse_tar_samples(shards)
    assert [k for k, _ in back] == ["000000001", "000000002", "000000003"]
    assert back[0][1] == {"txt": b"hello", "json": b'{"lang": "en"}'}
    assert back[1][1]["png"] == b"fakepng"
    assert back[2][1] == {"txt": b""}
    assert sample_metadata(back[0][1]) == {"lang": "en"}
    assert sample_metadata(back[2][1]) == {}


def test_shard_bytes_deterministic():
    a = build_tar_shard(_samples())
    b = build_tar_shard(_samples())
    assert a == b
    # zeroed metadata: no timestamps/owners leak into the bytes
    with tarfile.open(fileobj=__import__("io").BytesIO(a), mode="r:") as tf:
        for m in tf:
            assert m.mtime == 0 and m.uid == 0 and m.gid == 0


def test_malformed_tar_raises():
    with pytest.raises(tarfile.ReadError):
        parse_tar_samples(b"not a tar at all" * 40)


def test_spark_pipeline_recovers_samples(spark):
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.queries.wds_ext import (
        synthesize_wds_shards,
        wds_extract_samples,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 40")
    expected = {
        r.doc_id: (r.text, r.lang) for r in docs.select("doc_id", "text", "lang").collect()
    }
    out = wds_extract_samples(synthesize_wds_shards(docs)).collect()
    assert {r.doc_id: (r.text, r.lang) for r in out} == expected
    for r in out:
        assert r.has_image == (r.doc_id % 2 == 0)
        assert r.image_ok == r.has_image  # every synthesized PNG decodes
        assert r.n_chars == len(r.text)
