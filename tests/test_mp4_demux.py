"""ISO-BMFF demuxer (multimodal/mp4.py): box-walk correctness against
the fixture writer, sample byte-range extraction, keyframe seek policy,
64-bit box forms, and the Spark demux/frame-sample plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datawarehouse1_spark.multimodal.mp4 import (
    Mp4Sample,
    demux_mp4,
    encode_mp4_stub,
    extract_sample,
    iter_boxes,
    keyframes_near,
)


def _payloads(n: int, base: int = 20) -> list[bytes]:
    return [bytes([i % 256]) * (base + i * 3) for i in range(n)]


def test_demux_roundtrip_every_sample():
    payloads = _payloads(8)
    mp4 = encode_mp4_stub(payloads, sample_duration_units=40)
    (track,) = demux_mp4(mp4)
    assert track.handler == "vide" and track.codec == "mp4v"
    assert track.track_id == 1 and (track.width, track.height) == (16, 16)
    assert track.timescale == 1000 and track.duration == 8 * 40
    assert len(track.samples) == 8
    for s in track.samples:
        assert extract_sample(mp4, s) == payloads[s.index]
        assert s.dts == s.index * 40 and s.duration == 40


def test_multi_chunk_layout_with_partial_tail():
    # 7 samples at 3 per chunk -> chunks of 3/3/1; offsets must chain
    # through stsc+stco, not assume one chunk
    payloads = _payloads(7)
    mp4 = encode_mp4_stub(payloads, samples_per_chunk=3)
    (track,) = demux_mp4(mp4)
    for s in track.samples:
        assert extract_sample(mp4, s) == payloads[s.index]


def test_uniform_chunk_layout():
    payloads = _payloads(6)
    mp4 = encode_mp4_stub(payloads, samples_per_chunk=3)  # exact 2 chunks
    (track,) = demux_mp4(mp4)
    for s in track.samples:
        assert extract_sample(mp4, s) == payloads[s.index]


def test_sync_samples_every_fourth():
    mp4 = encode_mp4_stub(_payloads(10), sync_every=4)
    (track,) = demux_mp4(mp4)
    assert [s.index for s in track.samples if s.is_sync] == [0, 4, 8]


def test_keyframe_seek_picks_latest_at_or_before_target():
    # 10 samples x 40ms, keyframes at 0/160/320ms; sampling every 150ms
    # targets 0,150,300 -> keyframes 0, 0(dedup), 160 -> indices 0, 4
    mp4 = encode_mp4_stub(_payloads(10), sample_duration_units=40, sync_every=4)
    (track,) = demux_mp4(mp4)
    picked = keyframes_near(track, every_ms=150)
    assert [(s.index, s.dts) for s in picked] == [(0, 0), (4, 160)]
    # dense sampling hits every keyframe exactly once
    dense = keyframes_near(track, every_ms=40)
    assert [s.index for s in dense] == [0, 4, 8]


def test_iter_boxes_handles_largesize_and_to_end():
    inner = b"abcd"
    large = struct.pack(">I", 1) + b"test" + struct.pack(">Q", 16 + len(inner)) + inner
    boxes = list(iter_boxes(large, 0, len(large)))
    assert boxes == [(b"test", 16, 16 + len(inner))]
    toend = struct.pack(">I", 0) + b"last" + inner
    boxes = list(iter_boxes(toend, 0, len(toend)))
    assert boxes == [(b"last", 8, len(toend))]


def test_malformed_payloads_raise():
    with pytest.raises(ValueError, match="ftyp"):
        demux_mp4(b"\x00" * 32)
    with pytest.raises(ValueError):
        demux_mp4(encode_mp4_stub(_payloads(3))[:40])  # truncated moov
    # declared-size overrun
    bad = struct.pack(">I", 9999) + b"ftyp" + b"\x00" * 16
    with pytest.raises(ValueError):
        demux_mp4(bad)


def test_extract_sample_range_checked():
    mp4 = encode_mp4_stub(_payloads(3))
    with pytest.raises(ValueError, match="outside payload"):
        extract_sample(mp4, Mp4Sample(0, len(mp4) - 2, 10, 0, 40, True))


def test_spark_demux_stats_matches_formulas(spark):
    """The Spark-side demux must recover the synthesizer's closed-form
    sample counts/sizes — same contract the DuckDB oracle checks."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.multimodal.binary_columns import (
        demux_stats,
        synthesize_video_assets,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 40")
    rows = demux_stats(synthesize_video_assets(docs)).collect()
    assert len(rows) == 40
    for r in rows:
        n = 5 + r.asset_id % 10
        assert r.codec == "mp4v"
        assert r.n_samples == n
        assert r.n_keyframes == (n + 3) // 4
        assert r.duration_ms == 40 * n
        assert r.total_sample_bytes == n * (20 + r.asset_id % 50)


def test_spark_frame_sample_real(spark):
    """Real keyframe selection + byte-range slicing executor-side; the
    stubbed decode sees the genuine frame bytes (feature must equal a
    local stub of the same slice)."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.multimodal.binary_columns import (
        deterministic_fake_decode,
        frame_sample_real,
        synthesize_video_assets,
    )
    from datawarehouse1_spark.multimodal.mp4 import (
        demux_mp4 as _demux,
        extract_sample as _ext,
        keyframes_near as _near,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 12")
    assets = synthesize_video_assets(docs)
    local = {bytes_row.asset_id: bytes(bytes_row.payload) for bytes_row in assets.collect()}
    out = frame_sample_real(assets, every_ms=200).collect()
    assert out
    for r in out:
        payload = local[r.asset_id]
        track = _demux(payload)[0]
        sample = track.samples[r.frame_idx]
        assert sample.is_sync
        frame = _ext(payload, sample)
        assert r.frame_bytes == len(frame)
        assert r.pts_ms == sample.dts * 1000 // track.timescale
        np.testing.assert_allclose(
            np.array(r.feature), deterministic_fake_decode(frame), rtol=1e-6
        )
    # every asset contributed at least its first keyframe
    assert {r.asset_id for r in out} == set(local)
    # and the per-asset frame count matches the local policy
    from collections import Counter

    counts = Counter(r.asset_id for r in out)
    for aid, payload in local.items():
        assert counts[aid] == len(_near(demux_mp4(payload)[0], 200))


def test_mjpeg_noise_frames_decode_to_encoded_pixels():
    """MJPEG end-to-end on NOISE frames (not the solid-gray oracle
    case): slicing a sample out of mdat and decoding it must equal
    decoding the original encoded frame directly — container framing
    adds or drops nothing."""
    from datawarehouse1_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    frames = [
        encode_jpeg(
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8), quality=85
        )
        for _ in range(5)
    ]
    mp4 = encode_mp4_stub(frames, sample_duration_units=40, codec=b"jpeg",
                          sync_every=2)
    (track,) = demux_mp4(mp4)
    assert track.codec == "jpeg"
    for s in track.samples:
        np.testing.assert_array_equal(
            decode_jpeg(extract_sample(mp4, s)), decode_jpeg(frames[s.index])
        )


def test_solid_gray_q96_roundtrip_bit_exact():
    """The invariant q_multimodal_video_decode's oracle rests on: at
    quality 96 libjpeg's scaling makes the DC quant step 1, so a
    solid-gray block survives encode->decode bit-exact for EVERY value."""
    from datawarehouse1_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    for v in range(0, 256, 17):
        img = np.full((16, 16, 3), v, dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(img, quality=96)), img
        )


def test_spark_decode_video_frames_real(spark):
    """decode_video_frames over synthesized MJPEG assets: per-frame
    pixel stats must equal the generating formula, and the H.26x path
    must stay an honest gate."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.multimodal.binary_columns import (
        decode_video_frames,
        synthesize_mjpeg_video_assets,
        synthesize_video_assets,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 12")
    out = decode_video_frames(
        synthesize_mjpeg_video_assets(docs), every_ms=80
    ).collect()
    assert out and {r.asset_id for r in out} == set(range(12))
    for r in out:
        v = (r.asset_id * 37 + r.frame_idx * 83) % 256
        assert (r.px_min, r.px_max) == (v, v)
        assert (r.width, r.height) == (16, 16)
        assert r.pts_ms == r.frame_idx * 40

    # non-MJPEG tracks (opaque 'mp4v' payloads) must raise, not fake it
    gated = decode_video_frames(synthesize_video_assets(docs.limit(1)))
    with pytest.raises(Exception, match="no built-in bitstream decoder"):
        gated.collect()
