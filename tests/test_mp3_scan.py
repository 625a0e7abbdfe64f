"""MPEG-audio frame walker (multimodal/mp3.py): header arithmetic over
every bitrate/samplerate combination, ID3v2/ID3v1 tag handling, and
loud desync/truncation errors."""

from __future__ import annotations

import pytest

from datawarehouse1_spark.multimodal.mp3 import demux_mp3, encode_mp3_stub


@pytest.mark.parametrize("bitrate", [32, 128, 192, 320])
@pytest.mark.parametrize("samplerate", [44100, 48000, 32000])
def test_frame_walk_every_table_entry(bitrate, samplerate):
    info = demux_mp3(encode_mp3_stub(7, bitrate, samplerate, title="t"))
    assert info.n_frames == 7
    assert info.bitrate_kbps == bitrate and info.samplerate == samplerate
    assert info.is_cbr
    assert info.duration_ms == 7 * 1152 * 1000 // samplerate
    assert info.title == "t"


def test_tagless_and_id3v1_trailer():
    assert demux_mp3(encode_mp3_stub(5)).title is None
    with_v1 = encode_mp3_stub(3) + b"TAG" + b"\x00" * 125
    assert demux_mp3(with_v1).n_frames == 3


def test_id3v2_skip_is_syncsafe():
    # a tag body > 127 bytes forces multi-byte syncsafe size encoding
    payload = encode_mp3_stub(4, title="x" * 300)
    info = demux_mp3(payload)
    assert info.n_frames == 4 and info.title == "x" * 300


def test_corrupt_streams_raise():
    with pytest.raises(ValueError, match="frame sync"):
        demux_mp3(b"\x00" * 100)
    with pytest.raises(ValueError, match="truncated"):
        demux_mp3(encode_mp3_stub(3)[:-10])
    with pytest.raises(ValueError, match="no MPEG audio frames"):
        demux_mp3(encode_mp3_stub(1, title="only-tag")[:-417])


def test_mpeg2_gated_honestly():
    p = bytearray(encode_mp3_stub(1))
    p[1] = 0xF3  # flip version bits to MPEG2
    with pytest.raises(NotImplementedError, match="MPEG1 Layer III"):
        demux_mp3(bytes(p))


def test_declared_query_matches_formulas(spark):
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_multimodal_mp3_scan"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 300
    for r in rows:
        n = 10 + r.asset_id % 20
        assert r.n_frames == n
        assert r.bitrate_kbps == (128, 192, 320)[r.asset_id % 3]
        assert r.duration_ms == n * 1152 * 1000 // 44100
        assert r.title == f"doc {r.asset_id}"


def test_id3v2_utf16_and_v24_syncsafe_frames():
    """Real taggers write UTF-16 TIT2 bodies and v2.4 syncsafe frame
    sizes — both must parse (not crash), and tag damage fails soft."""
    import struct as _s

    from datawarehouse1_spark.multimodal.mp3 import encode_mp3_stub

    frames = encode_mp3_stub(3)  # bare frame sequence

    def tag(version: int, body: bytes, fsize: int | None = None) -> bytes:
        n = len(body)
        fs = fsize if fsize is not None else n
        if version >= 4:  # syncsafe
            raw = bytes([(fs >> 21) & 0x7F, (fs >> 14) & 0x7F, (fs >> 7) & 0x7F, fs & 0x7F])
        else:
            raw = _s.pack(">I", fs)
        frame = b"TIT2" + raw + b"\x00\x00" + body
        size = len(frame)
        return (
            bytes([0x49, 0x44, 0x33, version, 0, 0])
            + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F])
            + frame
        )

    # v2.3 UTF-16 with BOM (encoding byte 1)
    body = b"\x01" + "héllo".encode("utf-16")
    assert demux_mp3(tag(3, body) + frames).title == "héllo"
    # v2.4 syncsafe frame size >= 0x80 (would mis-frame as big-endian)
    long_title = "t" * 200
    body = b"\x03" + long_title.encode("utf-8")
    assert demux_mp3(tag(4, body) + frames).title == long_title
    # damaged encoding: fails soft to None, frames still counted
    body = b"\x01" + b"\xff\xfe\x00\xd8"  # lone surrogate U+D800 (LE)
    info = demux_mp3(tag(3, body) + frames)
    assert info.title is None and info.n_frames == 3


# ---------- FLAC metadata scan ----------


def test_flac_streaminfo_roundtrip():
    from datawarehouse1_spark.multimodal.mp3 import encode_flac_stub, scan_flac

    for total, rate, ch, bits in (
        (44100, 44100, 2, 16),
        (123456, 48000, 1, 24),
        (0, 8000, 8, 32),
        ((1 << 36) - 1, 96000, 2, 16),  # max representable sample count
    ):
        info = scan_flac(encode_flac_stub(total, rate, ch, bits, vendor="v1"))
        assert info.total_samples == total
        assert (info.sample_rate, info.channels, info.bits_per_sample) == (rate, ch, bits)
        assert info.duration_ms == total * 1000 // rate
        assert info.vendor == "v1"


def test_flac_malformed_raises():
    from datawarehouse1_spark.multimodal.mp3 import encode_flac_stub, scan_flac

    with pytest.raises(ValueError, match="not a FLAC"):
        scan_flac(b"flaC" + b"\x00" * 40)
    with pytest.raises(ValueError, match="truncated"):
        scan_flac(encode_flac_stub(100)[:20])
    with pytest.raises(ValueError, match="STREAMINFO"):
        scan_flac(b"fLaC" + bytes([0x80 | 0x04, 0, 0, 1, 0]))  # comment only
