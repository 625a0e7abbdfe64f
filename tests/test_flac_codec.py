"""FLAC codec (multimodal/flac.py): lossless round-trip law, CRC/MD5
corruption detection, honest gates, and consistency with the metadata
scanner. Losslessness means decode(encode(x)) == x EXACTLY — the
strongest law any codec in the repo can pin."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datawarehouse1_spark.multimodal.flac import (
    _BLOCKSIZE,
    decode_flac,
    encode_flac,
)
from datawarehouse1_spark.multimodal.mp3 import scan_flac


def test_round_trip_mono_multiframe():
    rng = np.random.default_rng(11)
    x = (
        np.sin(np.linspace(0, 80 * np.pi, 3 * _BLOCKSIZE + 123)) * 15000
        + rng.integers(-100, 100, 3 * _BLOCKSIZE + 123)
    ).astype(np.int16)
    blob = encode_flac(x, 22050)
    pcm, rate, info = decode_flac(blob)
    assert rate == 22050
    assert info.channels == 1 and info.bits_per_sample == 16
    assert np.array_equal(pcm[:, 0], x)
    # smooth audio should actually compress (fixed predictors + rice)
    assert len(blob) < x.nbytes


def test_round_trip_stereo():
    rng = np.random.default_rng(3)
    left = rng.integers(-20000, 20000, 5000).astype(np.int16)
    right = (left // 3 + 7).astype(np.int16)
    st_ = np.stack([left, right], axis=1)
    pcm, rate, info = decode_flac(encode_flac(st_, 48000))
    assert info.channels == 2 and rate == 48000
    assert np.array_equal(pcm, st_)


def test_constant_and_extreme_values():
    c = np.full(4096 + 7, -123, np.int16)
    assert np.array_equal(decode_flac(encode_flac(c, 8000))[0][:, 0], c)
    t = np.array([0, 1, -1, 32767, -32768, 32767, -32768], np.int16)
    assert np.array_equal(decode_flac(encode_flac(t, 8000))[0][:, 0], t)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
    st.sampled_from([8000, 16000, 44100]),
)
def test_round_trip_property(samples, rate):
    x = np.array(samples, np.int16)
    pcm, got_rate, info = decode_flac(encode_flac(x, rate))
    assert got_rate == rate
    assert info.total_samples == len(x)
    assert np.array_equal(pcm[:, 0], x)


def test_corruption_detected_never_silent():
    x = (np.arange(9000) % 2000 - 1000).astype(np.int16)
    blob = bytearray(encode_flac(x, 16000))
    # flip a bit inside frame data (past the ~70-byte metadata prologue)
    blob[len(blob) // 2] ^= 0x10
    with pytest.raises((ValueError, NotImplementedError)):
        decode_flac(bytes(blob))


def test_md5_guard_catches_wrong_pcm():
    """A stream whose STREAMINFO MD5 disagrees with the decoded PCM must
    raise — swap the MD5 bytes and keep the frames intact."""
    x = (np.arange(5000) % 997 - 498).astype(np.int16)
    blob = bytearray(encode_flac(x, 16000))
    # STREAMINFO md5 lives at bytes 4+4+18 .. 4+4+34
    blob[26:42] = bytes(16)  # all-zero = "unknown", decoder skips check
    pcm, _, _ = decode_flac(bytes(blob))
    assert np.array_equal(pcm[:, 0], x)
    blob[26:42] = b"\x01" * 16  # definite wrong digest
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


def test_scanner_and_decoder_agree():
    x = np.zeros((777, 2), np.int16)
    blob = encode_flac(x, 44100, vendor="dw1-test")
    meta = scan_flac(blob)
    pcm, rate, info = decode_flac(blob)
    assert (meta.sample_rate, meta.channels, meta.total_samples) == (
        rate,
        pcm.shape[1],
        pcm.shape[0],
    )
    assert meta.vendor == "dw1-test"


def test_honest_gates_raise_by_name():
    x = np.zeros(100, np.int16)
    blob = bytearray(encode_flac(x, 8000))
    # force 20-bit depth in STREAMINFO's packed word: flip bits-1 field
    # (8/16/24 decode for real since r9 — 12/20/32 remain gated)
    word = int.from_bytes(blob[18:26], "big")
    word = (word & ~(0x1F << 36)) | ((20 - 1) << 36)
    blob[18:26] = word.to_bytes(8, "big")
    with pytest.raises(NotImplementedError, match="20-bit"):
        decode_flac(bytes(blob))
    with pytest.raises(NotImplementedError, match="20-bit"):
        encode_flac(x, 8000, bits_per_sample=20)


def test_encoder_output_is_deterministic():
    x = (np.arange(3000) * 31 % 1777 - 888).astype(np.int16)
    assert encode_flac(x, 16000) == encode_flac(x, 16000)


# ---- r8: LPC, stereo decorrelation, wasted bits (decoded for real) ----


def test_round_trip_lpc_orders():
    rng = np.random.default_rng(5)
    x = (
        np.sin(np.linspace(0, 60 * np.pi, 2 * _BLOCKSIZE + 77)) * 12000
        + rng.integers(-150, 150, 2 * _BLOCKSIZE + 77)
    ).astype(np.int16)
    fixed = encode_flac(x, 44100)
    for order in (1, 2, 4, 8, 16, 32):
        blob = encode_flac(x, 44100, lpc_order=order)
        pcm, _, _ = decode_flac(blob)
        assert np.array_equal(pcm[:, 0], x), f"LPC({order}) not lossless"
    # a tonal signal should compress better under LPC than fixed orders
    assert len(encode_flac(x, 44100, lpc_order=8)) < len(fixed)


def test_round_trip_all_stereo_layouts():
    rng = np.random.default_rng(9)
    left = (np.sin(np.arange(6000) / 30) * 9000 + rng.integers(-99, 99, 6000)).astype(
        np.int16
    )
    right = (left * 0.8).astype(np.int16) + rng.integers(-20, 20, 6000).astype(
        np.int16
    )
    st_ = np.stack([left, right], axis=1)
    indep = encode_flac(st_, 44100)
    for mode in ("left_side", "right_side", "mid_side"):
        blob = encode_flac(st_, 44100, stereo=mode)
        pcm, _, info = decode_flac(blob)
        assert info.channels == 2
        assert np.array_equal(pcm, st_), f"{mode} not lossless"
        # correlated channels: decorrelation must beat independent coding
        assert len(blob) < len(indep), f"{mode} did not compress vs independent"


def test_round_trip_wasted_bits():
    rng = np.random.default_rng(13)
    raw = (rng.integers(-1000, 1000, 5000) * 16).astype(np.int16)  # 4 LSBs zero
    blob = encode_flac(raw, 16000)
    pcm, _, _ = decode_flac(blob)
    assert np.array_equal(pcm[:, 0], raw)
    # the 4 wasted bits must actually be elided from the stream
    assert len(blob) < len(encode_flac((raw // 16).astype(np.int16), 16000)) + raw.nbytes // 4


def test_stereo_extremes_mid_side_exact():
    """mid/side halving floors (l+r)>>1; the side LSB must reconstruct
    the exact sum — pin the odd-sum corner at full scale."""
    l = np.array([32767, -32768, 32767, 0, 1, -1] * 300, np.int16)
    r = np.array([32766, -32767, -32768, 1, 0, -2] * 300, np.int16)
    st_ = np.stack([l, r], axis=1)
    for mode in ("left_side", "right_side", "mid_side"):
        pcm, _, _ = decode_flac(encode_flac(st_, 8000, stereo=mode))
        assert np.array_equal(pcm, st_), mode


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-32768, 32767), st.integers(-32768, 32767)),
        min_size=2,
        max_size=400,
    ),
    st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
    st.sampled_from([None, 2, 6]),
)
def test_round_trip_property_stereo_modes(pairs, mode, lpc):
    st_ = np.array(pairs, np.int16)
    pcm, _, _ = decode_flac(encode_flac(st_, 16000, stereo=mode, lpc_order=lpc))
    assert np.array_equal(pcm, st_)


def test_coded_number_boundaries_minimal_length():
    """ADVICE r8 (low): the 2-byte UTF-8-style form holds 11 bits
    (n < 2048), not 10 — frame numbers in [1024, 2047] must encode in
    2 bytes (strict decoders reject overlong forms), and every
    boundary must round-trip through the bit reader."""
    from datawarehouse1_spark.multimodal.flac import (
        _BitReader,
        _decode_coded_number,
        _encode_coded_number,
    )

    expect_len = [
        (0x7F, 1),
        (0x80, 2),
        (1023, 2),
        (1024, 2),  # previously emitted an overlong 3-byte form
        (2047, 2),
        (2048, 3),
        ((1 << 16) - 1, 3),
        (1 << 16, 4),
        ((1 << 21) - 1, 4),
        (1 << 21, 5),
        ((1 << 26) - 1, 5),
        (1 << 26, 6),
        ((1 << 31) - 1, 6),
    ]
    for n, ln in expect_len:
        enc = _encode_coded_number(n)
        assert len(enc) == ln, (n, len(enc), ln)
        assert _decode_coded_number(_BitReader(enc)) == n


def test_round_trip_thousands_of_frames():
    """Streams with >=1024 frames exercise the 2-byte frame-number
    form end-to-end (~the regime ADVICE r8 flagged as overlong)."""
    rng = np.random.default_rng(17)
    blocksize = 16
    nframes = 1500
    x = rng.integers(-30000, 30000, blocksize * nframes).astype(np.int16)
    blob = encode_flac(x, 8000, blocksize=blocksize)
    pcm, rate, info = decode_flac(blob)
    assert rate == 8000
    assert np.array_equal(pcm[:, 0], x)


def test_streaminfo_min_blocksize_is_blocksize_for_short_stream():
    """ADVICE r8 (low): the spec excludes the short last frame from
    min-blocksize; a fixed-blocksize encoder writes min == max ==
    blocksize even for a sub-block stream (never below the 16-sample
    floor)."""
    x = np.arange(10, dtype=np.int16)  # shorter than one block
    blob = encode_flac(x, 44100)
    streaminfo = blob[8:]  # 'fLaC' + 4-byte block header
    min_bs = int.from_bytes(streaminfo[0:2], "big")
    max_bs = int.from_bytes(streaminfo[2:4], "big")
    assert min_bs == max_bs == _BLOCKSIZE
    pcm, _, _ = decode_flac(blob)
    assert np.array_equal(pcm[:, 0], x)


# ---- r9: 8-bit and 24-bit depths decode for real ----


def test_round_trip_24bit_all_layouts():
    """24-bit depth (the studio-master format): exact round trip as
    int32 across mono, every stereo decorrelation (side channel at 25
    bits), LPC, and the full-scale corners; MD5 verified over 3-byte
    little-endian samples."""
    rng = np.random.default_rng(9)
    x = rng.integers(-(1 << 23), 1 << 23, 9000).astype(np.int64)
    pcm, rate, info = decode_flac(encode_flac(x, 48000, bits_per_sample=24))
    assert info.bits_per_sample == 24 and pcm.dtype == np.int32
    assert np.array_equal(pcm[:, 0], x)

    st = np.stack([x[:4000], (x[:4000] // 3 + 11)], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        for lpc in (None, 8):
            pcm, _, _ = decode_flac(
                encode_flac(
                    st, 48000, stereo=mode, lpc_order=lpc, bits_per_sample=24
                )
            )
            assert np.array_equal(pcm, st), (mode, lpc)

    corners = np.array(
        [0, 1, -1, (1 << 23) - 1, -(1 << 23), (1 << 23) - 1, -(1 << 23)],
        np.int64,
    )
    pcm, _, _ = decode_flac(encode_flac(corners, 8000, bits_per_sample=24))
    assert np.array_equal(pcm[:, 0], corners)


def test_round_trip_8bit():
    rng = np.random.default_rng(10)
    x = rng.integers(-128, 128, 5000).astype(np.int64)
    pcm, _, info = decode_flac(encode_flac(x, 8000, bits_per_sample=8))
    assert info.bits_per_sample == 8 and pcm.dtype == np.int16
    assert np.array_equal(pcm[:, 0], x)
    st = np.stack([x[:2000], -x[:2000] - 1], axis=1)
    for mode in ("left_side", "mid_side"):
        pcm, _, _ = decode_flac(
            encode_flac(st, 8000, stereo=mode, bits_per_sample=8)
        )
        assert np.array_equal(pcm, st), mode


def test_depth_range_enforced_on_encode():
    too_big = np.array([1 << 8], np.int64)
    with pytest.raises(ValueError, match="8-bit range"):
        encode_flac(too_big, 8000, bits_per_sample=8)
    with pytest.raises(ValueError, match="24-bit range"):
        encode_flac(np.array([1 << 23], np.int64), 8000, bits_per_sample=24)


def test_md5_guard_24bit():
    """The MD5 is computed over 3-byte samples for 24-bit streams: a
    tampered sample trips it."""
    x = np.arange(-500, 500, dtype=np.int64) * 4001
    blob = bytearray(encode_flac(x, 8000, bits_per_sample=24))
    # corrupt STREAMINFO MD5 (bytes 26..42 of the STREAMINFO block)
    blob[30] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))
