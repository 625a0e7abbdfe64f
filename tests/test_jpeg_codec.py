"""Baseline JPEG codec (multimodal/jpeg.py): round-trip fidelity over
every encoder layout the synthesizer emits (4:4:4 / 4:2:0, quality
sweep, restart markers, grayscale, progressive SOF2 scan scripts,
non-multiple-of-8 dims), marker-level structure, and loud failures on
the modes the decoder honestly does not speak (arithmetic coding,
12-bit, AC successive approximation)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datawarehouse1_spark.multimodal.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w)[None, :]
    img[:, :, 1] = np.linspace(0, 255, h)[:, None]
    img[:, :, 2] = 80
    return img


def test_zigzag_is_the_published_order():
    # spot-check the first 10 entries of T.81 Figure 5 (natural index
    # of each zigzag position): 0, 1, 8, 16, 9, 2, 3, 10, 17, 24
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG) == list(range(64))


def test_flat_field_roundtrip_lossless():
    flat = np.full((16, 16, 3), 130, dtype=np.uint8)
    for ss in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(flat, quality=90, subsample=ss))
        assert out.shape == (16, 16, 3)
        # a constant block quantizes to DC-only and survives exactly
        # (up to ±1 from the color transform)
        assert int(np.abs(out.astype(int) - 130).max()) <= 1


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("quality", [50, 75, 95])
def test_gradient_roundtrip_psnr(subsample, quality):
    img = _gradient(24, 40)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    assert out.shape == img.shape
    floor = 30.0 if subsample == "4:2:0" else 35.0
    assert _psnr(img, out) > floor


def test_higher_quality_never_worse():
    img = _gradient(32, 32)
    p = [
        _psnr(img, decode_jpeg(encode_jpeg(img, quality=q)))
        for q in (30, 60, 90)
    ]
    assert p[0] <= p[1] <= p[2]


def test_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(3)
    for h, w in ((17, 19), (9, 33), (8, 8), (1, 1)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ss in ("4:4:4", "4:2:0"):
            out = decode_jpeg(encode_jpeg(img, quality=95, subsample=ss))
            assert out.shape == (h, w, 3)


def test_restart_markers_roundtrip_and_present():
    img = _gradient(24, 40)
    for interval in (1, 2, 5):
        payload = encode_jpeg(img, quality=90, restart_interval=interval)
        # DRI segment announces the interval
        dri = payload.find(b"\xff\xdd")
        assert dri > 0
        assert struct.unpack_from(">H", payload, dri + 4)[0] == interval
        # at least one RST0 marker in the scan
        assert b"\xff\xd0" in payload
        assert _psnr(img, decode_jpeg(payload)) > 35.0


def test_grayscale_single_component():
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(gray, quality=95))
    assert out.shape == (20, 30, 3)
    # all three channels replicate the luma plane
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert _psnr(np.repeat(gray[:, :, None], 3, axis=2), out) > 35.0


def test_encoder_deterministic_bytes():
    img = _gradient(16, 24)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)
    assert encode_jpeg(img, 85, "4:2:0") == encode_jpeg(img, 85, "4:2:0")


def test_marker_structure_is_jfif_baseline():
    payload = encode_jpeg(_gradient(16, 16), quality=80)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    assert payload[2:4] == b"\xff\xe0" and payload[6:11] == b"JFIF\x00"
    sof = payload.find(b"\xff\xc0")
    assert sof > 0
    precision, h, w, ncomp = struct.unpack_from(">BHHB", payload, sof + 4)
    assert (precision, h, w, ncomp) == (8, 16, 16, 3)


def test_quality_scales_quant_tables():
    lo = encode_jpeg(_gradient(16, 16), quality=10)
    hi = encode_jpeg(_gradient(16, 16), quality=95)

    def first_dqt(payload):
        p = payload.find(b"\xff\xdb")
        return np.frombuffer(payload[p + 5 : p + 69], dtype=np.uint8).astype(int)

    assert first_dqt(lo).sum() > first_dqt(hi).sum()
    # quality 50 is the unscaled Annex K table
    mid = encode_jpeg(_gradient(16, 16), quality=50)
    assert np.array_equal(
        first_dqt(mid), QUANT_LUMA.reshape(64)[ZIGZAG].astype(int)
    )


def test_arithmetic_and_12bit_raise_honestly():
    """Progressive (SOF2) left the gated set in r6; the remaining
    honest gates are arithmetic coding and 12-bit precision."""
    base = bytearray(encode_jpeg(_gradient(16, 16)))
    sof = bytes(base).find(b"\xff\xc0")
    arith = bytearray(base)
    arith[sof + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(NotImplementedError, match="coding process"):
        decode_jpeg(bytes(arith))
    deep = bytearray(base)
    deep[sof + 4] = 12  # 12-bit precision
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(deep))


def test_garbage_raises_loudly():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(b"\xff\xd8\xff\xdb" + b"\x00" * 8)  # truncated DQT


def test_synthesizer_emits_decodable_jpegs(spark):
    """Every JPEG the asset synthesizer produces decodes through the
    same path the declared query uses, and the stdlib_decode features
    match a local decode bit-for-bit."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.multimodal.binary_columns import (
        synthesize_media_assets,
    )
    from datawarehouse1_spark.multimodal.codecs import sniff_mime, stdlib_decode

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 60")
    rows = synthesize_media_assets(docs).filter("mime = 'image/jpeg'").collect()
    assert len(rows) >= 5
    for r in rows:
        payload = bytes(r.payload)
        assert sniff_mime(payload) == "image/jpeg"
        img = decode_jpeg(payload)
        assert img.shape == (16, 16, 3)
        feat = stdlib_decode(payload)
        assert feat[0] == 16.0 and feat[1] == 16.0


# ---------- progressive (SOF2) ----------


def test_progressive_equals_baseline_bit_for_bit():
    """Progressive transmits the SAME quantized coefficients in a
    different order, so its decode must equal the baseline 4:4:4 decode
    exactly — any disagreement is a scan-accounting bug."""
    from datawarehouse1_spark.multimodal.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(21)
    for h, w in ((16, 16), (17, 19), (1, 1), (24, 40)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for q in (50, 90):
            base = decode_jpeg(encode_jpeg(img, q, "4:4:4"))
            prog = decode_jpeg(encode_jpeg_progressive(img, q))
            np.testing.assert_array_equal(prog, base)


def test_progressive_marker_is_sof2():
    from datawarehouse1_spark.multimodal.jpeg import encode_jpeg_progressive

    payload = encode_jpeg_progressive(_gradient(16, 16))
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    # 1 DC + 1 DC refine + 6 AC first bands + 6 AC refinement scans
    assert payload.count(b"\xff\xda") == 14


def test_progressive_quality_tracks_baseline():
    from datawarehouse1_spark.multimodal.jpeg import encode_jpeg_progressive

    img = _gradient(24, 40)
    out = decode_jpeg(encode_jpeg_progressive(img, 90))
    assert _psnr(img, out) > 35.0


def test_progressive_scan_script_covers_both_approximation_passes():
    """The fixture writer emits Al=1 first scans AND Ah=1 refinement
    scans — parse every SOS header and check both passes are present
    for AC (the decode-equality test then proves they reconstruct)."""
    from datawarehouse1_spark.multimodal.jpeg import encode_jpeg_progressive

    payload = encode_jpeg_progressive(_gradient(16, 16))
    passes = []
    pos = -1
    while True:
        pos = payload.find(b"\xff\xda", pos + 1)
        if pos < 0:
            break
        ns = payload[pos + 4]
        ss, se, ahal = payload[pos + 5 + 2 * ns : pos + 8 + 2 * ns]
        passes.append((ns, ss, se, ahal >> 4, ahal & 0x0F))
    ac_first = [p for p in passes if p[1] > 0 and p[3] == 0 and p[4] == 1]
    ac_refine = [p for p in passes if p[1] > 0 and p[3] == 1 and p[4] == 0]
    assert len(ac_first) == 6 and len(ac_refine) == 6
    assert passes[0] == (3, 0, 0, 0, 1)  # DC first
    assert passes[1] == (3, 0, 0, 1, 0)  # DC refine


def test_synthesizer_emits_progressive_slice(spark):
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.multimodal.binary_columns import (
        synthesize_media_assets,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 128")
    rows = synthesize_media_assets(docs).filter("mime = 'image/jpeg'").collect()
    kinds = {"prog": 0, "base": 0}
    for r in rows:
        payload = bytes(r.payload)
        kinds["prog" if b"\xff\xc2" in payload else "base"] += 1
        assert decode_jpeg(payload).shape == (16, 16, 3)
    assert kinds["prog"] > 0 and kinds["base"] > 0


# --- 12-bit extended sequential (SOF1) tier, added r8 ---


def test_12bit_constant_blocks_bit_exact_full_range():
    """quant_step=1 makes the DCT round trip exact on constant blocks;
    sweep the whole 12-bit range."""
    from datawarehouse1_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_gray12,
    )

    for v in list(range(0, 4096, 97)) + [0, 1, 2047, 2048, 4094, 4095]:
        img = np.full((8, 16), v, np.uint16)
        dec = decode_jpeg(encode_jpeg_gray12(img))
        assert dec.dtype == np.uint16 and dec.shape == (8, 16, 3)
        assert np.all(dec[:, :, 0] == v), f"value {v} not exact"


def test_12bit_arbitrary_content_within_one_lsb():
    from datawarehouse1_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_gray12,
    )

    rng = np.random.default_rng(41)
    img = rng.integers(0, 4096, (40, 56)).astype(np.uint16)
    dec = decode_jpeg(encode_jpeg_gray12(img))
    err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
    # full-range white noise drives every AC category the 12-bit mode
    # adds (size up to 14) through the data-derived Huffman tables
    assert err.max() <= 1


def test_12bit_nonmultiple_of_8_dimensions():
    from datawarehouse1_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_gray12,
    )

    img = (np.add.outer(np.arange(13) * 300, np.arange(21) * 11) % 4096).astype(
        np.uint16
    )
    dec = decode_jpeg(encode_jpeg_gray12(img))
    assert dec.shape == (13, 21, 3)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_12bit_rejects_out_of_range_and_wrong_dtype():
    from datawarehouse1_spark.multimodal.jpeg import encode_jpeg_gray12

    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg_gray12(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="4095"):
        encode_jpeg_gray12(np.full((8, 8), 4096, np.uint16))


def test_12bit_progressive_still_gated():
    """SOF2 (progressive) at 12-bit stays invalid: the spec allows
    12-bit only for extended sequential / arithmetic processes."""
    from datawarehouse1_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_gray12,
    )

    blob = bytearray(encode_jpeg_gray12(np.zeros((8, 8), np.uint16)))
    i = blob.index(b"\xff\xc1")
    blob[i + 1] = 0xC2  # forge progressive marker on a 12-bit frame
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(blob))
