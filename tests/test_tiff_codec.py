"""TIFF 6.0 codec (multimodal/tiff.py): exact round trips across every
compression/predictor/strip layout the fixture writer emits, the
TIFF-variant LZW (MSB packing, early change), PackBits corner cases,
byte-order and photometric handling, and loud failures."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datawarehouse1_spark.multimodal.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


@pytest.mark.parametrize("compression", ["none", "lzw", "packbits", "deflate"])
@pytest.mark.parametrize("predictor", [False, True])
def test_roundtrip_exact(compression, predictor):
    rng = np.random.default_rng(hash((compression, predictor)) % 2**32)
    for h, w in ((16, 16), (17, 19), (1, 1), (40, 3)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_tiff(
            encode_tiff(img, compression, predictor, rows_per_strip=5)
        )
        assert np.array_equal(out, img), (h, w, compression, predictor)


def test_lzw_crosses_width_boundaries_and_reset():
    rng = np.random.default_rng(2)
    data = bytes(rng.integers(0, 256, 40000, dtype=np.uint8).tolist())
    assert tiff_lzw_decode(tiff_lzw_encode(data)) == data
    rep = b"abab" * 1000 + b"\x00" * 5000 + b"xyz" * 700  # KwKwK + runs
    assert tiff_lzw_decode(tiff_lzw_encode(rep)) == rep


def test_lzw_early_change_produces_msb_stream():
    # first emitted code is CLEAR (256) at 9 bits, MSB-first:
    # 100000000 -> bytes start 0x80 0x0...
    stream = tiff_lzw_encode(b"A")
    assert stream[0] == 0x80


def test_packbits_corner_cases():
    for d in (b"", b"a", b"aaaa", bytes(range(256)), b"ab" * 300, b"\xff" * 500):
        assert packbits_decode(packbits_encode(d)) == d


def test_big_endian_and_photometrics():
    """Hand-build a big-endian grayscale WhiteIsZero TIFF: the decoder
    must honor MM byte order and invert the gray ramp."""
    h, w = 2, 3
    pixels = bytes([0, 128, 255, 10, 20, 30])
    # layout: header(8) + pixels + IFD
    ifd_off = 8 + len(pixels)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 0),  # WhiteIsZero
        (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, h),
        (279, 4, 1, len(pixels)),
    ]
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off) + pixels)
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            out += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    img = decode_tiff(bytes(out))
    assert img.shape == (2, 3, 3)
    np.testing.assert_array_equal(img[0, :, 0], [255, 127, 0])  # inverted
    np.testing.assert_array_equal(img[:, :, 0], img[:, :, 2])


def test_malformed_and_gated_raise():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX\x00\x00" + b"\x00" * 16)
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    ok = encode_tiff(img)
    with pytest.raises((ValueError, struct.error, IndexError)):
        decode_tiff(ok[:30])
    # unsupported compression id: patch the COMPRESSION entry value
    bad = bytearray(encode_tiff(img))
    # find IFD and the compression tag (259)
    (ifd_off,) = struct.unpack_from("<I", bad, 4)
    (n,) = struct.unpack_from("<H", bad, ifd_off)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", bad, off)[0]
        if tag == 259:
            struct.pack_into("<H", bad, off + 8, 34712)  # JPEG2000
    with pytest.raises(NotImplementedError, match="compression 34712"):
        decode_tiff(bytes(bad))


def test_sniff_and_stdlib_decode_route_tiff():
    from datawarehouse1_spark.multimodal.codecs import sniff_mime, stdlib_decode

    img = np.random.default_rng(3).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = encode_tiff(img, "lzw", predictor=True)
    assert sniff_mime(payload) == "image/tiff"
    feat = stdlib_decode(payload)
    assert feat[0] == 16.0 and feat[1] == 16.0


def test_synthesizer_emits_decodable_tiffs(spark):
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.multimodal.binary_columns import (
        synthesize_media_assets,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 128")
    rows = synthesize_media_assets(docs).filter("mime = 'image/tiff'").collect()
    assert len(rows) >= 5
    for r in rows:
        assert decode_tiff(bytes(r.payload)).shape == (16, 16, 3)


def test_tiled_tiff_round_trip_all_variants():
    """TIFF 6.0 §15 tile grids: edge padding, per-tile predictor reset,
    all three compressions, and non-multiple-of-16 image sizes."""
    import numpy as np

    from datawarehouse1_spark.multimodal.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(11)
    for shape in [(16, 16), (40, 24), (17, 33)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        for comp in ("none", "lzw", "packbits"):
            for pred in (False, True):
                out = decode_tiff(
                    encode_tiff(img, compression=comp, predictor=pred, tile=16)
                )
                np.testing.assert_array_equal(out, img)


def test_tiled_tiff_rejects_bad_tile_size():
    import numpy as np
    import pytest

    from datawarehouse1_spark.multimodal.tiff import encode_tiff

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, tile=12)


def test_gray16_decode_both_byte_orders():
    """16-bit grayscale (scan depth): container byte order applies per
    sample; the decoder downshifts to 8-bit RGB."""
    import numpy as np

    from datawarehouse1_spark.multimodal.tiff import (
        decode_tiff,
        encode_tiff_gray16,
    )

    rng = np.random.default_rng(5)
    img16 = rng.integers(0, 65536, size=(12, 9), dtype=np.uint16)
    expect = (img16 >> 8).astype(np.uint8)
    for be in (False, True):
        out = decode_tiff(encode_tiff_gray16(img16, big_endian=be))
        assert out.shape == (12, 9, 3)
        for ch in range(3):
            np.testing.assert_array_equal(out[:, :, ch], expect)


# ---- r8: Deflate + new-style JPEG-in-TIFF (Tech Note 2) ----


def test_deflate_old_code_32946_also_decodes():
    import zlib

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    blob = bytearray(encode_tiff(img, compression="deflate", rows_per_strip=8))
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", blob, off)[0] == 259:
            struct.pack_into("<H", blob, off + 8, 32946)  # old deflate id
    assert np.array_equal(decode_tiff(bytes(blob)), img)


def test_jpeg_in_tiff_matches_direct_jpeg_decode():
    """The TIFF wrapper must be a pure container: decoding the wrapped
    strips equals stacking the direct decodes of the same streams."""
    from datawarehouse1_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((45, 60, 3), np.uint8)
    for c in range(3):
        img[:, :, c] = (np.add.outer(np.arange(45) * 2, np.arange(60)) + c * 17) % 256
    rps = 16
    want = np.concatenate(
        [decode_jpeg(encode_jpeg(img[y : y + rps])) for y in range(0, 45, rps)],
        axis=0,
    )[:45, :60]
    got = decode_tiff(encode_tiff(img, compression="jpeg", rows_per_strip=rps))
    assert np.array_equal(got, want)


def test_jpeg_in_tiff_abbreviated_streams_share_tables():
    """jpeg_tables=True moves DQT/DHT to tag 347; strips become
    abbreviated streams that only decode against the shared tables —
    result must be identical to the standalone-stream form and the
    container must actually shrink."""
    img = (np.add.outer(np.arange(40), np.arange(48)) % 256).astype(np.uint8)
    img = np.repeat(img[:, :, None], 3, axis=2)
    full = encode_tiff(img, compression="jpeg", rows_per_strip=8)
    abbrev = encode_tiff(img, compression="jpeg", rows_per_strip=8, jpeg_tables=True)
    assert len(abbrev) < len(full)
    assert np.array_equal(decode_tiff(abbrev), decode_tiff(full))


def test_jpeg_in_tiff_rejects_predictor_and_tiles():
    img = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="strips only"):
        encode_tiff(img, compression="jpeg", predictor=True)
    with pytest.raises(ValueError, match="strips only"):
        encode_tiff(img, compression="jpeg", tile=16)


def test_float32_predictor3_round_trip_exact():
    """TIFF Tech Note 3 floating-point predictor: the byte-plane split
    + per-row differencing must round-trip bit-for-bit for arbitrary
    float32 rasters (NaN/inf payload bytes included), with predictor 3
    materially out-compressing plain deflate on smooth rasters (the
    reason the predictor exists)."""
    import zlib

    import numpy as np

    from datawarehouse1_spark.multimodal.tiff import (
        decode_tiff,
        decode_tiff_float32,
        encode_tiff_float32,
    )

    rng = np.random.default_rng(5)
    x = rng.standard_normal((13, 17)).astype(np.float32)
    x[0, 0] = np.float32("nan")
    x[1, 1] = np.float32("inf")
    x[2, 2] = np.float32("-inf")
    for comp in ("deflate", "none"):
        for p3 in (True, False):
            blob = encode_tiff_float32(x, compression=comp, predictor3=p3)
            y = decode_tiff_float32(blob)
            assert np.array_equal(
                x.view(np.uint32), y.view(np.uint32)
            ), (comp, p3)  # bit-level (NaN-safe) equality

    # decode_tiff's uint8-RGB contract: [0,1] floats -> 8-bit gray
    g = np.clip(rng.random((9, 9)).astype(np.float32), 0, 1)
    rgb = decode_tiff(encode_tiff_float32(g))
    assert rgb.shape == (9, 9, 3)
    assert np.array_equal(rgb[:, :, 0], np.rint(g * 255).astype(np.uint8))

    # compression rationale: smooth raster, predictor 3 wins big
    smooth = np.linspace(0, 1, 64 * 64, dtype=np.float32).reshape(64, 64)
    with_p3 = len(encode_tiff_float32(smooth, predictor3=True))
    plain = len(zlib.compress(smooth.astype("<f4").tobytes(), 6))
    assert with_p3 * 5 < plain  # >5x smaller on this fixture


def test_float32_tiff_gates_raise_by_name():
    import numpy as np
    import pytest as _pytest

    from datawarehouse1_spark.multimodal.tiff import (
        decode_tiff_float32,
        encode_tiff_float32,
    )

    with _pytest.raises(ValueError, match="float32"):
        encode_tiff_float32(np.zeros((4, 4), dtype=np.float64))
    blob = encode_tiff_float32(np.zeros((4, 4), dtype=np.float32))
    # a non-float TIFF through the float decoder is a loud ValueError
    from datawarehouse1_spark.multimodal.tiff import encode_tiff

    rgb_blob = encode_tiff(np.zeros((4, 4, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="SampleFormat"):
        decode_tiff_float32(rgb_blob)
    assert decode_tiff_float32(blob).shape == (4, 4)
