"""GIF87a/89a codec (multimodal/gif.py): exact round trips across LZW
code-width growth and dictionary resets, interlacing, palette edge
cases, and loud failures on malformed payloads."""

from __future__ import annotations

import numpy as np
import pytest

from datawarehouse1_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _gray(rng, h, w):
    v = rng.integers(0, 256, (h, w), dtype=np.uint8)
    return np.stack([v, v, v], axis=2)


@pytest.mark.parametrize("min_code_size", [2, 4, 8])
def test_lzw_roundtrip_crosses_width_boundaries(min_code_size):
    rng = np.random.default_rng(min_code_size)
    # enough symbols to cross several code-width boundaries and (for
    # 8-bit) the 4096-entry dictionary reset
    idx = rng.integers(0, 1 << min_code_size, 30000).tolist()
    assert lzw_decode(lzw_encode(idx, min_code_size), min_code_size) == idx


def test_lzw_repetitive_input_exercises_kwkwk():
    # aaaa... is the classic KwKwK corner case
    idx = [1] * 500 + [0, 1] * 250
    assert lzw_decode(lzw_encode(idx, 2), 2) == idx


def test_gif_roundtrip_exact_fullpalette():
    img = _gray(np.random.default_rng(1), 48, 64)  # 256 distinct colors
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_interlaced_roundtrip_exact():
    img = _gray(np.random.default_rng(2), 37, 23)  # odd dims stress passes
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)


def test_gif_few_colors_and_tiny():
    g = np.zeros((40, 60, 3), np.uint8)
    g[:, :, 0] = (np.arange(60)[None, :] * 4).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(g)), g)
    t = np.full((1, 1, 3), 7, np.uint8)
    assert np.array_equal(decode_gif(encode_gif(t)), t)


def test_gif_rejects_too_many_colors():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1000 colors
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_gif_malformed_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF89a" + b"\x00" * 32)
    ok = encode_gif(_gray(np.random.default_rng(4), 8, 8))
    with pytest.raises(ValueError):
        decode_gif(ok[:20])  # truncated mid-header/color-table
    with pytest.raises(ValueError, match="truncated"):
        # drop the data sub-blocks but keep the trailer
        decode_gif(ok[:-10] + b"\x00\x3b")


def test_stdlib_decode_routes_gif():
    from datawarehouse1_spark.multimodal.codecs import sniff_mime, stdlib_decode

    img = _gray(np.random.default_rng(5), 16, 16)
    payload = encode_gif(img)
    assert sniff_mime(payload) == "image/gif"
    feat = stdlib_decode(payload)
    assert feat[0] == 16.0 and feat[1] == 16.0


def test_synthesizer_emits_decodable_gifs(spark):
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.multimodal.binary_columns import (
        synthesize_media_assets,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 64")
    rows = synthesize_media_assets(docs).filter("mime = 'image/gif'").collect()
    assert len(rows) >= 5
    for r in rows:
        img = decode_gif(bytes(r.payload))
        assert img.shape == (16, 16, 3)
