"""GIF87a/89a codec in pure Python (GIF is LZW + palettes — fully
published in the GIF89a specification and Welch 1984; no external
library needed). Decodes the first frame to (H, W, 3) uint8 RGB:
logical screen descriptor, global/local color tables, interlacing,
graphic-control transparency (rendered against the background color),
and the variable-width LZW bitstream with dictionary resets. The
encoder writes a non-interlaced 256-color GIF (palette built from the
image; fixture writer for the decode tier).

Part of the LLM-pipeline multimodal surface (the reference ETL,
etl/app.py, never touches media). Pure bytes — safe inside
Arrow-batched executors.
"""

from __future__ import annotations

import struct

import numpy as np


# --- LZW (variable code width, per the GIF89a spec appendix) ---


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Decode a GIF LZW stream (already de-sub-blocked) into indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # dictionary: code -> list of indices
    base = {i: [i] for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # stream ended without END code — be lenient
            acc |= data[pos] << nbits  # LSB-first packing
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = dict(base)
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Encode pixel indices as a GIF LZW stream (inverse of
    lzw_decode; emits CLEAR up front and on dictionary overflow)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= (1 << 12):
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- container ---

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF -> (H, W, 3) uint8 RGB of the first frame. Transparent
    pixels take the background color."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height, packed, bg_index, _aspect = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent_index = None
    try:
        return _decode_blocks(
            payload, pos, width, height, gct, bg_index, transparent_index
        )
    except (IndexError, struct.error) as exc:
        raise ValueError(f"GIF truncated or malformed: {exc}") from exc


def _decode_blocks(payload, pos, width, height, gct, bg_index, transparent_index):
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = payload[pos]
                flags = payload[pos + 1]
                if flags & 0x01:
                    transparent_index = payload[pos + 4]
                pos += size + 1
            # skip remaining sub-blocks
            while payload[pos] != 0:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            pos += 1
            indices = lzw_decode(b"".join(chunks), min_code_size)
            if len(indices) < w * h:
                raise ValueError(
                    f"GIF frame truncated: {len(indices)} of {w * h} pixels"
                )
            idx = np.array(indices[: w * h], dtype=np.int64).reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                deinterlaced = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for row in range(start, h, step):
                        deinterlaced[row] = idx[src]
                        src += 1
                idx = deinterlaced
            if int(idx.max()) >= len(ct):
                raise ValueError("GIF pixel index outside color table")
            frame = ct[idx]
            if transparent_index is not None and gct is not None:
                bg = gct[bg_index] if bg_index < len(gct) else np.zeros(3, np.uint8)
                frame = np.where(
                    (idx == transparent_index)[:, :, None], bg[None, None, :], frame
                )
            # compose onto the logical screen (first frame only)
            if (left, top, w, h) != (0, 0, width, height):
                screen = np.zeros((height, width, 3), dtype=np.uint8)
                if gct is not None and bg_index < len(gct):
                    screen[:, :] = gct[bg_index]
                screen[top : top + h, left : left + w] = frame
                return screen
            return frame.astype(np.uint8)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X} at offset {pos}")
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB -> single-frame GIF89a. Builds the palette
    from the image's distinct colors (must be ≤256 — the fixture
    generator quantizes first; a real encoder would median-cut)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_gif expects (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors exceed GIF's 256")
    # pad palette to a power of two ≥ 2
    bits = max(int(np.ceil(np.log2(max(len(colors), 2)))), 1)
    palette = np.zeros((1 << bits, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx = inverse.reshape(h, w)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += palette.tobytes()
    ipacked = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        idx = idx[rows]
    min_code_size = max(bits, 2)
    out.append(min_code_size)
    stream = lzw_encode(idx.reshape(-1).tolist(), min_code_size)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
