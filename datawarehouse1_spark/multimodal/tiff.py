"""Baseline TIFF 6.0 codec in pure stdlib+numpy — the container of
scanned-document corpora (OCR training data is full of it).

Implements the published baseline subset a text/image pipeline meets:
both byte orders, IFD walking with inline/offset values, multi-strip
AND tiled images (TIFF 6.0 §15: padded tile grids with per-tile
predictor reset — the layout large geo/scan rasters use), 8-bit
grayscale / RGB / palette photometrics, Compression 1 (none), 32773
(PackBits), 5 (TIFF-LZW: MSB-first packing with the spec's
historical "early change" code-width rule, which differs from GIF),
8/32946 (Deflate, both codes) and 7 (new-style JPEG-in-TIFF per
Tech Note 2, incl. abbreviated streams against the shared
tag-347 JPEGTables — decoded by the repo's own jpeg.py, strips and
tiles), Predictor 2 (horizontal differencing), and IEEE-float rasters
(SampleFormat 3, 32-bit) with Predictor 3 (r9: floating-point
horizontal differencing per TIFF Technical Note 3 — big-endian byte-
plane split + per-row byte differencing; decode_tiff_float32 is exact,
decode_tiff maps [0,1] to 8-bit gray). The encoder writes
little-endian fixtures in every combination so the decoder is
exercised on genuine container bytes at any SF, and 16-bit grayscale
(scan depth) decodes with a downshift to 8-bit. Remaining gates raise
loudly by name: 16-bit color/tiled-deep variants, tiled/multi-sample
float rasters.

Pure bytes+numpy — safe inside Arrow-batched executors.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BPS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PREDICTOR, _COLORMAP, _TILE_WIDTH = 317, 320, 322
_TILE_LENGTH, _TILE_OFFSETS, _TILE_COUNTS = 323, 324, 325
_JPEG_TABLES = 347
_SAMPLE_FORMAT = 339

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# --- TIFF-variant LZW (spec §13: MSB-first, early change) ---


def tiff_lzw_decode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    bits = 9
    base = {i: bytes([i]) for i in range(256)}
    table: dict[int, bytes] = {}
    next_code = 258
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < bits:
            if pos >= len(data):
                return bytes(out)
            acc = (acc << 8) | data[pos]  # MSB-first packing
            nbits += 8
            pos += 1
        code = (acc >> (nbits - bits)) & ((1 << bits) - 1)
        nbits -= bits
        if code == CLEAR:
            table = {}
            next_code = 258
            bits = 9
            prev = None
            continue
        if code == EOI:
            return bytes(out)
        if code < 256:
            entry = base[code]
        elif code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt TIFF-LZW stream: code {code}")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            # the "early change": width grows one code sooner than GIF
            if next_code == (1 << bits) - 1 and bits < 12:
                bits += 1
        prev = entry


def tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    bits = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR, bits)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], bits)
        table[wk] = next_code
        next_code += 1
        # encoder leads the decoder by one entry, so it grows at 2^bits
        # where the decoder grows at 2^bits - 1 (the early change)
        if next_code == (1 << bits) and bits < 12:
            bits += 1
        if next_code >= 4094:  # reset before the 12-bit table fills
            emit(CLEAR, bits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            bits = 9
        w = bytes([byte])
    if w:
        emit(table[w], bits)
    emit(EOI, bits)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- PackBits (TIFF 6.0 §9 / classic Mac) ---


def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = struct.unpack_from("b", data, pos)[0]
        pos += 1
        if n >= 0:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n != -128:
            out += bytes([data[pos]]) * (1 - n)
            pos += 1
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += struct.pack("b", 1 - run) + bytes([data[i]])
            i += run
            continue
        lit_start = i
        while (
            i < n
            and i - lit_start < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out += struct.pack("b", i - lit_start - 1) + data[lit_start:i]
    return bytes(out)


# --- container ---


def _read_ifd(payload: bytes, fmt: str):
    (ifd_off,) = struct.unpack_from(fmt + "I", payload, 4)
    (n_entries,) = struct.unpack_from(fmt + "H", payload, ifd_off)
    tags = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(fmt + "HHI", payload, off)
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            raw = payload[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack_from(fmt + "I", payload, off + 8)
            raw = payload[voff : voff + size]
        if typ == 3:
            vals = list(struct.unpack(fmt + f"{count}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(fmt + f"{count}I", raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = [raw]
        tags[tag] = vals
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF -> (H, W, 3) uint8 RGB."""
    if payload[:4] == b"II*\x00":
        fmt = "<"
    elif payload[:4] == b"MM\x00*":
        fmt = ">"
    else:
        raise ValueError("not a TIFF payload")
    tags = _read_ifd(payload, fmt)
    w = tags[_WIDTH][0]
    h = tags[_LENGTH][0]
    spp = tags.get(_SPP, [1])[0]
    bps = tags.get(_BPS, [1])
    if tags.get(_SAMPLE_FORMAT, [1])[0] == 3:
        # IEEE-float raster (SampleFormat 3): decode exactly, then map
        # [0, 1] to 8-bit gray for this function's uint8-RGB contract
        # (tags passed through — no second container parse per asset)
        fimg = _decode_float32_from_tags(payload, fmt, tags)
        gray = np.rint(np.clip(fimg, 0.0, 1.0) * 255.0).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if all(b == 16 for b in bps) and spp == 1:
        pass  # 16-bit grayscale: handled below (downshifted to 8-bit)
    elif any(b != 8 for b in bps):
        raise NotImplementedError(
            f"bits-per-sample {bps} unsupported (8-bit, or 16-bit grayscale)"
        )
    deep_gray = all(b == 16 for b in bps) and spp == 1
    compression = tags.get(_COMPRESSION, [1])[0]
    photometric = tags.get(_PHOTOMETRIC, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")

    if compression == 7:
        # New-style JPEG-in-TIFF (TIFF Tech Note 2): every strip/tile is
        # a JPEG stream, optionally abbreviated against the shared
        # JPEGTables stream (tag 347: SOI + DQT/DHT segments + EOI).
        # Reuses the repo's own JPEG decoder — no library involved.
        from datawarehouse1_spark.multimodal.jpeg import decode_jpeg

        tables = tags.get(_JPEG_TABLES, [b""])[0]
        prefix = b"\xff\xd8" + bytes(tables)[2:-2] if tables else b"\xff\xd8"

        def jpeg_chunk(chunk: bytes) -> np.ndarray:
            if chunk[:2] != b"\xff\xd8":
                raise ValueError("JPEG-in-TIFF strip missing SOI")
            return decode_jpeg(prefix + chunk[2:])

        if _TILE_WIDTH in tags:
            tw, tl = tags[_TILE_WIDTH][0], tags[_TILE_LENGTH][0]
            offsets, counts = tags[_TILE_OFFSETS], tags[_TILE_COUNTS]
            across = -(-w // tw)
            img = np.zeros((h, w, 3), dtype=np.uint8)
            for ti, (off, cnt) in enumerate(zip(offsets, counts)):
                tile_rgb = jpeg_chunk(payload[off : off + cnt])
                y0, x0 = (ti // across) * tl, (ti % across) * tw
                ys, xs = min(tl, h - y0), min(tw, w - x0)
                img[y0 : y0 + ys, x0 : x0 + xs] = tile_rgb[:ys, :xs]
            return img
        rows = []
        for off, cnt in zip(tags[_STRIP_OFFSETS], tags[_STRIP_COUNTS]):
            rows.append(jpeg_chunk(payload[off : off + cnt]))
        img = np.concatenate(rows, axis=0)
        if img.shape[0] < h or img.shape[1] < w:
            raise ValueError("JPEG-in-TIFF strips cover less than the image")
        return np.ascontiguousarray(img[:h, :w])

    def decompress(chunk: bytes) -> bytes:
        if compression == 1:
            return chunk
        if compression == 5:
            return tiff_lzw_decode(chunk)
        if compression == 32773:
            return packbits_decode(chunk)
        if compression in (8, 32946):  # Adobe deflate / old deflate
            import zlib

            return zlib.decompress(chunk)
        raise NotImplementedError(
            f"TIFF compression {compression} unsupported "
            "(none/LZW/PackBits/Deflate/JPEG)"
        )

    if _TILE_WIDTH in tags:
        if deep_gray:
            raise NotImplementedError("tiled 16-bit TIFF unsupported")
        # TIFF 6.0 §15: the image is a grid of fixed-size tiles, each
        # compressed independently and padded at the right/bottom edges;
        # the predictor (horizontal differencing) resets per tile row.
        tw = tags[_TILE_WIDTH][0]
        tl = tags[_TILE_LENGTH][0]
        offsets = tags[_TILE_OFFSETS]
        counts = tags[_TILE_COUNTS]
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offsets) < across * down:
            raise ValueError("TIFF tile table short")
        img = np.zeros((h, w, spp), dtype=np.uint8)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            chunk = payload[off : off + cnt]
            if len(chunk) != cnt:
                raise ValueError("TIFF tile truncated")
            raw = decompress(chunk)
            if len(raw) < tl * tw * spp:
                raise ValueError("TIFF tile data short")
            tile = np.frombuffer(
                bytes(raw[: tl * tw * spp]), dtype=np.uint8
            ).reshape(tl, tw, spp)
            if predictor == 2:
                tile = np.cumsum(tile.astype(np.int64), axis=1).astype(np.uint8)
            y0 = (ti // across) * tl
            x0 = (ti % across) * tw
            ys = min(tl, h - y0)
            xs = min(tw, w - x0)
            img[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
    else:
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_COUNTS]
        raw = bytearray()
        for off, cnt in zip(offsets, counts):
            strip = payload[off : off + cnt]
            if len(strip) != cnt:
                raise ValueError("TIFF strip truncated")
            raw += decompress(strip)
        expected = h * w * spp * (2 if deep_gray else 1)
        if len(raw) < expected:
            raise ValueError(f"TIFF data short: {len(raw)} < {expected}")
        if deep_gray:
            # 16-bit scan depth: container byte order applies per sample;
            # predictor (if any) differenced the 16-bit values
            deep = np.frombuffer(
                bytes(raw[:expected]), dtype=np.dtype(fmt + "u2")
            ).reshape(h, w, 1)
            if predictor == 2:
                deep = (
                    np.cumsum(deep.astype(np.int64), axis=1) & 0xFFFF
                ).astype(np.uint16)
            img = (deep >> 8).astype(np.uint8)
        else:
            img = np.frombuffer(bytes(raw[:expected]), dtype=np.uint8).reshape(
                h, w, spp
            )
            if predictor == 2:  # horizontal differencing: undo by row cumsum
                img = np.cumsum(img.astype(np.int64), axis=1).astype(np.uint8)
    if photometric == 2:  # RGB
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples per pixel")
        return np.ascontiguousarray(img[:, :, :3])
    if photometric == 3:  # palette
        cmap = tags[_COLORMAP][0] if isinstance(tags[_COLORMAP][0], (bytes, bytearray)) else None
        vals = tags[_COLORMAP]
        if cmap is not None:
            n = len(cmap) // 6
            trip = struct.unpack(fmt + f"{n * 3}H", cmap)
        else:
            trip = vals
            n = len(trip) // 3
        table = (
            np.array(trip, dtype=np.uint32).reshape(3, n).T >> 8
        ).astype(np.uint8)  # 16-bit colormap entries scale to 8
        return table[img[:, :, 0]]
    gray = img[:, :, 0]
    if photometric == 0:  # WhiteIsZero
        gray = 255 - gray
    return np.repeat(gray[:, :, None], 3, axis=2)


def _assemble_tiff(
    strips: list[bytes],
    w: int,
    h: int,
    comp_id: int,
    rows_per_strip: int,
    photometric: int = 2,
    jpeg_tables: bytes = b"",
) -> bytes:
    """Assemble a little-endian strip TIFF around pre-built strip
    payloads (shared by the JPEG-in-TIFF path; the raster paths keep
    their inline assembly which also covers tiles)."""
    entries = [
        (_WIDTH, 4, [w]),
        (_LENGTH, 4, [h]),
        (_BPS, 3, [8, 8, 8]),
        (_COMPRESSION, 3, [comp_id]),
        (_PHOTOMETRIC, 3, [photometric]),
        (_SPP, 3, [3]),
        (_STRIP_OFFSETS, 4, ["offsets"]),
        (_ROWS_PER_STRIP, 4, [rows_per_strip]),
        (_STRIP_COUNTS, 4, [len(s) for s in strips]),
    ]
    if jpeg_tables:
        entries.append((_JPEG_TABLES, 7, [jpeg_tables]))

    header_size = 8
    strip_offsets = []
    off = header_size
    for s in strips:
        strip_offsets.append(off)
        off += len(s)
    overflow = bytearray()
    overflow_base = off

    packed_entries = []
    for tag, typ, vals in sorted(entries):
        if vals == ["offsets"]:
            vals = strip_offsets
        if typ == 7:
            raw = bytes(vals[0])
            count = len(raw)
        else:
            code = {3: "H", 4: "I"}[typ]
            raw = struct.pack("<" + code * len(vals), *vals)
            count = len(vals)
        if len(raw) <= 4:
            packed_entries.append((tag, typ, count, raw.ljust(4, b"\x00")))
        else:
            packed_entries.append(
                (tag, typ, count, struct.pack("<I", overflow_base + len(overflow)))
            )
            overflow += raw
    ifd_off = overflow_base + len(overflow)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    for s in strips:
        out += s
    out += overflow
    out += struct.pack("<H", len(packed_entries))
    for tag, typ, count, val4 in packed_entries:
        out += struct.pack("<HHI", tag, typ, count) + val4
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a standalone JPEG stream into (tables_stream, abbreviated
    stream) per TIFF Tech Note 2: DQT/DHT segments move to a
    SOI+segments+EOI tables stream; the remainder keeps everything
    else."""
    assert stream[:2] == b"\xff\xd8"
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos < len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = stream[pos + 1]
        if marker == 0xD9:  # EOI
            rest += stream[pos:]
            break
        (seglen,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            rest += seg
        pos += 2 + seglen
        if marker == 0xDA:  # SOS: entropy data follows to EOI
            end = stream.find(b"\xff\xd9", pos)
            rest += stream[pos:end]
            pos = end
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int = 8,
    tile: int | None = None,
    jpeg_tables: bool = False,
) -> bytes:
    """(H, W, 3) uint8 RGB -> little-endian TIFF. compression in
    {'none', 'lzw', 'packbits', 'deflate', 'jpeg'}; predictor applies
    horizontal differencing (only meaningful with LZW/Deflate, but
    legal with any). With `tile` set (a multiple of 16, per TIFF 6.0
    §15) the image is written as a padded tile grid instead of strips —
    the layout large geo/scan rasters use; the predictor then differs
    per tile row. compression='jpeg' writes new-style JPEG-in-TIFF
    (each strip a JPEG stream; with jpeg_tables=True the shared
    DQT/DHT move to tag 347 and strips become abbreviated streams)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_tiff expects (H, W, 3) uint8 RGB")
    comp_id = {
        "none": 1,
        "lzw": 5,
        "packbits": 32773,
        "deflate": 8,
        "jpeg": 7,
    }[compression]
    h, w = img.shape[:2]

    if compression == "jpeg":
        if tile is not None or predictor:
            raise ValueError("jpeg compression: strips only, no predictor")
        from datawarehouse1_spark.multimodal.jpeg import encode_jpeg

        streams = [
            encode_jpeg(img[y0 : y0 + rows_per_strip])
            for y0 in range(0, h, rows_per_strip)
        ]
        tables_blob = b""
        if jpeg_tables:
            split = [_split_jpeg_tables(s) for s in streams]
            tables_blob = split[0][0]
            streams = [r for _, r in split]
        return _assemble_tiff(
            streams,
            w,
            h,
            comp_id,
            rows_per_strip,
            photometric=6,  # encode_jpeg writes YCbCr
            jpeg_tables=tables_blob,
        )

    def apply_predictor(block: np.ndarray) -> np.ndarray:
        diff = block.astype(np.int64)
        diff[:, 1:] = diff[:, 1:] - diff[:, :-1]
        return (diff & 0xFF).astype(np.uint8)

    def compress(chunk: bytes) -> bytes:
        if compression == "lzw":
            return tiff_lzw_encode(chunk)
        if compression == "packbits":
            return packbits_encode(chunk)
        if compression == "deflate":
            import zlib

            return zlib.compress(chunk, 6)
        return chunk

    strips = []
    if tile is not None:
        if tile % 16:
            raise ValueError("TIFF tile dimensions must be multiples of 16")
        padded = np.zeros(
            (-(-h // tile) * tile, -(-w // tile) * tile, 3), dtype=np.uint8
        )
        padded[:h, :w] = img
        for y0 in range(0, padded.shape[0], tile):
            for x0 in range(0, padded.shape[1], tile):
                block = padded[y0 : y0 + tile, x0 : x0 + tile]
                if predictor:
                    block = apply_predictor(block)
                strips.append(compress(block.tobytes()))
    else:
        data = apply_predictor(img) if predictor else img
        for y0 in range(0, h, rows_per_strip):
            strips.append(compress(data[y0 : y0 + rows_per_strip].tobytes()))

    n_strips = len(strips)
    entries = []  # (tag, type, count, value_or_bytes)

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(_WIDTH, 4, [w])
    entry(_LENGTH, 4, [h])
    entry(_BPS, 3, [8, 8, 8])
    entry(_COMPRESSION, 3, [comp_id])
    entry(_PHOTOMETRIC, 3, [2])
    entry(_SPP, 3, [3])
    if tile is not None:
        entry(_TILE_WIDTH, 4, [tile])
        entry(_TILE_LENGTH, 4, [tile])
        entry(_TILE_OFFSETS, 4, ["offsets"])  # patched below
        entry(_TILE_COUNTS, 4, [len(s) for s in strips])
    else:
        entry(_STRIP_OFFSETS, 4, ["offsets"])  # patched below
        entry(_ROWS_PER_STRIP, 4, [rows_per_strip])
        entry(_STRIP_COUNTS, 4, [len(s) for s in strips])
    if predictor:
        entry(_PREDICTOR, 3, [2])

    # layout: header(8) | strips | overflow values | IFD
    header_size = 8
    strip_offsets = []
    off = header_size
    for s in strips:
        strip_offsets.append(off)
        off += len(s)
    overflow = bytearray()
    overflow_base = off

    def value_bytes(typ, vals):
        code = {3: "H", 4: "I"}[typ]
        return struct.pack("<" + code * len(vals), *vals)

    packed_entries = []
    for tag, typ, vals in sorted(entries):
        if vals == ["offsets"]:
            vals = strip_offsets
        raw = value_bytes(typ, vals)
        if len(raw) <= 4:
            packed_entries.append((tag, typ, len(vals), raw.ljust(4, b"\x00")))
        else:
            packed_entries.append(
                (tag, typ, len(vals), struct.pack("<I", overflow_base + len(overflow)))
            )
            overflow += raw
    ifd_off = overflow_base + len(overflow)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    for s in strips:
        out += s
    out += overflow
    out += struct.pack("<H", len(packed_entries))
    for tag, typ, count, val4 in packed_entries:
        out += struct.pack("<HHI", tag, typ, count) + val4
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def encode_tiff_gray16(
    img16: np.ndarray, big_endian: bool = False
) -> bytes:
    """(H, W) uint16 grayscale -> single-strip uncompressed TIFF with
    BitsPerSample 16 — the scanned-document deep-depth fixture (the
    decoder downshifts to 8-bit RGB). Byte order selectable so both
    container variants get traffic."""
    if img16.ndim != 2 or img16.dtype != np.uint16:
        raise ValueError("encode_tiff_gray16 expects (H, W) uint16")
    fmt = ">" if big_endian else "<"
    h, w = img16.shape
    data = img16.astype(np.dtype(fmt + "u2")).tobytes()
    entries = [
        (_WIDTH, 4, [w]),
        (_LENGTH, 4, [h]),
        (_BPS, 3, [16]),
        (_COMPRESSION, 3, [1]),
        (_PHOTOMETRIC, 3, [1]),
        (_STRIP_OFFSETS, 4, [8]),
        (_SPP, 3, [1]),
        (_ROWS_PER_STRIP, 4, [h]),
        (_STRIP_COUNTS, 4, [len(data)]),
    ]
    ifd_off = 8 + len(data)
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    out = bytearray(magic + struct.pack(fmt + "I", ifd_off))
    out += data
    out += struct.pack(fmt + "H", len(entries))
    for tag, typ, vals in sorted(entries):
        code = {3: "H", 4: "I"}[typ]
        raw = struct.pack(fmt + code * len(vals), *vals)
        out += struct.pack(fmt + "HHI", tag, typ, len(vals)) + raw.ljust(4, b"\x00")
    out += struct.pack(fmt + "I", 0)
    return bytes(out)


# --- IEEE-float rasters (SampleFormat 3) + predictor 3 ----------------
#
# TIFF Technical Note 3: floating-point data may use predictor 3
# ("floating point horizontal differencing") — each row's float bytes
# are first split into big-endian byte PLANES (all byte-0s of the row,
# then all byte-1s, ...), then differenced with stride = samples-per-
# pixel across the whole rearranged row, resetting per row. The split
# puts the highly-correlated exponent bytes next to each other, which
# is what makes Deflate/LZW bite on float rasters.


def decode_tiff_float32(payload: bytes) -> np.ndarray:
    """Float TIFF (SampleFormat 3, 32-bit, 1 sample/pixel, strips) ->
    exact (H, W) float32 array. Supports predictor 1 (none) and 3
    (floating-point horizontal differencing per TIFF Tech Note 3)."""
    if payload[:4] == b"II*\x00":
        fmt = "<"
    elif payload[:4] == b"MM\x00*":
        fmt = ">"
    else:
        raise ValueError("not a TIFF payload")
    tags = _read_ifd(payload, fmt)
    return _decode_float32_from_tags(payload, fmt, tags)


def _decode_float32_from_tags(
    payload: bytes, fmt: str, tags: dict
) -> np.ndarray:
    """Inner form taking the already-parsed IFD so decode_tiff's
    float route doesn't re-parse the container per asset."""
    if tags.get(_SAMPLE_FORMAT, [1])[0] != 3:
        raise ValueError("not a floating-point TIFF (SampleFormat != 3)")
    w = tags[_WIDTH][0]
    h = tags[_LENGTH][0]
    spp = tags.get(_SPP, [1])[0]
    bps = tags.get(_BPS, [1])
    if spp != 1 or bps != [32]:
        raise NotImplementedError(
            f"float TIFF {bps}x{spp} unsupported (32-bit single-sample)"
        )
    compression = tags.get(_COMPRESSION, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    if predictor not in (1, 3):
        raise NotImplementedError(
            f"float TIFF predictor {predictor} unsupported (1 or 3)"
        )
    if _TILE_WIDTH in tags:
        raise NotImplementedError("tiled float TIFF unsupported (strips)")

    def decompress(chunk: bytes) -> bytes:
        if compression == 1:
            return chunk
        if compression == 5:
            return tiff_lzw_decode(chunk)
        if compression in (8, 32946):
            import zlib

            return zlib.decompress(chunk)
        raise NotImplementedError(
            f"float TIFF compression {compression} unsupported"
        )

    raw = bytearray()
    for off, cnt in zip(tags[_STRIP_OFFSETS], tags[_STRIP_COUNTS]):
        strip = payload[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("TIFF strip truncated")
        raw += decompress(strip)
    row_bytes = w * 4
    if len(raw) < h * row_bytes:
        raise ValueError(f"float TIFF data short: {len(raw)} < {h * row_bytes}")
    rows = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8).reshape(
        h, row_bytes
    )
    if predictor == 3:
        # undo the per-row byte differencing, then un-split the planes
        acc = np.cumsum(rows.astype(np.int64), axis=1).astype(np.uint8)
        planes = acc.reshape(h, 4, w)  # byte plane k of every pixel
        be = np.ascontiguousarray(planes.transpose(0, 2, 1))  # (h, w, 4) MSB..LSB
        return be.reshape(h, row_bytes).view(">f4").astype(np.float32).reshape(h, w)
    # predictor 1: plain floats in container byte order
    return (
        rows.reshape(h, w, 4)
        .copy()
        .view(np.dtype(fmt + "f4"))
        .astype(np.float32)
        .reshape(h, w)
    )


def encode_tiff_float32(
    img: np.ndarray, compression: str = "deflate", predictor3: bool = True
) -> bytes:
    """(H, W) float32 -> little-endian float TIFF (SampleFormat 3,
    single strip) with optional predictor 3 — the fixture writer for
    the geo/scan-raster layout. decode_tiff_float32(encode(x)) == x
    bit-for-bit (the law pinned in tests)."""
    if img.ndim != 2 or img.dtype != np.float32:
        raise ValueError("encode_tiff_float32 expects (H, W) float32")
    h, w = img.shape
    if predictor3:
        be = img.astype(">f4").view(np.uint8).reshape(h, w, 4)
        planes = np.ascontiguousarray(be.transpose(0, 2, 1)).reshape(h, w * 4)
        diffed = planes.astype(np.int64)
        diffed[:, 1:] = diffed[:, 1:] - planes.astype(np.int64)[:, :-1]
        data = (diffed & 0xFF).astype(np.uint8).tobytes()
    else:
        data = img.astype("<f4").tobytes()
    if compression == "deflate":
        import zlib

        data = zlib.compress(data, 6)
        comp_code = 8
    elif compression == "none":
        comp_code = 1
    else:
        raise ValueError("compression: 'deflate' or 'none'")
    entries = [
        (_WIDTH, 4, [w]),
        (_LENGTH, 4, [h]),
        (_BPS, 3, [32]),
        (_COMPRESSION, 3, [comp_code]),
        (_PHOTOMETRIC, 3, [1]),
        (_STRIP_OFFSETS, 4, [8]),
        (_SPP, 3, [1]),
        (_ROWS_PER_STRIP, 4, [h]),
        (_STRIP_COUNTS, 4, [len(data)]),
        (_PREDICTOR, 3, [3 if predictor3 else 1]),
        (_SAMPLE_FORMAT, 3, [3]),
    ]
    ifd_off = 8 + len(data)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += data
    out += struct.pack("<H", len(entries))
    for tag, typ, vals in sorted(entries):
        code = {3: "H", 4: "I"}[typ]
        raw = struct.pack("<" + code * len(vals), *vals)
        out += struct.pack("<HHI", tag, typ, len(vals)) + raw.ljust(4, b"\x00")
    out += struct.pack("<I", 0)
    return bytes(out)
