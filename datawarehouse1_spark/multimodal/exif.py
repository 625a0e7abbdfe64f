"""EXIF metadata: a minimal writer + parser for the APP1 segment of a
JPEG stream.

EXIF (per the published Exif 2.x / JEITA CP-3451 spec) embeds a TIFF
6.0 structure — byte-order header, IFD0 with standard TIFF tags —
inside a JPEG APP1 marker whose body starts with ``Exif\\0\\0``. The
parser here reuses the repo's own TIFF IFD reader (multimodal/tiff.py::
_read_ifd), which is exactly the reuse the format was designed for;
the writer emits a self-contained little-endian TIFF with the four
tags an image-collection pipeline actually routes on (Make, Model,
Orientation, DateTime).

Reference parity: the reference ETL has no image tier; SURVEY.md §2D
extension inventory (multimodal metadata tier). The scan op feeds the
same per-asset metadata columns payload_metadata() provides for
containers.
"""

from __future__ import annotations

import struct

_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_ORIENTATION = 274
_TAG_DATETIME = 306

_ASCII = 2
_SHORT = 3


def encode_exif_app1(
    make: str, model: str, orientation: int, datetime_str: str
) -> bytes:
    """Build a complete APP1 segment (marker + length + Exif header +
    little-endian TIFF with IFD0 carrying Make/Model/Orientation/
    DateTime). ASCII values are NUL-terminated per spec; values wider
    than 4 bytes live in the value area after the IFD."""
    entries = []  # (tag, type, count, value_bytes)
    for tag, s in ((_TAG_MAKE, make), (_TAG_MODEL, model), (_TAG_DATETIME, datetime_str)):
        raw = s.encode("ascii") + b"\x00"
        entries.append((tag, _ASCII, len(raw), raw))
    entries.append(
        (_TAG_ORIENTATION, _SHORT, 1, struct.pack("<H", orientation))
    )
    entries.sort(key=lambda e: e[0])  # IFD entries must be tag-ordered

    n = len(entries)
    ifd_off = 8
    value_off = ifd_off + 2 + 12 * n + 4  # after count + entries + next-IFD
    ifd = struct.pack("<H", n)
    tail = b""
    for tag, typ, count, raw in entries:
        if len(raw) <= 4:
            inline = raw + b"\x00" * (4 - len(raw))
            ifd += struct.pack("<HHI", tag, typ, count) + inline
        else:
            ifd += struct.pack("<HHII", tag, typ, count, value_off + len(tail))
            tail += raw
    ifd += struct.pack("<I", 0)  # no next IFD
    tiff = b"II*\x00" + struct.pack("<I", ifd_off) + ifd + tail
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment directly after SOI — where Exif requires
    it. The entropy-coded image is untouched, so decode is unchanged."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def parse_exif(jpeg: bytes) -> dict:
    """Walk the JPEG marker stream to the Exif APP1 and parse its IFD0
    through the repo's TIFF reader. Returns {} when no Exif APP1 is
    present (a plain photo); raises on a structurally broken segment
    rather than guessing."""
    from datawarehouse1_spark.multimodal.tiff import _read_ifd

    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    while pos + 2 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"marker sync lost at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
        while pos + 1 < len(jpeg) and jpeg[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(jpeg):
            break
        marker = jpeg[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no APP1 found
            return {}
        # Standalone markers carry no length field: TEM (0x01) and
        # RSTn (0xD0-0xD7) are 2-byte markers per T.81 B.1.1.3.
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(jpeg):
            break
        (seg_len,) = struct.unpack_from(">H", jpeg, pos + 2)
        body = jpeg[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            if tiff[:2] == b"II":
                fmt = "<"
            elif tiff[:2] == b"MM":
                fmt = ">"
            else:
                raise ValueError("Exif TIFF header has no byte-order mark")
            tags = _read_ifd(tiff, fmt)
            out = {}
            for name, tag in (
                ("make", _TAG_MAKE),
                ("model", _TAG_MODEL),
                ("datetime", _TAG_DATETIME),
            ):
                if tag in tags:
                    raw = tags[tag][0]
                    out[name] = bytes(raw).rstrip(b"\x00").decode("ascii")
            if _TAG_ORIENTATION in tags:
                out["orientation"] = int(tags[_TAG_ORIENTATION][0])
            return out
        pos += 2 + seg_len
    return {}
