"""MPEG audio (MP3) frame-header walker in pure stdlib.

MP3 decode proper needs the Huffman/MDCT bitstream (honestly gated,
like H.26x) — but the CONTAINER layer is published arithmetic: 4-byte
frame headers carry version/layer/bitrate/samplerate, frame length is
`144 * bitrate / samplerate + padding` for Layer III, and ID3v2/ID3v1
tags frame the stream. That layer is what a corpus pipeline needs to
audit audio at scale (duration, bitrate, tag metadata, corrupt-stream
detection) before any decode, and it is fully implementable without
codecs. This module walks it: ID3v2 skip (syncsafe size), frame-by-
frame traversal with header validation, CBR stats, ID3v2.3 TIT2 title
extraction, ID3v1 trailer tolerance. encode_mp3_stub writes valid
frame sequences (zeroed payloads) + an ID3v2.3 tag as fixtures.

Pure bytes — safe inside Arrow-batched executors.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# MPEG1 Layer III tables (ISO 11172-3)
_BITRATES_V1L3 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_SAMPLERATES_V1 = (44100, 48000, 32000)
_SAMPLES_PER_FRAME_V1L3 = 1152


@dataclass
class Mp3Info:
    n_frames: int
    samplerate: int
    bitrate_kbps: int  # of the first frame (CBR assumption flagged below)
    is_cbr: bool
    duration_ms: int
    title: str | None


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


# ID3v2 text-frame encodings (v2.3 §3.3 / v2.4 §4): byte 0 selects
_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _parse_id3v2(payload: bytes) -> tuple[int, str | None]:
    """Returns (bytes_to_skip, TIT2 title if present). Handles both
    v2.3 (plain big-endian frame sizes) and v2.4 (syncsafe frame
    sizes); all four published text encodings including the UTF-16
    variants real taggers write. An undecodable title fails soft to
    None — tag damage must not kill the frame walk."""
    if payload[:3] != b"ID3":
        return 0, None
    version = payload[3]
    size = _syncsafe(payload[6:10])
    end = 10 + size
    title = None
    pos = 10
    while pos + 10 <= end:
        frame_id = payload[pos : pos + 4]
        if frame_id == b"\x00\x00\x00\x00":
            break
        raw = payload[pos + 4 : pos + 8]
        fsize = _syncsafe(raw) if version >= 4 else struct.unpack(">I", raw)[0]
        if frame_id == b"TIT2" and fsize > 1:
            body = payload[pos + 10 : pos + 10 + fsize]
            try:
                title = body[1:].decode(
                    _ID3_ENCODINGS.get(body[0], "latin-1")
                ).rstrip("\x00")
            except UnicodeDecodeError:
                title = None
        pos += 10 + fsize
    return end, title


def demux_mp3(payload: bytes) -> Mp3Info:
    """Walk every frame header; raises on desync (corrupt stream)."""
    pos, title = _parse_id3v2(payload)
    end = len(payload)
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    n_frames = 0
    first_bitrate = None
    samplerate = 0
    is_cbr = True
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"trailing garbage at offset {pos}")
        b0, b1, b2, _b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at offset {pos}")
        version = (b1 >> 3) & 0x03
        layer = (b1 >> 1) & 0x03
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError(
                "only MPEG1 Layer III frame walking implemented"
            )
        bitrate_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        padding = (b2 >> 1) & 0x01
        if bitrate_idx in (0, 15) or sr_idx == 3:
            raise ValueError(f"invalid frame header at offset {pos}")
        bitrate = _BITRATES_V1L3[bitrate_idx] * 1000
        samplerate = _SAMPLERATES_V1[sr_idx]
        if first_bitrate is None:
            first_bitrate = bitrate
        elif bitrate != first_bitrate:
            is_cbr = False
        frame_len = 144 * bitrate // samplerate + padding
        if pos + frame_len > end:
            raise ValueError(f"truncated final frame at offset {pos}")
        pos += frame_len
        n_frames += 1
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    duration_ms = n_frames * _SAMPLES_PER_FRAME_V1L3 * 1000 // samplerate
    return Mp3Info(
        n_frames=n_frames,
        samplerate=samplerate,
        bitrate_kbps=(first_bitrate or 0) // 1000,
        is_cbr=is_cbr,
        duration_ms=duration_ms,
        title=title,
    )


def encode_mp3_stub(
    n_frames: int,
    bitrate_kbps: int = 128,
    samplerate: int = 44100,
    title: str | None = None,
) -> bytes:
    """Valid MPEG1 Layer III frame sequence with zeroed payloads (the
    bitstream inside is fake by construction — this writer exists to
    exercise the frame walk, not decode) plus an ID3v2.3 TIT2 tag."""
    bitrate_idx = _BITRATES_V1L3.index(bitrate_kbps)
    sr_idx = _SAMPLERATES_V1.index(samplerate)
    out = bytearray()
    if title is not None:
        body = b"\x00" + title.encode("latin-1")
        frame = b"TIT2" + struct.pack(">I", len(body)) + b"\x00\x00" + body
        size = len(frame)
        out += (
            b"ID3\x03\x00\x00"
            + bytes(
                [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                 (size >> 7) & 0x7F, size & 0x7F]
            )
            + frame
        )
    header = bytes(
        [
            0xFF,
            0xFB,  # MPEG1, Layer III, no CRC
            (bitrate_idx << 4) | (sr_idx << 2),  # no padding
            0x00,
        ]
    )
    frame_len = 144 * bitrate_kbps * 1000 // samplerate
    for _ in range(n_frames):
        out += header + b"\x00" * (frame_len - 4)
    return bytes(out)


# --- FLAC metadata blocks (frame decode lives in multimodal/flac.py) ---


@dataclass
class FlacInfo:
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int
    duration_ms: int
    vendor: str | None


def scan_flac(payload: bytes) -> FlacInfo:
    """Walk the published FLAC metadata-block layer (format spec §
    METADATA_BLOCK): STREAMINFO's packed sample-rate/channels/bits/
    total-samples word and the VORBIS_COMMENT vendor string. The
    Rice-coded subframes are decoded for real by multimodal/flac.py
    (r8); only MP3's Huffman bitstream remains gated on this tier."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    vendor = None
    while pos + 4 <= len(payload):
        header = payload[pos]
        is_last = bool(header & 0x80)
        btype = header & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise ValueError("FLAC metadata block truncated")
        if btype == 0:  # STREAMINFO
            if size < 34:
                raise ValueError("STREAMINFO too short")
            # bytes 10..17 pack: rate(20) channels-1(3) bits-1(5) total(36)
            word = int.from_bytes(body[10:18], "big")
            rate = word >> 44
            channels = ((word >> 41) & 0x07) + 1
            bits = ((word >> 36) & 0x1F) + 1
            total = word & ((1 << 36) - 1)
            if rate == 0:
                raise ValueError("invalid FLAC sample rate 0")
            info = (rate, channels, bits, total)
        elif btype == 4:  # VORBIS_COMMENT (little-endian lengths)
            vlen = int.from_bytes(body[0:4], "little")
            vendor = body[4 : 4 + vlen].decode("utf-8", errors="replace")
        pos += 4 + size
        if is_last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bits, total = info
    return FlacInfo(
        sample_rate=rate,
        channels=channels,
        bits_per_sample=bits,
        total_samples=total,
        duration_ms=total * 1000 // rate,
        vendor=vendor,
    )


def encode_flac_stub(
    total_samples: int,
    sample_rate: int = 44100,
    channels: int = 2,
    bits: int = 16,
    vendor: str = "datawarehouse1",
) -> bytes:
    """Structurally valid FLAC metadata prologue (STREAMINFO +
    VORBIS_COMMENT, last-block flag set) — no audio frames, which is
    legal for a metadata scan fixture and honest about the gated
    decode tier."""
    word = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    streaminfo = (
        (4096).to_bytes(2, "big") * 2  # min/max blocksize
        + (0).to_bytes(3, "big") * 2  # min/max framesize (unknown)
        + word.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of unencoded audio (unknown)
    )
    v = vendor.encode("utf-8")
    comment = len(v).to_bytes(4, "little") + v + (0).to_bytes(4, "little")
    out = bytearray(b"fLaC")
    out += bytes([0x00]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    out += bytes([0x80 | 0x04]) + len(comment).to_bytes(3, "big") + comment
    return bytes(out)
