"""MP4 / ISO Base Media File Format demuxer in pure stdlib.

The MP4 *container* is not entropy-coded — it is a tree of length-
prefixed boxes (ISO/IEC 14496-12): `moov` holds per-track sample tables
(stts decode times, stsz sizes, stsc sample→chunk mapping, stco chunk
offsets, stss sync samples) and `mdat` holds the raw sample bytes.
Demuxing — locating every frame's byte range, timestamp, and keyframe
flag — therefore needs no codec at all. This module implements that:
the part of the video tier a training-data pipeline needs for frame
SAMPLING (pick the keyframe nearest each target timestamp, slice its
bytes) before any decode happens. Only the video bitstream inside the
samples (H.26x) remains honestly gated on ffmpeg.

encode_mp4_stub is the matching fixture writer: a structurally valid
single-track MP4 (ftyp + mdat + moov with real stts/stsz/stsc/stco/stss
tables, 3-samples-per-chunk layout) whose sample payloads are opaque
deterministic bytes — so the demuxer is exercised on genuine box
structure at any SF with no binary fixtures in testdata.

Parity note: the reference ETL (etl/app.py) never touches media; this
belongs to the LLM-pipeline extension surface. Pure bytes — safe inside
Arrow-batched executors.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


# --- box tree parsing ---


def iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in
    [start, end); handles 64-bit largesize boxes (size == 1)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"malformed box {fourcc!r} at offset {pos}")
        yield fourcc, pos + header, pos + size
        pos += size


def find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """Walk a container path like [b'moov', b'trak'] and yield payload
    ranges of every box matching the final path element."""
    head, rest = path[0], path[1:]
    for fourcc, p0, p1 in iter_boxes(data, start, end):
        if fourcc != head:
            continue
        if not rest:
            yield p0, p1
        else:
            yield from find_box(data, p0, p1, rest)


@dataclass
class Mp4Sample:
    index: int
    offset: int
    size: int
    dts: int  # in track timescale units
    duration: int
    is_sync: bool


@dataclass
class Mp4Track:
    track_id: int
    handler: str  # 'vide' / 'soun' / ...
    codec: str  # sample-entry fourcc, e.g. 'avc1', 'mp4v'
    timescale: int
    duration: int  # in track timescale units
    width: int
    height: int
    samples: list[Mp4Sample]


def _full_box(data: bytes, p0: int) -> int:
    """Skip the version+flags word of a full box; returns payload pos."""
    return p0 + 4


def _parse_stbl(data: bytes, p0: int, p1: int) -> tuple[str, list[Mp4Sample]]:
    codec = ""
    stts: list[tuple[int, int]] = []
    sizes: list[int] = []
    stsc: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    chunk_offsets: list[int] = []
    sync: set[int] | None = None  # 1-based sample numbers; None = all sync
    for fourcc, b0, b1 in iter_boxes(data, p0, p1):
        if fourcc == b"stsd":
            p = _full_box(data, b0) + 4  # entry_count
            for efourcc, e0, e1 in iter_boxes(data, p, b1):
                codec = efourcc.decode("latin-1")
                break
        elif fourcc == b"stts":
            p = _full_box(data, b0)
            n = struct.unpack_from(">I", data, p)[0]
            for i in range(n):
                cnt, delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
                stts.append((cnt, delta))
        elif fourcc == b"stsz":
            p = _full_box(data, b0)
            uniform, n = struct.unpack_from(">II", data, p)
            if uniform:
                sizes = [uniform] * n
            else:
                sizes = list(
                    struct.unpack_from(f">{n}I", data, p + 8)
                )
        elif fourcc == b"stsc":
            p = _full_box(data, b0)
            n = struct.unpack_from(">I", data, p)[0]
            for i in range(n):
                first, spc, _desc = struct.unpack_from(">III", data, p + 4 + 12 * i)
                stsc.append((first, spc))
        elif fourcc == b"stco":
            p = _full_box(data, b0)
            n = struct.unpack_from(">I", data, p)[0]
            chunk_offsets = list(struct.unpack_from(f">{n}I", data, p + 4))
        elif fourcc == b"co64":
            p = _full_box(data, b0)
            n = struct.unpack_from(">I", data, p)[0]
            chunk_offsets = list(struct.unpack_from(f">{n}Q", data, p + 4))
        elif fourcc == b"stss":
            p = _full_box(data, b0)
            n = struct.unpack_from(">I", data, p)[0]
            sync = set(struct.unpack_from(f">{n}I", data, p + 4))
    # expand stsc runs into per-chunk sample counts
    n_samples = len(sizes)
    per_chunk: list[int] = []
    for i, (first, spc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunk_offsets)
        per_chunk.extend([spc] * (last - first + 1))
    # per-sample decode times from stts run lengths
    dts_list: list[tuple[int, int]] = []  # (dts, duration)
    t = 0
    for cnt, delta in stts:
        for _ in range(cnt):
            dts_list.append((t, delta))
            t += delta
    samples: list[Mp4Sample] = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        spc = per_chunk[ci] if ci < len(per_chunk) else 0
        off = coff
        for _ in range(spc):
            if si >= n_samples:
                break
            dts, dur = dts_list[si] if si < len(dts_list) else (0, 0)
            samples.append(
                Mp4Sample(
                    index=si,
                    offset=off,
                    size=sizes[si],
                    dts=dts,
                    duration=dur,
                    is_sync=(sync is None) or (si + 1) in sync,
                )
            )
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"sample table inconsistent: placed {si} of {n_samples} samples"
        )
    return codec, samples


def demux_mp4(payload: bytes) -> list[Mp4Track]:
    """Parse the container and return every track with its full sample
    table (byte ranges, decode timestamps, keyframe flags)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    tracks: list[Mp4Track] = []
    for t0, t1 in find_box(payload, 0, len(payload), [b"moov", b"trak"]):
        track_id = 0
        width = height = 0
        timescale = duration = 0
        handler = ""
        for fourcc, b0, b1 in iter_boxes(payload, t0, t1):
            if fourcc == b"tkhd":
                version = payload[b0]
                if version == 1:
                    track_id = struct.unpack_from(">I", payload, b0 + 4 + 16)[0]
                    fixed_off = b0 + 4 + 16 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
                else:
                    track_id = struct.unpack_from(">I", payload, b0 + 4 + 8)[0]
                    # creation+mod (8) + id (4) + reserved (4) + duration
                    # (4) + reserved (8) + layer/group/volume/pad (8) + matrix
                    fixed_off = b0 + 4 + 8 + 4 + 4 + 4 + 8 + 8 + 36
                w_fx, h_fx = struct.unpack_from(">II", payload, fixed_off)
                width, height = w_fx >> 16, h_fx >> 16
        for m0, m1 in find_box(payload, t0, t1, [b"mdia"]):
            for fourcc, b0, b1 in iter_boxes(payload, m0, m1):
                if fourcc == b"mdhd":
                    version = payload[b0]
                    if version == 1:
                        timescale, duration = struct.unpack_from(
                            ">IQ", payload, b0 + 4 + 16
                        )
                    else:
                        timescale, duration = struct.unpack_from(
                            ">II", payload, b0 + 4 + 8
                        )
                elif fourcc == b"hdlr":
                    handler = payload[b0 + 8 : b0 + 12].decode("latin-1")
            for s0, s1 in find_box(payload, m0, m1, [b"minf", b"stbl"]):
                codec, samples = _parse_stbl(payload, s0, s1)
                tracks.append(
                    Mp4Track(
                        track_id=track_id,
                        handler=handler,
                        codec=codec,
                        timescale=timescale,
                        duration=duration,
                        width=width,
                        height=height,
                        samples=samples,
                    )
                )
    if not tracks:
        raise ValueError("ISO-BMFF payload has no demuxable track")
    return tracks


def extract_sample(payload: bytes, sample: Mp4Sample) -> bytes:
    """Slice one sample's encoded bytes out of mdat (no decode)."""
    if sample.offset + sample.size > len(payload):
        raise ValueError("sample range outside payload")
    return payload[sample.offset : sample.offset + sample.size]


def keyframes_near(track: Mp4Track, every_ms: int) -> list[Mp4Sample]:
    """Frame-sampling policy: for each target instant (0, every_ms,
    2*every_ms, ... up to track duration) pick the latest sync sample at
    or before it — the seek rule every real player uses. Deduplicates
    when targets land on the same keyframe."""
    if track.timescale <= 0:
        raise ValueError("track has no timescale")
    syncs = [s for s in track.samples if s.is_sync]
    if not syncs:
        return []
    duration_ms = track.duration * 1000 // track.timescale
    # single merged walk over targets and syncs (both monotonic):
    # O(n_targets + n_syncs), not a rescan per target
    picked: list[Mp4Sample] = []
    si = 0
    best: Mp4Sample | None = None
    t = 0
    while t <= max(duration_ms - 1, 0):
        target_units = t * track.timescale // 1000
        while si < len(syncs) and syncs[si].dts <= target_units:
            best = syncs[si]
            si += 1
        if best is not None and (not picked or picked[-1].index != best.index):
            picked.append(best)
        t += every_ms
    return picked


# --- fixture writer ---


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4_stub(
    sample_payloads: list[bytes],
    sample_duration_units: int = 40,
    timescale: int = 1000,
    width: int = 16,
    height: int = 16,
    codec: bytes = b"mp4v",
    sync_every: int = 4,
    samples_per_chunk: int = 3,
) -> bytes:
    """Structurally valid single-video-track MP4 whose sample payloads
    are caller-supplied opaque bytes. Real stts/stsz/stsc/stco/stss
    tables with a multi-chunk layout (every stsc/stco branch of the
    demuxer sees traffic); the bitstream inside the samples is fake by
    construction — this writer exists to exercise demux, not decode."""
    n = len(sample_payloads)
    if n == 0:
        raise ValueError("need at least one sample")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(sample_payloads)
    mdat = _box(b"mdat", mdat_payload)
    mdat_data_start = len(ftyp) + 8  # mdat payload begins after its header

    duration = n * sample_duration_units
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, reserved
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    # minimal visual sample entry (no codec config — payloads are opaque)
    sample_entry = _box(
        codec,
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1),  # depth, color table
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(
        b"stts", 0, 0,
        struct.pack(">I", 1) + struct.pack(">II", n, sample_duration_units),
    )
    sync_samples = list(range(1, n + 1, sync_every))
    stss = _full(
        b"stss", 0, 0,
        struct.pack(">I", len(sync_samples))
        + struct.pack(f">{len(sync_samples)}I", *sync_samples),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + struct.pack(f">{n}I", *(len(p) for p in sample_payloads)),
    )
    n_chunks = -(-n // samples_per_chunk)
    stsc_entries = [(1, samples_per_chunk)]
    tail = n - (n_chunks - 1) * samples_per_chunk
    if n_chunks > 1 and tail != samples_per_chunk:
        stsc_entries.append((n_chunks, tail))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in stsc_entries),
    )
    chunk_offsets = []
    off = mdat_data_start
    si = 0
    for ci in range(n_chunks):
        chunk_offsets.append(off)
        spc = min(samples_per_chunk, n - si)
        for _ in range(spc):
            off += len(sample_payloads[si])
            si += 1
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", n_chunks)
        + struct.pack(f">{n_chunks}I", *chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stss + stsz + stsc + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
