"""Round-15 twin-formula audit — batch 16 (r19-window pre-insurance):
the image-dHash and audio-energy fingerprint tiers re-derived from
their closed-form staging in pure Python integers — pixels, PCM
amplitudes, energy sums, bit packing, hamming distances, and the
complete <=3 pair set, with no codec, no Spark, no SQL.  Beside the
engine's real decode chain (BMP/WAV bytes through the repo codecs)
and the oracle's SQL formulas, this is the third independent route.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _doc_ids(sf: str = SF):
    return [
        r["doc_id"]
        for r in pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
        .to_pylist()
        if r["doc_id"] < 400
    ]


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _pairs_within(hashes: dict[int, tuple[int, int]], k: int = 3):
    out = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        ha, la = hashes[a]
        for b in ids[i + 1 :]:
            hb, lb = hashes[b]
            d = bin(ha ^ hb).count("1") + bin(la ^ lb).count("1")
            if d <= k:
                out[(a, b)] = d
    return out


# ---------------------------------------------------------------------------
# q_dedup_image_dhash — 9x8 pixel grid + adjacent-compare bits by hand
# ---------------------------------------------------------------------------


def test_image_dhash_matches_literal_pixel_walk(spark):
    hashes = {}
    for did in _doc_ids():
        base, noisy = did - did % 2, did % 2
        px = {}
        for y in range(8):
            for x in range(9):
                n = base * 73 + y * 9 + x + 1
                v = ((n * n * 2654435761 + n * 40503) % 2**32) >> 24
                if noisy and y == 4 and x == 3:
                    v += 96
                px[(y, x)] = v % 256
        hi = lo = 0
        for y in range(8):
            for x in range(8):
                bit = 1 if px[(y, x + 1)] > px[(y, x)] else 0
                if y >= 4:
                    hi |= bit << ((y - 4) * 8 + x)
                else:
                    lo |= bit << (y * 8 + x)
        hashes[did] = (hi, lo)
    expected = _pairs_within(hashes)
    got = {
        (r.left_id, r.right_id): r.hamming
        for r in _run(spark, "q_dedup_image_dhash")
    }
    assert got == expected
    # every staged even/odd perturbation pair must surface
    assert all(
        (d, d + 1) in expected for d in range(0, 400, 2) if d + 1 < 400
    )


# ---------------------------------------------------------------------------
# q_dedup_audio_fingerprint — PCM energy signs by hand
# ---------------------------------------------------------------------------


def test_audio_fingerprint_matches_literal_pcm_walk(spark):
    hashes = {}
    for did in _doc_ids():
        base, noisy = did - did % 2, did % 2
        seed = (base * 2654435761 + 40503) % 2**31
        energy = [0] * 65
        for t in range(4160):
            amp = (((((t + 1) * (t + 1)) % 2**31) * seed) % 2**31 >> 7) % 4001 - 2000
            if noisy and t // 64 == 20:
                amp += 800
            energy[t // 64] += amp * amp
        hi = lo = 0
        for f in range(64):
            bit = 1 if energy[f + 1] > energy[f] else 0
            if f >= 32:
                hi |= bit << (f - 32)
            else:
                lo |= bit << f
        hashes[did] = (hi, lo)
    expected = _pairs_within(hashes)
    got = {
        (r.left_id, r.right_id): r.hamming
        for r in _run(spark, "q_dedup_audio_fingerprint")
    }
    assert got == expected
    assert all(
        (d, d + 1) in expected for d in range(0, 400, 2) if d + 1 < 400
    )
