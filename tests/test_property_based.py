"""Property-based tests (hypothesis): the hand-built operators are
checked against brute-force pure-Python oracles on randomized inputs —
the SURVEY.md §5.3 answer to the reference having no tests at all.

Example counts are small (each example runs real Spark jobs); the
generators bias toward the nasty cases: duplicate keys, ties in
timestamps, empty sides.
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datawarehouse1_spark.operators.scale import salted_join
from datawarehouse1_spark.operators.temporal import asof_join_backward

BASE = datetime(2025, 1, 1)

KEYS = st.integers(min_value=0, max_value=3)  # few keys -> many collisions
TS = st.integers(min_value=0, max_value=20)  # coarse grid -> frequent ties

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12, unique=True)
    )
    # right side unique per (key, ts) — the operator's documented contract
    right = draw(
        st.lists(
            st.tuples(KEYS, TS),
            min_size=0,
            max_size=12,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    return left, right


def _brute_asof(left, right):
    out = {}
    for i, (k, ts) in enumerate(left):
        cands = [(rts, p) for (rk, rts, p) in right if rk == k and rts <= ts]
        out[i] = max(cands)[1] if cands else None
    return out


@given(asof_case())
@SETTINGS
def test_asof_matches_brute_force(spark, case):
    left_rows, right_rows = case
    if not left_rows:
        return
    left = spark.createDataFrame(
        [(i, k, BASE + timedelta(hours=ts)) for i, (k, ts) in enumerate(left_rows)],
        "event_id long, k long, ts timestamp",
    )
    right_payloaded = [(k, ts, k * 1000 + ts) for (k, ts) in right_rows]
    want = _brute_asof(left_rows, right_payloaded)
    if right_rows:
        right = spark.createDataFrame(
            [(k, BASE + timedelta(hours=ts), p) for (k, ts, p) in right_payloaded],
            "k long, rts timestamp, payload long",
        )
        out = asof_join_backward(left, right, "k", "k", "ts", "rts", ["payload"])
        got = {r.event_id: r.payload for r in out.collect()}
    else:
        got = {i: None for i in range(len(left_rows))}
    assert got == want


@st.composite
def join_case(draw):
    fact = draw(st.lists(st.tuples(KEYS, st.integers(0, 100)), max_size=15))
    dim = draw(
        st.lists(st.tuples(KEYS, st.text("ab", max_size=2)), max_size=6,
                 unique_by=lambda t: t[0])
    )
    n_salts = draw(st.sampled_from([1, 3, 8]))
    return fact, dim, n_salts


@given(join_case())
@SETTINGS
def test_salted_join_always_equals_plain_join(spark, case):
    fact_rows, dim_rows, n_salts = case
    if not fact_rows or not dim_rows:
        return
    fact = spark.createDataFrame(fact_rows, "k long, v long")
    dim = spark.createDataFrame(dim_rows, "dk long, dv string")
    got = sorted(
        (r.k, r.v, r.dv)
        for r in salted_join(fact, dim, "k", "dk", n_salts=n_salts).collect()
    )
    want = sorted((r.k, r.v, r.dv) for r in fact.join(dim, fact.k == dim.dk).collect())
    assert got == want


# ---------- adaptive MinHash banding (pure Python — no Spark per example) ----------

LSH_SETTINGS = settings(max_examples=80, deadline=None)


def _independent_error(num_hashes: int, b: int, t: float, steps: int = 500) -> float:
    """Trapezoidal FP+FN area, written independently of the operator's
    midpoint integration, as the optimality oracle."""
    from datawarehouse1_spark.operators.dedup import lsh_collision_probability

    r = num_hashes // b

    def curve(s: float) -> float:
        return lsh_collision_probability(s, b, r)

    def trap(lo: float, hi: float, f) -> float:
        h = (hi - lo) / steps
        total = (f(lo) + f(hi)) / 2 + sum(f(lo + i * h) for i in range(1, steps))
        return total * h

    fp = trap(0.0, t, curve)
    fn = trap(t, 1.0, lambda s: 1.0 - curve(s))
    return 0.5 * fp + 0.5 * fn


@given(
    num_hashes=st.sampled_from([16, 32, 64, 128]),
    threshold=st.floats(min_value=0.1, max_value=0.9),
)
@LSH_SETTINGS
def test_lsh_optimal_params_properties(num_hashes, threshold):
    from datawarehouse1_spark.operators.dedup import (
        lsh_collision_probability,
        lsh_optimal_params,
    )

    b, r = lsh_optimal_params(num_hashes, threshold)
    assert b * r == num_hashes and b >= 1 and r >= 1

    # the S-curve with the chosen params is monotonically nondecreasing
    probs = [lsh_collision_probability(i / 50, b, r) for i in range(51)]
    assert all(p2 >= p1 - 1e-12 for p1, p2 in zip(probs, probs[1:]))
    assert probs[0] == 0.0 and probs[-1] == 1.0

    # optimality among all factorizations, judged by an independent
    # implementation of the same objective (small tolerance for the
    # different quadrature)
    errs = {
        bb: _independent_error(num_hashes, bb, threshold)
        for bb in range(1, num_hashes + 1)
        if num_hashes % bb == 0
    }
    assert errs[b] <= min(errs.values()) + 1e-3


def test_lsh_rows_per_band_monotone_in_threshold():
    """Higher target threshold -> longer band slices (more rows per
    band): the curve shifts right. The achievable inflections are sparse
    (b must divide num_hashes), so monotonicity — not distance — is the
    invariant worth pinning."""
    from datawarehouse1_spark.operators.dedup import lsh_optimal_params

    rows = [lsh_optimal_params(128, t / 20)[1] for t in range(2, 19)]
    assert rows == sorted(rows)


@given(threshold=st.floats(min_value=0.15, max_value=0.85))
@LSH_SETTINGS
def test_lsh_curve_separates_around_threshold(threshold):
    """Pairs 0.2 above the threshold must collide far more often than
    pairs 0.2 below it — the S-curve the optimizer picks actually
    discriminates at the requested operating point."""
    from datawarehouse1_spark.operators.dedup import (
        lsh_collision_probability,
        lsh_optimal_params,
    )

    b, r = lsh_optimal_params(128, threshold)
    above = lsh_collision_probability(min(threshold + 0.2, 1.0), b, r)
    below = lsh_collision_probability(max(threshold - 0.2, 0.0), b, r)
    assert above - below > 0.3


# ---------- round-4 query invariants (cross-column consistency) ----------


def test_transition_matrix_counts_conserve(spark):
    """Each user with n>=1 events contributes exactly n-1 transitions, so
    sum(n_transitions) == total_events - distinct_users — a conservation
    law the window+agg must respect under any partitioning."""
    from datawarehouse1_spark import registry
    from datawarehouse1_spark.catalog import table
    from tests.conftest import SF_DIR

    registry.load_all()
    out = registry.QUERIES["q_events_transition_matrix"](spark, SF_DIR)
    total_transitions = sum(r.n_transitions for r in out.collect())
    ev = table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_transitions == n_events - n_users


def test_heavy_hitters_shares_and_order(spark):
    """Shares are each key's count over the table total (so the top-20
    sum stays within (0, 1]) and rows arrive in the declared total
    order."""
    from datawarehouse1_spark import registry
    from datawarehouse1_spark.catalog import table
    from tests.conftest import SF_DIR

    registry.load_all()
    rows = registry.QUERIES["q_heavy_hitters"](spark, SF_DIR).collect()
    assert len(rows) == 20
    total = table(spark, SF_DIR, "lineitem").count()
    for r in rows:
        assert abs(r.share - r.n_lines / total) < 1e-12
    keys = [(-r.n_lines, -r.key_revenue, r.l_orderkey) for r in rows]
    assert keys == sorted(keys)
    assert 0 < sum(r.share for r in rows) <= 1.0


def test_curation_topk_is_topk_of_full_ranking(spark):
    """The per-language top-20 must equal the brute-force head of the
    full score ranking (score desc, doc_id asc) for every language."""
    from collections import defaultdict

    from datawarehouse1_spark import registry
    from tests.conftest import SF_DIR

    registry.load_all()
    out = registry.QUERIES["q_curation_topk_per_lang"](spark, SF_DIR).collect()
    by_lang = defaultdict(list)
    for r in out:
        by_lang[r.lang].append(r)
    for lang, rows in by_lang.items():
        assert len(rows) <= 20
        ranked = sorted(rows, key=lambda r: (-r.score, r.doc_id))
        assert [r.rk for r in ranked] == list(range(1, len(rows) + 1)), lang


# ---------- codec round-trip properties (no Spark needed) ----------

CODEC_SETTINGS = settings(max_examples=25, deadline=None)


@CODEC_SETTINGS
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
    filter_type=st.integers(0, 4),
)
def test_png_roundtrip_property(h, w, seed, interlace, filter_type):
    """PNG is lossless: decode(encode(img)) == img for ANY uint8 RGB
    image, any filter, interlaced or not."""
    import numpy as np

    from datawarehouse1_spark.multimodal.codecs import decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type, interlace=interlace))
    assert np.array_equal(out, img)


@CODEC_SETTINGS
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1), interlace=st.booleans())
def test_gif_roundtrip_property(h, w, seed, interlace):
    """GIF is lossless for <=256-color images (grayscale by
    construction here), interlaced or not."""
    import numpy as np

    from datawarehouse1_spark.multimodal.gif import decode_gif, encode_gif

    v = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    img = np.stack([v, v, v], axis=2)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)


@CODEC_SETTINGS
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    quality=st.integers(30, 100),
    subsample=st.sampled_from(["4:4:4", "4:2:0"]),
)
def test_jpeg_decodes_to_correct_shape_and_range(h, w, seed, quality, subsample):
    """JPEG is lossy, but decode(encode(img)) must always produce the
    original shape, uint8 range, and for a FLAT image be near-exact."""
    import numpy as np

    from datawarehouse1_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


@CODEC_SETTINGS
@given(
    n=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    spc=st.integers(1, 5),
    sync_every=st.integers(1, 6),
)
def test_mp4_demux_roundtrip_property(n, seed, spc, sync_every):
    """Every sample written by the fixture writer must be recovered
    byte-for-byte through the stsc/stco walk, for any chunking layout
    and sync cadence."""
    import numpy as np

    from datawarehouse1_spark.multimodal.mp4 import (
        demux_mp4,
        encode_mp4_stub,
        extract_sample,
    )

    rng = np.random.default_rng(seed)
    payloads = [bytes(rng.integers(0, 256, int(rng.integers(1, 80)), dtype=np.uint8).tolist()) for _ in range(n)]
    mp4 = encode_mp4_stub(payloads, samples_per_chunk=spc, sync_every=sync_every)
    (track,) = demux_mp4(mp4)
    assert len(track.samples) == n
    for s in track.samples:
        assert extract_sample(mp4, s) == payloads[s.index]
    assert [s.index for s in track.samples if s.is_sync] == list(range(0, n, sync_every))


@CODEC_SETTINGS
@given(data=st.binary(min_size=0, max_size=256))
def test_decoders_never_return_garbage_on_fuzz(data):
    """Arbitrary bytes must either raise (ValueError family /
    NotImplementedError) or decode legitimately — never hang or return
    malformed output. Magic prefixes are prepended so each decoder's
    parser proper gets fuzzed, not just the signature check."""
    import zlib

    import numpy as np

    from datawarehouse1_spark.multimodal.codecs import decode_bmp, decode_png
    from datawarehouse1_spark.multimodal.gif import decode_gif
    from datawarehouse1_spark.multimodal.jpeg import decode_jpeg
    from datawarehouse1_spark.multimodal.mp4 import demux_mp4

    for fn, prefix in (
        (decode_png, b"\x89PNG\r\n\x1a\n"),
        (decode_jpeg, b"\xff\xd8\xff"),
        (decode_gif, b"GIF89a"),
        (decode_bmp, b"BM"),
        (demux_mp4, b"\x00\x00\x00\x18ftypisom"),
    ):
        try:
            out = fn(prefix + data)
        except (ValueError, NotImplementedError, IndexError, struct.error,
                zlib.error, EOFError, OverflowError):
            continue
        if fn is demux_mp4:
            assert isinstance(out, list)
        else:
            assert isinstance(out, np.ndarray) and out.dtype == np.uint8


WORD = st.text(alphabet="abcxyz", min_size=1, max_size=5)


@given(toks=st.lists(WORD, min_size=0, max_size=10), n=st.integers(2, 4))
@SETTINGS
def test_word_ngrams_matches_naive_reference(spark, toks, n):
    """functions/arrays.py::word_ngrams (the zip_with-chain rewrite every
    shingle/bigram path now rides on) must equal the naive Python
    n-gram construction for any token list, including len < n."""
    import pyspark.sql.functions as F

    from datawarehouse1_spark.functions.arrays import word_ngrams

    df = spark.createDataFrame([(toks,)], "t array<string>")
    (got,) = df.select(word_ngrams(F.col("t"), n).alias("g")).collect()
    expected = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ]
    assert list(got.g) == expected


# --- apply_cdc vs a sequential dict-replay oracle ---
@st.composite
def cdc_case(draw):
    base = draw(
        st.lists(
            st.tuples(KEYS, st.integers(0, 9)),
            min_size=0,
            max_size=8,
            unique_by=lambda t: t[0],
        )
    )
    # changes: (key, value, op, seq) — seq unique per key is the
    # operator's documented contract (a total order within each key)
    raw = draw(
        st.lists(
            st.tuples(
                KEYS,
                st.integers(0, 9),
                st.sampled_from(["I", "U", "D"]),
                st.integers(0, 20),
            ),
            min_size=0,
            max_size=12,
            unique_by=lambda t: (t[0], t[3]),
        )
    )
    return base, raw


@given(cdc_case())
@SETTINGS
def test_apply_cdc_matches_dict_replay(spark, case):
    from datawarehouse1_spark.operators.warehouse import apply_cdc

    base, changes = case
    expected = dict(base)
    # replay: latest op per key wins (ordered by seq), D removes,
    # I/U upsert — exactly the MERGE contract
    latest = {}
    for k, v, op, seq in changes:
        if k not in latest or seq > latest[k][1]:
            latest[k] = ((k, v, op), seq)
    for (k, v, op), _ in latest.values():
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = v

    base_df = spark.createDataFrame(
        base, "k int, v int"
    ) if base else spark.createDataFrame([], "k int, v int")
    chg_df = spark.createDataFrame(
        changes, "k int, v int, op string, seq int"
    ) if changes else spark.createDataFrame([], "k int, v int, op string, seq int")
    got = {
        r.k: r.v for r in apply_cdc(base_df, chg_df, keys=("k",)).collect()
    }
    assert got == expected


# --- extract_changes ∘ apply_cdc round-trip law ---
@st.composite
def snapshot_pair(draw):
    """Two arbitrary snapshots over the same key space, nullable values
    included — the operator pair must transport ANY old to ANY new."""
    vals = st.one_of(st.none(), st.integers(0, 9))
    old = draw(
        st.lists(
            st.tuples(KEYS, vals, vals),
            min_size=0,
            max_size=10,
            unique_by=lambda t: t[0],
        )
    )
    new = draw(
        st.lists(
            st.tuples(KEYS, vals, vals),
            min_size=0,
            max_size=10,
            unique_by=lambda t: t[0],
        )
    )
    return old, new


@given(snapshot_pair())
@SETTINGS
def test_extract_changes_roundtrip_property(spark, case):
    """apply_cdc(old, extract_changes(old, new)) == new for ARBITRARY
    snapshot pairs, including null-bearing and null-only-diff rows, and
    the feed is MINIMAL (no change row for an identical (key, values))."""
    from pyspark.sql import functions as F

    from datawarehouse1_spark.operators.warehouse import apply_cdc, extract_changes

    old, new = case
    schema = "k int, a int, b int"

    def df(rows):
        return (
            spark.createDataFrame(rows, schema)
            if rows
            else spark.createDataFrame([], schema)
        )

    changes = extract_changes(df(old), df(new), keys=("k",))
    rows = changes.collect()

    # minimality: a key whose full row is identical in both snapshots
    # must emit no change row
    unchanged = {t[0] for t in set(old) & set(new)}
    emitted = {r.k for r in rows}
    assert not (unchanged & emitted)

    replayed = apply_cdc(df(old), changes.withColumn("seq", F.lit(1)), keys=("k",))
    got = {(r.k, r.a, r.b) for r in replayed.collect()}
    assert got == set(new)


# --- stratified_sample vs a pure-python md5 oracle ---
@st.composite
def strat_case(draw):
    rows = draw(
        st.lists(
            st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"])),
            min_size=0,
            max_size=40,
            unique_by=lambda t: t[0],
        )
    )
    k = draw(st.integers(1, 6))
    return rows, k

@given(strat_case())
@SETTINGS
def test_stratified_sample_matches_md5_oracle(spark, case):
    """The sample is a pure function of (md5(key), stratum): a python
    replay over the same hashes must predict EXACTLY the chosen rows
    and their ranks, for any stratum sizes around k."""
    import hashlib

    from datawarehouse1_spark.operators.sampling import stratified_sample

    rows, k = case
    expected = {}
    by_stratum = {}
    for key, s in rows:
        by_stratum.setdefault(s, []).append(key)
    for s, keys in by_stratum.items():
        ranked = sorted(keys, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rank, key in enumerate(ranked[:k], start=1):
            expected[key] = (s, rank)

    df = (
        spark.createDataFrame(rows, "doc_id long, lang string")
        if rows
        else spark.createDataFrame([], "doc_id long, lang string")
    )
    got = {
        r.doc_id: (r.lang, r.sample_rank)
        for r in stratified_sample(df, ("lang",), "doc_id", k=k).collect()
    }
    assert got == expected


# --- interval_overlap_join vs brute force ---
@st.composite
def interval_case(draw):
    def ivs(n):
        return st.lists(
            st.tuples(
                st.integers(0, 30),
                st.integers(-2, 9),  # length; <=0 => degenerate/empty
            ),
            min_size=0,
            max_size=n,
        )
    return draw(ivs(10)), draw(ivs(10)), draw(st.sampled_from([1, 3, 7]))


@given(interval_case())
@SETTINGS
def test_interval_overlap_matches_brute_force(spark, case):
    """Grid-bucket decomposition == the plain theta join for arbitrary
    intervals (spanning several buckets, inside one, empty, touching at
    bucket boundaries) and any bucket width."""
    from datawarehouse1_spark.operators.temporal import interval_overlap_join

    lraw, rraw, w = case
    left = [(i, s, s + ln) for i, (s, ln) in enumerate(lraw)]
    right = [(i, s, s + ln) for i, (s, ln) in enumerate(rraw)]
    want = {
        (li, ri)
        for (li, ls, le) in left
        for (ri, rs, re_) in right
        # half-open overlap — BOTH non-empty: an empty interval contains
        # no points, so it can never share one (the bare ls<re_ ∧ rs<le
        # predicate wrongly matches empties, hypothesis found the case)
        if ls < le and rs < re_ and ls < re_ and rs < le
    }
    schema = "id long, s long, e long"

    def df(rows):
        return (
            spark.createDataFrame(rows, schema)
            if rows
            else spark.createDataFrame([], schema)
        )

    out = interval_overlap_join(df(left), df(right), "s", "e", "s", "e", w)
    got = {(r.l_id, r.r_id) for r in out.collect()}
    assert got == want


@st.composite
def keyed_interval_case(draw):
    def ivs(n):
        return st.lists(
            st.tuples(
                st.integers(0, 2),     # entity key, few -> collisions
                st.integers(0, 20),
                st.integers(-1, 6),
            ),
            min_size=0,
            max_size=10,
        )
    return draw(ivs(10)), draw(ivs(10)), draw(st.sampled_from([1, 4]))


@given(keyed_interval_case())
@SETTINGS
def test_keyed_interval_overlap_matches_brute_force(spark, case):
    """equi_keys: overlap joins only within the same entity key."""
    from datawarehouse1_spark.operators.temporal import interval_overlap_join

    lraw, rraw, w = case
    left = [(i, k, s, s + ln) for i, (k, s, ln) in enumerate(lraw)]
    right = [(i, k, s, s + ln) for i, (k, s, ln) in enumerate(rraw)]
    want = {
        (li, ri)
        for (li, lk, ls, le) in left
        for (ri, rk, rs, re_) in right
        if lk == rk and ls < le and rs < re_ and ls < re_ and rs < le
    }
    schema = "id long, k long, s long, e long"

    def df(rows):
        return (
            spark.createDataFrame(rows, schema)
            if rows
            else spark.createDataFrame([], schema)
        )

    out = interval_overlap_join(
        df(left), df(right), "s", "e", "s", "e", w, equi_keys=[("k", "k")]
    )
    got = {(r.l_id, r.r_id) for r in out.collect()}
    assert got == want


# ---- r9: hash64 pigeonhole completeness over ARBITRARY hashes ----
#
# The staged modality tests (image/audio/video twins) exercise the
# shared band-pair operator on engineered inputs; this drives it with
# arbitrary 64-bit values + planted near pairs and checks against a
# pure-python all-pairs scan — the pigeonhole claim itself.


@st.composite
def hash64_case(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    base = draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << 64) - 1),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    # plant near-duplicates: flip 0..3 random bits of some bases
    planted = []
    for i, h in enumerate(base):
        if draw(st.booleans()):
            flips = draw(st.sets(st.integers(0, 63), min_size=0, max_size=3))
            h2 = h
            for b in flips:
                h2 ^= 1 << b
            planted.append(h2)
    return base + planted


HASH64_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(hash64_case())
@HASH64_SETTINGS
def test_hash64_band_pairs_equals_all_pairs(spark, case):
    from datawarehouse1_spark.operators.dedup import hash64_band_pairs

    hashes = list(dict.fromkeys(case))  # dedupe values, keep order
    rows = [
        (i, (h >> 32) & 0xFFFFFFFF, h & 0xFFFFFFFF)
        for i, h in enumerate(hashes)
    ]
    want = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= 3:
                want.add((i, j, d))
    df = spark.createDataFrame(rows, "id long, hi long, lo long")
    got = {
        (r.left_id, r.right_id, r.hamming)
        for r in hash64_band_pairs(df, "id", "hi", "lo", max_hamming=3).collect()
    }
    assert got == want


# ---- r9: systematic PPS vs a pure-python replay oracle ----


@st.composite
def pps_case(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    weights = draw(
        st.lists(
            st.integers(min_value=1, max_value=5000), min_size=n, max_size=n
        )
    )
    return weights


@given(pps_case())
@HASH64_SETTINGS
def test_pps_systematic_matches_python_replay(spark, tmp_path_factory, weights):
    """The sampler is a deterministic function of (weights, md5 order):
    replaying the same cumulative-line arithmetic in plain python over
    the same md5 ordering must select the identical multiset."""
    import hashlib

    from datawarehouse1_spark import registry

    registry.load_all()
    tmp = tmp_path_factory.mktemp("pps")
    rows = [
        (i, "t" * w, "en", "s", w) for i, w in enumerate(weights)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    got = {
        (r.doc_id, r.n_hits)
        for r in registry.QUERIES["q_sample_pps_systematic"](
            spark, str(tmp)
        ).collect()
    }

    order = sorted(
        range(len(weights)),
        key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
    )
    total = sum(weights)
    step = total // 10
    want = set()
    cum = 0
    for i in order:
        lo = cum
        cum += weights[i]
        if step > 0:
            hits = cum // step - lo // step
            if hits > 0:
                want.add((i, hits))
    assert got == want
