"""Property-based tests (hypothesis): the hand-built operators are
checked against brute-force pure-Python oracles on randomized inputs —
the SURVEY.md §5.3 answer to the reference having no tests at all.

Example counts are small (each example runs real Spark jobs); the
generators bias toward the nasty cases: duplicate keys, ties in
timestamps, empty sides.
"""

from __future__ import annotations

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
