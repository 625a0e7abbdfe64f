"""Round-12 batch-10 law tests: sweep-line half-open/carry-over
semantics and link-prediction ranking on hand-built graphs."""

from __future__ import annotations

from datetime import datetime

from datawarehouse1_spark import registry

registry.load_all()

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)
_LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)


def _stage(spark, tmp_path, name, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


# ------------------------------------------------------ peak concurrency


def _ev(eid, dt):
    return (eid, dt, 1, "x", 0.0, "{}")


def test_peak_concurrency_overlap_halfopen_and_carry(spark, tmp_path):
    """Three holds overlapping within 5 minutes peak at 3; an event
    starting exactly when another's hold ends does NOT overlap it
    (half-open); a hold crossing midnight carries into the next day's
    baseline."""
    rows = [
        # day 1: three overlapping (10:00, 10:01, 10:02), then one
        # back-to-back at 10:07 (= 10:02's end instant -> no overlap)
        _ev(1, datetime(2024, 3, 1, 10, 0, 0)),
        _ev(2, datetime(2024, 3, 1, 10, 1, 0)),
        _ev(3, datetime(2024, 3, 1, 10, 2, 0)),
        _ev(4, datetime(2024, 3, 1, 10, 7, 0)),
        # day 1 -> 2: starts 23:58, holds until 00:03 next day
        _ev(5, datetime(2024, 3, 1, 23, 58, 0)),
        # day 2: two starts inside that carried hold
        _ev(6, datetime(2024, 3, 2, 0, 0, 0)),
        _ev(7, datetime(2024, 3, 2, 0, 1, 0)),
    ]
    sf = _stage(spark, tmp_path, "events", _EVENTS_SCHEMA, rows)
    out = {
        str(r.day): r
        for r in registry.QUERIES["q_events_peak_concurrency"](
            spark, sf
        ).collect()
    }
    d1, d2 = out["2024-03-01"], out["2024-03-02"]
    assert (d1.n_starts, d1.carry_in, d1.peak_concurrency) == (5, 0, 3)
    # carry_in = +1: event 5 started on day 1, its end lands on day 2
    assert (d2.n_starts, d2.carry_in, d2.peak_concurrency) == (2, 1, 3)


def test_peak_concurrency_carried_plateau_is_the_peak(spark, tmp_path):
    """A day whose only delta rows are ENDS must report the carried
    midnight plateau as its peak, not the post-end level (r12 review
    catch: max(carry_in + run) alone under-reported by carry_in)."""
    rows = [
        _ev(1, datetime(2024, 3, 1, 23, 58, 0)),
        _ev(2, datetime(2024, 3, 1, 23, 58, 30)),
    ]
    sf = _stage(spark, tmp_path, "events", _EVENTS_SCHEMA, rows)
    out = {
        str(r.day): r
        for r in registry.QUERIES["q_events_peak_concurrency"](
            spark, sf
        ).collect()
    }
    d2 = out["2024-03-02"]
    assert (d2.n_starts, d2.carry_in, d2.peak_concurrency) == (0, 2, 2)


def test_peak_concurrency_back_to_back_is_one(spark, tmp_path):
    """A chain of exactly-abutting holds never exceeds concurrency 1
    (the half-open law in isolation)."""
    rows = [
        _ev(i, datetime(2024, 3, 1, 10, 5 * i, 0)) for i in range(4)
    ]
    sf = _stage(spark, tmp_path, "events", _EVENTS_SCHEMA, rows)
    (row,) = registry.QUERIES["q_events_peak_concurrency"](
        spark, sf
    ).collect()
    assert row.peak_concurrency == 1


# ------------------------------------------------------ link prediction


def _li(ok, pk):
    return (
        ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 1)
    )


def test_link_prediction_square_diagonals(spark, tmp_path):
    """On the 4-cycle 1-2-3-4-1 the only wedge-generated non-edges are
    the diagonals (1,3) and (2,4), each with 2 common neighbors and
    Jaccard 2/(2+2-2) = 1.0 exactly; existing edges never appear."""
    rows = []
    ok = 0
    for u, v in [(1, 2), (2, 3), (3, 4), (1, 4)]:
        for _ in range(2):  # clear the support>=2 bar
            ok += 1
            rows += [_li(ok, u), _li(ok, v)]
    sf = _stage(spark, tmp_path, "lineitem", _LINEITEM_SCHEMA, rows)
    out = registry.QUERIES["q_graph_link_prediction"](spark, sf).collect()
    got = {(r.part_a, r.part_b): r for r in out}
    assert set(got) == {(1, 3), (2, 4)}
    for r in got.values():
        assert (r.common_neighbors, r.jaccard_e6) == (2, 1_000_000)


def test_link_prediction_ranks_overlap_over_popularity(spark, tmp_path):
    """Jaccard prefers pairs sharing their WHOLE neighborhood over a
    pair sharing one neighbor of a hub: the leaf pairs (3,4) under hub
    2 and (10,11) under hub 1 both score 1/(1+1-1) = 1 (ranked by the
    (score DESC, a, c) tie-break), while 2 and 10 share only hub 1 of
    2's three neighbors (1/(3+1-1) = 1/3)."""
    rows = []
    ok = 0
    for u, v in [(1, 2), (2, 3), (2, 4), (1, 10), (1, 11)]:
        for _ in range(2):
            ok += 1
            rows += [_li(ok, u), _li(ok, v)]
    sf = _stage(spark, tmp_path, "lineitem", _LINEITEM_SCHEMA, rows)
    out = registry.QUERIES["q_graph_link_prediction"](spark, sf).collect()
    ranked = [(r.part_a, r.part_b, r.jaccard_e6) for r in out]
    assert ranked[0] == (3, 4, 1_000_000)  # tie-break: a ascending
    assert ranked[1] == (10, 11, 1_000_000)
    d = {(a, b): j for a, b, j in ranked}
    assert d[(2, 10)] == 333_333
