"""Round-12 batch-11 law tests: dwell attribution/percentiles and
basket-profile exact means."""

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


# ------------------------------------------------------ dwell time


def test_dwell_attributes_gap_to_current_type(spark, tmp_path):
    """The gap to the NEXT event belongs to the CURRENT event's type;
    each user's last event contributes nothing; mean is exact
    integer milliseconds and p50/p90 are actual data values."""
    rows = []
    eid = 0

    def ev(uid, sec, typ):
        nonlocal eid
        eid += 1
        return (
            eid, datetime(2024, 1, 1, 0, sec // 60, sec % 60), uid, typ,
            0.0, "{}",
        )

    # user 1: a@0 -> b@10 -> c@40: dwell a=10, b=30, c=last (none)
    rows += [ev(1, 0, "a"), ev(1, 10, "b"), ev(1, 40, "c")]
    # user 2: a@0 -> a@25: dwell a=25
    rows += [ev(2, 0, "a"), ev(2, 25, "a")]
    sf = _stage(spark, tmp_path, "events", _EVENTS_SCHEMA, rows)
    out = {
        r.event_type: r
        for r in registry.QUERIES["q_events_dwell_time"](
            spark, sf
        ).collect()
    }
    assert "c" not in out  # only ever a last event
    a = out["a"]
    # dwells of a: {10, 25} -> mean 17.5 s = 17500 e3, p50 = 10 (disc
    # picks a data value at or below the midpoint), p90 = 25
    assert (a.n_dwells, a.mean_dwell_e3) == (2, 17500)
    assert (a.p50_dwell_s, a.p90_dwell_s) == (10, 25)
    b = out["b"]
    assert (b.n_dwells, b.mean_dwell_e3, b.p50_dwell_s) == (1, 30000, 30)


# ------------------------------------------------------ basket profile


def _li(ok, pk, qty, ln):
    return (
        ok, pk, 1, ln, qty, 1.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 1)
    )


def test_basket_profile_exact_bucket_means(spark, tmp_path):
    """Orders with equal line counts share a bucket; distinct-part and
    quantity means are exact floored rationals; single-line orders
    have mean_parts exactly 1000 e3."""
    rows = [
        # order 1: 3 lines, 2 distinct parts, qty 1+2+3
        _li(1, 100, 1.0, 1), _li(1, 100, 2.0, 2), _li(1, 200, 3.0, 3),
        # order 2: 3 lines, 3 distinct parts, qty 4+5+6
        _li(2, 100, 4.0, 1), _li(2, 200, 5.0, 2), _li(2, 300, 6.0, 3),
        # order 3: 1 line
        _li(3, 100, 7.0, 1),
    ]
    sf = _stage(spark, tmp_path, "lineitem", _LINEITEM_SCHEMA, rows)
    out = {
        r.n_lines: r
        for r in registry.QUERIES["q_orders_basket_profile"](
            spark, sf
        ).collect()
    }
    b3 = out[3]
    assert b3.n_orders == 2
    assert b3.mean_parts_e3 == 2500  # (2 + 3) * 1000 // 2
    assert b3.mean_qty_cents == 1050  # (600 + 1500) // 2 cents
    b1 = out[1]
    assert (b1.n_orders, b1.mean_parts_e3, b1.mean_qty_cents) == (
        1, 1000, 700,
    )
