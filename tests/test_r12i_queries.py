"""Round-12 batch-9 law tests: gains/lift closure, triangle-closure
extremes, next-event Gini extremes, and head/tail TVD extremes."""

from __future__ import annotations

from datetime import datetime

from datawarehouse1_spark import registry

registry.load_all()

_DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)
_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
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


# ------------------------------------------------------ gains / lift


def test_gains_perfect_signal_concentrates_top_decile(spark, tmp_path):
    """100 docs, the 10 longest are the only positives: the top decile
    captures 100% at lift 10x; every lower decile has lift 0; the
    decile-DESC cumulative doc count closes to the corpus size."""
    rows = [
        (i, "t", "en" if i >= 90 else "xx", "s", i) for i in range(100)
    ]
    sf = _stage(spark, tmp_path, "documents", _DOCS_SCHEMA, rows)
    out = {
        r.decile: r
        for r in registry.QUERIES["q_quality_cumulative_gains"](
            spark, sf
        ).collect()
    }
    top = out[10]
    assert (top.n_docs, top.n_pos) == (10, 10)
    assert top.capture_e6 == 1_000_000
    assert top.lift_e6 == 10_000_000  # 10x base rate, exact
    assert out[1].lift_e6 == 0
    # decile-DESC cumulative closes over the whole corpus at decile 1
    assert out[1].cum_docs == 100
    assert out[1].capture_e6 == 1_000_000


# ------------------------------------------------------ clustering coeff


def _li(ok, pk):
    return (
        ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(1995, 1, 1)
    )


def test_clustering_triangle_and_pendant(spark, tmp_path):
    """Graph = triangle {1,2,3} plus pendant edge 3-4 (each edge
    co-occurring in 2 orders to clear support): degree-2 nodes (1,2)
    close perfectly (1e6), node 3 (degree 3) closes 1/3, node 4
    (degree 1) is NULL."""
    rows = []
    ok = 0
    # two orders per edge; an order containing both endpoints
    for u, v in [(1, 2), (2, 3), (1, 3), (3, 4)]:
        for _ in range(2):
            ok += 1
            rows += [_li(ok, u), _li(ok, v)]
    sf = _stage(spark, tmp_path, "lineitem", _LINEITEM_SCHEMA, rows)
    out = {
        r.degree: r
        for r in registry.QUERIES["q_graph_clustering_coeff"](
            spark, sf
        ).collect()
    }
    # degree 2: nodes 1 and 2, each in exactly the one triangle
    assert (out[2].n_nodes, out[2].n_triangle_incidences) == (2, 2)
    assert out[2].mean_closure_e6 == 1_000_000
    # degree 3: node 3, one triangle of 3 possible neighbor pairs
    assert (out[3].n_nodes, out[3].n_triangle_incidences) == (1, 1)
    assert out[3].mean_closure_e6 == 333_333
    # degree 1: node 4 — closure undefined
    assert out[1].mean_closure_e6 is None


# ------------------------------------------------------ transition gini


def test_transition_gini_extremes(spark, tmp_path):
    """A type whose successor is always the same has gini 0 and top
    share 1e6; a type split evenly over two successors has gini
    500000 and top share 500000."""
    rows = []
    eid = 0

    def ev(uid, t, typ):
        nonlocal eid
        eid += 1
        return (eid, datetime(2024, 1, 1, 0, 0, t), uid, typ, 0.0, "{}")

    # user 1..4: a -> b -> (c|d): a always followed by b (gini 0);
    # b followed by c,c,d,d (gini 1/2)
    for uid, last in [(1, "c"), (2, "c"), (3, "d"), (4, "d")]:
        rows += [ev(uid, 1, "a"), ev(uid, 2, "b"), ev(uid, 3, last)]
    sf = _stage(spark, tmp_path, "events", _EVENTS_SCHEMA, rows)
    out = {
        r.prev_type: r
        for r in registry.QUERIES["q_events_transition_gini"](
            spark, sf
        ).collect()
    }
    a = out["a"]
    assert (a.n_out, a.n_next_types, a.top_share_e6, a.gini_e6) == (
        4, 1, 1_000_000, 0,
    )
    b = out["b"]
    assert (b.n_out, b.n_next_types, b.top_share_e6, b.gini_e6) == (
        4, 2, 500_000, 500_000,
    )


# ------------------------------------------------------ head/tail drift


def test_head_tail_drift_extremes(spark, tmp_path):
    """Identical halves give TVD 0; fully disjoint halves give TVD
    exactly 1e6; the head gets floor(n/2) tokens of an odd-length
    doc."""
    rows = [
        # same: head = tail = {x, y}
        (1, "x y x y", "en", "same", 7),
        # disjoint: head {a, b} vs tail {c, d}
        (2, "a b c d", "en", "disjoint", 7),
        # odd length: 5 tokens -> head 2, tail 3
        (3, "p p q q q", "en", "odd", 9),
    ]
    sf = _stage(spark, tmp_path, "documents", _DOCS_SCHEMA, rows)
    out = {
        r.source: r
        for r in registry.QUERIES["q_text_head_tail_drift"](
            spark, sf
        ).collect()
    }
    assert out["same"].tvd_e6 == 0
    assert out["disjoint"].tvd_e6 == 1_000_000
    odd = out["odd"]
    assert (odd.head_tokens, odd.tail_tokens) == (2, 3)
    # head = {p:2}, tail = {p:0? no — tokens p p | q q q}: head {p:2},
    # tail {q:3}: disjoint => 1e6
    assert odd.tvd_e6 == 1_000_000
    assert (odd.head_vocab, odd.tail_vocab) == (1, 1)
