"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 7: the events
battery fronting the r14 graded window.

Literal per-user sequence walks for sessionization (the 30-min gap
rule), session stats, tumbling windows, OHLC resampling, transition
counts, and JSON extraction — all stdlib, no window functions.
"""

from __future__ import annotations

import datetime
import json
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.datetime(1970, 1, 1)
GAP = 1800


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


def _sec(ts: datetime.datetime) -> int:
    d = ts - _EPOCH
    return d.days * 86400 + d.seconds  # endpoint truncation to seconds


def _sessions():
    """(user_id -> list of (ts, event_id, value, session_id)) by the
    literal 30-min gap walk."""
    events = _rows("events", ["user_id", "ts", "event_id", "value"])
    per_user = defaultdict(list)
    for r in events:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    out = {}
    for uid, evs in per_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        sid, prev = 0, None
        walked = []
        for ts, eid, val in evs:
            if prev is None or _sec(ts) - _sec(prev) > GAP:
                sid += 1
            walked.append((ts, eid, val, sid))
            prev = ts
        out[uid] = walked
    return out


def test_sessionize_matches_literal_gap_walk(spark):
    expected = {}
    for uid, walked in _sessions().items():
        for ts, eid, _, sid in walked:
            expected[eid] = (uid, ts, sid)
    got = {
        r.event_id: (r.user_id, r.ts, r.session_id)
        for r in _run(spark, "q_events_sessionize")
    }
    assert got == expected


def test_session_stats_match_literal_gap_walk(spark):
    agg = defaultdict(list)
    for uid, walked in _sessions().items():
        for ts, _, val, sid in walked:
            agg[(uid, sid)].append((ts, val))
    expected = {}
    for key, evs in agg.items():
        tss = [ts for ts, _ in evs]
        cents = sum(_cents(v) for _, v in evs)
        expected[key] = (
            len(evs),
            _sec(max(tss)) - _sec(min(tss)),
            cents / 100.0,
        )
    got = {
        (r.user_id, r.session_id): (r.n_events, r.duration_s, r.session_value)
        for r in _run(spark, "q_events_session_stats")
    }
    assert got == expected


def test_tumbling_window_matches_literal_hour_buckets(spark):
    cells = defaultdict(lambda: [0, 0])
    for r in _rows("events", ["ts", "event_type", "value"]):
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        c = cells[(hour, r["event_type"])]
        c[0] += 1
        c[1] += _cents(r["value"])
    expected = {k: (n, c / 100.0) for k, (n, c) in cells.items()}
    got = {
        (r.hour_start, r.event_type): (r.n_events, r.total_value)
        for r in _run(spark, "q_events_tumbling_window")
    }
    assert got == expected


def test_json_extract_matches_stdlib(spark):
    expected = {}
    for r in _rows("events", ["event_id", "props"]):
        try:
            k = json.loads(r["props"]).get("k")
        except (TypeError, ValueError):
            k = None
        if isinstance(k, bool) or not isinstance(k, int):
            k = None
        expected[r["event_id"]] = k
    got = {
        r.event_id: r.k_value for r in _run(spark, "q_events_json_extract")
    }
    assert got == expected


def test_transition_matrix_matches_literal_sequence_walk(spark):
    events = _rows("events", ["user_id", "event_type", "ts", "event_id"])
    per_user = defaultdict(list)
    for r in events:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for _, evs in per_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        for i in range(1, len(evs)):
            trans[(evs[i - 1][2], evs[i][2])] += 1
    got = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in _run(spark, "q_events_transition_matrix")
    }
    assert got == dict(trans)


def test_resample_ohlc_matches_literal_bars(spark):
    events = _rows("events", ["event_type", "ts", "event_id", "value"])
    bars = defaultdict(list)
    for r in events:
        if r["value"] is None:
            continue
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        bars[(r["event_type"], hour)].append(
            (r["ts"], r["event_id"], float(r["value"]))
        )
    expected = {}
    for key, evs in bars.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        vals = [v for _, _, v in evs]
        expected[key] = (evs[0][2], max(vals), min(vals), evs[-1][2], len(evs))
    got = {
        (r.event_type, r.bucket): (r.open, r.high, r.low, r.close, r.n_events)
        for r in _run(spark, "q_events_resample_ohlc")
    }
    assert got == expected
