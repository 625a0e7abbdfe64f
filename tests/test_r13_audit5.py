"""Round-13 twin-formula audit, batch 5 — funnel / retention / streak /
hopping-window event analytics re-derived by literal sequence walks
(same discipline as batches 1-4).
"""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _day(ts):
    return ts.date() if hasattr(ts, "date") else ts


# ---------------------------------------------------------------------------
# q_events_funnel
# ---------------------------------------------------------------------------


def test_funnel_matches_per_user_walk(spark):
    ev = _rows("events", ["user_id", "ts", "event_type"])
    views = defaultdict(list)
    buys = defaultdict(list)
    users = set()
    for r in ev:
        if r["event_type"] == "view":
            views[r["user_id"]].append(r["ts"])
            users.add(r["user_id"])
        elif r["event_type"] == "purchase":
            buys[r["user_id"]].append(r["ts"])
            users.add(r["user_id"])
    got = {r.user_id: r for r in _run(spark, "q_events_funnel")}
    assert set(got) == users
    for u in users:
        row = got[u]
        assert row.n_views == len(views.get(u, []))
        assert row.n_purchases == len(buys.get(u, []))
        if views.get(u) and buys.get(u):
            assert row.converted == (min(views[u]) < min(buys[u])), u
        else:
            assert row.converted is None, u


# ---------------------------------------------------------------------------
# q_events_retention_weekly — Monday week starts via stdlib weekday()
# ---------------------------------------------------------------------------


def test_retention_weekly_matches_literal_cohorts(spark):
    ev = _rows("events", ["user_id", "ts"])
    active = {
        (r["user_id"], _day(r["ts"]) - dt.timedelta(days=_day(r["ts"]).weekday()))
        for r in ev
    }
    weeks = defaultdict(set)
    for u, w in active:
        weeks[w].add(u)
    got = {r.week: r for r in _run(spark, "q_events_retention_weekly")}
    assert set(got) == set(weeks)
    for w, us in weeks.items():
        nxt = weeks.get(w + dt.timedelta(days=7), set())
        row = got[w]
        assert row.n_active == len(us)
        assert row.n_retained == len(us & nxt), w


# ---------------------------------------------------------------------------
# q_events_streak_longest — literal consecutive-day run walk
# ---------------------------------------------------------------------------


def test_streak_longest_matches_literal_run_walk(spark):
    ev = _rows("events", ["user_id", "ts"])
    days = defaultdict(set)
    for r in ev:
        days[r["user_id"]].add(_day(r["ts"]))
    expected = {}
    for u, ds in days.items():
        s = sorted(ds)
        best_len, best_start = 0, None
        run_len, run_start = 0, None
        for i, d in enumerate(s):
            if i and (d - s[i - 1]).days == 1:
                run_len += 1
            else:
                run_len, run_start = 1, d
            # strict > keeps the EARLIEST start among equal lengths
            if run_len > best_len:
                best_len, best_start = run_len, run_start
        expected[u] = (best_len, best_start)
    got = {r.user_id: (r.streak_days, r.streak_start)
           for r in _run(spark, "q_events_streak_longest")}
    assert got == expected


# ---------------------------------------------------------------------------
# q_events_hopping_window — literal 4-window fan-out
# ---------------------------------------------------------------------------


def test_hopping_window_matches_literal_fanout(spark):
    ev = _rows("events", ["user_id", "ts", "event_type"])
    n = Counter()
    users = defaultdict(set)
    for r in ev:
        t = r["ts"].replace(tzinfo=None)
        b15 = t.replace(minute=(t.minute // 15) * 15, second=0, microsecond=0)
        for k in range(4):
            start = b15 - dt.timedelta(minutes=15 * k)
            key = (start, r["event_type"])
            n[key] += 1
            users[key].add(r["user_id"])
    got = {}
    for r in _run(spark, "q_events_hopping_window"):
        ws = r.window_start.replace(tzinfo=None)
        got[(ws, r.event_type)] = (r.n_events, r.n_users)
        assert (r.window_end.replace(tzinfo=None) - ws) == dt.timedelta(hours=1)
    assert set(got) == set(n)
    for key in n:
        assert got[key] == (n[key], len(users[key])), key
