"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 9: grouping-set
NULL semantics, chunking/decontamination, URL canonicalization, and the
Excel serial epoch.

The CUBE/GROUPING SETS twins enumerate every grouping set with plain
dicts (the NULL roll-up markers are exactly the place a shared Expand
bug would hide); the URL twin re-canonicalizes with urllib-free string
ops; the Excel twin re-derives the 1899-12-30 epoch arithmetic with
datetime.
"""

from __future__ import annotations

import datetime
import hashlib
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str):
    return registry.QUERIES[qname](spark, SF).collect()


def _cents(x) -> int:
    return round(float(x) * 100)


def _toks(text) -> list[str]:
    return [t for t in re.split(r"\s+", (text or "").lower()) if t]


# ---------------------------------------------------------------------------
# q_agg_cube — all four grouping sets by literal dicts
# ---------------------------------------------------------------------------


def test_cube_matches_literal_grouping_sets(spark):
    orders = _rows("orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
    expected = {}
    for keyer in (
        lambda r: (r["o_orderpriority"], r["o_orderstatus"]),
        lambda r: (r["o_orderpriority"], None),
        lambda r: (None, r["o_orderstatus"]),
        lambda r: (None, None),
    ):
        agg = defaultdict(lambda: [0, 0])
        for r in orders:
            c = agg[keyer(r)]
            c[0] += 1
            c[1] += _cents(r["o_totalprice"])
        for k, (n, cents) in agg.items():
            expected[k] = (n, cents / 100.0)
    got = {
        (r.o_orderpriority, r.o_orderstatus): (r.n_orders, r.total_price)
        for r in _run(spark, "q_agg_cube")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_agg_grouping_sets — the three declared sets by literal dicts
# ---------------------------------------------------------------------------


def test_grouping_sets_match_literal_dicts(spark):
    li = _rows("lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    expected = {}
    for keyer in (
        lambda r: (r["l_returnflag"], r["l_linestatus"]),
        lambda r: (r["l_returnflag"], None),
        lambda r: (None, None),
    ):
        agg = defaultdict(lambda: [0, 0])
        for r in li:
            c = agg[keyer(r)]
            c[0] += 1
            c[1] += _cents(r["l_quantity"])
        for k, (n, cents) in agg.items():
            expected[k] = (n, cents / 100.0)
    got = {
        (r.l_returnflag, r.l_linestatus): (r.n_items, r.sum_qty)
        for r in _run(spark, "q_agg_grouping_sets")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_chunk_sliding — literal 64/48 window walk
# ---------------------------------------------------------------------------


def test_chunk_sliding_matches_literal_windows(spark):
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        t = _toks(r["text"])
        if not t:
            continue
        for i in range((len(t) - 1) // 48 + 1):
            piece = t[i * 48 : i * 48 + 64]
            expected[(r["doc_id"], i)] = (
                len(t),
                " ".join(piece),
                len(piece),
            )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk, r.chunk_tokens)
        for r in _run(spark, "q_curation_chunk_sliding")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_decontaminate — literal trigram set intersection
# ---------------------------------------------------------------------------


def test_decontaminate_matches_literal_set_intersection(spark):
    docs = _rows("documents", ["doc_id", "text"])
    tri = {}
    for r in docs:
        t = _toks(r["text"])
        tri[r["doc_id"]] = {
            hashlib.md5(" ".join(t[i : i + 3]).encode()).hexdigest()
            for i in range(len(t) - 2)
        }
    eval_sh = set()
    for did, sh in tri.items():
        if did % 97 == 0:
            eval_sh |= sh
    expected = {}
    for r in docs:
        did = r["doc_id"]
        if did % 97 == 0:
            continue
        hits = len(tri[did] & eval_sh)
        expected[did] = (hits, hits >= 3)
    got = {
        r.doc_id: (r.n_eval_shingle_hits, r.drop_doc)
        for r in _run(spark, "q_curation_decontaminate")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_dedup_url_normalize — literal staging + canonicalization
# ---------------------------------------------------------------------------


def test_url_normalize_matches_literal_canonicalization(spark):
    canon_groups = defaultdict(list)
    for r in _rows("documents", ["doc_id"]):
        did = r["doc_id"]
        scheme = {0: "https://", 1: "HTTP://", 2: "https://"}[did % 3]
        url = (
            scheme
            + ("WWW." if did % 2 == 0 else "")
            + f"Site{did % 50}.Example.COM/docs/{did % 200}"
            + ("/" if did % 4 == 0 else "")
            + {
                0: f"?b=1&id={did % 200}",
                1: f"?id={did % 200}&b=1",
                2: f"?id={did % 200}&utm_src=9&b=1",
            }[did % 3]
            + ("#sec-2" if did % 7 == 0 else "")
        )
        rest = re.sub(r"^[A-Za-z]+://", "", url)
        m = re.match(r"^([^/?#]+)([^?#]*)", rest)
        host = re.sub(r"^www\.", "", m.group(1).lower())
        path = re.sub(r"/$", "", m.group(2))
        qm = re.search(r"\?([^#]*)", url)
        params = sorted(
            p for p in (qm.group(1).split("&") if qm else [])
            if not p.startswith("utm_")
        )
        q = "&".join(params)
        canon_groups[host + path + (f"?{q}" if q else "")].append(did)
    expected = {
        canon: (min(ids), len(ids) - 1)
        for canon, ids in canon_groups.items()
    }
    got = {
        r.url_canon: (r.keeper_doc_id, r.n_dupes)
        for r in _run(spark, "q_dedup_url_normalize")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_excel_serial_date — literal 1899-12-30 epoch arithmetic
# ---------------------------------------------------------------------------


def test_excel_serial_matches_literal_epoch_math(spark):
    expected = {}
    for r in _rows("events", ["event_id", "value"]):
        if r["value"] is None:
            expected[r["event_id"]] = (None, None, None)
            continue
        serial = 40000.0 + float(r["value"])
        secs = round((serial - 25569) * 86400.0)
        ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=secs)
        expected[r["event_id"]] = (serial, ts, ts.date())
    got = {
        r.event_id: (r.excel_serial, r.converted_ts, r.converted_date)
        for r in _run(spark, "q_excel_serial_date")
    }
    assert got == expected
