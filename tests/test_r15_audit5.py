"""Round-15 twin-formula audit — batch 5 (r17-window pre-insurance).

Literal raw-parquet walks for the r11-vintage formula-bearing queries
with no prior audit twin: global-first paragraph dedup, PII redaction,
first-touch conversion latency, nearest-centroid label purity, the
Deequ-style expectations report, and the TTL retention plan.
"""

from __future__ import annotations

import datetime
import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"

_EPOCH = datetime.datetime(1970, 1, 1)


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


def _us(ts: datetime.datetime) -> int:
    return (ts - _EPOCH) // datetime.timedelta(microseconds=1)


# ---------------------------------------------------------------------------
# q_dedup_paragraphs — global-first keeper election by hand
# ---------------------------------------------------------------------------


def test_dedup_paragraphs_matches_literal_walk(spark):
    boiler = (
        "subscribe to our newsletter for updates",
        "all rights reserved by the site owner",
        "click here to accept cookies and continue",
    )
    paras = []  # (doc_id, para_idx, para)
    for r in _rows("documents", ["doc_id", "text"]):
        t = r["text"]
        for idx, p in enumerate((t[:60], boiler[r["doc_id"] % 3], t[60:120])):
            if p.strip():
                paras.append((r["doc_id"], idx, p))
    first: dict[str, tuple[int, int]] = {}
    for did, idx, p in sorted(paras):
        norm = re.sub(r"\s+", " ", p.strip().lower())
        if norm not in first:
            first[norm] = (did, idx)
    expected: dict[int, tuple[int, int, str]] = {}
    per_doc = defaultdict(list)
    for did, idx, p in paras:
        per_doc[did].append((idx, p))
    for did, items in per_doc.items():
        items.sort()
        kept = [
            p
            for idx, p in items
            if first[re.sub(r"\s+", " ", p.strip().lower())] == (did, idx)
        ]
        expected[did] = (len(items), len(kept), "\n".join(kept))
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.kept_text)
        for r in _run(spark, "q_dedup_paragraphs")
    }
    assert got == expected
    assert any(v[1] < v[0] for v in expected.values())  # boiler deduped


# ---------------------------------------------------------------------------
# q_text_pii_redact — staged PII + three-pass scrub by hand
# ---------------------------------------------------------------------------


def test_pii_redact_matches_literal_walk(spark):
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\b555-[0-9]{4}\b")
    ipv4 = re.compile(r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")
    expected = {}
    for r in _rows("documents", ["doc_id", "text"]):
        i = r["doc_id"]
        staged = (
            r["text"]
            + f" contact user{i}@mail.example.com or call 555-0"
            + str(i % 1000).rjust(3, "0")
            + f" node 10.{i % 200}.{(i * 7) % 250}.25 end"
        )
        red = ipv4.sub(
            "<IP>", phone.sub("<PHONE>", email.sub("<EMAIL>", staged))
        )
        expected[i] = (
            len(email.findall(staged)),
            len(phone.findall(staged)),
            len(ipv4.findall(staged)),
            red,
        )
    got = {
        r.doc_id: (r.n_emails, r.n_phones, r.n_ips, r.redacted)
        for r in _run(spark, "q_text_pii_redact")
    }
    assert got == expected
    assert all(v[0] >= 1 and v[1] >= 1 and v[2] >= 1 for v in expected.values())


# ---------------------------------------------------------------------------
# q_events_time_to_convert — first-view latency histogram by hand
# ---------------------------------------------------------------------------


def test_time_to_convert_matches_literal_walk(spark):
    per_user = defaultdict(list)
    for r in _rows("events", ["event_id", "user_id", "ts", "event_type"]):
        per_user[r["user_id"]].append(r)
    lats = []
    for evs in per_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        first_view = None
        for r in evs:
            if r["event_type"] == "view":
                u = _us(r["ts"])
                if first_view is None or u < first_view:
                    first_view = u
            if r["event_type"] == "purchase" and first_view is not None:
                lats.append(_us(r["ts"]) - first_view)
    n = len(lats)
    hist = Counter(lat // 60_000_000 for lat in lats)
    cum = 0
    median = p90 = None
    for m in sorted(hist):
        cum += hist[m]
        if median is None and cum * 2 >= n:
            median = m
        if p90 is None and cum * 10 >= n * 9:
            p90 = m
    expected = (n, sum(lats) // n, median, p90, max(hist))
    out = _run(spark, "q_events_time_to_convert")
    assert len(out) == 1
    r = out[0]
    assert (
        r.n_conversions,
        r.mean_latency_us,
        r.median_latency_min,
        r.p90_latency_min,
        r.max_latency_min,
    ) == expected
    assert n > 0


# ---------------------------------------------------------------------------
# q_embedding_cluster_purity — quantized argmin + majority by hand
# ---------------------------------------------------------------------------


def test_cluster_purity_matches_literal_walk(spark):
    emb = _rows("embeddings", ["vec_id", "label", "embedding"])
    qs = {
        r["vec_id"]: (
            r["label"],
            [math.floor(float(v) * 1_000_000) for v in r["embedding"]],
        )
        for r in emb
    }
    cents = {cid: qs[cid][1] for cid in range(8) if cid in qs}
    cell: Counter = Counter()
    for _, (label, q) in qs.items():
        best = min(
            (
                (sum((a - b) * (a - b) for a, b in zip(q, cq)), cid)
                for cid, cq in cents.items()
            )
        )
        cell[(best[1], label)] += 1
    expected = {}
    per_cid = defaultdict(list)
    for (cid, label), nn in cell.items():
        per_cid[cid].append((-nn, label))
    for cid, items in per_cid.items():
        n_members = sum(-negn for negn, _ in items)
        negn, label = min(items)
        expected[cid] = (
            n_members,
            label,
            -negn,
            (-negn) * 1_000_000 // n_members,
        )
    got = {
        r.cluster_id: (r.n_members, r.majority_label, r.n_majority, r.purity_e6)
        for r in _run(spark, "q_embedding_cluster_purity")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_expectations_orders — the seven checks recomputed by hand
# ---------------------------------------------------------------------------


def test_expectations_orders_matches_literal_walk(spark):
    orders = _rows(
        "orders",
        [
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            "o_totalprice",
            "o_orderstatus",
            "o_orderpriority",
        ],
    )
    cust = {r["c_custkey"] for r in _rows("customer", ["c_custkey"])}
    n = len(orders)
    nn_cust = sum(1 for r in orders if r["o_custkey"] is not None)
    nn_date = sum(1 for r in orders if r["o_orderdate"] is not None)
    keys = [r["o_orderkey"] for r in orders if r["o_orderkey"] is not None]
    d_key = len(set(keys))
    p_price = sum(
        1 for r in orders if 0 <= float(r["o_totalprice"]) <= 500000
    )
    p_status = sum(1 for r in orders if r["o_orderstatus"] in ("O", "F", "P"))
    pat = re.compile(r"^[1-3]-")
    p_prio = sum(1 for r in orders if pat.match(r["o_orderpriority"]))
    p_fk = sum(1 for r in orders if r["o_custkey"] in cust)

    def status(passed, extra=True):
        return "pass" if passed == n and extra else "fail"

    expected = {
        "complete_o_custkey": ("o_custkey", "completeness", n, nn_cust, status(nn_cust)),
        "complete_o_orderdate": ("o_orderdate", "completeness", n, nn_date, status(nn_date)),
        "unique_o_orderkey": (
            "o_orderkey",
            "uniqueness",
            n,
            d_key,
            "pass" if len(keys) == n and d_key == n else "fail",
        ),
        "range_o_totalprice": ("o_totalprice", "range", n, p_price, status(p_price)),
        "in_set_o_orderstatus": ("o_orderstatus", "set_membership", n, p_status, status(p_status)),
        "matches_o_orderpriority": ("o_orderpriority", "pattern", n, p_prio, status(p_prio)),
        "fk_o_custkey": ("o_custkey", "foreign_key", n, p_fk, status(p_fk)),
    }
    got = {
        r.constraint: (r["column"], r.kind, r.n_rows, r.n_passed, r.status)
        for r in _run(spark, "q_expectations_orders")
    }
    assert got == expected
    # the designed-to-fail branch really fails (priorities 4/5 exist)
    assert expected["matches_o_orderpriority"][4] == "fail"


# ---------------------------------------------------------------------------
# q_layout_retention_plan — TTL classes by hand
# ---------------------------------------------------------------------------


def test_retention_plan_matches_literal_walk(spark):
    cutoff = datetime.date(1996, 7, 15)
    parts = defaultdict(lambda: [0, 0])
    for r in _rows("orders", ["o_orderdate"]):
        d = r["o_orderdate"].date()
        cell = parts[d.replace(day=1)]
        cell[0] += 1
        cell[1] += 1 if d < cutoff else 0
    expected = {}
    for month, (n, exp) in parts.items():
        action = (
            "drop_partition" if exp == n else "rewrite" if exp > 0 else "keep"
        )
        expected[month] = (n, exp, action, (n - exp) * 1_000_000 // n)
    got = {
        r.part_month: (r.n_rows, r.n_expired, r.action, r.survivor_share_e6)
        for r in _run(spark, "q_layout_retention_plan")
    }
    assert got == expected
    actions = {v[2] for v in expected.values()}
    assert actions == {"drop_partition", "rewrite", "keep"}  # all classes live
