"""Round-15 twin-formula audit (VERDICT r14 #5) — the r10-vintage
closed forms whose only prior coverage was staged "laws" tests: each
test here re-derives the query from FIRST PRINCIPLES with a brute-force
Python walk over the raw parquet — per-row loops, plain dict/list
machinery, no shared code with the engine — and checks the engine's
full output exactly. Covers: zone-map pruning costing, vacuum planning
(independent reference-semantics route, not the closed form), centroid
drift, the trigram classifier confusion matrix, and the market-basket
walk re-run at the driver's grading SF (beyond the r14 sf0.001 walk).
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
SF01 = "/root/testdata/sf0.01"


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


# ---------------------------------------------------------------------------
# q_layout_file_prune_stats — zone-map pruning costed by literal walk
# ---------------------------------------------------------------------------


def test_file_prune_stats_matches_literal_manifest_walk(spark):
    """Both layouts' manifests rebuilt row-by-row: bucket every order
    into its synthetic file, track per-file min/max/count/match, apply
    the envelope-overlap rule (max >= lo AND min < hi) by hand, and
    compare all six report columns for both layouts exactly."""
    lo = datetime.datetime(1998, 1, 1)
    hi = datetime.datetime(1998, 7, 1)
    orders = _rows("orders", ["o_orderkey", "o_orderdate"])

    def walk(file_key):
        files = defaultdict(lambda: [0, 0, None, None])  # n, match, mn, mx
        for r in orders:
            d = r["o_orderdate"]
            f = files[file_key(r)]
            f[0] += 1
            f[1] += 1 if lo <= d < hi else 0
            f[2] = d if f[2] is None or d < f[2] else f[2]
            f[3] = d if f[3] is None or d > f[3] else f[3]
        scanned = {k for k, f in files.items() if f[3] >= lo and f[2] < hi}
        return (
            len(files),
            len(scanned),
            sum(f[0] for f in files.values()),
            sum(f[0] for k, f in files.items() if k in scanned),
            sum(f[1] for f in files.values()),
        )

    expected = {
        "keyrange": walk(lambda r: r["o_orderkey"] // 512),
        "datepart": walk(
            lambda r: (r["o_orderdate"].year, r["o_orderdate"].month)
        ),
    }
    got = {
        r.layout: (
            r.n_files,
            r.files_scanned,
            r.total_rows,
            r.rows_scanned,
            r.rows_matching,
        )
        for r in _run(spark, "q_layout_file_prune_stats")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_layout_vacuum_plan — deletability via the REFERENCE semantics
# ---------------------------------------------------------------------------


def test_vacuum_plan_matches_literal_snapshot_walk(spark):
    """Full literal twin at sf0.01 (the sf0.001 manifest never
    exercises the deletable branch): manifest rebuilt per file from the
    raw rows, lineage fields from the staging formulas, and deletable
    decided by ENUMERATING the retained snapshots and asking whether
    any still references the file (created_v <= v < deleted_v) — the
    independent route, not the query's deleted_v <= live_min closed
    form. Every output column compared per file."""
    orders = _rows("orders", ["o_orderkey", "o_totalprice"], sf=SF01)
    files = defaultdict(lambda: [0, 0])  # n_rows, mass_cents
    for r in orders:
        f = files[r["o_orderkey"] // 512]
        f[0] += 1
        f[1] += round(float(r["o_totalprice"]) * 100)
    lineage = {}
    for fid, (n, mass) in files.items():
        created = fid % 8
        deleted = created + 1 + fid % 4 if fid % 3 == 0 else None
        lineage[fid] = (n, mass, created, deleted)
    vmax = max(
        max(c, d if d is not None else c)
        for _, _, c, d in lineage.values()
    )
    live_min = vmax - 3 + 1
    expected = {}
    for fid, (n, mass, created, deleted) in lineage.items():
        referenced = any(
            created <= v and (deleted is None or v < deleted)
            for v in range(live_min, vmax + 1)
        )
        expected[fid] = (n, mass, created, deleted, live_min, 0 if referenced else 1)
    got = {
        r.file_id: (
            r.n_rows,
            r.mass_cents,
            r.created_v,
            r.deleted_v,
            r.live_min,
            r.deletable,
        )
        for r in _run(spark, "q_layout_vacuum_plan", sf=SF01)
    }
    assert got == expected
    assert 0 < sum(v[5] for v in expected.values()) < len(expected)


# ---------------------------------------------------------------------------
# q_embedding_centroid_drift — quantized integer co-moments by hand
# ---------------------------------------------------------------------------


def test_centroid_drift_matches_literal_quantized_walk(spark):
    """Per-label drift cosines recomputed from the raw embeddings:
    floor-quantize every component to micro-units, accumulate the
    per-label and global per-dim sums as exact Python ints, and
    assemble the cosine with the query's own parenthesization
    (double(dot) * 1e6 / sqrt(double(l2) * double(g2))) so the single
    float expression is evaluated identically."""
    emb = _rows("embeddings", ["label", "embedding"])
    s: dict[int, list[int]] = {}
    n_vecs: Counter = Counter()
    for r in emb:
        qv = [math.floor(float(v) * 1_000_000) for v in r["embedding"]]
        lab = r["label"]
        if lab not in s:
            s[lab] = [0] * len(qv)
        for i, q in enumerate(qv):
            s[lab][i] += q
        n_vecs[lab] += 1
    dims = len(next(iter(s.values())))
    g = [sum(s[lab][i] for lab in s) for i in range(dims)]
    g2 = sum(x * x for x in g)
    expected = {}
    for lab, vec in s.items():
        dot = sum(vec[i] * g[i] for i in range(dims))
        l2 = sum(x * x for x in vec)
        cos_e6 = math.floor(
            float(dot) * 1_000_000 / math.sqrt(float(l2) * float(g2))
        )
        expected[lab] = (n_vecs[lab], cos_e6)
    got = {
        r.label: (r.n_vecs, r.cos_e6)
        for r in _run(spark, "q_embedding_centroid_drift")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_lang_classify_confusion — train + score + argmax by hand
# ---------------------------------------------------------------------------


def test_lang_classify_confusion_matches_literal_walk(spark):
    """The whole classifier re-run in pure Python over the raw docs:
    trigram extraction (lowercase, [a-z ]{3} filter), per-language
    top-16 profile (count desc, trigram asc), integer dot-product
    scoring, argmax with lang-asc tie-break, 'unknown' for docs whose
    trigrams miss every profile — then the (actual, predicted)
    confusion matrix compared cell-by-cell."""
    tri_ok = re.compile(r"^[a-z ]{3}$")
    docs = [
        r
        for r in _rows("documents", ["doc_id", "lang", "text"])
        if len(r["text"]) >= 3
    ]
    doc_tri: dict[int, Counter] = {}
    lang_of: dict[int, str] = {}
    for r in docs:
        t = r["text"].lower()
        grams = [
            t[i : i + 3]
            for i in range(len(t) - 2)
            if tri_ok.match(t[i : i + 3])
        ]
        doc_tri[r["doc_id"]] = Counter(grams)
        lang_of[r["doc_id"]] = r["lang"]

    lang_tri: dict[str, Counter] = defaultdict(Counter)
    for did, cnts in doc_tri.items():
        lang_tri[lang_of[did]].update(cnts)
    profile: dict[str, dict[str, int]] = {}
    for lang, cnts in lang_tri.items():
        top = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
        profile[lang] = dict(top)

    confusion: Counter = Counter()
    for did, cnts in doc_tri.items():
        scores = {
            model: sum(c * prof[tri] for tri, c in cnts.items() if tri in prof)
            for model, prof in profile.items()
        }
        scores = {m: sc for m, sc in scores.items() if sc > 0}
        if scores:
            predicted = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        else:
            predicted = "unknown"
        confusion[(lang_of[did], predicted)] += 1

    got = {
        (r.lang, r.predicted): r.n_docs
        for r in _run(spark, "q_text_lang_classify_confusion")
    }
    assert got == dict(confusion)


# ---------------------------------------------------------------------------
# q_orders_market_basket — the r14 walk re-run at the grading SF
# ---------------------------------------------------------------------------


def test_market_basket_matches_literal_walk_at_grading_sf(spark):
    """Beyond the r14 sf0.001 walk: the same literal pair enumeration
    at sf0.01 — the SF the driver grades at, with 10x the baskets, so
    the support>=3 frontier and the top-20 boundary are exercised on
    the graded output itself. Also pins that the top-20 sort key
    (n_ab desc, part_a, part_b) is collision-free BY CONSTRUCTION
    (pair keys unique), so the LIMIT boundary can never be
    nondeterministic."""
    li = _rows("lineitem", ["l_orderkey", "l_partkey"], sf=SF01)
    items = {(r["l_orderkey"], r["l_partkey"]) for r in li}
    baskets = defaultdict(set)
    for ok, pk in items:
        baskets[ok].add(pk)
    n_orders = len(baskets)
    part_n = Counter(pk for _, pk in items)
    pair_n: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_n[(a, b)] += 1
    cands = sorted(
        ((ab, n) for ab, n in pair_n.items() if n >= 3),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert len({ab for ab, _ in cands}) == len(cands)  # unique sort keys
    expected = {
        (a, b): (
            n,
            part_n[a],
            part_n[b],
            n * n_orders * 1_000_000 // (part_n[a] * part_n[b]),
        )
        for (a, b), n in cands[:20]
    }
    got = {
        (r.part_a, r.part_b): (r.n_ab, r.n_a, r.n_b, r.lift_e6)
        for r in _run(spark, "q_orders_market_basket", sf=SF01)
    }
    assert got == expected
