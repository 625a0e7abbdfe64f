"""Round-15 twin-formula audit — batch 10 (r18-window pre-insurance).

Literal raw-parquet walks: PMI collocations, RAKE keyphrases (the full
segment/degree/score pipeline in plain dicts), the sort-key advisor's
file-count algebra, the vocabulary coverage spectrum, the PR threshold
sweep, the bipartite degree distribution, and leave-one-out kNN label
agreement.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from datawarehouse1_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(name: str, columns=None, sf: str = SF):
    return pq.read_table(f"{sf}/{name}.parquet", columns=columns).to_pylist()


def _run(spark, qname: str, sf: str = SF):
    return registry.QUERIES[qname](spark, sf).collect()


def _word_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ---------------------------------------------------------------------------
# q_text_collocations_pmi — exact integer lift ranking by hand
# ---------------------------------------------------------------------------


def test_collocations_pmi_matches_literal_walk(spark):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for r in _rows("documents", ["text"]):
        toks = _word_tokens(r["text"])
        uni.update(toks)
        bi.update(" ".join(p) for p in zip(toks, toks[1:]))
    n_bi = sum(bi.values())
    scored = []
    for bg, c_xy in bi.items():
        if c_xy < 5:
            continue
        w1, w2 = bg.split(" ")
        lift = c_xy * n_bi * 1_000_000 // (uni[w1] * uni[w2])
        scored.append((bg, c_xy, uni[w1], uni[w2], lift))
    expected = sorted(scored, key=lambda t: (-t[4], t[0]))[:20]
    got = [
        (r.bigram, r.n_pair, r.n_w1, r.n_w2, r.lift_e6)
        for r in _run(spark, "q_text_collocations_pmi")
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_keyphrases_rake — the full RAKE pipeline by hand
# ---------------------------------------------------------------------------


def test_keyphrases_rake_matches_literal_walk(spark):
    stop = {
        "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
        "in", "is", "it", "of", "on", "or", "that", "the", "this", "to",
        "was", "we", "with", "you", "i",
    }
    # candidate phrases: maximal stopword-free runs, <= 4 words
    phrase_occs = []  # (phrase, member words)
    for r in _rows("documents", ["text"]):
        toks = _word_tokens(r["text"])
        run: list[str] = []
        for w in toks + ["the"]:  # sentinel stopword flushes the tail
            if w in stop:
                if run and len(run) <= 4:
                    phrase_occs.append(list(run))
                run = []
            else:
                run.append(w)
    deg: Counter = Counter()
    freq: Counter = Counter()
    for words in phrase_occs:
        for w in words:
            deg[w] += len(words)
            freq[w] += 1
    ws = {w: deg[w] * 1_000_000 // freq[w] for w in deg}
    best_score: dict[str, int] = {}
    n_occ: Counter = Counter()
    for words in phrase_occs:
        phrase = " ".join(words)
        sc = sum(ws[w] for w in words)
        n_occ[phrase] += 1
        best_score[phrase] = max(best_score.get(phrase, 0), sc)
    ranked = sorted(
        ((p, n_occ[p], best_score[p]) for p in n_occ),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    got = [
        (r.phrase, r.n_occurrences, r.score_e6)
        for r in _run(spark, "q_text_keyphrases_rake")
    ]
    assert got == ranked


# ---------------------------------------------------------------------------
# q_layout_sort_advisor — ceil-div file algebra by hand
# ---------------------------------------------------------------------------


def test_sort_advisor_matches_literal_walk(spark):
    epoch = None
    li = _rows(
        "lineitem", ["l_partkey", "l_suppkey", "l_orderkey", "l_shipdate"]
    )
    import datetime

    epoch = datetime.date(1970, 1, 1)
    R = 4096
    cands = {
        "l_partkey": lambda r: r["l_partkey"],
        "l_suppkey": lambda r: r["l_suppkey"],
        "l_orderkey": lambda r: r["l_orderkey"],
        "l_shipdate": lambda r: (r["l_shipdate"].date() - epoch).days,
    }
    expected = {}
    for label, key in cands.items():
        nv: Counter = Counter(key(r) for r in li)
        n_rows = sum(nv.values())
        n_distinct = len(nv)
        files_sum = sum((c + R - 1) // R + 1 for c in nv.values())
        nft = (n_rows + R - 1) // R
        expected[label] = (
            n_rows,
            n_distinct,
            nft,
            files_sum * 1_000_000 // n_distinct,
            max(0, 1_000_000 - files_sum * 1_000_000 // (n_distinct * nft)),
        )
    got = {
        r.col: (
            r.n_rows,
            r.n_distinct,
            r.n_files_total,
            r.avg_files_per_value_e6,
            r.prune_score_e6,
        )
        for r in _run(spark, "q_layout_sort_advisor")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_vocab_coverage — frequency spectrum + cumulative mass by hand
# ---------------------------------------------------------------------------


def test_vocab_coverage_matches_literal_walk(spark):
    tf: Counter = Counter()
    for r in _rows("documents", ["text"]):
        tf.update(_word_tokens(r["text"]))
    spectrum = defaultdict(lambda: [0, 0])
    for c in tf.values():
        cell = spectrum[c.bit_length() - 1]
        cell[0] += 1
        cell[1] += c
    total_mass = sum(m for _, m in spectrum.values())
    expected = {}
    cum_types = cum_mass = 0
    for lb in sorted(spectrum, reverse=True):
        n_types, mass = spectrum[lb]
        cum_types += n_types
        cum_mass += mass
        expected[lb] = (
            n_types,
            mass,
            cum_types,
            cum_mass * 1_000_000 // total_mass,
        )
    got = {
        r.count_log2: (r.n_types, r.mass, r.cum_types, r.coverage_ppm)
        for r in _run(spark, "q_text_vocab_coverage")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_quality_pr_threshold_sweep — confusion counts at 9 thresholds
# ---------------------------------------------------------------------------


def test_pr_threshold_sweep_matches_literal_walk(spark):
    docs = _rows("documents", ["n_chars", "lang"])
    pos = sum(1 for r in docs if (r["lang"] or "") == "en")
    expected = {}
    for k in range(9):
        tp = sum(
            1
            for r in docs
            if min(r["n_chars"] // 1024, 8) >= k and (r["lang"] or "") == "en"
        )
        fp = sum(
            1
            for r in docs
            if min(r["n_chars"] // 1024, 8) >= k and (r["lang"] or "") != "en"
        )
        expected[k * 1024] = (
            tp,
            fp,
            pos - tp,
            tp * 1_000_000 // (tp + fp) if tp + fp else None,
            tp * 1_000_000 // pos if pos else None,
            2 * tp * 1_000_000 // (tp + fp + pos) if tp + fp + pos else None,
        )
    got = {
        r.threshold_chars: (
            r.tp,
            r.fp,
            r.fn,
            r.precision_ppm,
            r.recall_ppm,
            r.f1_ppm,
        )
        for r in _run(spark, "q_quality_pr_threshold_sweep")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_graph_degree_distribution — bipartite degrees by hand
# ---------------------------------------------------------------------------


def test_degree_distribution_matches_literal_walk(spark):
    cust_of = {
        r["o_orderkey"]: r["o_custkey"]
        for r in _rows("orders", ["o_orderkey", "o_custkey"])
    }
    edges = {
        (r["l_suppkey"], cust_of[r["l_orderkey"]])
        for r in _rows("lineitem", ["l_suppkey", "l_orderkey"])
    }
    deg: Counter = Counter(s for s, _ in edges)
    hist = defaultdict(lambda: [0, None, None, 0])
    for d in deg.values():
        cell = hist[d.bit_length() - 1]
        cell[0] += 1
        cell[1] = d if cell[1] is None or d < cell[1] else cell[1]
        cell[2] = d if cell[2] is None or d > cell[2] else cell[2]
        cell[3] += d
    expected = {lb: tuple(v) for lb, v in hist.items()}
    got = {
        r.deg_log2: (r.n_suppliers, r.min_degree, r.max_degree, r.n_edges)
        for r in _run(spark, "q_graph_degree_distribution")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_embedding_knn_label_agreement — leave-one-out 5-NN vote by hand
# ---------------------------------------------------------------------------


def test_knn_label_agreement_matches_literal_walk(spark):
    emb = [
        (r["vec_id"], r["label"], [float(v) for v in r["embedding"]])
        for r in _rows("embeddings", ["vec_id", "label", "embedding"])
    ]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    agree = defaultdict(lambda: [0, 0])
    for qid, qlabel, qv in emb:
        if qid >= 8:
            continue
        scored = sorted(
            (
                (-cos(qv, cv), nid, nlabel)
                for nid, nlabel, cv in emb
                if nid != qid
            )
        )[:5]
        votes: Counter = Counter(nl for _, _, nl in scored)
        maj = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        cell = agree[qlabel]
        cell[0] += 1
        cell[1] += maj == qlabel
    expected = {
        lbl: (n, a, a * 1_000_000 // n) for lbl, (n, a) in agree.items()
    }
    got = {
        r.label: (r.n_queries, r.n_agree, r.agree_ppm)
        for r in _run(spark, "q_embedding_knn_label_agreement")
    }
    assert got == expected
