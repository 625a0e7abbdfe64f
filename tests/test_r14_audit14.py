"""Round-14 twin-formula audit (VERDICT r13 #6) — batch 14: the last
r9-vintage members with formula substance.

Includes a UNION-FIND twin for the iterative dedup-clusters operator
(a third independent fixpoint implementation beside Spark's min-label
propagation and DuckDB's recursive CTE), int8 quantization error with
the floor(+0.5) tie discipline, the power-of-two bucket ladder with
pad-waste, per-domain stats, and the bigram/token count reports.
"""

from __future__ import annotations

import math
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


def _alnum_toks(text) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _ws_toks(text) -> list[str]:
    return [t for t in re.split(r"\s+", (text or "").lower()) if t]


# ---------------------------------------------------------------------------
# q_dedup_clusters — union-find over literal Jaccard pairs
# ---------------------------------------------------------------------------


def test_dedup_clusters_match_union_find(spark):
    base = {
        r["doc_id"]: r["text"]
        for r in _rows("documents", ["doc_id", "text"])
        if r["doc_id"] < 40
    }
    staged = dict(base)
    for did, text in base.items():
        if did % 3 == 0:
            staged[did + 10000] = text + " zebra quill oxcart"
            staged[did + 20000] = text + " zebra quill oxcart jasper flint"
    sh = {}
    for did, text in staged.items():
        t = _ws_toks(text)
        s = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        if s:
            sh[did] = s
    parent = {d: d for d in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sh)
    members = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.1:
                members.add(a)
                members.add(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expected = {d: find(d) for d in members}
    got = {r.id: r.keeper for r in _run(spark, "q_dedup_clusters")}
    assert got == expected
    # non-vacuity: the staged triangles must form >2-member components
    assert any(
        sum(1 for k in expected.values() if k == kk) >= 3
        for kk in set(expected.values())
    )


# ---------------------------------------------------------------------------
# q_embedding_quantize_error — literal int8 symmetric quantization
# ---------------------------------------------------------------------------


def test_quantize_error_matches_literal_int8(spark):
    expected = {}
    for r in _rows("embeddings", ["vec_id", "label", "embedding"]):
        v = [float(x) for x in r["embedding"]]
        amax = max(abs(x) for x in v) if v else 0.0
        if amax == 0:
            err_e6 = 0
        else:
            scale = 127.0 / amax
            err = max(abs(x - math.floor(x * scale + 0.5) / scale) for x in v)
            err_e6 = math.floor(err * 1000000)
        expected[r["vec_id"]] = (
            r["label"],
            math.floor(amax * 1000000),
            err_e6,
        )
    got = {
        r.vec_id: (r.label, r.amax_e6, r.max_abs_err_e6)
        for r in _run(spark, "q_embedding_quantize_error")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_length_buckets — literal power-of-two ladder + pad waste
# ---------------------------------------------------------------------------


def test_length_buckets_match_literal_ladder(spark):
    ladder = (16, 32, 64, 128, 256, 512, 1024)
    agg = defaultdict(lambda: [0, 0])
    for r in _rows("documents", ["text"]):
        n = len(_alnum_toks(r["text"]))
        bucket = next((b for b in ladder if n <= b), 2048)
        agg[bucket][0] += 1
        agg[bucket][1] += n
    expected = {
        b: (n, s, (b * n - s) * 1_000_000 // (b * n))
        for b, (n, s) in agg.items()
    }
    got = {
        r.bucket: (r.n_docs, r.sum_tokens, r.pad_waste_e6)
        for r in _run(spark, "q_curation_length_buckets")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_curation_domain_stats — literal staged-URL domain walk
# ---------------------------------------------------------------------------


def test_domain_stats_match_literal_walk(spark):
    hosts = defaultdict(lambda: [0, set(), 0, set()])
    for r in _rows("documents", ["doc_id", "lang", "n_chars"]):
        did = r["doc_id"]
        host = f"site{did % 50}.example.com"  # lowercased, www-stripped
        page = str(did % 200)
        h = hosts[host]
        h[0] += 1
        h[1].add(page)
        h[2] += r["n_chars"]
        h[3].add(r["lang"])
    expected = {
        host: (
            n,
            len(pages),
            (n - len(pages)) * 1_000_000 // n,
            chars,
            len(langs),
        )
        for host, (n, pages, chars, langs) in hosts.items()
    }
    got = {
        r.host: (r.n_docs, r.n_pages, r.dup_share_e6, r.total_chars, r.n_langs)
        for r in _run(spark, "q_curation_domain_stats")
    }
    assert got == expected


# ---------------------------------------------------------------------------
# q_text_bigram_topk + q_text_token_histogram — literal counts
# ---------------------------------------------------------------------------


def test_bigram_topk_matches_literal_counts(spark):
    counts = Counter()
    for r in _rows("documents", ["text"]):
        t = _alnum_toks(r["text"])
        for i in range(len(t) - 1):
            counts[f"{t[i]} {t[i + 1]}"] += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.bigram, r.n) for r in _run(spark, "q_text_bigram_topk")]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == top
    assert set(got) == set(top)


def test_token_histogram_matches_literal_buckets(spark):
    agg = defaultdict(lambda: [0, 0])
    for r in _rows("documents", ["text"]):
        n = len(_alnum_toks(r["text"]))
        b = (n // 50) * 50
        agg[b][0] += 1
        agg[b][1] += n
    expected = {b: tuple(v) for b, v in agg.items()}
    got = {
        r.bucket_lo: (r.n_docs, r.total_tokens)
        for r in _run(spark, "q_text_token_histogram")
    }
    assert got == expected
