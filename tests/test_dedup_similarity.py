"""Approximate tiers validated against exact baselines: MinHash-LSH recall
vs exact Jaccard, SimHash collision behavior, LSH/IVF ANN recall vs brute
force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from datawarehouse1_spark.operators.similarity import ivf_topk, lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dupes(spark):
    d = table(spark, SF, "documents").select("doc_id", "text").filter("doc_id < 80")
    return d.unionByName(
        d.filter("doc_id < 20").select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )


def test_exact_dedup_removes_injected_copies(spark, docs_with_dupes):
    out = exact_dedup(docs_with_dupes)
    # every injected copy (doc_id >= 1000) must lose to its original
    assert out.filter("doc_id >= 1000").count() == 0
    assert out.count() == 80


def test_minhash_lsh_finds_exact_dupes(spark, docs_with_dupes):
    pairs = minhash_lsh_pairs(docs_with_dupes, jaccard_threshold=0.99).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(i, i + 1000) for i in range(20)}
    # exact duplicates have jaccard 1.0 -> identical signatures -> every
    # band collides; recall on true dupes must be 100%
    assert expected <= found


def test_minhash_recall_against_exact_jaccard(spark, docs_with_dupes):
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs_with_dupes, threshold=0.5).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs_with_dupes, jaccard_threshold=0.5).collect()
    }
    assert approx <= exact  # exact-verified candidates: zero false positives
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall:.2f} too low"


def test_simhash_groups_exact_dupes(spark, docs_with_dupes):
    out = simhash_dedup(docs_with_dupes)
    injected = out.filter("doc_id >= 1000").collect()
    assert all(not r.keeper for r in injected)  # original always wins (lower id)
    assert all(r.n_copies >= 2 for r in injected)


def test_lsh_ann_recall_vs_brute_force(spark):
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["q_similarity_cosine_topk"](spark, SF).collect()
    emb = table(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 8")
    approx = lsh_topk(emb, queries, k=5, n_planes=4, n_tables=8).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    # multi-table LSH on random gaussian data (weak neighborhood structure):
    # it must recover a solid fraction of true top-5 neighbors
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.4, f"LSH ANN recall {recall:.2f}"
    assert all(r.rnk <= 5 for r in approx)


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    """Distance-1 multi-probe expands the candidate set strictly
    monotonically (every single-probe bucket is also probed), so its
    recall can never be lower — and on this corpus it is strictly
    higher."""
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["q_similarity_cosine_topk"](spark, SF).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    emb = table(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 8")

    def recall(probe_bits):
        got = lsh_topk(
            emb, queries, k=5, n_planes=4, n_tables=8,
            probe_bits=probe_bits,
        ).collect()
        pairs = {(r.query_id, r.neighbor_id) for r in got}
        return len(exact_pairs & pairs) / len(exact_pairs)

    r0, r4 = recall(0), recall(4)
    assert r4 >= r0, (r0, r4)
    assert r4 >= 0.9, f"multi-probe recall {r4:.2f}"


def test_ivf_topk_shape(spark):
    emb = table(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 8")
    out = ivf_topk(emb, queries, k=5).collect()
    assert out and all(r.query_id != r.neighbor_id for r in out)
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_ivf_ann_recall_vs_brute_force(spark):
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["q_similarity_cosine_topk"](spark, SF).collect()
    emb = table(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 8")
    approx = ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    # probing 4/16 lists scores ~25% of the corpus; on gaussian data the
    # true neighbors concentrate in the probed lists
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.4, f"IVF ANN recall {recall:.2f}"


def test_ivf_trained_centroids_recall_at_least_random(spark):
    """MLlib-KMeans-trained centroids behind the same ivf_assign
    interface: recall vs brute force must be >= the seeded-random
    baseline at equal nprobe (data-adapted lists concentrate true
    neighbors into fewer probes)."""
    from datawarehouse1_spark.operators.similarity import train_ivf_centroids
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["q_similarity_cosine_topk"](spark, SF).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    emb = table(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 8")

    def recall(centroids):
        approx = ivf_topk(
            emb, queries, k=5, n_centroids=16, nprobe=4, centroids=centroids
        ).collect()
        pairs = {(r.query_id, r.neighbor_id) for r in approx}
        return len(exact_pairs & pairs) / len(exact_pairs)

    cents = train_ivf_centroids(emb, n_centroids=16)
    assert cents.shape[0] == 16
    import numpy as np

    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, rtol=1e-6)

    r_random = recall(None)
    r_trained = recall(cents)
    assert r_trained >= r_random, (
        f"trained recall {r_trained:.2f} < random baseline {r_random:.2f}"
    )
    assert r_trained >= 0.4


def test_ivf_index_spill_boosts_recall_and_stays_topk_clean(spark):
    """VERDICT r12 #2: index-side boundary multi-assignment
    (index_spill=2) must (a) beat spill-free recall at equal nprobe on
    the near-orthogonal gaussian corpus, (b) keep the top-k contract
    clean — exactly one row per (query, rank), no duplicate neighbors
    even though a neighbor can be reachable through two probed lists."""
    from datawarehouse1_spark.operators.similarity import train_ivf_centroids
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["q_similarity_cosine_topk"](spark, SF).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    emb = table(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 8")
    cents = train_ivf_centroids(emb, n_centroids=16)

    def run(spill):
        return ivf_topk(
            emb, queries, k=5, n_centroids=16, nprobe=6,
            centroids=cents, index_spill=spill,
        ).collect()

    def recall(rows):
        pairs = {(r.query_id, r.neighbor_id) for r in rows}
        return len(exact_pairs & pairs) / len(exact_pairs)

    plain, spilled = run(1), run(2)
    assert recall(spilled) >= recall(plain), (recall(plain), recall(spilled))
    assert recall(spilled) >= 0.85, f"spilled recall {recall(spilled):.2f}"
    # top-k contract under duplicates: unique (query, neighbor), dense ranks
    seen = set()
    per_q = {}
    for r in spilled:
        assert (r.query_id, r.neighbor_id) not in seen
        seen.add((r.query_id, r.neighbor_id))
        per_q.setdefault(r.query_id, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_simhash_neardup_matches_brute_force(spark, docs_with_dupes):
    """Block-split banding has perfect recall at the stated distance by
    pigeonhole, and the exact-verify step kills all false positives — so
    the operator's output must EQUAL brute force over the fingerprints."""
    from datawarehouse1_spark.operators.dedup import (
        simhash,
        simhash_neardup_pairs,
        tokens,
    )

    # perturbed copies: one appended token flips only a few simhash bits
    perturbed = docs_with_dupes.filter("doc_id < 10").select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat("text", F.lit(" perturbation")).alias("text"),
    )
    corpus = docs_with_dupes.unionByName(perturbed)

    K = 8
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(corpus, max_hamming=K).collect()
    }

    fps = {
        r.doc_id: r.fp
        for r in corpus.select(
            "doc_id", simhash(tokens("text")).alias("fp")
        ).collect()
    }
    ids = sorted(fps)
    want = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= K
    }
    assert got == want
    # the injected exact dupes are all found at distance 0
    assert all(got.get((i, i + 1000)) == 0 for i in range(20))
    # at least one perturbed pair lands in (0, K] — non-vacuous near-dup
    assert any(0 < got[p] <= K for p in got if p[1] >= 2000)


def test_minhash_bucket_cap_drops_degenerate_buckets(spark, docs_with_dupes):
    """The degenerate-bucket guard: a mass-duplicate group (B identical
    signatures -> B(B-1)/2 pairs in every band) is dropped when over the
    cap, while ordinary near-dup pairs survive via their own buckets."""
    # 30 identical copies of doc 40 (which has no injected near-dup of
    # its own) -> a 31-strong degenerate bucket in every band
    blob = docs_with_dupes.filter("doc_id = 40").select("text")
    mass = (
        blob.crossJoin(spark.range(3000, 3030).withColumnRenamed("id", "doc_id"))
        .select("doc_id", "text")
    )
    corpus = docs_with_dupes.unionByName(mass)

    uncapped = minhash_lsh_pairs(corpus, jaccard_threshold=0.99)
    capped = minhash_lsh_pairs(corpus, jaccard_threshold=0.99, max_bucket_size=10)

    got_uncapped = {(r.id_a, r.id_b) for r in uncapped.collect()}
    got_capped = {(r.id_a, r.id_b) for r in capped.collect()}

    mass_ids = {40} | set(range(3000, 3030))
    mass_pairs_uncapped = {
        p for p in got_uncapped if p[0] in mass_ids and p[1] in mass_ids
    }
    mass_pairs_capped = {
        p for p in got_capped if p[0] in mass_ids and p[1] in mass_ids
    }
    assert len(mass_pairs_uncapped) >= 30 * 29 / 2  # quadratic blow-up is real
    assert not mass_pairs_capped  # ...and the cap removes it

    # the ordinary injected dupes (singleton buckets) are unaffected
    expected = {(i, i + 1000) for i in range(20)}
    assert expected <= got_capped


def test_dedup_clusters_from_pairs(spark):
    """Min-label propagation: chains collapse to the component minimum,
    disjoint components stay separate."""
    from datawarehouse1_spark.operators.dedup import dedup_clusters_from_pairs

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (needs >1 round), pair {10,11}, triangle {20,21,22}
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r.id: r.keeper for r in dedup_clusters_from_pairs(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_clusters_rejects_non_numeric_ids(spark):
    """Numeric-id contract: a string id that can't cast to long would
    become NULL and collapse every such row into one bogus null node —
    the operator must fail fast instead of producing wrong clusters."""
    import pytest as _pytest

    from datawarehouse1_spark.operators.dedup import dedup_clusters_from_pairs

    pairs = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c")], "id_a string, id_b string"
    )
    with _pytest.raises(ValueError, match="NULL after casting"):
        dedup_clusters_from_pairs(pairs).collect()

    # numeric strings are fine (cast succeeds for every endpoint)
    ok = spark.createDataFrame([("1", "2"), ("2", "3")], "id_a string, id_b string")
    got = {r.id: r.keeper for r in dedup_clusters_from_pairs(ok).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_dedup_clusters_composes_with_minhash(spark, docs_with_dupes):
    """End-to-end dedup: minhash pairs -> clusters -> keeper per injected
    copy is its original."""
    from datawarehouse1_spark.operators.dedup import dedup_clusters_from_pairs

    pairs = minhash_lsh_pairs(docs_with_dupes, jaccard_threshold=0.99)
    clusters = {
        r.id: r.keeper for r in dedup_clusters_from_pairs(pairs).collect()
    }
    for i in range(20):
        assert clusters[i + 1000] == i  # every copy keeps its original


def test_fuzzy_pairs_finds_insertions_across_lengths(spark):
    """Length-BAND blocking: a pure insertion changes the length, so
    equality blocking would miss it — 'Jon Smith'/'John Smith' must be
    found at k=1, and each pair exactly once (no band double-count)."""
    from datawarehouse1_spark.operators.dedup import fuzzy_pairs_blocked

    df = spark.createDataFrame(
        [(1, "Jon Smith"), (2, "John Smith"), (3, "Jane Smith"), (4, "Bob")],
        "id long, name string",
    )
    rows = fuzzy_pairs_blocked(df, "name", "id", max_edit_distance=1).collect()
    got = {(r.id_a, r.id_b): r.edit_distance for r in rows}
    assert got == {(1, 2): 1}  # insertion found; Jane is 2 edits from John


def test_dedup_clusters_raises_on_nonconvergence(spark):
    """A component whose diameter exceeds max_iter must raise, not
    return inconsistent keepers."""
    from datawarehouse1_spark.operators.dedup import dedup_clusters_from_pairs

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters_from_pairs(chain, max_iter=2)
    # and converges with rounds >= the component diameter (propagation
    # advances the min label one hop per round)
    ok = {r.id: r.keeper for r in dedup_clusters_from_pairs(chain, max_iter=12).collect()}
    assert set(ok.values()) == {0}


def test_minhash_rejects_nondivisor_bands(spark, docs_with_dupes):
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(docs_with_dupes, num_hashes=16, bands=5)


def test_simhash_multiprobe_same_pairs_fewer_candidates(spark, docs_with_dupes):
    """Multi-probe banding (n_blocks > k+1) must return EXACTLY the same
    verified pairs (pigeonhole recall is perfect for any valid block
    count) while generating no more — and on this corpus strictly fewer
    — pre-verification candidates, the quantity that prices the shuffle
    and the XOR-verify at scale."""
    from datawarehouse1_spark.operators.dedup import (
        _simhash_candidate_pairs,
        simhash_neardup_pairs,
    )

    perturbed = docs_with_dupes.filter("doc_id < 10").select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat("text", F.lit(" perturbation")).alias("text"),
    )
    corpus = docs_with_dupes.unionByName(perturbed)

    K = 3
    base = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup_pairs(corpus, max_hamming=K).collect()
    }
    multi = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup_pairs(
            corpus, max_hamming=K, n_blocks=8
        ).collect()
    }
    assert base == multi and base  # identical verified output, non-empty

    n_cand_base = _simhash_candidate_pairs(
        corpus, "text", "doc_id", K, K + 1, 42
    ).count()
    n_cand_multi = _simhash_candidate_pairs(
        corpus, "text", "doc_id", K, 8, 42
    ).count()
    assert n_cand_multi < n_cand_base, (n_cand_multi, n_cand_base)


def test_tune_nprobe_meets_recall_target(spark):
    """The nprobe autotuner returns the smallest doubling-sweep setting
    whose measured recall (vs the exact broadcast baseline) clears the
    target, and the recall curve is achievable within n_centroids."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.operators.similarity import (
        train_ivf_centroids,
        tune_nprobe,
    )
    from tests.conftest import SF_DIR

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id < 8")
    cents = train_ivf_centroids(emb, n_centroids=8)

    nprobe, recalls = tune_nprobe(
        emb, queries, target_recall=0.9, k=5, n_centroids=8, centroids=cents
    )
    assert 1 <= nprobe <= 8
    assert recalls[nprobe] >= 0.9 or nprobe == 8
    # sweep visited only doubling steps and stopped at the first success
    visited = sorted(recalls)
    assert visited == [2**i for i in range(len(visited))]
    assert all(recalls[n] < 0.9 for n in visited[:-1])


def test_tune_nprobe_rejects_unbounded_probe_set(spark):
    """VERDICT r10 #5: the autotuner collects O(|queries|·k) id pairs
    per sweep step, so its bounded-sample contract must be enforced,
    not assumed — a probe set above max_queries raises loudly instead
    of silently becoming a driver-side bottleneck."""
    import pytest as _pytest

    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.operators.similarity import tune_nprobe
    from tests.conftest import SF_DIR

    emb = table(spark, SF_DIR, "embeddings")
    with _pytest.raises(ValueError, match="max_queries"):
        tune_nprobe(emb, emb.limit(6), n_centroids=4, max_queries=5)
    # at the bound it still runs (the cap is inclusive)
    nprobe, recalls = tune_nprobe(
        emb, emb.limit(5), k=3, n_centroids=4, max_queries=5
    )
    assert nprobe in recalls


def test_contamination_shingle_join_salts_identically(spark, docs_with_dupes):
    """Skewed-shingle scenario: a phrase shared by many corpus docs makes
    one shingle bucket dominate the contamination equi-join. salted_join
    over the shingle key must return the same benchmark->corpus
    contamination counts as the plain join — the drop-in remedy when a
    hot shingle key outgrows what AQE's partition splitting can fix
    (AQE splits oversized partitions, not a single giant build key)."""
    from datawarehouse1_spark.operators.scale import salted_join

    # corpus: 40 docs all containing one hot phrase; benchmark: 2 docs
    # that also contain it
    hot = "the quick brown fox jumps"
    corpus = spark.range(40).select(
        (F.col("id") + 5000).alias("doc_id"),
        F.concat(F.lit(f"{hot} filler "), F.col("id").cast("string")).alias("text"),
    )
    bench = spark.createDataFrame(
        [(9000, f"{hot} alpha beta"), (9001, f"{hot} gamma delta")],
        "doc_id long, text string",
    )

    def shingles(df):
        toks = F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != F.lit("")
        )
        sh = F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                )
            ),
        )
        return df.select("doc_id", F.explode(sh).alias("sh")).distinct()

    b = shingles(bench).withColumnRenamed("doc_id", "bench_doc_id")
    c = shingles(corpus).withColumnRenamed("doc_id", "corpus_doc_id")

    plain = {
        (r.bench_doc_id, r.n)
        for r in b.join(c, "sh")
        .groupBy("bench_doc_id")
        .agg(F.count_distinct("corpus_doc_id").alias("n"))
        .collect()
    }
    salted = {
        (r.bench_doc_id, r.n)
        for r in salted_join(c, b, "sh", "sh", n_salts=4)
        .groupBy("bench_doc_id")
        .agg(F.count_distinct("corpus_doc_id").alias("n"))
        .collect()
    }
    assert plain == salted
    # the staged skew is real: both benchmark docs hit every corpus doc
    assert plain == {(9000, 40), (9001, 40)}


def test_tune_nprobe_clamps_to_non_power_of_two_centroids(spark):
    """Regression (ADVICE r5): with non-power-of-two n_centroids and an
    unattainable target the sweep must end AT n_centroids with a measured
    recall entry — the old doubling sweep skipped from 4 past 6 and
    returned an nprobe absent from the recall dict."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.operators.similarity import tune_nprobe
    from tests.conftest import SF_DIR

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id < 4")
    nprobe, recalls = tune_nprobe(
        emb, queries, target_recall=1.1, k=3, n_centroids=6
    )
    assert nprobe == 6
    assert nprobe in recalls  # the KeyError the advice flagged
    assert sorted(recalls) == [1, 2, 4, 6]
    # nprobe == n_centroids scans every list: recall is exact-complete
    assert recalls[6] == pytest.approx(1.0)


# ---------- product quantization (FAISS-style ADC + re-rank) ----------


def test_pq_recall_against_exact(spark):
    """Two-stage PQ search (ADC shortlist + exact re-rank) must reach
    recall@5 >= 0.8 vs the exact baseline at m=8, 16 codes, shortlist
    100 on the 500-vector corpus (measured 0.90)."""
    from datawarehouse1_spark.operators.similarity import (
        exact_topk,
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 20")
    books = train_pq_codebooks(emb, m=8, n_codes=16)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, queries, books, k=5, shortlist=100).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in exact_topk(emb, queries, k=5).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.8


def test_pq_encode_compression_and_determinism(spark):
    """Codes are m small indices (8 bytes vs 256 for 64-dim float32);
    training and encoding are seed-deterministic."""
    import numpy as np

    from datawarehouse1_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b1 = train_pq_codebooks(emb, m=8, n_codes=16)
    b2 = train_pq_codebooks(emb, m=8, n_codes=16)
    np.testing.assert_array_equal(b1, b2)
    rows = pq_encode(emb.limit(50), b1).collect()
    for r in rows:
        assert len(r.pq_codes) == 8
        assert all(0 <= c < 16 for c in r.pq_codes)
    again = pq_encode(emb.limit(50), b1).collect()
    assert [r.pq_codes for r in rows] == [r.pq_codes for r in again]


def test_pq_corpus_never_shuffles(spark):
    """The ADC scan is a mapInPandas over the corpus — the only
    exchanges are the tiny shortlist window and re-rank join."""
    from datawarehouse1_spark.operators.similarity import (
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, n_codes=16)
    df = pq_topk(emb, emb.filter("vec_id < 5"), books, k=3, shortlist=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_image_dhash_recall_and_separation(spark):
    """dHash law: (a) decode path — hashes computed from the actual BMP
    bytes equal the closed-form the oracle uses; (b) recall — every
    even/odd twin (one-pixel perturbation, <= 2 bit flips) is found by
    the banded join, i.e. the pigeonhole banding loses nothing at
    hamming <= 3; (c) separation — unrelated bases don't collapse into
    one giant near-dup cluster."""
    from datawarehouse1_spark.queries.multimodal_ext import q_dedup_image_dhash

    pairs = q_dedup_image_dhash(spark, "/root/testdata/sf0.001")
    got = {(r.left_id, r.right_id): r.hamming for r in pairs.collect()}

    # (b) all 200 staged twins present, each within the designed 2 bits
    for base in range(0, 400, 2):
        assert (base, base + 1) in got, f"missing twin pair {base}"
        assert got[(base, base + 1)] <= 2
    # (c) incidental (non-twin) collisions stay a small minority
    incidental = [p for p in got if p[1] != p[0] + 1]
    assert len(incidental) < 100, len(incidental)


def test_audio_fingerprint_recall_and_wav_roundtrip(spark):
    """Audio-fingerprint laws: (a) the WAV container round-trips — the
    fingerprint computed from decoded bytes equals the one computed
    straight from the generating PCM; (b) recall — every even/odd twin
    (one perturbed frame, <= 2 bit flips) survives the pigeonhole
    banding; (c) separation — no incidental pairs at this staging
    (measured min non-twin hamming is 15)."""
    import numpy as np

    from datawarehouse1_spark.multimodal.binary_columns import (
        synthesize_audio_fp_assets,
    )
    from datawarehouse1_spark.multimodal.codecs import decode_wav
    from datawarehouse1_spark.queries.multimodal_ext import (
        q_dedup_audio_fingerprint,
    )

    # (a) container exactness on a sample asset
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = (
        synthesize_audio_fp_assets(docs.filter("doc_id = 7"))
        .collect()[0]
    )
    samples, rate = decode_wav(bytes(row.payload))
    amp = np.rint(samples.astype(np.float64) * 32768.0).astype(np.int64)
    m = 2147483648
    t = np.arange(65 * 64, dtype=np.int64)
    expect = ((((t + 1) * (t + 1)) % m) * ((6 * 2654435761 + 40503) % m) % m >> 7) % 4001 - 2000
    expect[20 * 64 : 21 * 64] += 800  # doc 7 is the noisy twin of base 6
    np.testing.assert_array_equal(amp, expect)

    pairs = q_dedup_audio_fingerprint(spark, "/root/testdata/sf0.001")
    got = {(r.left_id, r.right_id): r.hamming for r in pairs.collect()}
    # (b) all 200 staged twins present within the designed 2 bits
    for base in range(0, 400, 2):
        assert (base, base + 1) in got, f"missing twin pair {base}"
        assert got[(base, base + 1)] <= 2
    # (c) nothing else pairs at this staging
    assert len(got) == 200, sorted(set(got) - {(b, b + 1) for b in range(0, 400, 2)})[:5]


def test_video_temporal_recall_and_container_exactness(spark):
    """Video-tier laws (mirrors the image/audio tiers, VERDICT r8 #1):
    (a) container exactness — the temporal signature computed through
    the FULL chain (MP4 demux -> mdat frame slice -> in-repo JPEG
    decode) equals the signature computed straight from the staged
    gray levels, because solid-gray frames at quality 96 round-trip
    bit-exactly; (b) recall — every even/odd twin (one re-rendered
    frame, <= 2 bit flips of the 64-bit delta-sign hash) survives the
    pigeonhole banding; (c) separation — unrelated bases don't
    collapse into a giant near-dup cluster."""
    import numpy as np

    from datawarehouse1_spark.multimodal.binary_columns import (
        synthesize_video_fp_assets,
        video_temporal_fingerprint,
    )
    from datawarehouse1_spark.queries.multimodal_ext import (
        q_dedup_video_temporal,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    # (a) decode-vs-formula exactness on one noisy twin (doc 7, base 6)
    row = video_temporal_fingerprint(
        synthesize_video_fp_assets(docs.filter("doc_id = 7"))
    ).collect()[0]
    m = 2147483648
    f = np.arange(65, dtype=np.int64)
    g = ((((f + 1) * (f + 1)) % m) * ((6 * 2654435761 + 40503) % m) % m >> 7) % 256
    g[20] += 96  # doc 7 re-renders frame 20 of its even twin
    g %= 256
    bits = (g[1:] > g[:-1]).astype(np.int64)
    lo = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
    hi = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
    assert (row.vfp_hi, row.vfp_lo) == (hi, lo)

    pairs = q_dedup_video_temporal(spark, "/root/testdata/sf0.001")
    got = {(r.left_id, r.right_id): r.hamming for r in pairs.collect()}
    # (b) all 100 staged twins present within the designed 2 bits
    for base in range(0, 200, 2):
        assert (base, base + 1) in got, f"missing twin pair {base}"
        assert got[(base, base + 1)] <= 2
    # (c) incidental (non-twin) collisions stay a small minority
    incidental = [p for p in got if p[1] != p[0] + 1]
    assert len(incidental) < 50, len(incidental)


def test_hash64_band_pairs_rejects_bad_split(spark):
    from datawarehouse1_spark.operators.dedup import hash64_band_pairs

    df = spark.range(1).select(
        F.col("id").alias("i"), F.lit(0).alias("h"), F.lit(0).alias("l")
    )
    with pytest.raises(ValueError):
        hash64_band_pairs(df, "i", "h", "l", max_hamming=2)


def test_hash64_incremental_equals_full(spark):
    """Law: incremental(index=history, batch) ∪ full(history) ==
    full(history ∪ batch), as unordered pair sets with identical
    hamming — the quadrant split loses and invents nothing. Uses the
    image-dHash staging (even/odd twins + incidental collisions), with
    the history/batch split cutting ACROSS twin pairs (doc 299|300) so
    the cross-quadrant path is exercised."""
    from datawarehouse1_spark.multimodal.binary_columns import (
        image_dhash,
        synthesize_dhash_assets,
    )
    from datawarehouse1_spark.operators.dedup import (
        hash64_band_pairs,
        hash64_band_pairs_incremental,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter("doc_id < 400")
    hashes = image_dhash(synthesize_dhash_assets(docs)).localCheckpoint()
    hist = hashes.filter("asset_id < 300")
    batch = hashes.filter("asset_id >= 300")

    full = {
        (r.left_id, r.right_id): r.hamming
        for r in hash64_band_pairs(
            hashes, "asset_id", "dhash_hi", "dhash_lo"
        ).collect()
    }
    hist_pairs = {
        (r.left_id, r.right_id): r.hamming
        for r in hash64_band_pairs(
            hist, "asset_id", "dhash_hi", "dhash_lo"
        ).collect()
    }
    incr = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.hamming
        for r in hash64_band_pairs_incremental(
            hist, batch, "asset_id", "dhash_hi", "dhash_lo"
        ).collect()
    }
    # disjoint quadrants: incremental never re-emits a history pair
    assert not set(incr) & set(hist_pairs)
    # every incremental pair touches the batch
    assert all(b >= 300 for _a, b in incr)
    combined = {**hist_pairs, **incr}
    assert combined == full


def test_tune_nprobe_with_index_spill_monotone(spark):
    """r14: the tuner measures at the index's spill level. At a fixed
    nprobe, spill>1 candidate sets are SUPERSETS of spill=1's (every
    primary assignment survives; boundary vectors gain extra lists),
    so measured recall is monotone non-decreasing in spill and the
    chosen nprobe is monotone non-increasing."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.operators.similarity import (
        train_ivf_centroids,
        tune_nprobe,
    )
    from tests.conftest import SF_DIR

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id < 8")
    cents = train_ivf_centroids(emb, n_centroids=8)
    np1, rec1 = tune_nprobe(
        emb, queries, target_recall=0.9, k=5, n_centroids=8,
        centroids=cents, index_spill=1,
    )
    np2, rec2 = tune_nprobe(
        emb, queries, target_recall=0.9, k=5, n_centroids=8,
        centroids=cents, index_spill=2,
    )
    assert np2 <= np1
    for n in set(rec1) & set(rec2):
        assert rec2[n] >= rec1[n]
