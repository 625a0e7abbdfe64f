"""Round-7 hardening regressions (r6 ADVICE closures).

Each test pins an ADVICE item:
  * degenerate-document guards in the Gopher rule battery — empty and
    whitespace-only docs must produce the SAME (NULL-bearing) row from
    Spark and DuckDB instead of diverging on 0/0 semantics;
  * (atomic snapshot publish and apply_cdc duplicate-seq enforcement
    are pinned in test_snapshot_store.py / test_warehouse_ops.py).
"""

from __future__ import annotations

import duckdb
import pytest

from conftest import compare_query


@pytest.fixture()
def degenerate_docs_dir(spark, tmp_path):
    """A documents table whose rows exercise the 0-line / 0-token edge:
    empty text, whitespace-only text, and one normal doc (doc_id chosen
    per residue class so bullet/ellipsis/dup staging branches all run)."""
    rows = [
        # doc_id%4∈{0,1} fabricates a '- '/'...' line even from empty
        # text, so the truly-zero-lines docs use residues 2 and 3
        (2, "", "en", "synthetic", 0),
        # trim() strips ONLY spaces in both engines: a doc of pure
        # spaces has zero lines; one with \n/\t keeps a line but still
        # tokenizes to zero words (split on \s+) — cover both
        (3, "        ", "en", "synthetic", 8),
        (7, "   \n  \t ", "en", "synthetic", 8),
        (0, "word " * 40, "en", "synthetic", 200),  # bullet+dup branches
        (1, "tiny", "en", "synthetic", 4),  # ellipsis branch, short text
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_gopher_rules_degenerate_docs_match_oracle(spark, degenerate_docs_dir):
    """0-line and 0-token docs: frac_e6 / dup_line_frac_e6 /
    mean_word_len_e6 must be NULL (not an error, not inf) in BOTH
    engines, and gopher_keep must come out identical."""
    from datawarehouse1_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{degenerate_docs_dir}/documents.parquet/*.parquet')"
    )
    compare_query(
        spark,
        con,
        QUERIES["q_curation_gopher_rules"],
        ORACLES["q_curation_gopher_rules"],
        sf_dir=degenerate_docs_dir,
    )


def test_gopher_rules_degenerate_docs_null_not_error(spark, degenerate_docs_dir):
    """The empty doc's derived metrics are NULL and its verdict is a
    plain False (n_tokens=0 fails the band) — no ANSI divide/cast error
    surfaces at execution time."""
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    out = {
        r.doc_id: r
        for r in QUERIES["q_curation_gopher_rules"](
            spark, degenerate_docs_dir
        ).collect()
    }
    for doc_id in (2, 3):  # empty text / whitespace-only text
        empty = out[doc_id]
        assert empty.n_lines == 0 and empty.n_tokens == 0
        assert empty.bullet_frac_e6 is None
        assert empty.ellipsis_frac_e6 is None
        assert empty.dup_line_frac_e6 is None
        assert empty.mean_word_len_e6 is None
        assert empty.gopher_keep is False
    assert out[0].gopher_keep is not None  # normal doc still scored


def test_stratified_sample_scale_path_equivalence(spark):
    """The oversample-prefilter scale path must return EXACTLY the same
    rows as the naive per-stratum window (the k smallest md5 survive
    any prefilter keeping >= k rows), and small strata pass whole."""
    from datawarehouse1_spark.operators.sampling import stratified_sample

    d = spark.createDataFrame(
        [(i, "big" if i % 4 else "small") for i in range(400)],
        "doc_id long, lang string",
    )
    naive = stratified_sample(d, ("lang",), "doc_id", k=10)
    scale = stratified_sample(d, ("lang",), "doc_id", k=10, oversample=4)
    a = {tuple(r) for r in naive.collect()}
    b = {tuple(r) for r in scale.collect()}
    assert a == b and len(a) == 20


def test_stratified_sample_shortfall_raises(spark):
    """oversample so tight the prefilter starves a stratum: must raise,
    never silently return a short sample."""
    import pytest
    from datawarehouse1_spark.operators.sampling import stratified_sample

    d = spark.createDataFrame(
        [(i, "x") for i in range(500)], "doc_id long, lang string"
    )
    # deterministic starvation: md5 is fixed, and for ids 0..499 the
    # 190th-smallest hash fraction (0.38324) sits ABOVE the
    # oversample=1 cut of 190/500 = 0.38 — verified offline, so the
    # prefilter provably drops at least one winner
    with pytest.raises(RuntimeError, match="shortfall"):
        stratified_sample(d, ("lang",), "doc_id", k=190, oversample=1)


def test_minhash_incremental_equals_full_run(spark):
    """The incremental-equals-full law: pairs(history) ∪
    incremental(index(history), batch) must equal the full LSH run over
    history ∪ batch — same banding, same seed, disjoint ids. This is
    what makes the incremental path safe to ship: skipping the
    history×history quadrant loses nothing that wasn't already emitted
    when history's own batches arrived."""
    from pyspark.sql import functions as F

    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.operators.dedup import (
        build_minhash_index,
        minhash_lsh_incremental_pairs,
        minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents").select("doc_id", "text")
    history = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1).unionByName(
        d.filter(F.col("doc_id") % 6 == 0).select(
            (F.col("doc_id") + 100001).alias("doc_id"), "text"
        )
    )
    kw = dict(num_hashes=16, bands=4, shingle_n=3, jaccard_threshold=0.5)

    full = minhash_lsh_pairs(history.unionByName(batch), **kw)
    hist_only = minhash_lsh_pairs(history, **kw)
    index = build_minhash_index(
        history, num_hashes=16, bands=4, shingle_n=3
    )
    inc = minhash_lsh_incremental_pairs(index, batch, **kw)

    def canon(df):
        # full run orders pairs id_a<id_b; incremental orders new-first —
        # canonicalize to unordered pairs with the jaccard value
        return {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b), round(r.jaccard, 9))
            for r in df.collect()
        }

    assert canon(hist_only) | canon(inc) == canon(full)
    assert canon(inc), "staged cross-batch near-dups must produce pairs"
    # the quadrants are disjoint: nothing emitted twice
    assert not (canon(hist_only) & canon(inc))


def test_chunk_sliding_reconstruction_law(spark, tmp_path):
    """Every token appears in a chunk, in order: taking the first
    `stride` tokens of each chunk plus the remainder of the final chunk
    reconstructs the document exactly — no token lost or duplicated by
    the windowing arithmetic, including the short-doc (single partial
    window) and exact-boundary cases."""
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    size, stride = 64, 48
    docs = {
        1: "w " * 10,            # shorter than one window
        2: "tok " * 64,          # exactly one window
        3: "a " * 65,            # one token past the boundary
        4: " ".join(f"t{i}" for i in range(200)),  # several windows
    }
    rows = [(i, txt, "en", "synthetic", len(txt)) for i, txt in docs.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    out = QUERIES["q_curation_chunk_sliding"](spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk
    for doc_id, txt in docs.items():
        want = [t for t in txt.lower().split() if t]
        chunks = [by_doc[doc_id][i] for i in range(len(by_doc[doc_id]))]
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.split(" ")[:stride])
        rebuilt.extend(chunks[-1].split(" "))
        assert rebuilt == want, doc_id
        # overlap invariant: consecutive chunks share size-stride tokens
        for a, b in zip(chunks, chunks[1:]):
            assert a.split(" ")[stride:] == b.split(" ")[: size - stride]


def test_mixture_budget_missing_stratum_forces_zero(spark, tmp_path):
    """A TARGET language absent from the corpus makes the mixture
    unsatisfiable: T must come out 0 (not silently 'solved' over the
    present strata), the absent strata must appear with avail=0 as the
    binding constraint, and their sample rate is NULL (0/0)."""
    from datawarehouse1_spark.registry import QUERIES, load_all

    load_all()
    rows = [
        (1, "word " * 50, "en", "s", 250),
        (2, "mot " * 40, "fr", "s", 160),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    out = {r.lang: r for r in QUERIES["q_mixture_token_budget"](
        spark, str(tmp_path)
    ).collect()}
    assert set(out) == {"en", "zh", "de", "fr", "es"}  # every TARGET lang
    for lang in ("zh", "de", "es"):  # absent from the corpus
        assert out[lang].avail_tokens == 0
        assert out[lang].budget_cap == 0
        assert out[lang].binding is True
        assert out[lang].sample_rate_e6 is None
    for lang in ("en", "fr"):  # present but unusable: T = 0
        assert out[lang].avail_tokens > 0
        assert out[lang].allotted_tokens == 0
        assert out[lang].binding is False
