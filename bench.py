#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full plan
execution, zero driver collect) after an untimed warmup run that absorbs
JVM/codegen warmup — the steady-state number is what a cluster would see.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the plans that
# stress shuffle/join/window/vector paths at scale.
HEADLINE = (
    "q_flagship_monthly_revenue",
    "q_agg_group_sum",
    "q_join_multi_star",
    "q_join_broadcast_dim",
    "q_window_rank_topn",
    "q_window_running_sum",
    "q_agg_count_distinct",
    "q_dedup_exact_hash",
    "q_text_tokenize_wordcount",
    "q_text_quality_score",
    "q_similarity_cosine_topk",
    "q_events_sessionize",
    "q_events_tumbling_window",
    "q_topk_orderby_limit",
    "q_builtin_charge",
)


def canary_sec(spark, runs: int = 3, warmup: bool = True) -> float:
    """Machine-speed canary (VERDICT r13 #2): a FIXED pure-JVM
    constant-work job — 50M-row range, xxhash64 per row, one sum.
    No I/O, no Python, no data dependence, whole-stage codegen
    throughout, so its time moves ONLY with the box (CPU speed, load,
    thermal state). Cross-round normalization: ratio = canary_rN /
    canary_rM; a per-query delta explained by that ratio (within its
    recorded spread) is box swing, not a plan change.

    r15 (VERDICT r14 #2): re-timed BEFORE EACH SECTION, not just once —
    the single leading canary missed r14's mid-run load ramp (analytics
    inflated ~1.7x while headline normalized perfectly). First call:
    warmup + min-of-3; later calls skip warmup (JVM already hot) and
    use min-of-2 (~0.3 s each)."""
    def job():
        # bit_xor, not sum: 50M hash longs overflow an ANSI sum
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS s"
        ).write.format("noop").mode("overwrite").save()

    if warmup:
        job()  # warmup (untimed)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        job()
        times.append(time.perf_counter() - t0)
    return min(times)


def spread_digits(spreads: dict[str, float]) -> str:
    """Per-query spreads as a fixed-width HEX-digit string for the tail
    budget: position i = i-th key in the dict's iteration order (the
    same order the matching *_per_query line prints), digit = max-min
    over the timed runs in DECISECONDS, ceil'd so the reported noise
    floor never understates, hex-encoded and capped at 'f' ('>=1.5 s').
    r15 (VERDICT r14 #2): r14's decimal cap of 9 pegged during the
    load ramp and hid how bad the swing really was — hex raises the
    ceiling 1.5x/char at the same one-char-per-query width, which is
    what lets all four sections fit the driver's 2000-char capture."""
    import math

    return "".join(
        format(min(15, math.ceil(round(s, 4) * 10)), "x")
        for s in spreads.values()
    )


def run_one(spark, fn, sf_dir: str, timed_runs: int = 2) -> tuple[float, float]:
    """Returns (min, max-min spread) over the timed runs. min-of-N damps
    GC/scheduler noise; the recorded spread distinguishes a real plan
    regression from a shared-box swing without a manual re-run (r6
    triaged three sub-second 'regressions' by hand — all noise)."""
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warmup (untimed)
    times = []
    for _ in range(timed_runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return min(times), max(times) - min(times)


def main() -> None:
    from datawarehouse1_spark import get_spark, registry
    from datawarehouse1_spark.schema_guard import check_testdata_schema

    # Named-diff drift warning (r4 lesson: events.ts re-encoded upstream and
    # the bench died 12 queries in with no artifact). Non-fatal: the
    # catalog's adaptive readers may still cope, so keep benching.
    for finding in check_testdata_schema(SF_DIR):
        print(f"[schema-drift] {finding}", file=sys.stderr)

    registry.load_all()
    spark = get_spark("datawarehouse1-bench")

    # Box-speed references: one canary re-timed immediately BEFORE each
    # section so a mid-run load ramp (r14's analytics inflation) is
    # caught, not just start-of-run state. ~1.2 s total for all four.
    # SPARK_GRAFT_BENCH_CANARY=0 skips (ADVICE r14: quick partial runs
    # with every section disabled shouldn't pay 4x 50M-row jobs).
    canaries: dict[str, float] = {}
    canary_on = os.environ.get("SPARK_GRAFT_BENCH_CANARY", "1") != "0"

    def time_canary(tag: str) -> None:
        if canary_on:
            canaries[tag] = round(
                canary_sec(spark, runs=2 if canaries else 3, warmup=not canaries),
                4,
            )

    time_canary("h")

    # Per-query isolation: one crashing query must not zero the whole
    # artifact (r4: a mid-list failure left BENCH_r04 as a bare stack
    # trace with no number). Failures are recorded by name and the JSON
    # line is ALWAYS printed.
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        try:
            best, spread = run_one(
                spark, registry.QUERIES[name], SF_DIR, timed_runs=3
            )
            timings[name] = round(best, 4)
            spreads[name] = round(spread, 4)
        except Exception as ex:  # noqa: BLE001 - record and keep benching
            errors[name] = f"{type(ex).__name__}: {ex}".split("\n")[0][:300]
            print(f"[bench-error] {name}: {errors[name]}", file=sys.stderr)

    # TPC-H canon: tracked per-query so plan regressions in the most
    # complex joins (Q8's 8-way star, Q21's conditional count-distinct)
    # are visible round-over-round (VERDICT r5 "Next round" #4). Kept
    # OUT of "value"/"queries" so the headline total stays comparable to
    # the r1 baseline; warmup + min-of-2 each (r7: single timed runs made
    # q4 swing +22% on pure noise and cost a manual triage — one extra
    # run per query buys the noise floor down). SPARK_GRAFT_BENCH_TPCH=0
    # skips.
    tpch: dict[str, float] = {}
    tpch_spread: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_TPCH", "1") != "0":
        time_canary("t")
        for name in sorted(n for n in registry.QUERIES if n.startswith("q_tpch_")):
            try:
                best, spread = run_one(
                    spark, registry.QUERIES[name], SF_DIR, timed_runs=2
                )
                tpch[name] = round(best, 4)
                tpch_spread[name] = round(spread, 4)
            except Exception as ex:  # noqa: BLE001 - record and keep benching
                errors[name] = f"{type(ex).__name__}: {ex}".split("\n")[0][:300]
                print(f"[bench-error] {name}: {errors[name]}", file=sys.stderr)

    # LLM-pipeline battery: the dedup/ANN/curation operators are graded
    # as first-class components, so their plan regressions need the same
    # round-over-round visibility as TPC-H (the r6 minhash fix — 62 s →
    # 2.8 s from the shingle zip_with rewrite + signature checkpoint —
    # was found exactly this way). Warmup + min-of-2 each; kept OUT
    # of the headline total. SPARK_GRAFT_BENCH_LLM=0 skips.
    LLM = (
        "q_dedup_minhash_lsh",
        "q_dedup_simhash_neardup",
        "q_semantic_dedup_corpus",
        "q_dedup_paragraphs",
        "q_similarity_lsh_topk",
        # r12: the IVF demo now trains its coarse quantizer per run
        # (recall 0.525 -> 0.82 at sf0.1, +~3 s KMeans — compare
        # per-query, not llm_total)
        "q_similarity_ivf_topk",
        "q_text_pii_redact",
        "q_text_bpe_token_count",
        "q_curation_pack_chunks",
        "q_llm_pipeline_packed",
        "q_sample_hash_mixture",
        "q_text_bigram_novelty",
        "q_bpe_learn_merges",
        "q_curation_gopher_rules",
        "q_curation_quality_verdict",
        "q_dedup_minhash_incremental",
        # r9: the non-text dedup tiers + the unicode tier join the
        # section (llm_total grows — compare r9 per-query, not totals)
        "q_dedup_image_dhash",
        "q_dedup_audio_fingerprint",
        "q_dedup_video_temporal",
        "q_dedup_unicode_normalize",
        # r10: the vector Gram/covariance path and the containment
        # dedup tier (llm_total grows again — compare per-query)
        "q_embedding_covariance_exact",
        "q_dedup_containment_subset",
        # r10 batch 10: the winnowing fingerprint tier and the
        # boilerplate report (llm_total grows again — compare per-query)
        "q_dedup_winnowing_fingerprint",
        "q_curation_boilerplate_snippets",
    )
    llm: dict[str, float] = {}
    llm_spread: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_LLM", "1") != "0":
        time_canary("l")
        for name in LLM:
            try:
                best, spread = run_one(
                    spark, registry.QUERIES[name], SF_DIR, timed_runs=2
                )
                llm[name] = round(best, 4)
                llm_spread[name] = round(spread, 4)
            except Exception as ex:  # noqa: BLE001 - record and keep benching
                errors[name] = f"{type(ex).__name__}: {ex}".split("\n")[0][:300]
                print(f"[bench-error] {name}: {errors[name]}", file=sys.stderr)

    # Analytics battery (VERDICT r12 #5): the r10-r12 analytics surface
    # had NO per-query bench visibility — a plan regression in any of
    # them was invisible between rounds. These are the measured most
    # expensive non-headline/non-TPC-H/non-LLM queries at sf0.1 (full
    # single-pass ranking, r13), re-timed per round. Warmup + min-of-2;
    # kept OUT of the headline total. SPARK_GRAFT_BENCH_ANALYTICS=0
    # skips.
    ANALYTICS = (
        "q_graph_components_copurchase",
        "q_stats_spearman_rho",
        "q_join_bloom_prefilter",
        "q_orders_open_backlog",
        "q_reconcile_checksums",
        "q_orders_value_deciles",
        "q_split_ngram_leakage",
        "q_stats_kruskal_wallis",
        "q_partition_boundaries",
    )
    analytics: dict[str, float] = {}
    analytics_spread: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_ANALYTICS", "1") != "0":
        time_canary("a")
        for name in ANALYTICS:
            try:
                best, spread = run_one(
                    spark, registry.QUERIES[name], SF_DIR, timed_runs=2
                )
                analytics[name] = round(best, 4)
                analytics_spread[name] = round(spread, 4)
            except Exception as ex:  # noqa: BLE001 - record and keep benching
                errors[name] = f"{type(ex).__name__}: {ex}".split("\n")[0][:300]
                print(f"[bench-error] {name}: {errors[name]}", file=sys.stderr)

    # Rows-only accuracy metrics (VERDICT r11 #4): the 11 oracle=None
    # queries get only a rows>0 check from the driver's correctness
    # gate; this section re-measures each one's pytest-pinned accuracy
    # (LSH/IVF recall vs brute force, MinHash recall vs exact Jaccard,
    # incremental-equals-full parity, HLL max relative error, decode
    # success, PCA alignment) so the bench artifact carries quantitative
    # evidence. Runs at the driver's correctness SF (sf0.01) because the
    # exact baselines are intentionally O(n²)-adjacent — that's why the
    # queries they grade are the scale path. SPARK_GRAFT_BENCH_METRICS=0
    # skips.
    metrics: dict[str, float | None] = {}
    metrics_errors: dict[str, str] = {}
    metrics_sf_dir = os.environ.get(
        "SPARK_GRAFT_METRICS_SF_DIR", "/root/testdata/sf0.01"
    )
    if os.environ.get("SPARK_GRAFT_BENCH_METRICS", "1") != "0":
        # outer guard: this section runs AFTER every timing section but
        # BEFORE any output line — an import-time or setup crash here
        # would throw away ~10 min of timings with no artifact at all
        try:
            from datawarehouse1_spark.accuracy import rows_only_metrics

            metrics = rows_only_metrics(
                spark, metrics_sf_dir, errors=metrics_errors
            )
        except Exception as ex:  # noqa: BLE001 - record and keep printing
            metrics_errors["rows_only_metrics"] = (
                f"{type(ex).__name__}: {ex}".split("\n")[0][:300]
            )
        errors.update(metrics_errors)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        # max-min over the 3 timed runs per headline query: a "regression"
        # smaller than its spread is shared-box noise, not a plan change
        "spread": spreads,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else SF_DIR,
    }
    if canaries:
        # fixed pure-JVM constant-work time per section ("h"/"t"/"l"/
        # "a" = before headline/tpch/llm/analytics) — divide a
        # section's numbers by ITS canary ratio before comparing
        # across rounds (VERDICT r13 #2, per-section from r15)
        out["canary"] = canaries
    if tpch:
        out["tpch"] = tpch
        out["tpch_total"] = round(sum(tpch.values()), 4)
        # r8 (VERDICT r7 #8): section spreads recorded like the
        # headline's, so a per-query swing self-triages as noise/real
        out["tpch_spread"] = tpch_spread
    if llm:
        out["llm"] = llm
        out["llm_total"] = round(sum(llm.values()), 4)
        out["llm_spread"] = llm_spread
    if analytics:
        out["analytics"] = analytics
        out["analytics_total"] = round(sum(analytics.values()), 4)
        out["analytics_spread"] = analytics_spread
    if metrics:
        out["rows_only_metrics"] = metrics
        out["metrics_sf_dir"] = metrics_sf_dir
    if errors:
        out["errors"] = errors
        out["incomplete"] = True
    print(json.dumps(out))
    # The driver captures only the LAST 2000 stdout chars (measured:
    # BENCH_r12's tail is exactly 2000), so the FULL record above is for
    # local runs; the artifact-visible record is the compact lines
    # below, printed least-critical FIRST so an overflow truncates from
    # the top (tests/test_accuracy_metrics.py pins the worst-case sum of
    # these lines under the tail budget):
    #   1. analytics_per_query — the 9 most expensive analytics-surface
    #      timings (full names; VERDICT r12 #5)
    #   2. llm_per_query    — 26 LLM-battery timings, 2dp; keys drop
    #      "q_" AND the family segment (r13: the analytics line had to
    #      fit the fixed 2000-char capture) — full names in the LLM
    #      tuple above, e.g. "minhash_lsh" = q_dedup_minhash_lsh
    #   3. rows_only_metrics — accuracy evidence for the oracle=None
    #      queries (VERDICT r11 #4); key = "<query>:<metric>" with the
    #      same family-segment strip; legend in accuracy.py
    #   4. tpch_per_query   — TPC-H timings keyed "1".."22", 2dp
    #      (VERDICT r11 #7: previously cut off mid-record)
    #   5. headline_per_query — the 15 headline timings (keys family-
    #      stripped from r14, like every other line — full names in the
    #      HEADLINE tuple above)
    #   6. spread_ds        — per-query spreads for all four sections as
    #      fixed-width decisecond HEX-digit strings (see spread_digits;
    #      cap 'f' = >=1.5 s from r15 — the r14 decimal cap pegged at 9
    #      during the load ramp); key "a"/"l"/"t"/"h" = analytics/llm/
    #      tpch/headline, position i = i-th key of that section's
    #      per-query line (4dp spread dicts stay in the full record)
    #   7. totals           — the driver-parsed final line, carrying
    #      "canary" — from r15 a PER-SECTION dict {"h","t","l","a"} of
    #      fixed pure-JVM constant-work secs timed immediately before
    #      each section (VERDICT r14 #2: one leading canary missed the
    #      r14 mid-run load ramp): normalize a section's numbers by ITS
    #      canary_rN/canary_rM before calling a delta a regression; a
    #      per-query delta inside its spread digit is box noise
    #      either way.
    def _famstrip(key: str) -> str:
        """'q_dedup_minhash_lsh' -> 'minhash_lsh' (unique across each
        line's key set — pinned by tests/test_accuracy_metrics.py).
        Single-segment names ('q_foo') keep their full stripped name
        (ADVICE r14: the old [1] indexing crashed output emission AFTER
        all timings were gathered)."""
        return key[2:].split("_", 1)[-1]

    if analytics:
        print(
            json.dumps(
                {
                    "analytics_per_query": {
                        _famstrip(k): round(v, 2) for k, v in analytics.items()
                    }
                },
                separators=(",", ":"),
            )
        )
    print(
        json.dumps(
            {"llm_per_query": {_famstrip(k): round(v, 2) for k, v in llm.items()}},
            separators=(",", ":"),
        )
    )
    if metrics:
        # family-stripped keys in every compact line: the tail budget
        # is real (tests/test_accuracy_metrics.py pins the worst case)
        mline = {
            "rows_only_metrics": {_famstrip(k): v for k, v in metrics.items()}
        }
        if metrics_sf_dir != "/root/testdata/sf0.01":
            mline["metrics_sf_dir"] = metrics_sf_dir
        print(json.dumps(mline, separators=(",", ":")))
    print(
        json.dumps(
            {
                # guarded: the section collects every q_tpch_* name, so
                # a non-canonical one (no q<digits>) must fall back to
                # its suffix instead of AttributeError-ing AFTER all
                # queries ran but BEFORE the parseable tail printed
                "tpch_per_query": {
                    (
                        m.group(1)
                        if (m := re.match(r"q_tpch_q(\d+)", k))
                        else k[len("q_tpch_") :]
                    ): round(v, 2)
                    for k, v in tpch.items()
                }
            },
            separators=(",", ":"),
        )
    )
    print(
        json.dumps(
            {
                "headline_per_query": {
                    _famstrip(k): round(v, 2) for k, v in timings.items()
                }
            },
            separators=(",", ":"),
        )
    )
    print(
        json.dumps(
            {
                "spread_ds": {
                    "a": spread_digits(analytics_spread),
                    "l": spread_digits(llm_spread),
                    "t": spread_digits(tpch_spread),
                    "h": spread_digits(spreads),
                }
            },
            separators=(",", ":"),
        )
    )
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
    }
    for key in ("tpch_total", "llm_total"):
        if key in out:
            compact[key] = out[key]
    if canaries:
        compact["canary"] = canaries
    # r17 (VERDICT r16 #3, PERF contract): the driver parses ONLY the
    # last stdout line, so the per-query map must ride THIS line for
    # PERF's round-over-round table to populate — additions-only: every
    # existing key above is unchanged, methodology untouched. Keys are
    # the same family-stripped names (tpch: bare "1".."22") as the
    # per-section lines; a cross-section strip collision (none today —
    # pinned by tests/test_accuracy_metrics.py) falls back to the full
    # name rather than silently merging two queries. Because this line
    # alone now approaches the driver's 2000-char capture, it also
    # carries the rows-only accuracy metrics and the spread digits:
    # everything the artifact needs survives even when the (redundant)
    # per-section lines above truncate from the top.
    per_query: dict[str, float] = {}
    for section in (timings, llm, analytics):
        for k, v in section.items():
            sk = _famstrip(k)
            per_query[k if sk in per_query else sk] = round(v, 2)
    for k, v in tpch.items():
        m = re.match(r"q_tpch_q(\d+)", k)
        sk = m.group(1) if m else k[len("q_tpch_") :]
        per_query[k if sk in per_query else sk] = round(v, 2)
    if per_query:
        compact["per_query"] = per_query
    if metrics:
        compact["rows_only_metrics"] = {
            _famstrip(k): v for k, v in metrics.items()
        }
    compact["spread_ds"] = {
        "a": spread_digits(analytics_spread),
        "l": spread_digits(llm_spread),
        "t": spread_digits(tpch_spread),
        "h": spread_digits(spreads),
    }
    if errors:
        compact["incomplete"] = True
    print(json.dumps(compact, separators=(",", ":")))
    spark.stop()
    # non-zero exit still signals the driver, but the artifact above is
    # complete for every query that ran
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
