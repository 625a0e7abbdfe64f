"""Physical-plan regression tests: the scale posture is an invariant,
not an accident. Headline queries must keep their intended shapes (no
sort-merge join where a broadcast belongs, no cartesian products, no
Python eval in relational hot paths, bounded exchange counts), and
results must survive the join-strategy flip that happens at real scale
when a dimension outgrows the broadcast threshold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse1_spark import registry
from datawarehouse1_spark.catalog import table
from datawarehouse1_spark.operators.warehouse import (
    merge_hll_rollup,
    rollup_with_hll,
)
from tests.conftest import SF_DIR, rows_to_canon

registry.load_all()

# name -> max shuffle exchanges allowed (documented costs only)
EXCHANGE_BUDGET = {
    # per-order lineitem pre-agg + customer-month agg + final agg
    # (count-distinct stays Expand-free via the two-level rewrite)
    "q_flagship_monthly_revenue": 3,
    # per-order lineitem pre-agg (reused as the orderkey join side) +
    # final region/nation agg
    "q_join_multi_star": 2,
    "q_join_broadcast_dim": 1,
    "q_agg_group_sum": 1,
    "q_window_rank_topn": 1,
    "q_window_running_sum": 1,
    "q_dedup_exact_hash": 1,
    "q_topk_orderby_limit": 0,  # TakeOrderedAndProject, no full sort shuffle
    "q_join_salted_skew": 1,
    "q_join_asof": 2,  # right-side pre-dedup + window
    # r3 audit of the newly driver-fronted queries (sf0.1, local[8]):
    "q_tpch_q1_pricing_summary": 1,
    "q_tpch_q3_shipping_priority": 1,  # + broadcast joins
    "q_tpch_q6_forecast_revenue": 1,  # single-row agg exchange
    # 6-table star, filter-first: both region-shrunk orderkey sides
    # (statically sort-merge; AQE broadcasts the small side at low SF)
    # + final agg
    "q_tpch_q5_local_supplier": 3,
    "q_tpch_q10_returned_items": 1,
    "q_tpch_q14_promo_revenue": 1,  # broadcast part + single agg
    "q_tpch_q13_customer_distribution": 2,  # per-cust agg + histogram agg
    # r8 aggregate-carry shape: ONE lineitem agg shuffle; the qualifying
    # (orderkey, sum_qty) set joins orders directly (broadcast at test
    # SF) and customer joins one row per qualifying order
    "q_tpch_q18_large_volume_customer": 1,
    "q_tpch_q22_global_sales_opportunity": 2,  # 1-row threshold broadcast
    "q_agg_cube": 1,  # Expand + one shuffle, not 2^k scans
    "q_agg_grouping_sets": 1,
    "q_agg_percentile": 1,
    "q_set_intersect": 1,
    "q_set_except": 1,
    "q_array_agg_sorted": 1,
    "q_pivot_status_by_priority": 2,  # distinct-values pass + pivot agg
    "q_events_funnel": 1,
    "q_events_retention_weekly": 3,  # cohort + activity + join-agg
    "q_profile_columns": 2,  # ONE scan: multi-distinct Expand 2-level agg
    "q_upsert_partition_rollup": 1,
    "q_embedding_neardup": 0,  # broadcast-bounded, no shuffle
    "q_dedup_fuzzy_names": 1,  # broadcast block self-join locally; 1 at scale
    "q_sample_hash_mixture": 0,  # pure narrow filter
    "q_pandas_udf_scalar": 0,  # ArrowEvalPython, narrow
    "q_builtin_charge": 0,
    "q_multimodal_metadata": 0,
    # r4 audit of the completed TPC-H canon (sf0.001, local[8]):
    "q_tpch_q2_min_cost_supplier": 2,  # partkey window (+1 when distinct not merged)
    "q_tpch_q4_order_priority": 1,  # semi-join broadcast + priority agg
    # both pre-shrunk sides of the orderkey fact join (statically
    # sort-merge; AQE broadcasts the small orders side at low SF) +
    # final agg — each side carries ~(2/|nations|) of the naive volume
    "q_tpch_q7_volume_shipping": 3,
    "q_tpch_q8_market_share": 1,
    "q_tpch_q9_product_type_profit": 1,
    # partkey agg appears twice statically (threshold branch + output
    # branch share the subtree; exchange reuse collapses it at runtime)
    # + 1-row SinglePartition total
    "q_tpch_q11_important_stock": 3,
    "q_tpch_q12_shipping_priority_class": 1,
    "q_tpch_q15_top_supplier": 2,  # checkpointed revenue view + sort
    "q_tpch_q16_parts_supplier": 2,  # two-level distinct-count agg
    # r10 window rewrite: ONE exchange on l_partkey (bounded by the
    # brand selectivity) + the single-row final agg; the second
    # lineitem scan and join-back are gone
    "q_tpch_q17_small_quantity_revenue": 2,
    "q_tpch_q19_discounted_revenue": 1,
    "q_tpch_q20_part_promotion": 2,  # suppkey HAVING agg feeding semi join
    # r16 single-aggregation shape: ONE order-grain lineitem agg (the
    # EXISTS pair decorrelates into min/max supplier identities) + name
    # agg (the r8 pair-grain window pass and its extra exchange are gone)
    "q_tpch_q21_waiting_supplier": 2,
    # r8 curation pair: one canonical-key agg / one shard window; the
    # canonicalize / md5 stages are pure narrow string exprs
    "q_dedup_url_normalize": 1,
    "q_curation_shard_assign": 1,
    # bloom prefilter is narrow (literal-bitmap probes); only the exact
    # semi join can shuffle (broadcast at test SF)
    "q_join_bloom_prefilter": 1,
    # widen_if_narrow round-robin before the Python codec work
    "q_multimodal_flac_decode": 1,
    # funnel: first-occurrence hash window + single cumulative agg
    "q_curation_funnel_report": 2,
    # corpus window-count rides a window over the hash + per-doc agg
    "q_dedup_exact_substring": 2,
    "q_curation_topk_per_lang": 1,  # one lang-window shuffle
    "q_events_transition_matrix": 2,  # user window + tiny type² agg
    "q_heavy_hitters": 2,  # key agg + 1-row total broadcast; TakeOrdered top-N
    # r5 audit of the new battery (sf0.001, local[8]):
    "q_window_ntile_quartile": 1,  # one global sort
    "q_window_percent_rank": 1,
    "q_window_first_last": 1,  # one custkey window
    "q_window_moving_avg": 2,  # daily agg + window sort
    "q_stats_moments": 1,
    "q_stats_mode_deterministic": 2,  # (group,value) agg + group window
    "q_events_variant_extract": 1,
    "q_date_gapfill_months": 2,  # monthly agg + spine left join
    "q_events_hourly_heatmap": 1,
    "q_events_gap_histogram": 2,  # user window + bucket agg
    "q_events_dau_wau": 6,  # 2-level distinct + explode agg + dau agg + join
    "q_scd2_user_state": 1,  # both windows share the user_id exchange
    "q_rfm_segmentation": 2,  # custkey agg + shared global ntile sort
    "q_orders_pareto": 2,  # custkey agg + running-share sort
    "q_hierarchy_recursive_cte": 0,  # broadcast recursion at this size
    "q_text_bigram_topk": 1,  # bigram agg; top-20 is TakeOrdered
    "q_text_tfidf_topterms": 5,  # tf agg + df agg + join + doc window
    "q_text_contamination_overlap": 4,  # 2 distincts + hash join + agg
    "q_text_token_histogram": 1,
    "q_text_posexplode_tokens": 0,  # pure generator, narrow
    "q_text_repetition_score": 0,  # pure higher-order exprs, narrow
    "q_docs_length_percentiles": 1,
    "q_curation_pack_chunks": 1,  # one lang pack sort
    "q_docs_dup_rate_by_source": 2,  # two-level distinct-count agg
    "q_embedding_quantize_error": 0,  # pure higher-order exprs, narrow
    "q_embedding_norm_stats": 1,
    "q_llm_pipeline_packed": 2,  # fp window + lang pack sort
    # r6 audit of the new battery (sf0.001, local[8]):
    "q_dedup_paragraphs": 2,  # keeper election agg + per-doc reassembly
    "q_text_pii_redact": 0,  # narrow regex projection, pure codegen
    # one-pass suite (count_distinct 2-level agg = 2) + the FK pass
    # (distinct dim keys + the single fact-scan join-count = 2)
    "q_expectations_orders": 4,
    "q_unpivot_metrics": 2,  # custkey join + distinct-count agg; melt is narrow
    # daily agg appears twice statically (stats branch + output branch
    # share the subtree; exchange reuse collapses it) + 1-row stats agg
    "q_events_anomaly_days": 3,
    "q_hierarchy_sql_recursive": 1,  # recursion union + final per-doc agg
    "q_sketch_log_histogram": 1,
    "q_sketch_count_min": 1,
    "q_warc_extract_text": 1,
    # widen_if_narrow round-robin before the Python codec work (fires
    # only locally where the scan has fewer splits than cores)
    "q_multimodal_video_decode": 1,
    "q_multimodal_mp4_demux": 1,
    # r6 fourth-block audit (sf0.001, local[8]):
    "q_curation_gopher_rules": 0,  # pure higher-order exprs, narrow
    # change-batch keep-latest window + snapshot anti join; the
    # snapshot never re-partitions more than once
    "q_merge_cdc_apply": 2,
    # med pre-agg subtree appears in both the mad branch and the final
    # agg branch statically (exchange reuse collapses it at runtime)
    # + mad agg + final agg
    "q_stats_mad_outliers": 4,
    # r7 audit (sf0.001, local[8]): bigram-frequency window + per-doc
    # fold; the attribution join-back broadcasts the (small) novelty
    # side locally — at scale it degrades to one more doc_id exchange,
    # never to a corpus rescan per rule
    "q_curation_quality_verdict": 2,
    # one full-outer SMJ on the key: both snapshot sides exchange once
    # (bucketed/co-partitioned snapshots make it exchange-free)
    "q_cdc_extract_changes": 2,
    # one per-stratum window exchange; the md5 rank is narrow
    "q_sample_stratified_exact": 1,
    # per-lang token aggregate + the 5-row global-min window
    "q_mixture_token_budget": 2,
    # pure by-name union with NULL fill: no shuffle at all
    "q_schema_evolution_union": 0,
    # one global order-statistics aggregate; the 8-row explode is free
    "q_partition_boundaries": 1,
    # the change feed shuffles once on the key for the interval window;
    # the snapshot is never touched
    "q_scd2_from_cdc": 1,
    # ONE bucket-id equi-join (the whole point: never a nested loop);
    # locally the smaller exploded side broadcasts
    "q_join_interval_overlap": 1,
    # bin-count aggregate + the <=10-row TVD window
    "q_drift_tvd_report": 2,
    # narrow slice/transform + one explode: pure map-side
    "q_curation_chunk_sliding": 0,
    # r8 profiling audit (sf0.001, local[8]):
    # priority-bin aggregate + the <=5-row chi-square window
    "q_drift_chisq_report": 2,
    # ONE scan, one 1-row co-moment aggregate; the 6-pair matrix
    # unpivots from the single row
    "q_stats_corr_matrix": 1,
    # (doc,char) partial agg + per-doc agg — (doc,char,count) triples
    # shuffle, never text
    "q_text_char_gini": 2,
    # 256-row feature agg + its 1-partition totals window + per-doc
    # agg; the weight table comes back as a BroadcastExchange
    "q_curation_dsir_affinity": 3,
    # one grouped co-moment aggregate; fit math is narrow
    "q_stats_regression": 1,
    # one (xb, yb) cell aggregate; the Morton interleave is narrow
    # codegen arithmetic
    "q_layout_zorder_cells": 1,
    # 16-bit band equi-join (broadcasts locally) + the pair-dedup agg;
    # pixels never shuffle — only (band, hash halves) rows move
    "q_dedup_image_dhash": 1,
    # same hash64_band_pairs shape over the audio energy fingerprints;
    # waveforms never shuffle
    "q_dedup_audio_fingerprint": 1,
    # same hash64_band_pairs shape over the video temporal signatures;
    # containers/frames never shuffle — decode fans out inside the task
    "q_dedup_video_temporal": 1,
    # r9 curation audit (sf0.001, local[8]):
    # two-phase expand aggregate for the per-host count-distinct pair;
    # both shuffles carry (host, page, lang, n_chars) tuples only
    "q_curation_domain_stats": 2,
    # one narrow (n_tokens, bucket) projection + the <=8-row bucket agg
    "q_curation_length_buckets": 1,
    # ArrowEvalPython NFC normalizer (vectorized pandas UDF, never
    # BatchEvalPython) + ONE aggregate on the canonical key
    "q_dedup_unicode_normalize": 1,
    # both per-lang windows (cumsum + total) reuse ONE lang
    # hashpartitioning; only (doc_id, lang, n_chars, rk) tuples shuffle
    "q_sample_pps_systematic": 1,
    # (part, day) file aggregate + per-part pack window; the report
    # aggregate reuses the window partitioning
    "q_layout_compaction_plan": 2,
    # per-key count (the only unbounded exchange) + two bounded
    # exchanges over one-row-per-distinct-count-value data
    "q_profile_skew_report": 3,
    # EXIF marker walk + IFD parse inside mapInPandas; the one exchange
    # is widen_if_narrow's local repartition — bytes never shuffle wide
    "q_multimodal_exif_scan": 1,
    # tombstone feeds broadcast (2 BroadcastExchange); the two shuffles
    # are the domain-tombstone distinct + the per-source audit agg
    "q_curation_optout_takedown": 2,
    # the six-stage composed build: two dedup windows (host+page,
    # md5(text)) + the two-phase shard aggregate (count-distinct
    # expand); narrow tiers fuse into the scans around them
    "q_curation_master_pipeline": 4,
    # one count aggregate per side (the orderkey exchanges both sides
    # already pay) + the single-row summary; per-row data crosses only
    # its own count exchange
    "q_profile_join_cardinality": 3,
    # both row_number windows + the bar aggregate share ONE
    # (event_type, hour) exchange
    "q_events_resample_ohlc": 1,
    # (priority, month) monthly agg + the (priority) window — both over
    # monthly-rollup tuples only
    "q_window_dense_rank_peers": 2,
    # two-level CDF cumsum: per-value agg + in-bucket window + bucket
    # summary agg touch unbounded data (3); the remaining two are
    # single-partition exchanges over the <=40-row bucket summary only
    "q_drift_ks_report": 5,
    # -- r10 additions --
    # hash-distinct of train text-hashes + the hash equi-join + the
    # 3-row split aggregate; only (hash, split) tuples shuffle
    "q_split_train_holdout": 3,
    # (lang, term) count + per-lang rank window (the per-lang OLS sums
    # fold into the window's lang exchange) + the widen_if_narrow
    # repartition (taken only at small split counts; no-op at scale)
    "q_text_zipf_fit": 3,
    # (lang, trigram) count + per-lang top-16 window + the conditional
    # widen_if_narrow repartition; trigrams explode map-side and
    # partial-aggregate before the exchange
    "q_text_trigram_lang_profile": 3,
    # two manifest aggregates (one per layout) + two 1-row summary
    # aggregates over <=O(files) rows
    "q_layout_file_prune_stats": 4,
    # manifest aggregate + 1-row retention-horizon aggregate (joined
    # back as a broadcast, no manifest re-shuffle)
    "q_layout_vacuum_plan": 2,
    # first-order window on o_custkey + (cohort, age) aggregate
    "q_orders_cohort_ltv": 2,
    # all three windows share the single o_orderpriority partition
    "q_window_cume_dist": 1,
    # (user, day) distinct + per-user lag/min windows + day rollup
    "q_events_user_lifecycle": 3,
    # post-checkpoint: the 64-row global-centroid aggregate + the
    # 10-row per-label co-moment aggregate (the (label, dim) quantized
    # sum — the only exchange that sees per-row data — runs once
    # behind a localCheckpoint; its 1 exchange is pinned by the law
    # test in test_r10_hardening.py)
    "q_embedding_centroid_drift": 2,
    # post-checkpoint shuffles over the bounded per-doc trigram-count
    # table (the single wide explode runs once behind a localCheckpoint):
    # profile agg + rank window, per-doc score agg + argmax window, the
    # labeled left join, the |langs|² confusion agg (+ the conditional
    # widen_if_narrow repartition feeding the checkpointed explode)
    "q_text_lang_classify_confusion": 7,
    # (order, part) distinct + both self-join sides co-partition on
    # l_orderkey + pair agg + the 1-row totals agg; top-20 is
    # TakeOrderedAndProject, per-part counts broadcast
    "q_orders_market_basket": 5,
    # all six Welch moments fold into ONE partial-aggregated scan
    "q_stats_welch_ttest": 1,
    # one suppkey fact aggregate + the nation ranking window over the
    # bounded per-supplier table (dims broadcast)
    "q_supplier_scorecard": 2,
    # orderkey fact join (sides co-partition; AQE may broadcast at
    # test SF) + bucket aggregate; the share window rides the tiny
    # (priority, bucket) table
    "q_orders_ship_latency": 4,
    # (user, type) lag window + per-type aggregate
    "q_events_interarrival_rate": 2,
    # the rank window and the host aggregate share the host exchange
    "q_curation_domain_cap_apply": 1,
    # daily aggregate (the only exchange seeing event rows) + per-type
    # totals + the cumulative/argmax windows over the bounded
    # (type, day) table
    "q_events_cusum_changepoint": 4,
    # r10 batch 4: all three window stages + the per-user rollup share
    # ONE user-sorted exchange; + the 1-row totals aggregate
    "q_events_funnel_conversion": 2,
    # (user, day) distinct + the user window; the run grouping and the
    # best-run window REUSE the user partitioning
    "q_events_streak_longest": 2,
    # narrow 4x window explode before the shuffle; countDistinct
    # expands (window, type, user) then aggregates
    "q_events_hopping_window": 2,
    # r13 sweep-line shape: lineitem close agg + orders join side at
    # the orderkey fact grain, then THREE bounded-table exchanges (the
    # ~#months delta aggregate, the single-partition running sum over
    # that tiny table, the boundary-list distinct) — the BNLJ fan-out
    # of every order row to every boundary is gone
    "q_orders_open_backlog": 5,
    # custkey fact join (dims broadcast) + (region, month) aggregate;
    # the region co-moment rollup rides the bounded month table
    "q_orders_revenue_trend": 2,
    # one fact scan partial-aggregates to <=9 digit rows; the
    # total-over-window runs on that bounded table
    "q_stats_benford_first_digit": 2,
    # pure projection; the 1 is widen_if_narrow's repartition at test
    # SF (no-op at production split counts -> 0 exchanges)
    "q_text_readability_flesch": 1,
    # widen repartition (test-SF only) + (source, word) counts +
    # per-source rollup
    "q_text_hapax_ratio": 3,
    # map-side pair inline + (i,j) cell aggregate; the d-row marginal
    # aggregate appears once per broadcast side
    "q_embedding_covariance_exact": 3,
    # shingle equi-join (both exploded sides may shuffle at scale) +
    # pair aggregate; per-doc counts broadcast
    "q_dedup_containment_subset": 3,
    # one user-sorted window exchange + the tiny touch-type aggregate
    "q_events_attribution_last_touch": 2,
    # month aggregate (the only fact exchange) + the bounded ordered
    # window on the monthly table
    "q_orders_seasonality_decompose": 2,
    # post-checkpoint: word join reshuffles both bounded vocab sides +
    # the pair aggregate; sizes broadcast
    "q_text_source_vocab_jaccard": 3,
    # both snapshot sides shuffle on the key (full outer cannot
    # broadcast) + the 4-row class aggregate
    "q_join_full_outer_reconcile": 3,
    # visible plan is the broadcast join over the checkpointed
    # bounded triangle (the distinct + user window + triangle agg run
    # once, pre-checkpoint)
    "q_events_retention_triangle": 0,
    # close aggregate + orders co-partitioned join side + the <=5-row
    # priority aggregate
    "q_orders_fill_rate_sla": 2,
    # r13: bounds come from the checkpointed two-level rank table
    # (no nine-buffer percentile aggregate); the fact shuffles once to
    # the decile aggregate, share windows ride the 10-row table
    "q_orders_value_deciles": 3,
    # widen repartition (test-SF only) + (bigram) pair counts +
    # (token) head roll-up; TakeOrderedAndProject top-50
    "q_text_successor_diversity": 3,
    # one user-sorted lead window + the (path, user) distinct expand
    "q_events_path_trigrams": 2,
    # post-checkpoint: everything runs on the bounded (source, word)
    # count table — word-total agg + its join reshuffle + source
    # aggregates; token rows shuffle exactly once (pre-checkpoint)
    "q_text_source_divergence": 6,
    # post-checkpoint (fingerprints + counts both checkpointed): the
    # broadcast pair join + ONE pair aggregate; selection/distinct
    # exchanges run once pre-checkpoint (rule 12)
    "q_dedup_winnowing_fingerprint": 1,
    # per-supplier lineitem agg + 25-row nation agg (supplier joins
    # broadcast at test SF)
    "q_supplier_concentration_hhi": 2,
    # custkey window exchange + bounded (segment, gap) histogram agg
    # + the bounded per-segment cum window
    "q_orders_repeat_interval": 3,
    # custkey-year agg + both FULL OUTER sides re-key on the shifted
    # year (full outer cannot broadcast) + bounded matrix agg + its
    # share window
    "q_orders_customer_migration": 5,
    # post-checkpoint (per-value counts checkpointed): bucket-border
    # agg + its bounded ordered window + the within-bucket window
    # partition + the single-row final agg — per-row data crosses
    # only the pre-checkpoint value-count exchange (rule 22)
    "q_stats_mann_whitney": 4,
    # one bounded per-source aggregate
    "q_text_charset_profile": 1,
    # (source, kind, snippet) agg + per-source totals agg (broadcast)
    "q_curation_boilerplate_snippets": 2,
    # bounded (fold, lang) cell agg + the per-lang share window
    "q_split_kfold_assign": 2,
    # 1-row centroid collect agg + 8-row cluster agg + global share
    # window over 8 rows; vectors themselves never shuffle
    "q_embedding_cluster_balance": 3,
    # post-checkpoint: ONE bounded all-pairs aggregate (facts collapse
    # to the (nation, year) cents aggregate pre-checkpoint; pairs ride
    # a bounded broadcast nested loop)
    "q_stats_kendall_tau": 1,
    # post-checkpoint (per-value masses checkpointed): bucket borders
    # + their bounded desc window + within-bucket window + 1-row total
    # + 3-row class agg; facts cross only the pre-checkpoint partkey
    # exchange
    "q_orders_abc_parts": 5,
    # two-level (user, type) -> user aggregate (rule 4)
    "q_events_user_type_gini": 2,
    # post-checkpoint (window hashes checkpointed): train-window
    # distinct + the semi-join probe re-key + leaked-doc distinct/agg
    # + holdout totals agg; text never shuffles
    "q_split_ngram_leakage": 4,
    # post-checkpoint (daily counts checkpointed): one bounded per-lag
    # aggregate; the lag self-join broadcasts the daily table
    "q_events_autocorr_daily": 1,
    # post-checkpoint ((source, token) counts checkpointed): the
    # vocab roll-up (TakeOrderedAndProject broadcast) + per-source agg
    "q_docs_oov_rate": 2,
    # user-sorted running-min window + bounded latency histogram agg
    # + its bounded ordered cum window
    "q_events_time_to_convert": 3,
    # daily agg + the bounded day-ordered sign/run windows
    "q_stats_runs_test": 2,
    # post-checkpoint (per-value counts checkpointed): bucket borders
    # + their bounded window + within-bucket window + 1-row final agg;
    # customers cross only the pre-checkpoint custkey exchange
    "q_orders_gini_coefficient": 4,
    # post-checkpoint (bounded monthly table): ONE bounded ordered
    # window/agg over the broadcast month-pair slopes
    "q_orders_theil_sen_trend": 1,
    # one month-partition fact aggregate; classes derive in-place
    "q_layout_retention_plan": 1,
    # (part, month) agg + per-part agg + 3-row class agg + its global
    # share window
    "q_orders_xyz_parts": 4,
    # the lag window + the four per-user aggregates + their co-keyed
    # joins — every exchange is user-keyed and carries narrow tuples
    "q_events_bot_verdict": 6,
    # 1-row centroid collect agg + (cluster, label) cell agg + the
    # 8-row majority election; vectors never shuffle
    "q_embedding_cluster_purity": 3,
    # r12 batch 8-10 audit (sf0.001, local[8]):
    # 8 IND arms x (child distinct + parent distinct + value join)
    "q_profile_ind_discovery": 24,
    # 10 key arms x (tuple group-count + 1-row reduction)
    "q_profile_key_discovery": 20,
    "q_orders_price_elasticity": 1,  # broadcast part + one brand agg
    "q_date_business_days": 1,  # orderkey join broadcast at test SF
    # r13: checkpointed rank-table bounds + decile agg + the bounded
    # 10-row window
    "q_quality_cumulative_gains": 3,
    # edge build (distinct + self-join + support agg) precedes the
    # checkpoint; degree/triangle/profile aggs after
    "q_graph_clustering_coeff": 15,
    "q_events_transition_gini": 3,  # user window + type^2 agg + final
    # (source, token) agg + bounded totals + join-back + reduction
    "q_text_head_tail_drift": 4,
    # per-day RANGE window + day totals + bounded carry window
    "q_events_peak_concurrency": 3,
    # edge build + sym/deg/wedge/anti/score joins; top-20 TakeOrdered
    "q_graph_link_prediction": 8,
    "q_events_dwell_time": 2,  # user window + |types| agg
    # (orderkey, partkey) distinct level + orderkey agg + histogram
    "q_orders_basket_profile": 3,
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_no_pathological_plan_nodes(spark, name):
    plan = _plan(registry.QUERIES[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_exchange_budget(spark, name):
    plan = _plan(registry.QUERIES[name](spark, SF_DIR))
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles <= EXCHANGE_BUDGET[name], (
        f"{name}: {n_shuffles} shuffle exchanges (budget "
        f"{EXCHANGE_BUDGET[name]})\n{plan}"
    )


def test_scan_projection_pushdown(spark):
    """A 2-column projection must not read the whole lineitem schema."""
    df = registry.QUERIES["q_scan_project"](spark, SF_DIR)
    plan = _plan(df)
    assert "l_comment" not in plan and "l_shipdate" not in plan


def test_flagship_survives_no_broadcast(spark):
    """When every dim outgrows the broadcast threshold (the 100 TB case),
    the same plan must flip to shuffled joins and return identical rows."""
    fn = registry.QUERIES["q_flagship_monthly_revenue"]
    want = fn(spark, SF_DIR)
    want_canon = rows_to_canon(want.columns, [tuple(r) for r in want.collect()])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        got = fn(spark, SF_DIR)
        plan = _plan(got)
        got_canon = rows_to_canon(got.columns, [tuple(r) for r in got.collect()])
        assert got_canon == want_canon
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


@pytest.mark.parametrize(
    "name",
    [
        "q_tpch_q3_shipping_priority",
        "q_join_multi_star",
        "q_tpch_q8_market_share",  # widest star in the repo (8-way)
        "q_tpch_q21_waiting_supplier",  # decorrelated EXISTS pair
    ],
)
def test_join_queries_survive_no_broadcast(spark, name):
    """Same flip for the other broadcast-reliant joins: at 100 TB
    customer/orders outgrow any broadcast threshold; results must be
    identical under shuffled join strategies."""
    fn = registry.QUERIES[name]
    want = fn(spark, SF_DIR)
    want_canon = rows_to_canon(want.columns, [tuple(r) for r in want.collect()])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        got = fn(spark, SF_DIR)
        got_canon = rows_to_canon(got.columns, [tuple(r) for r in got.collect()])
        assert got_canon == want_canon
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_hll_rollup_merge_equals_full(spark):
    """Mergeable distinct: unioned per-batch HLL sketches estimate within
    sketch error of both the single-pass sketch and the exact count.
    (Union is NOT bit-identical to a one-pass sketch above the sparse
    regime — the union gadget re-targets the representation — so the
    assertion is a tolerance, not equality.)"""
    o = table(spark, SF_DIR, "orders")
    b1 = o.filter(F.col("o_orderkey") % 2 == 0)
    b2 = o.filter(F.col("o_orderkey") % 2 == 1)
    m = merge_hll_rollup(
        None, rollup_with_hll(b1, ["o_orderstatus"], "o_custkey"), ["o_orderstatus"]
    )
    m = merge_hll_rollup(
        m, rollup_with_hll(b2, ["o_orderstatus"], "o_custkey"), ["o_orderstatus"]
    )
    est = {
        r.o_orderstatus: r.est
        for r in m.select(
            "o_orderstatus", F.hll_sketch_estimate("custkey_sketch").alias("est")
        ).collect()
    }
    full = {
        r.o_orderstatus: r.est
        for r in rollup_with_hll(o, ["o_orderstatus"], "o_custkey")
        .select("o_orderstatus", F.hll_sketch_estimate("custkey_sketch").alias("est"))
        .collect()
    }
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(full) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)
        assert abs(est[k] - full[k]) <= max(2, 0.05 * n), (k, est[k], full[k])


def test_approx_count_distinct_accuracy(spark):
    """The scale path must stay within its advertised error: default rsd
    is 5%; assert the approximate per-group counts land within 10% of
    exact on real data."""
    fn = registry.QUERIES["q_agg_approx_distinct"]
    approx_df = fn(spark, SF_DIR)
    cols = approx_df.columns
    key = [c for c in cols if not c.startswith("approx")][0]
    val = [c for c in cols if c.startswith("approx")][0]
    approx = {r[key]: r[val] for r in approx_df.collect()}
    o = table(spark, SF_DIR, "orders")
    exact = {
        r[key]: r.n
        for r in o.groupBy(key).agg(F.countDistinct("o_custkey").alias("n")).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.10 * n), (k, approx[k], n)


def test_approx_percentile_tracks_exact(spark):
    """The scale path for q_agg_percentile: approx_percentile (mergeable
    sketch — partial-aggregatable, unlike exact percentile which buffers
    the group) must track the exact values within a tight relative
    error at warehouse-realistic accuracy settings."""
    li = table(spark, SF_DIR, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("approx_p50"),
        F.expr("percentile(l_quantity, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(l_quantity, 0.99, 10000)").alias("approx_p99"),
    )
    for r in both.collect():
        assert abs(r.approx_p50 - r.exact_p50) / max(r.exact_p50, 1e-9) < 0.05
        assert abs(r.approx_p99 - r.exact_p99) / max(r.exact_p99, 1e-9) < 0.05
