"""Workload registry: every implemented operator exposed as a named query
over the driver testdata, each with a DuckDB oracle-SQL twin.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE[name] -> str``
feed /root/repo/__spark_entry__.py (the driver correctness contract).

Ordering matters: the driver's correctness gate checks a bounded prefix
of the registry (~50 entries per round), so the registry ROTATES each
round so every query's driver row stays at most a couple of rounds old:
(1) queries added or semantically/plan-wise changed this round,
(2) the oldest driver-verified entries (drift watch — the round-2 NTZ
regression proved drift is real), (3) entries never driver-verified,
then the freshest greens. See the _PRIORITY comment for this round's
tiers.
"""

from pyspark_recs.workloads import llmops as _llmops
from pyspark_recs.workloads import recsys as _recsys
from pyspark_recs.workloads import relational as _relational
from pyspark_recs.workloads import streaming as _streaming

_ALL_QUERIES = {}
_ALL_ORACLE = {}
for _mod in (_relational, _llmops, _recsys, _streaming):
    _ALL_QUERIES.update(_mod.QUERIES)
    _ALL_ORACLE.update(getattr(_mod, "ORACLE", {}))

# Round-8 rotation (driver checks a bounded ~50-entry prefix).
# Tier 0: the 9 STALE-EVIDENCE queries — their coefficients or plan
# changed AFTER their newest driver row (VERDICT r7 item #1, two rounds
# overdue): the ML family whose fitted coefficients moved when round 7
# introduced _pin_fit_layout (hash+sort summation order) and the
# dictionary query whose rank path was rewritten to ranked_by_range.
# Tier 1: drift watch — driver greens ordered OLDEST-first by their
# last CORRECTNESS round. Round 7 re-verified the previous 50-entry
# prefix (through l16), so the oldest rows now are the round-2-era
# remainder (l17..s06) followed by the round-3 greens.
# Trailing fall-through: rounds 3-5 greens, then the r07-fresh block
# (freshest driver rows last).
_PRIORITY = [
    # tier 0 — stale evidence: code changed after newest driver row
    "rs04_als_recommendations", "rs24_cf_holdout_eval", "rs26_rrf_fusion",
    "rs27_sampled_metrics_bias", "rs28_content_model_eval",
    "rs30_ensemble_eval", "l29_image_fetch_encode", "l30_text_image_search",
    "r19_categorify_dictionary",
    # tier 1a — drift watch: last driver row is round-2-era (not in the
    # r06/r07 prefix)
    "l17_resize_thumbnail", "l18_tfidf_top_terms", "l19_pack_sequences",
    "l20_corpus_profile", "l22_bigram_repetition", "l23_gopher_rules",
    "l24_stratified_sample", "l26_source_mixture", "l27_chunk_documents",
    "l28_type_token_ratio",
    "l02_minhash_signatures", "l03_lsh_candidate_pairs", "l05_ngram_jaccard",
    "rs01_interactions", "rs02_popular_items_per_segment",
    "rs07_leave_one_out", "s01_tumbling_daily", "s03_keep_first_dedup",
    "s05_session_windows", "s06_stream_quarantine",
    # tier 1b — drift watch: round-3 greens (oldest after the above)
    "l40_incremental_lsh", "l61_fuzzy_decontaminate", "l64_decontaminate_spans",
    "l68_threshold_sweep", "r51_grouping_sets", "r52_mode_per_group",
    "r53_sketch_rollup", "r54_nation_trade", "r55_mad_outliers",
    "r75_shipping_priority", "r76_late_shipment_priority",
    "r77_returned_customers", "r78_promo_revenue", "r79_supplier_census",
    "r80_master_merge", "r81_time_travel", "r82_subject_access_report",
    "r83_skew_profile", "r84_luhn_validation", "l36_fuzzy_edit_dedup",
    "l37_heavy_hitters",
    # fall-through — remaining round-3 greens
    "l38_rare_token_score", "l39_bpe_pair_counts",
    "l41_winnow_fingerprints", "l58_ivfpq_search", "l59_token_drift",
    "l60_vocab_coverage", "l62_cluster_balanced_sample", "l63_shard_manifest",
    "l65_payload_dedup", "l69_corpus_diff", "rs09_next_item_pairs",
    "rs10_funnel", "rs11_copurchase_triangles", "rs12_item_transitions",
    "rs13_diversified_topk", "rs25_point_in_time_features",
    "s07_hopping_windows", "s08_new_user_events", "s09_user_profile",
    "s10_recursive_ewma", "s11_peak_concurrency",
    # fall-through — round-4 greens
    "l21_dedup_components", "l66_attribution_union", "l67_group_aware_split",
    "l71_bpe_train", "l73_bpe_apply", "l12_ann_lsh",
    "l72_intra_doc_repetition",
    "r85_forecast_revenue_change", "r86_product_type_profit",
    "r87_top_supplier", "r88_important_stock", "rs29_markov_next_item_eval",
    "l70_real_encoder_embed",
    "s15_histogram_quantiles", "s16_value_drift",
    "rs05_item_cooccurrence", "rs21_coldstart_fallback", "rs22_item_lift",
    "rs23_item_knn",
    "rs03_user_history_topk", "rs06_negative_samples", "rs08_feature_rerank",
    "rs18_decayed_covisitation", "rs19_bias_baseline", "rs20_rec_coverage",
    "r45_dominant_suppliers", "r46_idle_rich_customers",
    "r02_frequent_customers", "r03_frequent_customer_orders", "r04_dedup_exact",
    "r05_dedup_last_value", "r06_latest_batch", "r07_json_extract",
    "r08_url_synthesis", "r09_left_join_defaults", "r10_three_way_join",
    "r11_per_part_avg_price", "r12_time_split", "r13_date_parts",
    "r14_topk_per_customer", "r15_latest_event", "r16_union_splits",
    "r17_distinct_values", "r18_argmax_per_nation",
    # fall-through — round-5 greens
    "l74_two_tower_align", "l75_mixture_sample",
    "r56_set_ops", "rs14_retention_cohorts", "s02_sessionize",
    "l42_matryoshka_energy", "r47_salted_join", "rs15_association_rules",
    "s04_user_gap_stats", "l31_pii_redaction", "r48_range_join",
    "rs16_personalized_pagerank", "l34_boilerplate_grams", "r49_grouped_ols",
    "rs17_rfm_segments", "l35_novelty_gate", "r50_quantile_bounds",
    "l32_decontaminate", "r57_pagerank_trade", "l33_bm25_search",
    "r58_ewma_smoothing", "l43_semantic_dedup", "r59_gap_fill",
    "l44_embedding_covariance", "r60_ks_drift", "l45_hamming_neardup",
    "r61_seasonal_anomaly", "l46_jl_projection", "l47_token_concentration",
    "l13_multimodal_features", "l25_scalar_quantize",
    "l48_segment_dedup", "r62_chisq_independence", "s12_debounce",
    "l49_pq_encode", "r63_snapshot_diff", "r64_disjunctive_pushdown",
    "r65_table_profile", "l50_hybrid_search", "l51_minhash_jaccard_audit",
    "l52_weighted_sample", "r66_trimmed_mean", "s13_late_arrival_audit",
    "r67_min_cost_supplier", "r68_big_spender_orders",
    "l53_weighted_reservoir", "s14_utouch_attribution",
    # fall-through — r07-fresh driver rows (freshest last)
    "rs32_joint_feature_eval", "l76_png_decode_stats",
    "r69_mann_whitney", "l54_countmin_sketch", "l55_containment_pairs",
    "r70_bitmap_distinct", "r71_rolling_distinct", "l56_linear_model_score",
    "r72_sql_model_chain", "r73_delete_propagation", "r74_fk_discovery",
    "l57_source_leakage", "rs31_behavioral_audit",
    "r20_categorify_encode_oov", "r21_bucketize", "r22_zscore",
    "r23_explode_tokens", "r24_fill_missing_normalize", "r25_count_distinct",
    "r26_ordered_export", "r28_hash_sample", "r30_interval_join",
    "r31_pivot", "r32_rollup", "r33_unpivot",
    "r35_trailing_window", "r36_spend_deciles", "r37_incremental_rollup",
    "r38_props_extract", "r39_local_supplier_volume", "r40_small_order_parts",
    "r41_sole_late_supplier", "r43_market_share", "r44_custdist",
    "l04_simhash",
    "r01_pricing_summary", "r27_approx_distinct", "r29_asof_join",
    "r34_scd2_history", "r42_json_quarantine", "l01_exact_dedup",
    "l06_embedding_topk", "l07_langid", "l08_quality_scores",
    "l09_token_stats", "l10_char_fingerprints", "l11_multimodal_decode",
    "l14_embedding_neardup", "l15_ann_ivf", "l16_frame_sample",
]

QUERIES = {}
ORACLE = {}
for _name in _PRIORITY:
    if _name in _ALL_QUERIES:  # forward slots for queries added later this round
        QUERIES[_name] = _ALL_QUERIES[_name]
        if _name in _ALL_ORACLE:
            ORACLE[_name] = _ALL_ORACLE[_name]
for _name, _fn in _ALL_QUERIES.items():
    if _name not in QUERIES:
        QUERIES[_name] = _fn
        if _name in _ALL_ORACLE:
            ORACLE[_name] = _ALL_ORACLE[_name]

__all__ = ["QUERIES", "ORACLE"]
