"""Workload registry: every implemented operator exposed as a named query
over the driver testdata, each with a DuckDB oracle-SQL twin.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE[name] -> str``
feed /root/repo/__spark_entry__.py (the driver correctness contract).

Ordering matters: the driver's correctness gate checks a bounded prefix
of the registry (rounds 1 and 2 each covered ~50 entries), so the
registry interleaves families — to guarantee every family lands green
rows in ``CORRECTNESS_r{N}.json`` regardless of the exact window size —
and ROTATES per round: (1) queries never driver-verified (new this
round), (2) queries whose round-2 row errored and was since fixed,
(3) queries last verified in round 1 (drift check — the round-2 NTZ
regression showed drift is real), (4) queries green in round 2.
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

# Round-3 rotation. Tier 1: the 51 queries with NO green driver row yet —
# 46 added after round 2's verification window closed, plus the 5 whose
# round-2 row errored and has since been fixed (s02/s04 NTZ, l13/l25/l29
# array canonicalization) — family-interleaved (l/r/rs/s round-robin) so
# even a tiny window samples every family. Tier 2: last verified in
# round 1, unchecked since (drift watch — the round-2 NTZ regression
# proved drift is real). Tier 3 (the trailing loop below): round-2 greens.
_PRIORITY = [
    # tier 0 — added late in round 3, never driver-verified
    "l58_ivfpq_search", "r75_shipping_priority", "rs23_item_knn",
    "s15_histogram_quantiles", "l59_token_drift",
    "r76_late_shipment_priority", "rs24_cf_holdout_eval",
    "l60_vocab_coverage", "r77_returned_customers",
    "l61_fuzzy_decontaminate", "r78_promo_revenue",
    "l62_cluster_balanced_sample", "r79_supplier_census",
    "rs25_point_in_time_features", "l63_shard_manifest",
    "s16_value_drift", "l64_decontaminate_spans",
    "rs26_rrf_fusion", "r80_master_merge", "l65_payload_dedup",
    "r81_time_travel", "r82_subject_access_report", "l66_attribution_union",
    "l67_group_aware_split", "r83_skew_profile", "r84_luhn_validation",
    "l68_threshold_sweep", "l69_corpus_diff", "rs27_sampled_metrics_bias",
    # tier 1 — never driver-verified, round-robin l / r / rs / s
    "l36_fuzzy_edit_dedup", "r51_grouping_sets", "rs09_next_item_pairs",
    "s09_user_profile", "l37_heavy_hitters", "r52_mode_per_group",
    "rs10_funnel", "s07_hopping_windows", "l38_rare_token_score",
    "r53_sketch_rollup", "rs11_copurchase_triangles", "s08_new_user_events",
    "l39_bpe_pair_counts", "r54_nation_trade", "rs12_item_transitions",
    "s10_recursive_ewma", "l40_incremental_lsh", "r55_mad_outliers",
    "rs13_diversified_topk", "s11_peak_concurrency",
    "l41_winnow_fingerprints", "r56_set_ops", "rs14_retention_cohorts",
    "s02_sessionize", "l42_matryoshka_energy", "r47_salted_join",
    "rs15_association_rules", "s04_user_gap_stats", "l31_pii_redaction",
    "r48_range_join", "rs16_personalized_pagerank", "l34_boilerplate_grams",
    "r49_grouped_ols", "rs17_rfm_segments", "l35_novelty_gate",
    "r50_quantile_bounds", "l32_decontaminate", "r57_pagerank_trade",
    "l33_bm25_search", "r58_ewma_smoothing", "l43_semantic_dedup",
    "r59_gap_fill", "l44_embedding_covariance", "r60_ks_drift",
    "l45_hamming_neardup", "r61_seasonal_anomaly", "l46_jl_projection",
    "l47_token_concentration", "l13_multimodal_features",
    "l25_scalar_quantize", "l29_image_fetch_encode",
    # tier 1b — added mid-round-3 (also never driver-verified)
    "l48_segment_dedup", "r62_chisq_independence", "rs18_decayed_covisitation",
    "s12_debounce", "l49_pq_encode", "r63_snapshot_diff", "rs19_bias_baseline",
    "r64_disjunctive_pushdown", "r65_table_profile", "l50_hybrid_search",
    "l51_minhash_jaccard_audit", "rs20_rec_coverage", "l52_weighted_sample",
    "r66_trimmed_mean", "rs21_coldstart_fallback", "s13_late_arrival_audit",
    "r67_min_cost_supplier", "r68_big_spender_orders",
    "l53_weighted_reservoir", "s14_utouch_attribution",
    "rs22_item_lift", "r69_mann_whitney", "l54_countmin_sketch",
    "l55_containment_pairs", "r70_bitmap_distinct", "r71_rolling_distinct",
    "l56_linear_model_score", "r72_sql_model_chain",
    "r73_delete_propagation", "r74_fk_discovery", "l57_source_leakage",
    # tier 2 — round-1-verified, unchecked since (drift watch);
    # r45/r46 were green in round 2 but reworked since (de-vacuated
    # constants) so they rotate forward with this tier
    "r45_dominant_suppliers", "r46_idle_rich_customers",
    "r02_frequent_customers", "r03_frequent_customer_orders", "r04_dedup_exact",
    "r05_dedup_last_value", "r06_latest_batch", "r07_json_extract",
    "r08_url_synthesis", "r09_left_join_defaults", "r10_three_way_join",
    "r11_per_part_avg_price", "r12_time_split", "r13_date_parts",
    "r14_topk_per_customer", "r15_latest_event", "r16_union_splits",
    "r17_distinct_values", "r18_argmax_per_nation", "r19_categorify_dictionary",
    "r20_categorify_encode_oov", "r21_bucketize", "r22_zscore",
    "r23_explode_tokens", "r24_fill_missing_normalize", "r25_count_distinct",
    "r26_ordered_export", "r28_hash_sample", "r30_interval_join",
    "r31_pivot", "r32_rollup", "r33_unpivot",
    "r35_trailing_window", "r36_spend_deciles", "r37_incremental_rollup",
    "r38_props_extract", "r39_local_supplier_volume", "r40_small_order_parts",
    "r41_sole_late_supplier", "r43_market_share", "r44_custdist",
    "l04_simhash",
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
