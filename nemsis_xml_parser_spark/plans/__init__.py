"""Analytic query layer (SURVEY §2.I) — the surface the driver verifies.

Every operator family the rebuilt engine exposes is registered here as a
named query: a Spark DataFrame program plus (where SQL-expressible) a
DuckDB oracle string.  Importing this package populates the registry.
"""

from .registry import QUERIES, Query, register  # noqa: F401
from . import tpch  # noqa: F401,E402
from . import tpch2  # noqa: F401,E402
from . import families  # noqa: F401,E402
from . import families2  # noqa: F401,E402
from . import families3  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import llm_ops  # noqa: F401,E402
from . import etl_queries  # noqa: F401,E402
from . import drift  # noqa: F401,E402
from . import mining  # noqa: F401,E402
from . import retrieval  # noqa: F401,E402
from . import robust  # noqa: F401,E402
from . import mining2  # noqa: F401,E402
from . import scaleops  # noqa: F401,E402
from . import mining3  # noqa: F401,E402
from . import round6  # noqa: F401,E402
from . import round6b  # noqa: F401,E402
from . import round7  # noqa: F401,E402
from . import round7b  # noqa: F401,E402
from . import round8  # noqa: F401,E402
from . import round9  # noqa: F401,E402
from . import round10  # noqa: F401,E402
from . import round11  # noqa: F401,E402
from . import round12  # noqa: F401,E402

# The driver's correctness run records the first ~50 queries in registration
# order.  Track, per query, the most recent round whose CORRECTNESS_r0N.json
# carries a green row for it, and register stalest-first (never-recorded
# queries at the very front) so each round's run refreshes the oldest rows
# against current code.  Extend the newest-round block each round.
_RECORDED_BY_ROUND: dict[int, frozenset[str]] = {
    1: frozenset({
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue", "q10_returned_items", "q4_order_priority_check",
        "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
        "q12_priority_by_linestatus", "q13_customer_order_distribution",
        "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_quantity_revenue", "q21_last_shipper_multi_supplier",
        "q22_dormant_high_balance", "q2_cheapest_supplier",
        "q11_important_stock",
        "q20_dominant_suppliers", "filter_project", "join_inner",
        "join_left_outer", "join_semi", "join_anti", "join_broadcast_decode",
        "join_range_band", "agg_groupby_multi", "agg_count_distinct",
        "agg_variance_manual", "agg_approx_distinct", "rollup_agg", "cube_agg",
        "grouping_sets_agg", "window_rank_orders", "window_running_total",
        "window_lag_gap", "topk_per_group", "sort_limit_topn",
        "set_union_distinct", "set_intersect", "set_except",
        "scalar_string_battery", "scalar_date_battery", "scalar_math_battery",
        "json_extract_events", "case_when_bands", "events_hourly_rollup",
        "subquery_scalar_avg", "subquery_in_list", "subquery_correlated_max",
    }),
    2: frozenset({
        "agg_corr_manual", "agg_filter_clause", "agg_having",
        "agg_percentile_approx", "agg_percentile_exact",
        "ann_lsh_bucket_stats", "array_agg_battery", "array_hof_battery",
        "asof_join_last_signup", "cross_join_small", "date_arithmetic_battery",
        "dedup_embedding_cosine_pairs", "dedup_exact_fingerprint",
        "dedup_exact_survivors", "dedup_minhash_lsh_candidates",
        "dedup_ngram_jaccard_pairs", "dedup_simhash_fingerprints",
        "events_anomaly_mad", "events_funnel_conversion",
        "events_gapfill_hourly",
        "events_retention_cohorts", "events_sessionize",
        "events_time_rollup_hierarchy", "events_view_click_attribution",
        "explode_tokens", "join_fuzzy_name_match", "join_lateral_topk",
        "join_nullsafe_eq", "join_range_interval_banded", "join_salted_skew",
        "knn_cosine_topk", "map_build_battery", "multimodal_binary_roundtrip",
        "pivot_status_by_segment", "q14_promo_revenue_share",
        "q18_large_orders",
        "q19_disjunctive_filter_join", "recursive_cte_key_depth",
        "scalar_conditional_battery", "set_except_all", "set_intersect_all",
        # "sketch_hll_mergeable" was recorded in r02 as the rows-only
        # DataSketches variant; rewritten in r6 as the deterministic
        # hash-oracled register HLL — vintage reset so the driver
        # re-records the new implementation.
        "set_union_all", "text_langid_confusion",
        "text_token_stats", "unpivot_stack", "window_analytic_battery",
        "window_locf_fill", "window_range_frame",
    }),
    3: frozenset({
        "ann_pq_topk", "curation_survivor_stats",
        "decontaminate_split_overlap", "dedup_cluster_components",
        "dedup_embedding_lsh_pairs", "embedding_quantization_error",
        "etl_distinct_pairs", "etl_file_md5", "etl_namespace_strip",
        "etl_sanitize_identifiers", "etl_trim_nullify",
        "multimodal_audio_meta",
        "multimodal_decode_meta", "multimodal_embed_knn", "pack_greedy_audit",
        "pack_sequences_cumsum", "pq_adc_seeded_topk",
        "profile_documents_columns", "sample_hash_split",
        "sample_stratified_hash", "sample_temperature_rebalance",
        "sample_topk_per_source", "skew_key_audit", "text_bigram_logprob",
        "text_bm25_score", "text_boilerplate_ratio", "text_bpe_token_stats",
        "text_clean_normalize", "text_doc_idf", "text_pii_scrub",
        "text_quality_by_source", "text_repetition_ratio",
        "text_rolling_fingerprint", "text_stopword_ratio",
        "text_term_frequency",
        "text_tfidf_cosine_pairs", "text_unigram_logprob",
        "text_zscore_by_lang",
    }),
    4: frozenset({
        "agg_argmax_battery", "agg_benford_digit_audit",
        "agg_gini_concentration", "agg_histogram_fixed_bins",
        "agg_regression_battery", "agg_skewness_kurtosis",
        "agg_weighted_median", "ann_ivf_topk", "ann_ivfpq_topk",
        "curation_chunk_sequences", "curation_pareto_coverage",
        "curation_url_canonicalize", "decontaminate_passage_containment",
        "dedup_minhash_star_capped", "dedup_semantic_clusters",
        "embedding_centroid_fisher", "etl_incremental_rollup",
        "etl_snapshot_diff", "events_cumulative_users", "events_error_bursts",
        "events_markov_transitions", "events_rate_limited_sample",
        "events_session_paths", "events_trending_rank_delta",
        "graph_pagerank_centrality", "join_prorate_quarters",
        "join_scd2_point_in_time", "mine_bitext_margin",
        "multimodal_audio_sample_stats", "multimodal_pixel_stats",
        "multimodal_thumbnail_stats", "q10_returned_items",
        "q12_priority_by_linestatus", "q1_pricing_summary",
        "q3_shipping_priority", "q4_order_priority_check",
        "q5_local_supplier_volume", "q6_forecast_revenue",
        "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
        "quality_expectations_audit", "sample_weighted_reservoir",
        "scalar_bitwise_battery", "split_cluster_safe", "text_entropy_score",
        "text_fertility_stats", "text_keyword_extraction",
        "text_ngram_novelty", "text_pmi_collocations",
    }),
    5: frozenset({
        "agg_histogram_quantiles", "agg_salted_two_phase",
        "agg_theil_sen_slope", "curation_dsir_importance",
        "curation_gopher_rules", "curation_mixture_weights",
        "dedup_duplicate_spans", "dedup_ssjoin_prefix",
        "dedup_survivor_election", "embedding_pca_power",
        "embedding_silhouette", "er_golden_record",
        "etl_scd2_build", "etl_table_checksum",
        "events_autocorrelation", "events_changepoint_cusum",
        "events_dwell_time_stats", "events_ewma_daily",
        "events_seasonality_dow", "events_trend_break",
        "graph_degree_distribution", "graph_hits_bipartite",
        "graph_kcore", "graph_label_propagation",
        "graph_personalized_pagerank", "graph_triangle_count",
        "join_bloom_prefilter", "join_interval_coalesce",
        "layout_zorder_skipping", "mine_hard_negatives",
        "multimodal_audio_silence_segments", "multimodal_luminance_histogram",
        "multimodal_phash_groups", "profile_key_candidates",
        "quality_embedding_norm_outliers", "quality_k_anonymity",
        "quality_ks_drift", "quality_mutual_information",
        "quality_perplexity_buckets", "quality_psi_by_day",
        "quality_psi_drift", "quality_rank_sum_drift",
        "retrieval_hybrid_rrf", "sketch_bloom_membership",
        "sketch_countmin_heavy_hitters", "sketch_join_cardinality",
        "text_bpe_merge_candidates", "text_heaps_law",
        "text_inverted_index", "window_scalable_running_total",
    }),
    6: frozenset({
        "agg_covariance_matrix", "agg_hash_sample_quantiles",
        "agg_mann_kendall_trend", "agg_mean_battery", "agg_pct_of_parent",
        "agg_poisson_bootstrap_ci", "agg_winsorized_mean",
        "curation_pipeline_e2e", "curation_waterfill_budget",
        "embedding_gram_matrix", "embedding_pca_projection", "etl_cdc_apply",
        "events_cohort_ltv", "events_funnel_windowed_strict",
        "events_kaplan_meier", "events_peak_days",
        "events_position_attribution", "events_rfm_segmentation",
        "events_sliding_window_rollup", "events_user_streaks",
        "graph_adamic_adar", "graph_bfs_hops", "graph_harmonic_closeness",
        "join_asof_forward", "join_asof_nearest", "join_spatial_grid_epsilon",
        "join_spatial_grid_knn", "join_temporal_anti_window",
        "mine_association_rules", "mine_fpgrowth_itemsets",
        "mine_frequent_triples", "multimodal_audio_periodicity",
        "multimodal_image_entropy", "multimodal_jpeg420_color_stats",
        "multimodal_jpeg_pixel_stats", "multimodal_video_frame_stats",
        "quality_adjusted_rand", "quality_chi_square_independence",
        "quality_did_estimator", "quality_dp_noisy_counts",
        "quality_js_divergence", "quality_two_proportion_ztest",
        "retrieval_mmr_rerank", "sample_neyman_allocation",
        "scalar_regex_battery", "scalar_timestamp_battery",
        "sketch_hll_mergeable", "text_burstiness_dispersion",
        "text_kneser_ney_bigram", "window_session_concurrency",
    }),
    7: frozenset({
        "agg_hodges_lehmann", "agg_jackknife_variance",
        "cluster_dbscan_grid", "cluster_kmeans_lloyd",
        "cluster_kmeanspp_seeding", "dedup_edit_distance_pairs",
        "dedup_ladder_full", "dedup_simhash_band_pairs",
        "events_fano_overdispersion", "events_max_drawdown",
        "events_seasonal_decompose", "events_vshape_patterns",
        "graph_assortativity", "graph_betweenness_sampled",
        "graph_ktruss_peeling", "graph_local_clustering",
        "graph_scc_peeling", "join_asof_tolerance",
        "join_interval_overlap_agg", "join_point_in_polygon_grid",
        "json_variant_battery", "multimodal_audio_dft_peak",
        "multimodal_audio_stft_bands", "multimodal_bmp_pixel_stats",
        "multimodal_gif_interlaced_stats", "multimodal_gif_pixel_stats",
        "multimodal_jpeg_progressive_stats", "multimodal_tiff_pixel_stats",
        "multimodal_video_scene_cuts", "q13_customer_order_distribution",
        "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_quantity_revenue", "q21_last_shipper_multi_supplier",
        "q22_dormant_high_balance", "quality_auc_mann_whitney",
        "quality_calibration_bins", "quality_cohens_kappa",
        "quality_dedup_recall", "quality_emd_drift",
        "quality_isotonic_calibration", "quality_poisson_rate_test",
        "quality_ratio_delta_method", "recursive_bom_rollup",
        "retrieval_prf_expansion", "sketch_hll_intersection",
        "sql_surface_topk_months", "text_sentence_stats", "text_zipf_slope",
        "window_median_filter",
    }),
    8: frozenset({
        "agg_approx_distinct", "agg_count_distinct",
        "agg_groupby_multi", "agg_variance_manual", "ann_nsw_beam_topk",
        "cube_agg", "curation_zorder_layout", "dedup_semdedup_band",
        "dedup_winnowing_ladder", "dedup_winnowing_pairs",
        "embedding_jl_projection", "er_fellegi_sunter",
        "filter_project", "graph_boruvka_msf",
        "graph_heavy_edge_coarsening", "graph_louvain_sweep",
        "graph_node2vec_walks", "graph_sssp_bellman_ford",
        "grouping_sets_agg", "join_anti", "join_broadcast_decode",
        "join_inner", "join_left_outer", "join_range_band", "join_semi",
        "multimodal_bmp4_pixel_stats", "multimodal_jpeg12_stats",
        "multimodal_png_variants_stats",
        "multimodal_tiff_multipage_stats",
        "multimodal_tiff_tiled_stats", "q11_important_stock",
        "q20_dominant_suppliers", "q2_cheapest_supplier",
        "quality_linear_probe", "rollup_agg", "scalar_date_battery",
        "scalar_math_battery", "scalar_string_battery", "set_except",
        "set_intersect", "set_union_distinct", "sketch_hll_distinct",
        "sort_limit_topn", "text_bpe_train_merges",
        "timeseries_holt_backtest", "timeseries_holt_linear",
        "topk_per_group", "window_lag_gap", "window_rank_orders",
        "window_running_total",
    }),
    9: frozenset({
        "agg_corr_manual", "agg_filter_clause", "agg_having",
        "agg_percentile_approx", "agg_percentile_exact",
        "array_agg_battery", "asof_join_last_signup", "case_when_bands",
        "cross_join_small", "curation_hilbert_layout",
        "date_arithmetic_battery", "dedup_cdc_chunks",
        "dedup_containment_pairs", "er_sorted_neighborhood",
        "events_funnel_conversion", "events_hourly_rollup",
        "events_retention_cohorts", "events_sessionize", "explode_tokens",
        "join_lateral_topk", "join_nullsafe_eq",
        "join_range_interval_banded", "join_salted_skew",
        "json_extract_events", "layout_curve_skipping", "map_build_battery",
        "multimodal_audio_g711_stats", "multimodal_binary_roundtrip",
        "multimodal_tiff_lzw_stats", "pivot_status_by_segment",
        "q14_promo_revenue_share", "q18_large_orders",
        "q19_disjunctive_filter_join", "quality_permutation_test",
        "recursive_cte_key_depth", "scalar_conditional_battery",
        "set_except_all", "set_intersect_all", "set_union_all",
        "sketch_kmv_distinct", "sketch_kmv_intersection",
        "subquery_correlated_max", "subquery_in_list",
        "subquery_scalar_avg", "text_bpe_encode", "text_rouge2_pairs",
        "unpivot_stack", "window_analytic_battery", "window_locf_fill",
        "window_range_frame",
    }),
    10: frozenset({
        "ann_ivfpq_rerank_topk", "ann_lsh_bucket_stats",
        "ann_lsh_multiprobe_topk", "ann_nsw_multientry_topk",
        "array_hof_battery", "cluster_kmeans_parallel_init",
        "curation_coreset_sample", "curation_coreset_weighted_kmeans",
        "curation_survivor_stats", "dedup_embedding_cosine_pairs",
        "dedup_embedding_lsh_pairs", "dedup_exact_fingerprint",
        "dedup_exact_survivors", "dedup_minhash_lsh_candidates",
        "dedup_ngram_jaccard_pairs", "dedup_simhash_fingerprints",
        "events_anomaly_mad", "events_gapfill_hourly",
        "events_time_rollup_hierarchy", "events_view_click_attribution",
        "graph_effective_diameter", "graph_hyperball_anf",
        "join_fuzzy_name_match", "knn_cosine_topk",
        "multimodal_decode_meta", "multimodal_embed_knn",
        "multimodal_jpeg_progressive_color_stats",
        "multimodal_png_deep_stats", "multimodal_tiff_jpeg_stats",
        "multimodal_tiff_tiled_pred_stats", "quality_fdr_bh",
        "quality_ransac_line", "retrieval_map_mrr",
        "retrieval_ndcg_eval", "sample_hash_split",
        "sample_stratified_hash", "sketch_dyadic_quantiles",
        "sketch_kmv_difference", "sketch_kmv_jaccard",
        "text_bpe_token_stats", "text_clean_normalize", "text_doc_idf",
        "text_good_turing", "text_langid_confusion",
        "text_quality_by_source", "text_rolling_fingerprint",
        "text_stopword_ratio", "text_term_frequency",
        "text_token_stats", "text_zscore_by_lang",
    }),
    11: frozenset({
        "agg_histogram_fixed_bins", "agg_regression_battery",
        "agg_weighted_median", "ann_lsh_multitable_topk", "ann_pq_topk",
        "cluster_single_linkage_mst", "decontaminate_split_overlap",
        "dedup_cluster_components", "embedding_quantization_error",
        "er_blocking_quality", "etl_distinct_pairs", "etl_file_md5",
        "etl_namespace_strip", "etl_sanitize_identifiers",
        "etl_trim_nullify", "join_scd2_point_in_time",
        "multimodal_audio_meta", "multimodal_jpeg_exif_meta",
        "multimodal_jpeg_progressive_420_stats",
        "multimodal_png_subbyte_stats", "multimodal_wav_adpcm_stats",
        "pack_greedy_audit", "pack_sequences_cumsum",
        "pq_adc_seeded_topk", "profile_documents_columns",
        "q10_returned_items", "q12_priority_by_linestatus",
        "q1_pricing_summary", "q3_shipping_priority",
        "q4_order_priority_check", "q5_local_supplier_volume",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q9_product_type_profit", "quality_expectations_audit",
        "retrieval_qld_dirichlet", "sample_temperature_rebalance",
        "sample_topk_per_source", "scalar_bitwise_battery",
        "sketch_ams_f2", "sketch_misra_gries_heavy", "skew_key_audit",
        "text_bigram_logprob", "text_bm25_score",
        "text_boilerplate_ratio", "text_pii_scrub",
        "text_repetition_ratio", "text_tfidf_cosine_pairs",
        "text_unigram_logprob",
    }),
}

_vintage: dict[str, int] = {}
for _round in sorted(_RECORDED_BY_ROUND):
    for _name in _RECORDED_BY_ROUND[_round]:
        _vintage[_name] = _round  # later rounds overwrite: latest wins

_order = sorted(QUERIES, key=lambda n: _vintage.get(n, 0))  # stable: keeps
_rotated = {n: QUERIES[n] for n in _order}                  # registration order
QUERIES.clear()
QUERIES.update(_rotated)
