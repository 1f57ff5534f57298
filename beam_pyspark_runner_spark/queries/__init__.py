"""Query registry: every operator capability gets a named query + DuckDB oracle.

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()`` maps; this package is their single source of truth.
Each module registers queries for one capability area of SURVEY.md §2.
"""

from __future__ import annotations

from beam_pyspark_runner_spark.queries.registry import REGISTRY, Query, register

# Import for registration side effects.
from beam_pyspark_runner_spark.queries import relational  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import tpch  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import joins  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import windows  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import events  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import dedup  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import similarity  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import text  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import streaming  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import multimodal  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import sketches  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import io  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import graph  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import partsupp  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import recursive  # noqa: E402,F401

# The external driver's correctness gate checks the FIRST 50 registry
# entries (dict iteration order). Round-8 rotation (per the round-7
# verdict's #1 and #6 asks): 5 sentinel family anchors + q18 (tpch
# seat) + array_functions (array_fns seat), every query whose CODE
# changed this round (13 never-driver-checked, plus rfm_segmentation —
# the deepest rewrite of the previously-green set (bucketed NTILEs) —
# as the one re-cert; revenue_concentration_8020 / hybrid_search_rrf /
# gini_coefficient / vocab_coverage_curve / bpe_merge_apply also
# changed but are covered by the local two-scale sweep, yielding
# their seats to first-time queries), the 5 remaining verdict-named
# round-7 headliners, the 2 never-checked streaming/sketch family
# anchors, and 22 from the queue head —
# 42 of 50 first-time-checked, per the ">=42" done-criterion.
# All 50 are locally oracle-MATCH at sf0.01 AND sf0.1
# (tests/oracle_check.py).
# ROUND-9 ROTATION QUEUE: see the comment block right after this tuple.
DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels: continuity + single-representative family anchors
    # (metrics/UDTF/pandas-UDF each have one canonical query — pinned)
    "q1_pricing_summary",
    "pipeline_wordcount",
    "metrics_counters",
    "udtf_token_positions",
    "pandas_udf_density_score",
    # --- round-8 code changes: single-task-window retirements ---
    "id_gap_islands",
    "conformal_interval_audit",
    "kmv_theta_sketch_ops",
    "trending_terms_rankshift",
    "bpe_pair_counts",
    "wilson_lower_bound_ranking",
    "vocab_id_encode",
    "rake_keyphrases",
    "uncertainty_margin_sample",
    "abc_classification",
    "join_cardinality_estimate",
    "safety_stock_reorder_points",
    "knn_distance_outliers",
    # --- deepest rewrite previously green -> driver re-cert ---
    "rfm_segmentation",
    # --- family seats (already green; tags tpch / array_fns) ---
    "q18_large_orders",
    "array_functions",
    # --- never-checked streaming + sketch + event_time anchors ---
    "stream_windowed_hll_distinct",
    "stream_append_mode_tumbling",
    # --- verdict #6: round-7 session-4/5 headliners ---
    "symspell_id_neighbors",
    "incremental_join_maintenance",
    "dataset_version_fingerprint",
    "fellegi_sunter_em_step",
    "payload_tile_phash_dedup",
    # --- queue head (never driver-checked, registration order) ---
    "gdpr_delete_cascade",
    "keyset_pagination",
    "latency_percentiles",
    "date_dimension_rollup",
    "qq_deciles_compare",
    "cohort_ltv_curve",
    "revenue_waterfall",
    "partition_skew_report",
    "functional_dependency_check",
    "approx_percentile_bounds",
    "metric_driver_decomposition",
    "loo_target_encoding",
    "merkle_bucket_diff",
    "ols_trend_per_group",
    "rolling_origin_backtest",
    "percent_of_parent",
    "mode_per_group",
    "pandas_cogroup_reconcile",
    "item_cf_recommend",
    "negative_sampling_pairs",
    "asof_join_tolerance",
    "record_linkage_score",
)

# ROUND-9 ROTATION QUEUE — the remaining never-driver-checked queries
# in registration order (cosine_topk_vectorized stays out: rows-only by
# design). Regenerated this round from REGISTRY minus all CORRECTNESS_r*
# coverage; net-new round-8 registrations append at the END as they
# land (the r5 discipline, continued):
# balanced_range_bounds, delta_encoding_bits, l_diversity_audit,
# kendall_tau_trend, holt_linear_forecast, shuffle_skew_advisor,
# rolling_ols_slope, regression_stump_train, cusum_drift_detector,
# anova_oneway, spearman_rank_corr, kruskal_wallis_test, acf_lags,
# t_closeness_audit, parameterized_sql_binding, eb_shrunk_conversion,
# boosting_residual_round, identifier_clause_scan, yule_walker_ar2,
# mmd_quadratic_drift, wasserstein_1d_drift, holt_winters_seasonal,
# simpsons_paradox_audit, jackknife_variance, raking_ipf_weights,
# partial_correlation, neyman_allocation, aqp_sample_extrapolation,
# pareto_front_layers, join_fanout_audit, binned_interval_join,
# inferred_dimension_members, dbscan_core_points,
# weiszfeld_geometric_median, market_basket_rules,
# max_concurrent_intervals, interval_union_coverage, hampel_filter,
# period_to_date_totals, pipeline_windowed_custom_combine,
# value_outliers, ewma_user_value, first_touch_attribution,
# dead_letter_split, cuped_variance_reduction,
# golden_record_survivorship, entry_path_analysis, wow_growth,
# user_feature_matrix, ab_assignment_srm, chi_square_independence,
# event_run_length_encode, growth_accounting, distribution_drift_chisq,
# temporal_group_split, smoothed_ctr, user_survival_curve,
# changepoint_detector, cohorted_funnel, seasonality_index,
# interarrival_burstiness, poisson_bootstrap_ci, permutation_test_diff,
# mann_whitney_u, time_weighted_average, event_sequence_motifs,
# winsorized_mean, feature_correlation_matrix,
# watermark_lateness_advisor, diff_in_diff, seasonal_adjusted_anomaly,
# expected_shortfall, cumulative_distinct_curve, slo_error_budget_burn,
# batch_match_recognize, udtf_table_arg_sessions,
# quantile_treatment_effect, two_proportion_ztest,
# shapley_channel_attribution, logrank_test, dispersion_index,
# capture_recapture_estimate, concordance_index,
# propensity_stratified_ate, offpolicy_ips_evaluation,
# dp_geometric_noise_counts, revenue_recognition_proration,
# frequent_sequence_pairs, propensity_nn_matching_att, dup_ngram_spans,
# lsh_band_sweep, blocking_quality_audit, dedup_cluster_precision,
# weighted_jaccard_pairs, label_centroid_dispersion,
# embedding_covariance_matrix, colbert_maxsim_topk, pca_power_iteration,
# als_user_factor_solve, binary_hamming_topk, retrieval_eval_map,
# knn_classify_embeddings, binary_recall_at_k, ndcg_at_k,
# random_projection_recall, kcenter_coreset_greedy,
# smote_interpolation_synthesis, bigram_lm_probs, mixture_weights,
# source_gini_diversity, token_lift_pairs, dataset_card_report,
# feature_hashing_stats, keyword_in_context, unicode_nfc_clean,
# classifier_eval_f1, doc_length_pow2_histogram, cohens_kappa_agreement,
# bm25_topk, gopher_quality_rules, shard_manifest_packing,
# classifier_calibration_bins, priority_sample_sources,
# flesch_readability, quantile_prune_per_source, mixture_epoch_plan,
# roc_auc_exact, cramers_v_association, span_corruption_targets,
# pr_curve_points, isotonic_calibration, brier_score_decomposition,
# stream_windowed_custom_combine, stream_sliding_distinct,
# stream_chained_window_aggs, stream_stream_full_outer,
# approx_top_k_events, sliding_distinct_bitmap, ams_f2_moment,
# ams_join_size_estimate, frame_hash_dedup, cas_dedup_savings,
# python_stream_source_agg, rendezvous_shard_rebalance,
# dict_encoding_estimate, zorder_pruning_audit,
# dynamic_partition_prune_join, runtime_bloom_filter_join,
# hilbert_curve_key, hilbert_vs_zorder_locality,
# curve_file_skipping_audit, link_prediction_jaccard,
# resource_allocation_linkpred, degree_assortativity, modularity_score,
# closeness_centrality_sampled, scc_pivot_fwbw, dag_longest_path_layers,
# bellman_ford_weighted_paths, bom_quantity_rollup, boruvka_msf_round,
# gnn_mean_aggregation_2hop, fifo_inventory_allocation
# -- net-new round 8 --
# expected_calibration_error, macro_f1_lang_multiclass,
# mcnemar_paired_classifiers, fleiss_kappa_multirater,
# mood_median_test, cvm_ecdf_drift, levene_brown_forsythe,
# lift_gains_by_decile, semi_additive_last_balance,
# allen_interval_relations, time_decay_attribution,
# delete_vector_apply_audit, embedding_int8_quant_error,
# ivf_nprobe_recall_sweep, mmr_diversified_topk,
# heaps_vocab_growth_curve, histogram_distance_drift,
# thumbnail_resize_stub, user_activity_streaks, qini_uplift_curve,
# clv_btyd_model_inputs, seasonal_naive_mase,
# embedding_centroid_shift, reciprocal_best_match_links,
# benford_law_audit, wald_wolfowitz_runs_test, atkinson_inequality_index,
# friedman_test, goodman_kruskal_tau, group_skewness_kurtosis,
# fk_orphan_audit, platt_scaling_newton_step, chao1_vocab_richness,
# stratified_kfold_assignment, croston_intermittent_demand,
# audio_vad_segments_stub, sprt_sequential_test,
# hodges_lehmann_location_shift, mcc_matthews_correlation,
# cochran_q_test


def _apply_driver_window() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()

__all__ = ["DRIVER_WINDOW", "REGISTRY", "Query", "register"]
