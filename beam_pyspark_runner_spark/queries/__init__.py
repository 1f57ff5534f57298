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
# entries (dict iteration order). Round-7 rotation (per the round-6
# verdict's #1 ask): the 5 sentinel family anchors + all 22 net-new
# round-6 registrations (none has driver signal yet — the verdict's
# independent oracle run covered them 22/22 MATCH) + the head of the
# never-driver-checked backlog. Per verdict #7, the three session-
# state-mutating queries whose ADVICE-r6 try/finally fixes land this
# round (markov_removal_attribution, sql_scripting_threshold_walk,
# stream_scd2_pointintime_enrich) sit ADJACENT at the top of the
# rotation so a leak from any one would poison its neighbor and show
# up as a driver mismatch. The tail holds 5 round-7 additions (incl.
# ppjoin_prefix_filter, whose code gained the positional filter this
# round). All 50 are locally oracle-MATCH at sf0.01 AND sf0.1
# (tests/oracle_check.py).
# ROUND-8 ROTATION QUEUE: see the comment block right after this tuple.
DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels: continuity + single-representative family anchors
    # (metrics/UDTF/pandas-UDF each have one canonical query — pinned)
    "q1_pricing_summary",
    "pipeline_wordcount",
    "metrics_counters",
    "udtf_token_positions",
    "pandas_udf_density_score",
    # --- ADVICE-r6 session-state fixes, deliberately adjacent ---
    "markov_removal_attribution",
    "sql_scripting_threshold_walk",
    "stream_scd2_pointintime_enrich",
    # --- remaining round-6 additions (verdict-named first) ---
    "two_phase_global_quantiles",
    "grid_radius_join",
    "bitemporal_asof_join",
    "incremental_minhash_upsert",
    "substring_contamination_winnowed",
    "source_overlap_matrix",
    "k_core_decomposition",
    "ann_recall_at_k",
    "linear_classifier_inference",
    "ngram_novelty_rate",
    "dsir_importance_weights",
    "tokenizer_fertility",
    "simpson_diversity_per_source",
    "zipf_slope_fit",
    "bpe_merge_apply",
    "temperature_sampling_weights",
    "ks_statistic_drift",
    "k_anonymity_audit",
    "paired_modality_audit",
    # --- backlog head (never driver-checked, registration order) ---
    "price_quantity_corr",
    "skyline_pareto",
    "group_median_mad",
    "ntile_quartile_stats",
    "sql_pipe_syntax",
    "quantile_normalize",
    "dq_contract_check",
    "incremental_agg_merge",
    "listagg_ordered",
    "rfm_segmentation",
    "benford_first_digit",
    "revenue_concentration_8020",
    "duplicate_payment_detection",
    "table_diff_reconcile",
    "column_profile",
    # --- family anchors (sketch from the never-checked backlog;
    # tpch / event_time have no never-checked members left, so the
    # already-green q18 / event_transition_matrix hold those seats) ---
    "hll_datasketch_union",
    "event_transition_matrix",
    "q18_large_orders",
    # --- round-7 additions: fresh first-hand signal on the new
    # families, plus ppjoin_prefix_filter whose CODE changed this
    # round (positional filter) — re-certify the lossless claim with
    # driver signal, not just the local gate. The three already-green
    # anchors that held spare slots in the staged window
    # (event_transition_matrix / array_functions / q18_large_orders)
    # yield their seats to these five; q18's bench re-measure was
    # settled by the round-7 clean-machine bench runs. ---
    "ppjoin_prefix_filter",
    "matryoshka_recall_curve",
    "theil_sen_slope",
    "hits_hubs_authorities",
    "stream_stream_left_outer",
)

# ROUND-8 ROTATION QUEUE — the remaining never-driver-checked queries
# (cosine_topk_vectorized stays out: rows-only by design). Net-new
# round-7 registrations are appended at the END of this list as they
# land (the r5 discipline, continued):
# gdpr_delete_cascade, keyset_pagination, latency_percentiles,
# date_dimension_rollup,
# qq_deciles_compare, cohort_ltv_curve, revenue_waterfall,
# partition_skew_report,
# functional_dependency_check,
# approx_percentile_bounds, metric_driver_decomposition, abc_classification,
# loo_target_encoding, merkle_bucket_diff, ols_trend_per_group,
# rolling_origin_backtest, percent_of_parent, mode_per_group,
# pandas_cogroup_reconcile, item_cf_recommend,
# negative_sampling_pairs, asof_join_tolerance, record_linkage_score,
# join_fanout_audit, max_concurrent_intervals, interval_union_coverage,
# pipeline_windowed_custom_combine, value_outliers,
# ewma_user_value, first_touch_attribution, dead_letter_split,
# cuped_variance_reduction, golden_record_survivorship, entry_path_analysis,
# wow_growth, id_gap_islands, user_feature_matrix, ab_assignment_srm,
# chi_square_independence, event_run_length_encode, growth_accounting,
# distribution_drift_chisq, temporal_group_split, smoothed_ctr,
# user_survival_curve, changepoint_detector, cohorted_funnel,
# wilson_lower_bound_ranking, seasonality_index, interarrival_burstiness,
# poisson_bootstrap_ci, permutation_test_diff, mann_whitney_u,
# time_weighted_average, event_sequence_motifs, winsorized_mean,
# feature_correlation_matrix, watermark_lateness_advisor, diff_in_diff,
# seasonal_adjusted_anomaly, expected_shortfall, cumulative_distinct_curve,
# label_centroid_dispersion, bpe_pair_counts, bigram_lm_probs,
# mixture_weights, vocab_id_encode, source_gini_diversity, token_lift_pairs,
# dataset_card_report, feature_hashing_stats, keyword_in_context,
# unicode_nfc_clean, trending_terms_rankshift, classifier_eval_f1,
# doc_length_pow2_histogram, cohens_kappa_agreement,
# stream_windowed_custom_combine, stream_append_mode_tumbling,
# frame_hash_dedup, cas_dedup_savings, approx_top_k_events,
# sliding_distinct_bitmap, python_stream_source_agg,
# fifo_inventory_allocation, dup_ngram_spans, link_prediction_jaccard,
# stream_sliding_distinct,
# -- net-new round 7 --
# bm25_topk, gopher_quality_rules, shard_manifest_packing,
# classifier_calibration_bins, embedding_covariance_matrix,
# binned_interval_join, colbert_maxsim_topk, pca_power_iteration,
# stream_chained_window_aggs, rendezvous_shard_rebalance,
# priority_sample_sources, flesch_readability,
# balanced_range_bounds, delta_encoding_bits,
# l_diversity_audit, dict_encoding_estimate, zorder_pruning_audit,
# join_cardinality_estimate, quantile_prune_per_source,
# kendall_tau_trend, holt_linear_forecast, shuffle_skew_advisor,
# batch_match_recognize,
# mixture_epoch_plan, lsh_band_sweep, als_user_factor_solve,
# rolling_ols_slope, regression_stump_train, udtf_table_arg_sessions,
# conformal_interval_audit, cusum_drift_detector, anova_oneway,
# quantile_treatment_effect,
# -- round-7 session-3 --
# spearman_rank_corr, kruskal_wallis_test, roc_auc_exact, acf_lags,
# t_closeness_audit, binary_hamming_topk, dynamic_partition_prune_join,
# runtime_bloom_filter_join, resource_allocation_linkpred,
# retrieval_eval_map, cramers_v_association, parameterized_sql_binding,
# stream_stream_full_outer, two_proportion_ztest, span_corruption_targets,
# inferred_dimension_members, knn_classify_embeddings, binary_recall_at_k,
# kmv_theta_sketch_ops, pr_curve_points, eb_shrunk_conversion,
# boosting_residual_round, identifier_clause_scan,
# shapley_channel_attribution, degree_assortativity, dbscan_core_points,
# weiszfeld_geometric_median, yule_walker_ar2, mmd_quadratic_drift,
# logrank_test, wasserstein_1d_drift, holt_winters_seasonal,
# modularity_score, dispersion_index, capture_recapture_estimate,
# concordance_index, simpsons_paradox_audit, market_basket_rules,
# jackknife_variance, raking_ipf_weights, partial_correlation
# -- round-7 session-4 --
# ams_f2_moment, hilbert_curve_key, hilbert_vs_zorder_locality,
# ndcg_at_k, isotonic_calibration, brier_score_decomposition,
# closeness_centrality_sampled, propensity_stratified_ate,
# rake_keyphrases, random_projection_recall,
# curve_file_skipping_audit, offpolicy_ips_evaluation,
# dp_geometric_noise_counts, scc_pivot_fwbw, dag_longest_path_layers,
# kcenter_coreset_greedy, uncertainty_margin_sample,
# bellman_ford_weighted_paths, bom_quantity_rollup,
# stream_windowed_hll_distinct, blocking_quality_audit,
# revenue_recognition_proration, payload_tile_phash_dedup,
# ams_join_size_estimate, neyman_allocation, boruvka_msf_round,
# dedup_cluster_precision, symspell_id_neighbors,
# knn_distance_outliers, hampel_filter, dataset_version_fingerprint,
# incremental_join_maintenance, fellegi_sunter_em_step


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
