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
# entries (dict iteration order). Round-11 rotation (the round-10
# verdict's #2 ask, verbatim): the 5 sentinel family anchors keep
# their seats; the other 45 are ALL first-time-checked — the ten
# round-10 registrations (the only queries with zero driver history,
# named by the verdict for these seats) plus 35 straight off the
# queue head in registration order. Debt 134 → ≤94 (+net-new ≤10).
# All 50 are locally oracle-MATCH at sf0.01 AND sf0.1
# (tests/oracle_check.py).
# ROUND-12 ROTATION QUEUE: see the comment block right after this tuple.
DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels: continuity + single-representative family anchors
    # (metrics/UDTF/pandas-UDF each have one canonical query — pinned)
    "q1_pricing_summary",
    "pipeline_wordcount",
    "metrics_counters",
    "udtf_token_positions",
    "pandas_udf_density_score",
    # --- verdict #2: the ten round-10 registrations (zero driver history) ---
    "mann_kendall_trend",
    "cochran_armitage_trend",
    "sax_symbolization",
    "rank_biased_overlap",
    "grubbs_max_deviate",
    "mahalanobis_diag_outliers",
    "rocchio_centroid_classify",
    "ngram_contamination_audit",
    "nn_descent_round_recall",
    "cooks_distance_influence",
    # --- queue head (never driver-checked, registration order) ---
    "expected_shortfall",
    "cumulative_distinct_curve",
    "slo_error_budget_burn",
    "batch_match_recognize",
    "udtf_table_arg_sessions",
    "quantile_treatment_effect",
    "two_proportion_ztest",
    "shapley_channel_attribution",
    "logrank_test",
    "dispersion_index",
    "capture_recapture_estimate",
    "concordance_index",
    "propensity_stratified_ate",
    "offpolicy_ips_evaluation",
    "dp_geometric_noise_counts",
    "revenue_recognition_proration",
    "frequent_sequence_pairs",
    "propensity_nn_matching_att",
    "dup_ngram_spans",
    "blocking_quality_audit",
    "dedup_cluster_precision",
    "weighted_jaccard_pairs",
    "label_centroid_dispersion",
    "embedding_covariance_matrix",
    "colbert_maxsim_topk",
    "pca_power_iteration",
    "als_user_factor_solve",
    "binary_hamming_topk",
    "retrieval_eval_map",
    "knn_classify_embeddings",
    # pulled forward past the strict queue head (family-diversity
    # invariant: the 30-seat head slice carried no streaming/sketch/
    # multimodal/join/window-tagged query — the round-10 lsh_band_sweep
    # precedent; the displaced head entries binary_recall_at_k …
    # smote_interpolation_synthesis return to the round-12 queue head).
    # sliding_distinct_bitmap doubles as the verdict-#5 re-measure
    # target, giving it first-hand driver signal the same round:
    "stream_chained_window_aggs",
    "sliding_distinct_bitmap",
    "frame_hash_dedup",
    "runtime_bloom_filter_join",
    "semi_additive_last_balance",
)

# ROUND-12 ROTATION QUEUE — the remaining never-driver-checked queries
# in registration order (cosine_topk_vectorized stays out: rows-only by
# design). The 35 round-11 queue seats were consumed off the head
# (expected_shortfall … smote_interpolation_synthesis) and the ten
# round-10 registrations pulled forward per the verdict; net-new
# round-11 registrations append at the END as they land (the r5
# discipline, continued):
# binary_recall_at_k, ndcg_at_k, random_projection_recall,
# kcenter_coreset_greedy, smote_interpolation_synthesis (displaced by
# the round-11 family-diversity pull-forward),
# bigram_lm_probs, mixture_weights,
# source_gini_diversity, token_lift_pairs, dataset_card_report,
# feature_hashing_stats, keyword_in_context, unicode_nfc_clean,
# classifier_eval_f1, doc_length_pow2_histogram, cohens_kappa_agreement,
# bm25_topk, gopher_quality_rules, shard_manifest_packing,
# classifier_calibration_bins, priority_sample_sources,
# flesch_readability, quantile_prune_per_source, mixture_epoch_plan,
# roc_auc_exact, cramers_v_association, span_corruption_targets,
# pr_curve_points, isotonic_calibration, brier_score_decomposition,
# stream_windowed_custom_combine, stream_sliding_distinct,
# stream_stream_full_outer,
# approx_top_k_events, ams_f2_moment,
# ams_join_size_estimate, cas_dedup_savings,
# python_stream_source_agg, rendezvous_shard_rebalance,
# dict_encoding_estimate, zorder_pruning_audit,
# dynamic_partition_prune_join,
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
# lift_gains_by_decile,
# allen_interval_relations, time_decay_attribution,
# delete_vector_apply_audit,
# heaps_vocab_growth_curve, histogram_distance_drift,
# thumbnail_resize_stub, user_activity_streaks, qini_uplift_curve,
# clv_btyd_model_inputs, seasonal_naive_mase,
# embedding_centroid_shift,
# benford_law_audit, wald_wolfowitz_runs_test, atkinson_inequality_index,
# friedman_test, goodman_kruskal_tau, group_skewness_kurtosis,
# fk_orphan_audit, platt_scaling_newton_step, chao1_vocab_richness,
# stratified_kfold_assignment, mcc_matthews_correlation,
# cochran_q_test
# -- round-9 net-new registrations (10, <= the 20 cap; all dual-scale
# -- oracle-MATCH on registration day): ljung_box_test,
# durbin_watson_statistic, jarque_bera_test, huber_m_estimator_irls,
# goodman_kruskal_gamma, page_hinkley_drift, granger_causality_lag1,
# bridge_table_weighted_rollup, edge_triangle_support,
# simplified_silhouette
# -- round-10 net-new registrations (10, == the 10 cap; all dual-scale
# -- oracle-MATCH on registration day): mann_kendall_trend,
# cochran_armitage_trend, sax_symbolization, rank_biased_overlap,
# grubbs_max_deviate, mahalanobis_diag_outliers,
# rocchio_centroid_classify, ngram_contamination_audit,
# nn_descent_round_recall, cooks_distance_influence
# -- round-11 net-new registrations (10, == the 10 cap; all TRI-scale
# -- oracle-MATCH on registration day, sf0.001/0.01/0.1):
# welch_t_test, generalized_esd_outliers, benjamini_hochberg_fdr,
# hurst_rescaled_range, bass_diffusion_fit, hoover_index_decomposition,
# hnsw_level_assignment, betweenness_centrality_sampled,
# video_keyframe_delta_stub, recursive_cte_cycle_guard


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
