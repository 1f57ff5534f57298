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
# entries (dict iteration order). Round-5 rotation (per the round-4
# verdict's #1 ask): 5 sentinels/anchors + 4 continuity picks from the
# round-4 greens (one per big family: streaming/join/TPC-H/text) +
# approx_distinct (newly oracle-able via deterministic error bounds —
# its only driver row ever was a round-1 `no_oracle` red) + the 40
# queries that have never had first-hand driver signal (all locally
# oracle-verified at sf0.01 and sf0.1; see tests/oracle_check.py).
# After this round every registered query except cosine_topk_vectorized
# (rows-only by design, stays out per protocol) and any net-new round-5
# queries (slotted into the next rotation) has first-hand driver signal.
# ROUND-6 ROTATION QUEUE (net-new this round, all locally oracle-MATCH
# at sf0.01 AND sf0.1): label_prop_weighted, skyline_pareto,
# group_median_mad, inverted_index_postings, source_gini_diversity,
# bitmap_intersect_exact, stream_windowed_topk, first_touch_attribution,
# dead_letter_split, embedding_scalar_quantize, ntile_quartile_stats,
# sql_pipe_syntax, token_lift_pairs, quantile_normalize,
# dq_contract_check, incremental_agg_merge, pandas_cogroup_reconcile,
# cuped_variance_reduction, golden_record_survivorship,
# entry_path_analysis, modality_router, wow_growth, id_gap_islands,
# user_feature_matrix, stream_dead_letter_route, incremental_dedup_delta,
# python_datasource_sink, parquet_codec_roundtrip,
# label_centroid_dispersion, dataset_card_report, approx_top_k_events,
# hll_datasketch_union, listagg_ordered, rfm_segmentation,
# benford_first_digit, revenue_concentration_8020,
# incremental_daily_close, item_cf_recommend,
# duplicate_payment_detection, feature_hashing_stats, keyword_in_context,
# negative_sampling_pairs, table_diff_reconcile, column_profile,
# ab_assignment_srm, asof_join_tolerance, stream_ab_metrics,
# latency_percentiles, date_dimension_rollup, chi_square_independence,
# source_precedence_dedup, gdpr_delete_cascade, minhash_estimate_vs_exact,
# unicode_nfc_clean, record_linkage_score, keyset_pagination,
# event_run_length_encode, growth_accounting, diversified_topk,
# distribution_drift_chisq, join_fanout_audit, trending_terms_rankshift,
# qq_deciles_compare, cohort_ltv_curve, revenue_waterfall,
# temporal_group_split, smoothed_ctr, classifier_eval_f1,
# user_survival_curve, retrieval_eval_mrr, changepoint_detector,
# partition_skew_report, functional_dependency_check, sql_udf_scalar, approx_percentile_bounds, boilerplate_line_removal,
# lm_fluency_score, doc_length_pow2_histogram, degree_distribution,
# csv_permissive_recovery, content_defined_chunking, cohorted_funnel,
# metric_driver_decomposition, abc_classification, containment_pairs,
# wilson_lower_bound_ranking, seasonality_index, interarrival_burstiness,
# cohens_kappa_agreement, poisson_bootstrap_ci, loo_target_encoding,
# permutation_test_diff, mann_whitney_u, max_concurrent_intervals,
# time_weighted_average, ppjoin_prefix_filter, merkle_bucket_diff,
# vocab_coverage_curve, bfs_shortest_hops, sliding_distinct_bitmap,
# ols_trend_per_group, stream_sliding_distinct, event_sequence_motifs,
# fifo_inventory_allocation, winsorized_mean, clustering_coefficient,
# interval_union_coverage, feature_correlation_matrix,
# rolling_origin_backtest, dedup_scaling_curve, triplet_mining,
# cas_dedup_savings, link_prediction_jaccard, watermark_lateness_advisor,
# stream_cep_error_then_purchase, schema_evolution_merge,
# decayed_trending_score, diff_in_diff, seasonal_adjusted_anomaly,
# hybrid_search_rrf, percent_of_parent, expected_shortfall,
# pardo_exception_dead_letter, mode_per_group, cumulative_distinct_curve,
# weighted_median, gini_coefficient, asof_join_nearest — plus the
# prior-session round-5 additions not in the current window (see git
# log b155159..740484d).
# Everything not listed keeps registration order after it;
# tests/test_oracle_harness.py pins the invariants.
DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels: continuity + single-representative family anchors
    # (metrics/UDTF/pandas-UDF each have one canonical query — pinned)
    "q1_pricing_summary",
    "pipeline_wordcount",
    "metrics_counters",
    "udtf_token_positions",
    "pandas_udf_density_score",
    # continuity picks (round-4 greens, one per major family)
    "stream_tumbling_agg",
    "asof_join",
    "q9_product_profit",
    "quality_filter",
    # newly oracle-able (deterministic-bound oracle, round-5)
    "approx_distinct",
    # --- the 40 never-driver-checked queries ---
    # joins
    "cross_join_small_dims",
    "null_safe_join",
    # relational / window functions
    "first_last_per_group",
    "analytic_functions",
    "above_group_avg",
    "range_interval_frame",
    # pipeline API
    "pipeline_windowed_count",
    # event analytics
    "event_type_pivot",
    "cohort_retention",
    "top_sessions",
    "session_window_batch",
    "resample_fill_gaps",
    # io
    "xml_roundtrip",
    # dedup
    "dedup_exact_normalized",
    "edit_distance_pairs",
    "doc_fingerprint",
    # similarity / clustering
    "kmeans_lloyd_step",
    # text / training-data ops
    "text_stats",
    "token_count_regex",
    "lang_id_heuristic",
    "lang_distribution",
    "chunk_documents",
    "train_val_split",
    "source_quota_sample",
    "repetition_filter",
    "udtf_dynamic_split",
    # streaming
    "stream_sliding_agg",
    "stream_dedup_ids",
    "stream_dedup_within_watermark",
    "stream_cdc_upsert",
    # multimodal
    "audio_feature_stub",
    # sketches
    "cms_build",
    "bloom_build",
    "hll_distinct_estimate",
    "cms_heavy_hitters",
    "exact_heavy_hitters",
    "bitmap_distinct_exact",
    # connectors
    "python_datasource_scan",
    # partsupp TPC-H
    "q16_partsupp_supplier_counts",
    "q20_partsupp_excess",
)


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
