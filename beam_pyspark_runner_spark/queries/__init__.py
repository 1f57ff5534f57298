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

# The external driver's correctness gate checks the FIRST 50 registry
# entries (dict iteration order). Round-4 rotation (per the round-2
# verdict's #1 ask): 5 sentinels/anchors + the 9 queries that went
# red in round 3 (the events.ts fixture-encoding regression — re-proving
# the fix with hard signal) + the 5 new round-4 queries (partsupp
# TPC-H q2/q9/q11 + stateful-timeout streaming) + 31 queries never yet
# driver-checked (chosen to span every operator family). Cumulative
# driver-checked coverage after this round: ~125/162. Queries WITHOUT a
# full SQL oracle (rows-only by design) must stay out of the window.
# Everything not listed keeps registration order after it;
# tests/test_oracle_harness.py pins the invariants.
#
# Round-5 rotation queue (never driver-checked after r4, 40 names; all
# locally oracle-verified at sf0.01 AND sf0.1): cross_join_small_dims,
# null_safe_join, first_last_per_group, analytic_functions,
# above_group_avg, range_interval_frame, pipeline_windowed_count,
# event_type_pivot, cohort_retention, top_sessions, session_window_batch,
# resample_fill_gaps, xml_roundtrip, dedup_exact_normalized,
# edit_distance_pairs, kmeans_lloyd_step, text_stats, token_count_regex,
# doc_fingerprint, lang_id_heuristic, lang_distribution, chunk_documents,
# train_val_split, source_quota_sample, repetition_filter,
# udtf_dynamic_split, stream_sliding_agg, stream_dedup_ids,
# stream_dedup_within_watermark, stream_cdc_upsert, audio_feature_stub,
# cms_build, bloom_build, hll_distinct_estimate, cms_heavy_hitters,
# exact_heavy_hitters, bitmap_distinct_exact, python_datasource_scan,
# q16_partsupp_supplier_counts, q20_partsupp_excess.
DRIVER_WINDOW: tuple[str, ...] = (
    # sentinels: continuity + single-representative family anchors
    # (metrics/UDTF/pandas-UDF each have one canonical query — pinned)
    "q1_pricing_summary",
    "pipeline_wordcount",
    "metrics_counters",
    "udtf_token_positions",
    "pandas_udf_density_score",
    # round-3 reds: events.ts regression, fixed in readers.load_table
    "asof_join",
    "dedup_latest_by_key",
    "tumbling_window_agg",
    "sessionization",
    "stream_tumbling_agg",
    "stream_session_window",
    "stream_stateful_count",
    "stream_stream_join",
    "stream_static_join",
    # new in round 4
    "partsupp_synth_balance",
    "q9_product_profit",
    "q11_important_stock",
    "q2_partsupp_min_cost",
    "stream_session_timeout_state",
    # never-driver-checked: TPC-H + SQL API
    "q5_local_supplier_volume",
    "q3_shipping_priority",
    "sql_api_revenue",
    # relational / scalar fns
    "map_functions",
    "union_schema_evolution",
    "try_arithmetic",
    # joins
    "join_full_outer",
    "salted_skew_join",
    # window functions
    "rank_dense_rank",
    "running_total_frame",
    "scd2_history",
    # event analytics
    "json_extraction",
    "sliding_window_agg",
    "funnel_stages",
    # streaming (remaining never-checked)
    "stream_foreach_batch_sink",
    # dedup / decontamination
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "benchmark_decontaminate",
    # similarity / ANN
    "ivf_centroid_assign",
    "embedding_near_dup",
    # text / training-data ops
    "quality_filter",
    "corpus_to_training_set",
    "pack_token_budget",
    "pii_redact",
    # multimodal
    "binary_payload_stats",
    "video_frame_sample_stub",
    # sketches
    "quantile_bin_sketch",
    # io / layout
    "json_roundtrip",
    "orc_roundtrip",
    "sideinput_dict_enrich",
    "zorder_key",
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
