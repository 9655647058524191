from queue_system_simulator_spark.plans.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    all_queries,
    all_oracles,
)

# importing these modules populates the registry
from queue_system_simulator_spark.plans import (  # noqa: F401,E402
    analytics_queries,
    reference_queries,
    tpch_queries,
    llm_queries,
    multimodal_queries,
    relational_queries,
    kernel_queries,
    streaming_queries,
)

#: The driver grades exactly the FIRST 50 entries of ``queries()`` in
#: registration order, so ordering is part of the contract.  Round-3
#: rotation: keep the 20 SURVEY-§2 parity anchors (reference operator
#: surface + the five hash-graded kernel oracles + the newly-gradeable
#: generator), and spend the other 30 slots on queries never yet graded by
#: the driver — all 8 remaining streaming queries, the iterative/graph/
#: clustering flagships, the remaining multimodal paths, the 6 most
#: pattern-distinct ungraded TPC-H adaptations, and one representative of
#: each round-3 operator family with no graded sibling (Bloom dedup, BPE
#: training, DSIR, Z-order).  Everything rotated OUT was driver-green in
#: round 1 or 2 (CORRECTNESS_r01/r02) and stays registered + locally
#: gated (tools/check_oracle.py); cumulative driver-graded coverage after
#: this window: ~95/170.
DRIVER_WINDOW = [
    # --- §2 anchors: reference operator surface (A–D, G) ---
    "ingest_requests",
    "sim_arrival_time",
    "negative_arrival_check",
    "priority_class",
    "hms_format",
    "input_count",
    "fifo_timeline",
    "fifo_stats",
    "sim_result_stats",
    "api_usage_zero_fill",
    "enqueue_totals",
    "result_order",
    "rate_limit_sliding",
    "queue_depth_timeseries",
    # A6+D3, newly hash-gradeable (md5-derived uniforms, r3)
    "generate_requests",
    # A7+A5, newly hash-gradeable (r3): render stage as a (line_no, line)
    # frame; parquet-datalake sink round-trip vs the original table
    "console_report",
    "datalake_roundtrip",
    # --- §2 anchors: the five hash-graded E-block kernel oracles ---
    "kernel_fifo_k1",
    "kernel_fifo_bounded_oracle",
    "kernel_priority_oracle",
    "kernel_fifo_k2_oracle",
    "kernel_api_rotation_oracle",
    # --- never-driver-graded: Structured Streaming, complete family ---
    "streaming_sliding_api_load",
    "streaming_session_counts",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_dedup_counts",
    "streaming_dedup_within_watermark",
    "streaming_enrich_segment_counts",
    "streaming_rate_limit",
    # --- never-driver-graded: iterative / graph / clustering flagships ---
    "pagerank_near_dup",
    "cluster_aware_split",
    "kmeans_medoid_keep",
    "user_activity_similarity",
    # --- never-driver-graded: remaining multimodal paths ---
    "multimodal_features_arrow",
    "multimodal_resize_stats",
    "multimodal_audio_windows",
    # --- never-driver-graded: corpus-statistics flagships ---
    "tfidf_top_terms",
    "embed_knn_graph",
    "bigram_lm_doc_score",
    # --- never-driver-graded: pattern-distinct TPC-H adaptations ---
    # (q4/q5/q10/q13/q17/q19/q22 wait for the round-4 rotation; 50 slots
    # is 50 — four slots went to the round-3 operator families below)
    "tpch_q7_trade_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q12_priority_by_flag",
    "tpch_q15_top_supplier",
    "tpch_q21_waiting_suppliers",
    # --- round-3 operator families with no graded sibling: distributed
    # Bloom dedup, iterative BPE training, DSIR data selection, Z-order
    # layout (each a genuinely new pattern, not a composition of already-
    # graded plans) ---
    "incremental_dedup_bloom",
    "bpe_merge_training",
    "dsir_importance_weights",
    "zorder_file_layout",
]


def _apply_driver_order() -> None:
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_order()
