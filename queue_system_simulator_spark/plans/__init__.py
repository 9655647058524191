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
#: registration order, so ordering is part of the contract.  Round-4
#: rotation: cumulative driver-graded coverage after rounds 1-3 is
#: 106/179 registered queries; this window keeps just 3 continuity
#: anchors (ingest + the flagship stats + the DES kernel, all green in
#: every prior round) and spends 47 slots on never-yet-graded queries:
#: the 10 remaining TPC-H patterns, the extension surfaces (custom Python
#: data source batch+stream, ORC, UDTF, Arrow UDAF, chained stateful
#: streaming, sharded-exact percentiles), relational/analytics breadth
#: (grouping sets, SCD2, gap-fill, OHLC, snapshot diff, skew salting,
#: window showcases, DQ audits), and the LLM-curation families with no
#: graded sibling (Gopher flags, SemDeDup, fuzzy dedup, perplexity
#: filter, SQ8, IVF recall, incremental MinHash, vocab encode, LSH
#: recall eval, stratified split, embedding outliers, PQ ADC).
#: Everything rotated OUT was driver-green in a prior round
#: (CORRECTNESS_r01/r02/r03) and stays registered + locally gated
#: (tools/check_oracle.py); cumulative coverage after this window:
#: ~153/179.
DRIVER_WINDOW = [
    # --- continuity anchors (green in r01+r02+r03) ---
    "ingest_requests",
    "fifo_stats",
    "kernel_fifo_k1",
    # --- remaining TPC-H patterns (completes driver-graded 22/22) ---
    "tpch_q2_min_cost_supplier",
    "tpch_q4_late_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_filter",
    "tpch_q20_promotable_suppliers",
    "tpch_q22_dormant_customers",
    # --- extension surfaces: custom Python data source (batch + stream),
    # ORC sink/source, Python UDTF, Arrow UDAF, chained stateful
    # streaming, sharded-exact percentile path ---
    "pyds_request_log",
    "pyds_request_log_stream",
    "orc_roundtrip",
    "udtf_event_run_lengths",
    "weighted_value_mean_udaf",
    "streaming_join_then_window",
    "fifo_stats_distributed",
    # --- relational / analytics breadth ---
    "grouping_sets_revenue",
    "rollup_revenue",
    "window_function_showcase",
    "window_topn_orders",
    "setops_customer_segments",
    "skew_salted_user_totals",
    "scd2_user_history",
    "timeseries_gap_fill",
    "snapshot_diff_user_state",
    "events_hourly_ohlc",
    "incremental_rollup_merge",
    "seasonal_naive_forecast_eval",
    "dq_expectations_report",
    "subquery_rewrites_demo",
    "user_event_unpivot",
    # --- LLM-curation families with no graded sibling ---
    "gopher_quality_flags",
    "priority_sample_by_source",
    "dup_span_fraction",
    "semdedup_prune",
    "fuzzy_edit_dedup_pairs",
    "ppl_quantile_filter",
    "embed_sq8_quantize",
    "ivf_recall_at_k",
    "incremental_minhash_candidates",
    "quality_rank_by_source",
    "vocab_encode_ids",
    "lsh_recall_eval",
    "stratified_exact_split",
    "embed_outlier_flags",
    "pq_adc_topk",
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
