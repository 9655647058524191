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
    scale_queries,
)

#: The driver grades exactly the FIRST 50 entries of ``queries()`` in
#: registration order, so ordering is part of the contract.  Round-6
#: rotation: cumulative driver-green coverage after rounds 1-5 is
#: 190/251 registered queries (CORRECTNESS_r05 was 50/50 green), with 61
#: never driver-graded (tools/coverage_ledger.py).  That pool EXCEEDS one
#: 50-slot window, so this window keeps 2 continuity anchors (ingest +
#: the DES kernel, green in every prior round) and spends 48 slots on
#: never-graded queries in priority order per VERDICT_r5 item 1:
#: (a) all 15 oracle-backed pre-round-5 deferrals (showcases, calendar/
#: moments profiles, corpus mix, context windows, hard negatives,
#: threshold sweep, cross-source dup matrix, weekly WoW, shuffle-hash
#: join demo, sampled count, conversion-latency quantiles, variant
#: props); (b) all 13 round-5a additions (TPC-H q16, bucketed join,
#: BM25, curation funnel, MAD anomalies, partition pruning, text-log /
#: binaryFile sources, the LSH/IVF calibration sweeps, tokenizer
#: fertility, CoGroupedMap); (c) 20 of the 29 round-5b additions,
#: user-impact first (CDC MERGE, streaming compaction, schema evolution,
#: column drift, compressed round-trips, the AllPairs prefix filter,
#: blocking eval, TF-IDF verify scorer, SQ8 rerank, Zipf fit, k-core,
#: shard layout/packing, privacy noise, entropy quality, sketch-accuracy
#: eval — minhash_estimate_error newly pair-capped this round).
#: Deferred to round 7 (all local-green at sf0.01 AND sf0.1): 9
#: oracle-backed r5b analytics (ewma_daily_value,
#: event_rate_autocorrelation, peak_concurrency_sweep,
#: stl_weekly_decompose, stl_residual_anomalies, regression_slope_daily,
#: event_path_topk, benford_price_audit, deterministic_shuffle_order),
#: the 4 rows-only kernel RNG runs, and the 4 round-6 additions
#: (scd2_dimension_build, gdpr_delete_propagation,
#: zorder_layout_manifest, split_strategy_eval, xml_roundtrip).  Everything
#: rotated OUT was driver-green in a prior round (CORRECTNESS_r01..r05)
#: and stays registered + locally gated (COVERAGE_LEDGER.md is the
#: committed snapshot).  Cumulative if this window grades green: 238/257.
DRIVER_WINDOW = [
    # --- continuity anchors (green in r01..r05) ---
    "ingest_requests",
    "kernel_fifo_k1",
    # --- (a) pre-round-5 oracle-backed deferrals ---
    "conversion_latency_quantiles",
    "null_semantics_showcase",
    "events_calendar_profile",
    "value_moments_by_type",
    "sampled_count_estimate",
    "map_functions_showcase",
    "array_functions_showcase",
    "variant_props_extract",
    "corpus_mix_sample",
    "context_windows",
    "hard_negative_mining",
    "filter_threshold_sweep",
    "cross_source_dup_matrix",
    "shuffle_hash_join_orders",
    "weekly_revenue_wow",
    # --- (b) round-5a additions ---
    "tpch_q16_part_supplier_counts",
    "bucketed_join_orders",
    "bm25_topk",
    "curation_pipeline_report",
    "mad_robust_anomalies",
    "partition_pruned_scan",
    "textlog_parse",
    "binaryfile_ingest",
    "lsh_threshold_sweep",
    "lsh_bands_sweep",
    "ivf_nprobe_sweep",
    "tokenizer_fertility_by_lang",
    "cogroup_click_context",
    # --- (c) round-5b additions, user-impact first ---
    "cdc_merge_orders",
    "streaming_compacted_latest",
    "schema_evolution_mergeread",
    "column_profile_drift",
    "compressed_roundtrip",
    "prefix_filter_jaccard_pairs",
    "blocking_strategy_eval",
    "tfidf_cosine_pairs",
    "minhash_estimate_error",
    "sq8_rerank_topk",
    "quantile_normalize_embeddings",
    "hll_precision_sweep",
    "dp_noisy_counts",
    "source_lang_entropy",
    "char_entropy_quality",
    "zipf_exponent_fit",
    "kcore_peel_rounds",
    "multimodal_shard_packing",
    "lineitem_range_shard_manifest",
    "token_shard_assignment",
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
