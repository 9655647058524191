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
#: registration order, so ordering is part of the contract.  Round-11
#: rotation (VERDICT_r10 items 1 + 3): CORRECTNESS_r10 was 50/50 green
#: (cumulative 259/259; no green older than r05).  This window keeps
#: the 2 continuity anchors, grades the round-11 addition
#: ``versioned_compaction_optimize`` (the verdict's item-3 seam:
#: OPTIMIZE/bin-pack compaction on the versioned lake — newest snapshot
#: rewritten into <= COMPACT_TARGET_FILES range-clustered files,
#: committed as a data-identical manifest version through the
#: crash-recoverable swap; hash-equal locally at sf0.001/0.01/0.1),
#: re-greens ALL 21 remaining r05-era queries (exact list from the
#: verdict, led by the family anchors ``pq_codebook_assign`` and
#: ``temperature_source_resample``), and fills the remaining 26 slots
#: from the r06-era tier (46 rows) with the verdict's named five
#: (prefix filter, bucketed join, partition pruning, variant path,
#: binary ingest) plus the usual one-per-family spread: TPC-H/joins
#: (q16, shuffle-hash, CDC merge, WoW, null semantics), connectors
#: (codecs, schema evolution, textlog, range-shard manifest), sketches
#: and robust stats (HLL sweep, MAD, conversion quantiles), dedup
#: (blocking eval, cross-source matrix, LSH bands), ANN (nprobe sweep,
#: SQ8 rerank), text retrieval/quality (BM25, char entropy), multimodal
#: shard packing, and the compacted-latest streaming read.  After this
#: round no query's newest green is older than r06 and the r06 tier
#: shrinks 46 -> 20.  Everything rotated OUT was driver-green in a
#: prior round and stays registered + locally gated
#: (COVERAGE_LEDGER.md is the committed snapshot).
DRIVER_WINDOW = [
    # --- continuity anchors (green every round r01..r10) ---
    "ingest_requests",
    "kernel_fifo_k1",
    # --- round-11 addition (local-green at 3 scales; VERDICT_r10 item 3:
    # Delta-OPTIMIZE/Iceberg-rewrite_data_files compaction on the
    # versioned lake — bin-packed range-clustered rewrite committed as a
    # byte-identical new version, superseded files left for VACUUM) ---
    "versioned_compaction_optimize",
    # --- freshness re-greens: ALL 21 remaining r05-era queries ---
    "pq_codebook_assign",
    "temperature_source_resample",
    "ab_test_conversion",
    "asof_join_next_error",
    "attribution_linear_credit",
    "corpus_drift_tokens",
    "events_null_audit",
    "hll_incremental_merge",
    "pair_graph_triangles",
    "pseudonymize_join_audit",
    "quality_dup_calibration",
    "rate_anomalies",
    "recency_weighted_value",
    "referential_integrity_audit",
    "skew_diagnosis_report",
    "slo_burn_rate",
    "transition_prediction_eval",
    "user_burstiness",
    "value_histogram",
    "value_percentiles_by_type",
    "vocab_roundtrip_check",
    # --- freshness re-greens, r06-era: verdict's named five ---
    "prefix_filter_jaccard_pairs",
    "bucketed_join_orders",
    "partition_pruned_scan",
    "variant_props_extract",
    "binaryfile_ingest",
    # --- freshness re-greens, r06-era: TPC-H / join strategy / lake ---
    "tpch_q16_part_supplier_counts",
    "shuffle_hash_join_orders",
    "cdc_merge_orders",
    "weekly_revenue_wow",
    "null_semantics_showcase",
    # --- freshness re-greens, r06-era: connectors / layout ---
    "compressed_roundtrip",
    "schema_evolution_mergeread",
    "textlog_parse",
    "lineitem_range_shard_manifest",
    # --- freshness re-greens, r06-era: sketches / robust stats ---
    "hll_precision_sweep",
    "mad_robust_anomalies",
    "conversion_latency_quantiles",
    # --- freshness re-greens, r06-era: dedup family ---
    "blocking_strategy_eval",
    "cross_source_dup_matrix",
    "lsh_bands_sweep",
    # --- freshness re-greens, r06-era: ANN family ---
    "ivf_nprobe_sweep",
    "sq8_rerank_topk",
    # --- freshness re-greens, r06-era: text retrieval / quality ---
    "bm25_topk",
    "char_entropy_quality",
    # --- freshness re-greens, r06-era: multimodal / streaming ---
    "multimodal_shard_packing",
    "streaming_compacted_latest",
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
