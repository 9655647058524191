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
#: registration order, so ordering is part of the contract.  Round-7
#: rotation (VERDICT_r6 item 1 — CLOSE the ledger): cumulative
#: driver-green after rounds 1-6 is 238/257 registered queries
#: (CORRECTNESS_r06 was 50/50 green), leaving 19 never driver-graded
#: (15 oracle-backed + 4 rows-only-by-design).  This window grades ALL
#: of the gradeable ones: 2 continuity anchors (ingest + the DES
#: kernel, green every round), the 15 never-graded oracle queries (9
#: round-5b analytics deferrals + the 6 round-6 additions), 3
#: re-grades whose plans were rewritten in round 6 AFTER their last
#: green (tpch_q15_top_supplier r03-green but scalar-agg rewrite;
#: watermark_lateness_audit r05-green but global_cummax rewrite;
#: minhash_estimate_error r06-green but possibly graded pre-b1732f8
#: double-sampling), 29 freshness re-greens (the oldest r02-era greens
#: — multimodal_frame_sample and token_count_regex defer to round 8,
#: each having an in-window family twin), and ``fifo_stats_approx`` as
#: the one rows-only entry (VERDICT_r6 "What's wrong" #3 asks for its
#: first driver row; its r01 err was under the old oracle protocol,
#: and the current contract gives oracle-less entries a rows-only
#: check — see registry.all_queries).  The other 3 rows-only kernel
#: runs are exposed in queries() but sit outside the first 50; they
#: rotate into round 8.  Everything rotated OUT was driver-green in a
#: prior round and stays registered + locally gated
#: (COVERAGE_LEDGER.md is the committed snapshot).  Cumulative if this
#: window grades green: 253/256 oracle-backed queries plus the first
#: rows-only row — the original 253-query oracle pool closes
#: completely.
DRIVER_WINDOW = [
    # --- continuity anchors (green in r01..r06) ---
    "ingest_requests",
    "kernel_fifo_k1",
    # --- never-graded oracle queries: round-5b analytics deferrals ---
    "regression_slope_daily",
    "event_path_topk",
    "stl_weekly_decompose",
    "stl_residual_anomalies",
    "benford_price_audit",
    "deterministic_shuffle_order",
    "peak_concurrency_sweep",
    "ewma_daily_value",
    "event_rate_autocorrelation",
    # --- never-graded oracle queries: round-6 additions ---
    "scd2_dimension_build",
    "gdpr_delete_propagation",
    "zorder_layout_manifest",
    "split_strategy_eval",
    "streaming_foreachbatch_merge",
    "xml_roundtrip",
    # --- re-grades: rewritten in round 6 after last green ---
    "tpch_q15_top_supplier",
    "watermark_lateness_audit",
    "minhash_estimate_error",
    # --- freshness re-greens (last green r02) ---
    "asof_join_purchase",
    "bpe_pair_frequencies",
    "contamination_ngram_overlap",
    "dataset_split",
    "dedup_clusters",
    "dedup_exact",
    "doc_fingerprint",
    "doc_quality_score",
    "doc_repetition_score",
    "doc_winnow_fingerprints",
    "embed_cosine_topk",
    "fifo_stats_by_user",
    "embed_ivf_probe_topk",
    "embed_lsh_bucket_topk",
    "embed_near_dup_pairs",
    "json_props_extract",
    "kmeans_assign",
    "lang_id",
    "minhash_lsh_pairs",
    "minhash_verified_pairs",
    "multimodal_features",
    "ngram_jaccard_pairs",
    "pii_redact",
    "range_join_error_context",
    "seq_pack_chunks",
    "simhash_near_dup_pairs",
    "streaming_fifo_state",
    "streaming_tumbling_counts",
    "text_stats",
    # --- rows-only (weaker driver check; VERDICT_r6 ask) ---
    "fifo_stats_approx",
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
