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
#: registration order, so ordering is part of the contract.  Round-5
#: rotation: cumulative driver-green coverage after rounds 1-4 is
#: 142/209 registered queries, with 67 lacking a current green row
#: (tools/coverage_ledger.py).  This window keeps just 2 continuity
#: anchors (ingest + the DES kernel, green in every prior round) and
#: spends 48 slots on queries without a green driver row, prioritizing
#: (a) the 10 analytics queries whose only driver record is a stale
#: round-1 environment error (`PARQUET_TYPE_ILLEGAL` on the old events
#: parquet — fixed in r02, re-verified locally every round since) and
#: (b) one-or-more members of every still-ungraded family: sketches
#: (HLL/CMS), privacy (k-anon, pseudonymization), MinHash/SimHash/IVF/PQ
#: building blocks + the composed IVF-PQ stack, multimodal aHash dedup,
#: dedup policy/span-removal/containment, graph triangles, as-of joins,
#: top-k with ties, the watermark audit, and the two-phase-rank rewrites
#: from this round (order_value_deciles, quality_dup_calibration,
#: vocab_roundtrip_check) so their new partition-safe plans get graded.
#: Everything rotated OUT was driver-green in a prior round
#: (CORRECTNESS_r01..r04) and stays registered + locally gated
#: (tools/check_oracle.py).  Still deferred to round 6 (all local-green):
#: 15 oracle-backed (showcases, calendar/moments profiles, corpus mix,
#: context windows, hard negatives, threshold sweep, cross-source dup
#: matrix, weekly WoW, shuffle-hash join demo, sampled count,
#: conversion-latency quantiles, variant props) + the 4 rows-only kernel
#: RNG runs.  Cumulative after this window: ~190/209.
DRIVER_WINDOW = [
    # --- continuity anchors (green in r01+r02+r03+r04) ---
    "ingest_requests",
    "kernel_fifo_k1",
    # --- the 10 stale-r01-error analytics queries (env error fixed in
    # r02; these look like failures on the scoreboard until re-graded) ---
    "funnel_view_click_purchase",
    "retention_cohorts",
    "value_histogram",
    "rate_anomalies",
    "event_type_transitions",
    "events_null_audit",
    "latest_event_per_user",
    "value_percentiles_by_type",
    "user_event_pivot",
    "session_conversion",
    # --- sketches / streaming-adjacent analytics ---
    "hll_distinct_users",
    "cms_heavy_hitters",
    "hll_incremental_merge",
    "sliding_distinct_users",
    "watermark_lateness_audit",
    # --- privacy / governance ---
    "k_anon_generalize",
    "pseudonymize_join_audit",
    # --- product analytics breadth ---
    "attribution_linear_credit",
    "recency_weighted_value",
    "user_burstiness",
    "slo_burn_rate",
    "ab_test_conversion",
    "transition_prediction_eval",
    "skew_diagnosis_report",
    "topk_with_ties",
    "asof_join_next_error",
    # --- relational breadth ---
    "customers_without_orders",
    "order_value_deciles",
    "order_line_summary",
    "referential_integrity_audit",
    "nation_revenue_share",
    "jsonl_roundtrip",
    # --- dedup / similarity building blocks and stacks ---
    "minhash_signatures",
    "simhash_signatures",
    "embed_ivf_centroids",
    "pq_codebook_assign",
    "ivf_pq_topk",
    "pq_recall_at_k",
    "hybrid_rrf_topk",
    "pair_graph_triangles",
    "ngram_containment_pairs",
    "dup_span_removal",
    "dedup_keep_best_quality",
    "quality_dup_calibration",
    "multimodal_ahash_dedup",
    # --- corpus curation ---
    "temperature_source_resample",
    "corpus_drift_tokens",
    "vocab_roundtrip_check",
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
