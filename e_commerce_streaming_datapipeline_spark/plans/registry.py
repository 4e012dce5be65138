"""Query registry: every operator from SURVEY.md §2 (plus the scale-up
operators) registers itself here as a named ``(spark, sf_dir) -> DataFrame``
builder with an optional DuckDB oracle SQL string.

``__spark_entry__.py`` (the driver contract) is a thin view over this
registry.  Column-name discipline: builders alias every computed column and
the oracle SQL uses identical ``AS`` names — the driver's compare sorts
columns by name before hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# operator modules that register queries on import
_OPERATOR_MODULES = [
    "e_commerce_streaming_datapipeline_spark.operators.gmv",
    "e_commerce_streaming_datapipeline_spark.operators.funnel",
    "e_commerce_streaming_datapipeline_spark.operators.dropoff",
    "e_commerce_streaming_datapipeline_spark.operators.payment",
    "e_commerce_streaming_datapipeline_spark.operators.row_ops",
    "e_commerce_streaming_datapipeline_spark.operators.dedup",
    "e_commerce_streaming_datapipeline_spark.operators.joins",
    "e_commerce_streaming_datapipeline_spark.operators.advanced",
    "e_commerce_streaming_datapipeline_spark.operators.connectors",
    "e_commerce_streaming_datapipeline_spark.operators.views",
    "e_commerce_streaming_datapipeline_spark.operators.analytics",
    "e_commerce_streaming_datapipeline_spark.operators.text",
    "e_commerce_streaming_datapipeline_spark.operators.similarity",
    "e_commerce_streaming_datapipeline_spark.operators.multimodal",
    "e_commerce_streaming_datapipeline_spark.operators.streaming_queries",
    "e_commerce_streaming_datapipeline_spark.operators.setops",
    "e_commerce_streaming_datapipeline_spark.operators.sampling",
    "e_commerce_streaming_datapipeline_spark.operators.tpch_shapes",
    "e_commerce_streaming_datapipeline_spark.operators.tpch_shapes2",
    "e_commerce_streaming_datapipeline_spark.operators.curation",
    "e_commerce_streaming_datapipeline_spark.operators.statistics",
    "e_commerce_streaming_datapipeline_spark.operators.layout",
    "e_commerce_streaming_datapipeline_spark.operators.graph",
    "e_commerce_streaming_datapipeline_spark.operators.segmentation",
    "e_commerce_streaming_datapipeline_spark.operators.retrieval",
    "e_commerce_streaming_datapipeline_spark.operators.quality",
    "e_commerce_streaming_datapipeline_spark.operators.ml_training",
]


# The external correctness driver snapshots a fixed-size prefix (50 entries)
# of ``queries()`` in iteration order.  To guarantee that window witnesses at
# least one proof query per SURVEY.md §2 family (S sources / P row ops /
# A aggregations / J joins / D dedup+stateful / K sinks / V views / UDF
# surface) AND per LLM-data-pipeline family (dedup, ANN, text, curation,
# sampling, multimodal, streaming, TPC-H shapes, analytics, sketches), the
# registry emits this curated prefix first, then every remaining query in
# registration order.  Round-2 verdict finding #1: appending modules rotated
# views.py proof queries out of the driver window — this makes the window
# content explicit and insertion-order-proof.
# Rotation ledger: the driver hash-checks only the first 50 entries of
# ``queries()``, so per-round the prefix rotates through the registry while
# keeping one witness per SURVEY §2 / LLM-pipeline family.  Names witnessed
# by a driver CORRECTNESS row in any earlier round (r1-r4 windows; see
# CORRECTNESS_r0{1,2,3,4}.json) — kept so each round's rotation can prove it
# adds never-before-witnessed queries:
_DRIVER_WITNESSED_PRIOR = frozenset(
    {
        # the round-9 window (CORRECTNESS_r09.json): 50/50 all-green — the
        # first fully-green hash-checked round including all three
        # bounds-oracle sketches.  The 35 rotated-in first-witness queries
        # below all got green rows
        "holt_winters_backtest", "kcore_decomposition",
        "peak_concurrent_sessions", "boolean_and_search",
        "supplier_pareto_frontier", "label_propagation_communities",
        "purged_timeseries_folds", "sorted_neighborhood_pairs",
        "stratified_uplift_ipw", "rake_keyphrases",
        "stream_state_size_advisor", "event_burst_detection", "ab_srm_check",
        "burst_detection_stream", "cart_abandonment_stream",
        "funnel_completion_stream", "multi_metric_stream",
        "gmv_cascade_stream", "session_stream", "attribution_stream_join",
        "click_purchase_full_outer_stream", "attributed_clicks_semi_stream",
        "complete_funnel_stream", "funnel_stream_hourly",
        "gmv_sliding_stream", "golden_record_stream",
        "hll_users_daily_to_monthly", "approx_value_percentiles",
        "kaplan_meier_conversion", "encoding_advisor", "hour_value_heatmap",
        "embedding_topk_lsh_multiprobe", "multimodal_frame_sample",
        "min_cost_supplier", "python_datasource_sink_roundtrip",
    }
) | frozenset(
    {
        # the round-8 window (CORRECTNESS_r08.json): 49/50 all-green, the
        # 50th (approx_unique_users_hourly, rows-only by design then —
        # bounds-oracle since r9) witnessed in r1-r3.  The 28 rotated-in
        # first-witness queries below all got green rows
        "jaccard_threshold_sweep", "packing_efficiency_sweep",
        "cross_source_leakage_matrix", "kanon_generalization_ladder",
        "benford_revenue_audit", "conversion_window_sweep",
        "schema_drift_audit", "partition_evolution_scan",
        "embedding_outlier_topk", "session_funnel_conversion",
        "cohort_ltv_triangle", "vocabulary_growth_curve",
        "revenue_concentration_hhi", "props_schema_census",
        "scd2_priority_history", "term_postings", "attribution_first_last",
        "forecast_backtest_snaive", "nation_pagerank", "cohort_retention",
        "grouping_sets_revenue", "top_customers", "daily_revenue_ma",
        "session_window_stats", "xml_source_stats", "multimodal_resize",
        "unique_buyers_stream", "embedding_near_dups",
    }
) | frozenset(
    {
        # the round-7 window (CORRECTNESS_r07.json): 49/50 all-green, the
        # 50th (approx_unique_users_hourly) rows-only by design — the first
        # fully-green driver round since r2.  The six r6 keepers-by-
        # exception all went green and leave the window; the 20 rotated-in
        # first-witness queries are recorded here
        "zorder_layout_stats", "leaderboard_stream", "bloom_filter_prejoin",
        "compaction_plan", "supplier_triangles", "conformal_interval",
        "ivm_delta_merge", "deletion_vector_scan",
        "compaction_rewrite_roundtrip", "vacuum_orphan_files",
        "index_delta_merge", "index_tombstone_merge", "pit_feature_assembly",
        "logreg_sgd_step", "fisher_discriminative_dims",
        "temperature_mixture_weights", "decontam_threshold_sweep",
        "embedding_drift_centroid", "dp_user_day_revenue",
        "prefix_filter_simjoin", "telemetry_double_fire_audit",
        "shuffle_sizing_advisor", "lateness_watermark_profile",
        "hilbert_layout_stats", "dim_refresh_stream", "kmv_set_overlap",
    }
) | frozenset(
    {
        # the round-6 window (CORRECTNESS_r06.json): every name below got a
        # GREEN driver row in r6.  The six r6 hash-mismatch rows
        # (zorder_layout_stats, leaderboard_stream, bloom_filter_prejoin,
        # compaction_plan, supplier_triangles, conformal_interval) are
        # deliberately NOT listed — all six were the uncast-integer-sum
        # oracle typing bug (fixed r7, gated by tests/test_oracle_dtypes.py)
        # and stay in the r7 window as keepers-by-exception until
        # driver-green
        "dsir_admission_stream", "skew_key_diagnosis",
        "recursive_reachability", "dsir_importance_sample",
        "curation_pipeline", "l_diversity_audit", "target_encoding_loo",
        "psi_value_drift", "event_transition_matrix", "embedding_topk_ivf",
        "ivf_probe_recall_audit", "hard_negative_mining", "multimodal_dedup",
        "multimodal_features", "bpe_encode_tokens", "bigram_pmi_topk",
        "semantic_dedup_autoblock", "minhash_admission_stream",
        "orc_source_stats", "corrupt_dlq_roundtrip",
    }
) | frozenset(
    {
        # the round-5 window (CORRECTNESS_r05.json): every name below got a
        # green driver row in r5 — zorder_layout_stats AND leaderboard_stream
        # are deliberately NOT listed (their r5 rows were the two hash
        # mismatches; both stay in the r6 window until driver-green, per the
        # rotation rule's keeper-by-exception clause)
        "dup_clusters", "dedup_rewrite_docs", "bigram_perplexity",
        "cdc_apply_latest", "locf_value_15min", "lateral_top_lineitems",
        "supplier_components_star", "embedding_topk_pq_rerank",
        "pq_encode_stream", "bpe_learn_merges", "dp_noisy_lang_counts",
        "neyman_allocation_sample", "exact_price_percentiles",
        "salted_join_rewrite", "gmv_pattern_topk", "holt_forecast_backtest",
        "embedding_topk_ivf_adc", "retrieval_eval_mrr", "pr_curve_thresholds",
        "journey_stream_join", "k_anonymity_audit", "tfidf_top_terms",
        "copurchase_pairs", "scd2_pit_lookup",
    }
) | frozenset(
    {
        # the round-4 window (CORRECTNESS_r04.json): every name below got a
        # driver row in r4
        "trained_ivf_topk", "scd2_stream_merge", "bm25_topk",
        "markov_attribution", "mmr_diversified_topk", "psi_drift_stream",
        "calibration_bins", "semantic_dedup", "checkpoint_resume_stream",
        "supplier_components", "ngram_zipf_slope", "conversion_latency_stats",
        "revenue_gini", "rfm_segments", "clv_pareto_deciles",
        "equi_depth_histogram", "source_quantile_normalize",
        "lambda_unified_gmv", "hybrid_rrf_fusion", "retrieval_eval_ndcg",
        "auc_quality_langid", "dq_expectations", "manifest_time_travel",
        "t_closeness_audit", "embedding_topk_pq",
    }
) | frozenset(
    {
        # r3 curated prefix (== r1/r2 union plus the restored views queries)
        "gmv_minutely", "gmv_sliding", "funnel_hourly", "ordered_funnel",
        "dropoff_hourly", "payment_hourly", "enrich_lineitem", "status_flags",
        "payment_rollup", "active_alerts", "stats_rollup",
        "latest_gmv_windows", "retention_filter", "complete_funnel",
        "order_details", "orders_without_items", "dedup_events",
        "approx_unique_users_hourly", "kafka_payload_roundtrip",
        "csv_source_stats", "jdbc_upsert_roundtrip", "corrupt_record_drop",
        "python_datasource_feed", "replay_rate_source", "bucketed_order_join",
        "median_price_udaf", "variant_props_stats", "doc_chunks_udtf",
        "dedup_docs_exact", "minhash_near_dups", "simhash_dup_groups",
        "incremental_dedup", "embedding_topk", "embedding_topk_lsh",
        "kmeans_lloyd_step", "text_stats", "lang_id", "token_count_estimates",
        "doc_fingerprints", "pii_redaction", "benchmark_decontam",
        "train_test_split", "stratified_doc_sample", "multimodal_decode",
        "gmv_stream_minutely", "dedup_stream_counts", "metrics_merge_upsert",
        "pricing_summary", "user_sessions", "heavy_hitters_cms",
        # r1/r2 windows additionally witnessed (registration-order spill
        # before the r3 curation): recorded in CORRECTNESS_r01/r02.json
        "dedup_docs_bag", "embedding_topk_pandas", "gapfilled_minutely_gmv",
        "asof_last_purchase", "user_activity_1h", "region_revenue",
        "top_orders_per_customer", "shipping_priority",
        "order_priority_check", "returned_item_ranking",
        "large_volume_customers", "bracket_revenue", "sequence_packing",
    }
)

_PROOF_PREFIX = (
    # ---- round-10 window: 15 SURVEY §2 flagship keepers + 35 rotated-in
    # queries that have never had a driver CORRECTNESS row (VERDICT r9
    # task #8: keep burning the witness backlog — 133 never-witnessed at
    # r10 start, ≤ 98 after this window).  Priorities: (a) the two
    # r10-optimization-touched never-witnessed queries (minhash_audit's
    # sampled truth set and dup_ngram_coverage's materialized grain get
    # driver-verified the same round they changed), (b) the remaining
    # never-witnessed streaming family — state-store readers, changelog
    # replay, per-batch monitors, bitmap/histogram/CMS sketch stores and
    # the asymmetric-watermark joins, (c) one fresh representative per
    # SURVEY/LLM family that still has unwitnessed names (dedup, text,
    # ANN, curation, multimodal, TPC-H shapes, analytics, graph,
    # drift/eval, layout).  Retrieval has no never-witnessed names left,
    # so its family witness is the r4-witnessed flagship bm25_topk
    # (keeper-by-family, swapped for the J_joins second witness).
    # Family coverage is pinned by tests/test_round3_ops.py; rotation
    # freshness (>= 35 never-witnessed) by
    # test_rotation_adds_never_witnessed_queries.
    #
    # A1-A4 core reference processors (one witness each)
    "gmv_minutely",
    "funnel_hourly",
    "dropoff_hourly",
    "payment_hourly",
    # P row-level ops
    "enrich_lineitem",
    # V views + A6 re-aggregation (family witness)
    "payment_rollup",
    # J joins
    "complete_funnel",
    # retrieval family witness (no never-witnessed retrieval names remain)
    "bm25_topk",
    # D dedup + the HLL bounds-oracle keeper
    "dedup_events",
    "approx_unique_users_hourly",
    # S sources / K sinks (Kafka wire, live-Derby MERGE)
    "kafka_payload_roundtrip",
    "jdbc_upsert_roundtrip",
    # UDF/Variant surface
    "variant_props_stats",
    # Streaming (D2-D4)
    "gmv_stream_minutely",
    # LLM dedup flagship
    "minhash_near_dups",
    # ---- rotated in for round 10 (never driver-witnessed before) ----
    # (a) r10-optimization-touched
    "minhash_audit",
    "dup_ngram_coverage",
    # (b) the never-witnessed streaming tail: stateful monitors, sketch
    # stores, state-store readers, changelog replay, asymmetric watermarks
    "user_stats_stream",
    "segment_revenue_stream",
    "unattributed_purchases_stream",
    "unattributed_asym_watermark_stream",
    "session_dynamic_stream",
    "unique_buyers_bitmap_stream",
    "histogram_stream_quantiles",
    "heavy_hitters_cms_stream",
    "state_store_inspect",
    "changelog_replay_stream",
    "agg_state_inspect",
    "column_stats_stream",
    # (c) fresh family representatives
    "incremental_minhash_dedup",
    "symspell_typo_linkage",
    "top_terms",
    "vocab_oov_rates",
    "lsh_recall_audit",
    "embedding_topk_sq",
    "matryoshka_recall_audit",
    "weighted_doc_sample",
    "kfold_assignment",
    "user_erasure",
    "multimodal_asset_stats",
    "nation_trade_volume",
    "late_ship_priority",
    "top_supplier",
    "revenue_cusum_changepoints",
    "bootstrap_revenue_ci",
    "supplier_link_prediction",
    "revenue_acf",
    "chi2_independence",
    "wap_publish_gate",
    "ivm_retract_merge",
)


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB ANSI SQL; None => driver does rows-only check
    doc: str = ""


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            # overwriting silently would swap a proof query's builder+oracle
            # out from under the driver's hash-checked window with no signal
            raise ValueError(f"duplicate query registration: {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, Query]:
    """All registered queries, curated proof prefix first.

    The driver's correctness snapshot covers a fixed-size prefix of this
    mapping, so ``_PROOF_PREFIX`` (every operator family) is emitted first,
    followed by the remaining queries in registration order.
    """
    _load()
    missing = [n for n in _PROOF_PREFIX if n not in _REGISTRY]
    if missing:  # fail loudly: a rename must update the prefix too
        raise KeyError(f"_PROOF_PREFIX names unregistered queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PROOF_PREFIX}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def get_query(name: str) -> Query:
    return all_queries()[name]


def queries_map() -> dict[str, Builder]:
    return {n: q.builder for n, q in all_queries().items()}


def oracle_sql_map() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
