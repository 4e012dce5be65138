"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop write (full computation, no
collect-to-driver cost, no count-only column pruning shortcut).  The headline
set spans every physical operator class: parquet scan + hash agg, sliding
windows, fact-fact shuffle join, broadcast dim join, window functions,
sessionization, MinHash LSH, vector similarity, Pandas-UDF decode, and a real
Structured Streaming query.

r8 additions: per-query COLD time (first iteration at SF_DIR) alongside the
min-of-3 warm number — persist-heavy queries' cold_s/warm_s ride the printed
line so cross-round deltas compare cold-to-cold; and a full-REGISTRY tail
(one timed run for every query outside the frozen sections) so no registered
query is ever silently unbenched (`unbenched` must be empty in
BENCH_LOCAL.json).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

HEADLINE = [
    "pricing_summary",        # scan + hash agg (TPC-H Q1 shape)
    "gmv_minutely",           # tumbling window agg
    "gmv_sliding",            # sliding windows (2x row expansion)
    "funnel_hourly",          # conditional aggregation
    "dropoff_hourly",         # window + key grouping, collect_list sample
    "payment_hourly",         # JSON decode + grouped agg
    "complete_funnel",        # aggregate-then-join (3 aggs + 2 joins)
    "order_details",          # fact-fact shuffle join
    "shipping_priority",      # TPC-H Q3: selective 3-way join + top-10
    "order_priority_check",   # TPC-H Q4: EXISTS -> left-semi with residual
    "returned_item_ranking",  # TPC-H Q10: join + grouped revenue top-20
    "large_volume_customers", # TPC-H Q18: HAVING subquery -> agg-then-join
    "bracket_revenue",        # TPC-H Q19: disjunctive bracket predicates
    "gapfilled_minutely_gmv", # generated spine + zero-fill left join
    "asof_last_purchase",     # as-of join (union + running last)
    "user_activity_1h",       # range join (bucketed equi-join rewrite)
    "region_revenue",         # multi-hop broadcast dim joins
    "top_orders_per_customer",  # window function top-k
    "user_sessions",          # gaps-and-islands sessionization
    "dedup_events",           # keyed dedup via row_number
    "dedup_docs_bag",         # content-hash dedup
    "minhash_near_dups",      # MinHash + LSH near-dup pipeline
    "simhash_docs",           # simhash signatures
    "text_stats",             # text analysis scan
    "embedding_topk",         # brute-force cosine top-k
    "embedding_topk_pandas",  # Arrow/Pandas-UDF similarity path
    "multimodal_decode",      # mapInPandas decode stage
    "embedding_topk_lsh",     # random-hyperplane LSH candidate pruning
    "pii_redaction",          # chained regexp_replace scan
    "benchmark_decontam",     # n-gram broadcast decontamination
    "sequence_packing",       # window cumsum token packing
    "gmv_stream_minutely",    # real Structured Streaming (availableNow)
]

# Second section (round 2+): the heavy analytics and streaming queries
# outside the original 32.  Kept separate so the core set stays
# round-over-round comparable; `core32_total` tracks the original metric.
EXTENDED = [
    "scd2_priority_history",  # SCD2 interval build (full-history windowing)
    "grouping_sets_revenue",  # GROUPING SETS multi-level rollup
    "journey_stream_join",    # 3-way chained stream-stream join
    "curation_pipeline",      # end-to-end curation (redact+filter+dedup+pack)
    "heavy_hitters_cms",      # count-min sketch build + estimate join
    "chunk_dedup_retention",  # chunk-hash cross-doc dedup (paragraph-style)
    "embedding_topk_sq",      # int8 scalar-quantized ANN + exact rerank
    "attribution_first_last", # range join + min_by/max_by attribution
    "kmeans_lloyd_step",      # exact-integer Lloyd assignment (O(N*K*D) map)
    "session_dynamic_gap_stats",  # dynamic-gap session_window aggregate
    "cohort_retention",       # first-seen cohort triangle (distinct + rollup)
    "unigram_logprob_scores", # corpus LM scoring (vocab agg + token join)
    "gmv_pattern_topk",       # time-series subsequence search (frame pass)
    "zorder_layout_stats",    # Z-order clustering quality (layout diagnostics)
    "bloom_filter_prejoin",   # explicit Bloom runtime filter + fp-rate audit
    "equi_depth_histogram",   # ntile equal-count optimizer statistics
    "supplier_triangles",     # degree-oriented triangle census (graph joins)
    "scd2_pit_lookup",        # point-in-time dimension lookup (temporal join)
    "k_anonymity_audit",      # privacy QI-group audit (distinct-count agg)
    "join_size_cms_estimate", # sketch inner-product join-cardinality estimate
    "attribution_time_decay", # multi-touch credit (pair join + window norm)
]

# Third section (round 3+): frozen like the others so every round reports
# core32, extended21, and r3 totals separately (round-over-round comparable).
EXTENDED_R3 = [
    "cdc_chunks",             # content-defined chunking + chunk-hash dup counts
    "semantic_dedup",         # SemDeDup greedy prefix dedup (cluster-blocked)
    "bigram_perplexity",      # add-k bigram LM scoring (vocab-keyed joins)
    "dup_ngram_coverage",     # 8-gram exact-substring duplication signal
    "weighted_doc_sample",    # Efraimidis-Spirakis weighted top-k sample
    "observed_quality_metrics",  # observe() counters riding the main pass
    "jdbc_upsert_roundtrip",  # live Derby MERGE stage+merge+replay+readback
    "lambda_unified_gmv",     # batch layer UNION real streaming speed layer
    "revenue_cusum_changepoints",  # exact-integer CUSUM over the daily rollup
    "event_path_ngrams",      # behavioral path mining (1 agg + TakeOrdered)
    "recursive_reachability", # WITH RECURSIVE BFS (UnionLoop iterate)
    "rfm_segments",           # RFM quartile grid (dim-sized NTILE windows)
    "interpurchase_survival", # partitioned lag + one-pass threshold unpivot
    "bigram_pmi_topk",        # collocation lift (flatMap + broadcast vocab)
    "incremental_minhash_dedup",  # batch probe vs stored LSH band index
    "source_unigram_divergence",  # pairwise TV drift (exact-integer fold)
    "bootstrap_revenue_ci",   # 200-replicate percentile bootstrap (spine-sized)
    "dpp_partitioned_join",   # runtime dynamicpruning partition filter
    "scd2_stream_merge",      # incremental SCD2 CDC merge (foreachBatch store)
    "bm25_topk",              # lexical ranker: query-term postings only shuffle
    "hybrid_rrf_fusion",      # BM25 + cosine reciprocal-rank fusion
    "state_store_inspect",    # statestore reader over the dedup checkpoint
    "checkpoint_resume_stream",  # two-start exactly-once restart proof
    "promo_window_attribution",  # keyless interval join, bin-bucketized
    "dq_expectations",        # one-pass declarative data-quality gate
    "changelog_replay_stream",   # update-mode changelog capture + replay
    "ngram_udtf_topk",        # polymorphic analyze() UDTF trigram top-k
    "manifest_time_travel",   # manifest-committed snapshots + time travel
    "supplier_components",    # iterative min-label connected components
    "forecast_backtest_snaive",  # seasonal-naive walk-forward backtest
    "agg_state_inspect",      # statestore reader over agg accumulators
    "l_diversity_audit",      # homogeneity-attack privacy audit
    "trained_ivf_topk",       # k-means-trained IVF: train -> index -> search
    "psi_value_drift",        # PSI input-drift monitor (fixed-point fold)
    "source_quantile_normalize",  # cross-source score normalization
    "auc_quality_langid",     # exact tie-aware Mann-Whitney AUC
    "retrieval_eval_mrr",     # MRR/P@k/R@k of the BM25 ranker
    "retrieval_eval_ndcg",    # NDCG@10, literal weight table
    "attribution_linear_cents",  # largest-remainder credit split
    "calibration_bins",       # reliability bins + exact Brier decomposition
    "conformal_interval",     # split-conformal coverage, order statistics
    "revenue_gini",           # exact rank-formulation Gini
    "t_closeness_audit",      # TVD per QI group vs global (privacy trio)
    "term_postings",          # inverted-index build, bounded posting heads
    "psi_drift_stream",       # PSI maintained by a streaming aggregation
    "kfold_auc",              # per-fold exact CV-AUC (partitioned ranks)
    "markov_attribution",     # removal-effect attribution, integer chain
    "cuped_did_lift",         # naive/DiD/CUPED estimator ladder
    "matryoshka_recall_audit",  # truncated-dim retrieval recall
    "quantile_pinball_backtest",  # P10/P50/P90 pinball, exact x10 cents
    "compaction_plan",        # cumulative-fill small-file bin packing
    "holt_forecast_backtest",  # recursive smoothing: HOF fold vs CTE walk
    "skew_key_diagnosis",     # heavy keys, skew factor, salt fan-out
    "popularity_rec_hitrate",  # segment top-5 recommender, temporal eval
    "chi2_independence",      # lang x source contingency, exact terms
    "knn_label_accuracy",     # majority-vote kNN classifier eval
    "eb_rate_shrinkage",      # empirical-Bayes posterior rates
    "pr_curve_thresholds",    # operating-point table under the AUC
    "leaderboard_stream",     # complete-mode sorted top-10 on the stream
    "mmr_diversified_topk",   # greedy diversity re-rank, integer kernel
    "seasonal_decompose_daily",  # trend/weekday-seasonal/residual split
    "residual_anomaly_days",  # robust z on the decomposed residuals
]

# Fourth section (round 4+): frozen like the others.  The rank-rewrite
# queries stay in their original sections (their per-query deltas are the
# round-4 regression story); this section holds queries REGISTERED in
# round 4.
EXTENDED_R4 = [
    "salted_join_rewrite",    # diagnosed partial-salting join (hot-key cure)
    "exact_price_percentiles",  # fact-grain exact percentile_disc (2-phase rank)
    "supplier_components_star",  # large-star/small-star CC (O(log n) rounds)
    "embedding_topk_pq",      # product-quantization codebooks + integer ADC
    "bpe_learn_merges",       # 5-round BPE merge-learning loop
    "pq_encode_stream",       # streaming PQ index census (literal codebook)
    "embedding_topk_pq_rerank",  # two-tier ADC shortlist + exact rerank
    "dp_noisy_lang_counts",   # DP geometric-mechanism count release
    "neyman_allocation_sample",  # variance-optimal stratified allocation
]

# Fifth section (round 5+): queries REGISTERED in round 5.
EXTENDED_R5 = [
    "embedding_topk_ivf_adc",  # composed IVF-prune x PQ-ADC x exact rerank
    "bpe_encode_tokens",       # learned merges applied: post-merge census
    "dsir_importance_sample",  # DSIR unigram log-ratio data selection
    "pipe_syntax_revenue",     # Spark 4 SQL pipe (|>) rollup
    "ivf_probe_recall_audit",  # trained-IVF recall-vs-nprobe tuning curve
    "complete_funnel_stream",  # windowed agg -> windowed agg -> stream join
    "dsir_admission_stream",   # DSIR gate per micro-batch (foreachBatch)
]

# Sixth section (round 6+): queries REGISTERED in round 6.
EXTENDED_R6 = [
    "hilbert_layout_stats",    # Hilbert vs Z-order span tightness (32-col curve)
    "logreg_sgd_step",         # two exact fixed-point GD steps (2 corpus aggs)
    "sql_udf_revenue",         # SQL UDF + table function, 4-row range join
    "ivm_delta_merge",         # incremental view maintenance (delta + merge)
    "dim_refresh_stream",      # per-micro-batch refreshed stream-static dim
    "prefix_filter_simjoin",   # PPJoin exact all-pairs similarity join
    "kmv_set_overlap",         # KMV/theta sketch: distincts + set algebra
    "lateness_watermark_profile",  # two-phase prefix-max lateness histogram
    "dp_user_day_revenue",     # clipped user-level DP sum release
    "temperature_mixture_weights",  # alpha=1/2 source sampling weights
    "embedding_drift_centroid",  # exact fixed-point centroid drift monitor
    "group_by_all_revenue",    # shared-dialect GROUP BY ALL inference
    "pit_feature_assembly",    # point-in-time feature export (1 user shuffle)
    "deletion_vector_scan",    # merge-on-read position deletes (anti-join DV)
    "fisher_discriminative_dims",  # exact-integer class-separation audit
    "compaction_rewrite_roundtrip",  # OPTIMIZE executed: small files -> bins
    "index_delta_merge",       # inverted-index stats merged, not rebuilt
    "shuffle_sizing_advisor",  # partition/file sizing from exact row widths
    "vacuum_orphan_files",     # manifest-referenced vacuum, snapshots intact
    "index_tombstone_merge",   # index deletes by per-term subtraction
    "decontam_threshold_sweep",  # contamination-cutoff tuning curve
    "telemetry_double_fire_audit",  # near-dup EVENTS via 2-bucket range join
]


# Seventh section (round 7+): queries REGISTERED in round 7.
EXTENDED_R7 = [
    "jaccard_threshold_sweep",     # dedup-cutoff tuning curve over LSH pairs
    "packing_efficiency_sweep",    # context-length budget tuning curve
    "cross_source_leakage_matrix", # pairwise source n-gram contamination
    "kanon_generalization_ladder", # QI coarsening ladder to reach k-anon
    "benford_revenue_audit",       # first-digit forensic data-quality test
    "conversion_window_sweep",     # attribution-window tuning curve
    "schema_drift_audit",          # batch-over-batch column stats drift
    "embedding_outlier_topk",      # diagonal-Mahalanobis vector audit
    "session_funnel_conversion",   # ordered funnel inside session bounds
    "cohort_ltv_triangle",         # cohort x week-of-life exact revenue
    "partition_evolution_scan",    # two partition specs, one logical scan
    "intra_doc_repetition_audit",  # within-doc n-gram looping detector
    "column_stats_stream",         # per-micro-batch column-stats monitor
    "props_schema_census",         # JSON payload key-set fingerprints
    "experiment_power_advisor",    # MDE -> required-sample-size table
    "vocabulary_growth_curve",     # Heaps'-law corpus-health diagnostic
    "revenue_concentration_hhi",   # per-day buyer-concentration monitor
]


# Eighth section (round 8+): queries REGISTERED in round 8.
EXTENDED_R8 = [
    "symspell_typo_linkage",       # deletion-neighborhood fuzzy linkage
    "golden_record_survivorship",  # duplicate-cluster canonical merge
    "revenue_acf",                 # exact integer-centered autocorrelation
    "decision_stump_train",        # exact best-split stump over NDV grid
    "encoding_advisor",            # NDV + run-length encoding advisor
    "hour_value_heatmap",          # bounded 2-D binned density rollup
    "ivm_retract_merge",           # signed-delta IVM under deletes/updates
    "branch_merge_conflicts",      # 3-way catalog branch merge grid
    "group_kfold_assignment",      # leakage-safe entity-keyed folds
    "golden_record_stream",        # streaming MDM store (partial merge)
    "wap_publish_gate",            # write-audit-publish gate, live both ways
    "session_gap_sensitivity",     # sessionization tuning curve, one pass
    "kaplan_meier_conversion",     # right-censored KM curve, integer chain
    "supplier_link_prediction",    # neighborhood-Jaccard wedge join top-k
    "dsar_access_export",          # broadcast request set + user bundles
    "purged_timeseries_folds",     # embargoed walk-forward CV splits
    "sorted_neighborhood_pairs",   # SNM blocking + recall vs interval join
    "stratified_uplift_ipw",       # subclassification treatment effect
    "label_propagation_communities",  # 3-round synchronous LPA, unrolled
    "rake_keyphrases",             # degree/freq keyphrase extraction
    "supplier_pareto_frontier",    # per-nation skyline, one window pass
    "stream_state_size_advisor",   # watermark-delay state capacity grid
    "event_burst_detection",       # integer-threshold burst episodes
    "ab_srm_check",                # sample-ratio-mismatch guardrail
    "boolean_and_search",          # conjunctive postings intersection
    "kcore_decomposition",         # 4-round degree peel, unrolled
    "peak_concurrent_sessions",    # sweep-line interval concurrency
    "holt_winters_backtest",       # seasonal-array fold, one-step backtest
    "burst_detection_stream",      # mergeable arrival-count store twin
]


def _cpu_witness_df(spark):
    """Deliberately CPU-bound scaling witness (r9 VERDICT task #2): the
    sf0.1 headline queries are 0.2-1 s and overhead-bound, so their
    8-vs-32-core ratios sit at ~1 and the driver cannot tell "bench honors
    $SPARK_GRAFT_CPUS but the suite is overhead-bound" from "bench ignores
    it".  This witness is pure compute — 4M rows x 8 chained md5 calls over
    a fixed 128-partition range (same plan at every core count; only the
    scheduler's concurrency changes) reduced to one row — so its runtime
    tracks 1/cores and its low/high-core ratio proves the master honored
    the env var.  Not a registry query (nothing to oracle-check: the value
    is discarded); it rides the bench's `queries` map as an ADDED entry."""
    from pyspark.sql import functions as F

    col = F.col("id").cast("string")
    for _ in range(8):
        col = F.md5(col)
    return spark.range(0, 4_000_000, 1, 128).select(col.alias("h")).agg(
        F.max("h").alias("max_h")
    )


def main() -> None:
    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries
    from e_commerce_streaming_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name="e_commerce_streaming_datapipeline-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # Warm up the heavyweight one-time machinery outside the timed region so
    # timings measure query execution at SF_DIR, not process bring-up: JVM
    # bring-up, whole-stage-codegen compilation (the generated class cache is
    # keyed on generated source, so the same plan shape at a different scale
    # factor is a cache hit), the Arrow/Python worker pool, and the
    # Structured Streaming engine + state store.  Warmups run every headline
    # query once at the smallest available SF; fall back to SF_DIR.
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    from e_commerce_streaming_datapipeline_spark.functions.ranks import release_rank_caches

    sections = (HEADLINE + EXTENDED + EXTENDED_R3 + EXTENDED_R4
                + EXTENDED_R5 + EXTENDED_R6 + EXTENDED_R7 + EXTENDED_R8)
    # queries whose plans pin a registered persist (the rank family, the
    # simjoin's token-id cache, ...): their min-of-3 is a WARM number by
    # construction (runs 2-3 reuse run 1's materialization), so the bench
    # also reports their COLD time to keep cross-round deltas honest
    # (r7 VERDICT task #3 — prefix_filter_simjoin's 0.87 s warm-min vs
    # 10.75 s cold).  Detected, not hand-listed: the warmup run observes
    # which builders register caches.
    persist_heavy: set[str] = set()
    for warm_query in sections:
        registry[warm_query].builder(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        # each rank-family builder pins a MEMORY_AND_DISK cache (the
        # determinism persist in functions/ranks.py); release between
        # queries so the suite doesn't accumulate hundreds of pinned copies
        if release_rank_caches():
            persist_heavy.add(warm_query)

    # Python DataSource machinery warmup (r10 measurement fix, disclosed in
    # OPTIMIZATION_r10.md with the old numbers kept): the session's FIRST
    # use of a Python DataSource reader, writer and JSON scan each spawn
    # driver-side planner/commit Python processes and a fresh executor
    # worker pool (~4.5 s + ~3.5 s + ~2 s one-time, measured; 1.4 s
    # steady-state for the whole sink roundtrip).  No frozen-section query
    # exercises this machinery, so whichever python_datasource tail query
    # ran FIRST absorbed it — that is the entire r9 "sink roundtrip x2.2
    # regression": the r9 window rotation reordered the tail so the sink
    # ran before the feed and inherited the reader's spin-up.  One tiny
    # (n=64) feed -> sink -> manifest-read roundtrip here puts the
    # spin-up outside every timed region, exactly like the JVM/codegen/
    # Arrow-pool/streaming-engine warmups above.
    import shutil
    import tempfile
    import uuid

    from e_commerce_streaming_datapipeline_spark.sources import (
        python_datasource as pds,
    )

    pds.register(spark)
    pds.register_sink(spark)
    pds_warm_dir = os.path.join(
        tempfile.gettempdir(), "bench_pds_warm", uuid.uuid4().hex
    )
    pds_feed = spark.read.format("ecommerce_replay").option("n", 64).load()
    pds_feed.write.format("noop").mode("overwrite").save()
    pds_feed.write.format("ecommerce_jsonl").option("path", pds_warm_dir).mode(
        "append"
    ).save()
    warm_files, _ = pds.read_manifest_files(pds_warm_dir)
    spark.read.schema(
        "event_id long, user_id long, event_type string, amount_cents double"
    ).json(warm_files).write.format("noop").mode("overwrite").save()
    shutil.rmtree(pds_warm_dir, ignore_errors=True)

    # Three timed iterations per query: report the min (steady state) AND
    # the first iteration (cold-at-this-SF: plan + codegen for this scale's
    # shape, no warm caches).  AQE picks size-dependent physical plans, so
    # the first run at SF_DIR still pays one-off codegen compilation for
    # this scale's plan shape; the remaining runs measure execution.
    # Min-of-3 inside one JVM pins the number against machine draw noise
    # (round-3 showed +-10% whole-suite drift between driver draws).
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm_spread_pct: dict[str, float] = {}
    for name in sections:
        q = registry[name]
        best = float("inf")
        first = None
        iters: list[float] = []
        for _ in range(3):
            start = time.perf_counter()
            df = q.builder(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            iters.append(elapsed)
            if first is None:
                first = elapsed
            best = min(best, elapsed)
        # spread of the two WARM iterations (run 1 is the cold number):
        # the per-query input to the machine-measured noise band below
        w_lo, w_hi = min(iters[1:]), max(iters[1:])
        warm_spread_pct[name] = round((w_hi - w_lo) / w_lo * 100, 1) if w_lo > 0 else 0.0
        # release AFTER the three timed runs, not between them: the
        # CacheManager matches persisted plans by canonicalized logical
        # plan, so runs 2-3 of a rank query legitimately reuse run 1's
        # materialized range partitioning (steady-state warm behavior, and
        # what every bench before r7 measured); releasing per-RUN forced
        # every iteration cold and showed as a phantom 1.6-2x regression
        # on the whole rank family.  Releasing per-QUERY still bounds the
        # leak to one query's caches (r6 ADVICE #2).
        release_rank_caches()
        timings[name] = round(best, 3)
        cold[name] = round(first, 3)

    # CPU-bound scaling witness: timed with the same min-of-3 methodology
    # and added to the queries map (an ADDED entry — existing entries are
    # never removed or renamed) so the driver's low-core/high-core
    # comparison has one query whose ratio provably tracks the core ratio.
    # kept OUT of `timings` so `value` and the frozen section totals stay
    # round-over-round comparable; it joins the emitted `queries` maps only
    witness_best = float("inf")
    for i in range(3):
        spark.sparkContext.setJobDescription(f"cpu_scaling_witness:iter{i}")
        start = time.perf_counter()
        _cpu_witness_df(spark).write.format("noop").mode("overwrite").save()
        witness_best = min(witness_best, time.perf_counter() - start)
    spark.sparkContext.setJobDescription(None)
    witness_s = round(witness_best, 3)

    # Registry tail: every registered query OUTSIDE the frozen sections gets
    # ONE timed run per bench invocation — closing the silent bench-coverage
    # cap (r7 VERDICT task #2: 173 queries had never been timed).  Single
    # runs (cold-ish) rather than min-of-3: the tail exists so every query
    # has a timing row and an obvious-regression tripwire, while the frozen
    # sections remain the round-over-round comparable metric.
    tail: dict[str, float] = {}
    tail_errors: dict[str, str] = {}
    for name in registry:
        if name in timings:
            continue
        start = time.perf_counter()
        try:
            registry[name].builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            tail[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # record, don't lose the whole bench run
            tail_errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            release_rank_caches()
    unbenched = sorted(
        set(registry) - set(timings) - set(tail) - set(tail_errors)
    )

    # Machine-measured noise band (r8 VERDICT task #3): the r8 round saw 15
    # warm "regressions" of 10-32% that were machine draw, argued in README
    # prose.  Make the band a measured artifact instead: REPLAY the core-32
    # section (a second back-to-back min-of-3 pass in the same JVM) and
    # take the p90 of per-query |replay - first| / first deltas, unioned
    # with the p90 of the per-query warm-iteration spreads.  round_delta.py
    # flags a WARM delta as structural only above max(10%, this band);
    # cold deltas keep the plain 10% threshold.
    replay_delta_pct: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            q.builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - start)
        release_rank_caches()
        if timings[name] > 0:
            replay_delta_pct[name] = round(
                abs(best - timings[name]) / timings[name] * 100, 1
            )

    def _p90(vals: list[float]) -> float:
        if not vals:
            return 0.0
        s = sorted(vals)
        return s[min(len(s) - 1, int(0.9 * (len(s) - 1) + 0.999))]

    noise_band_pct = round(
        max(
            _p90(list(replay_delta_pct.values())),
            _p90([warm_spread_pct[n] for n in HEADLINE]),
        ),
        1,
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    totals = {
        "core32_total": round(sum(timings[n] for n in HEADLINE), 3),
        "extended_total": round(sum(timings[n] for n in EXTENDED), 3),
        "r3_total": round(sum(timings[n] for n in EXTENDED_R3), 3),
        "r4_total": round(sum(timings[n] for n in EXTENDED_R4), 3),
        "r5_total": round(sum(timings[n] for n in EXTENDED_R5), 3),
        "r6_total": round(sum(timings[n] for n in EXTENDED_R6), 3),
        "r7_total": round(sum(timings[n] for n in EXTENDED_R7), 3),
        "r8_total": round(sum(timings[n] for n in EXTENDED_R8), 3),
        "core32_cold_total": round(sum(cold[n] for n in HEADLINE), 3),
        "sections_cold_total": round(sum(cold.values()), 3),
    }
    # core-count contract, made legible to the driver (r9 VERDICT task #2:
    # `suspect_cpus_ignored` fired because the emitted line never said at
    # what core count it ran): the honored env var, the actual master, and
    # the scheduler's parallelism ride both the line and BENCH_LOCAL.
    core_contract = {
        "cpus": CPUS,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    full = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {**timings, "cpu_scaling_witness": witness_s},
        **core_contract,
        "cold": cold,
        "warm_spread_pct": warm_spread_pct,
        "replay_delta_pct": replay_delta_pct,
        "noise_band_pct": noise_band_pct,
        "persist_heavy": sorted(persist_heavy),
        "tail_queries": tail,
        "tail_total": round(sum(tail.values()), 3),
        "tail_errors": tail_errors,
        "unbenched": unbenched,
        **totals,
        "sf": sf_val,
    }
    # The driver captures only the last 2000 chars of output, so the full
    # 114-query map (~4.3 KB) cannot ride the printed line (round-3's
    # BENCH_r03 parsed null for exactly this reason).  Print a compact line
    # that always fits -- per-query timings for the round-comparable core32
    # set plus all three section totals -- and persist the complete map to
    # BENCH_LOCAL.json for ROUND_DELTAS / plan audits.
    # env-switchable so external harness runs (the driver re-runs bench.py
    # and rewrote this file every round, dirtying the tree — r9 VERDICT
    # housekeeping #6) can point it elsewhere; the in-repo default stays so
    # close benches and round_delta.py keep their artifact
    local_path = os.environ.get(
        "SPARK_GRAFT_BENCH_LOCAL_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
    )
    with open(local_path, "w") as fh:
        json.dump(full, fh, indent=2, sort_keys=True)
        fh.write("\n")
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "queries": {
            **{n: timings[n] for n in HEADLINE},
            "cpu_scaling_witness": witness_s,
        },
        **core_contract,
        # cold_s/warm_s for the persist-heavy queries (warm-min flatters
        # exactly these; r7 VERDICT task #3) — capped to the 8 coldest so
        # the line stays under the driver's 2000-char tail capture; the
        # full cold map lives in BENCH_LOCAL.json
        "cold_s": {n: cold[n] for n in sorted(
            (n for n in persist_heavy if n in cold),
            key=lambda n: -cold[n])[:8]},
        "warm_s": {n: timings[n] for n in sorted(
            (n for n in persist_heavy if n in timings),
            key=lambda n: -cold.get(n, 0.0))[:8]},
        "tail_total": full["tail_total"],
        "n_tail": len(tail),
        "n_tail_errors": len(tail_errors),
        "n_unbenched": len(unbenched),
        "noise_band_pct": noise_band_pct,
        **totals,
        "sf": sf_val,
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1900, f"bench line too long for driver tail: {len(line)}"
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
