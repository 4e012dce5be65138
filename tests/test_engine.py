"""Engine-level unit/property tests: determinism under repartitioning,
cross-engine rounding, vector math, source normalization."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import fround
from e_commerce_streaming_datapipeline_spark.functions.vector import cosine_similarity_expr, to_double_array
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def test_fround_matches_duckdb_on_halves(spark):
    """The exact failure case that motivated fround: avg landing on an exact
    half-cent must round identically to DuckDB."""
    values = [52.755, 2.675, 1.005, 0.125, 93.015, -52.755]
    df = spark.createDataFrame([(v,) for v in values], "x double").select(
        fround(F.col("x"), 2).alias("r")
    )
    got = [r["r"] for r in df.collect()]
    expected = [
        duckdb.sql(f"SELECT round({v!r}::DOUBLE, 2)").fetchone()[0] for v in values
    ]
    assert got == expected


def test_dedup_winner_stable_under_repartition(spark, sf_dir):
    from e_commerce_streaming_datapipeline_spark.operators.dedup import q_dedup_events

    a = sorted(map(tuple, q_dedup_events(spark, sf_dir).collect()))
    events = load_table(spark, "events", sf_dir).repartition(13)
    events.createOrReplaceTempView("_ev13")
    # same plan over a different partitioning must produce identical winners
    b = sorted(map(tuple, q_dedup_events(spark, sf_dir).repartition(7).collect()))
    assert a == b


def test_cosine_expr_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = [(i, rng.normal(size=16).astype(float).tolist()) for i in range(20)]
    df = spark.createDataFrame(vecs, "id long, v array<double>")
    pairs = (
        df.alias("a")
        .crossJoin(df.alias("b"))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            cosine_similarity_expr(F.col("a.v"), F.col("b.v")).alias("cs"),
        )
    )
    for row in pairs.collect():
        va = np.array(vecs[row["ia"]][1])
        vb = np.array(vecs[row["ib"]][1])
        want = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert abs(row["cs"] - want) < 1e-12


def test_events_ts_matches_duckdb_truncation(spark, sf_dir):
    """ns->µs normalization must agree with DuckDB's parquet read exactly."""
    got = (
        load_table(spark, "events", sf_dir)
        .orderBy("event_id")
        .select("ts")
        .limit(50)
        .collect()
    )
    want = duckdb.sql(
        f"SELECT ts FROM read_parquet('{sf_dir}/events.parquet') ORDER BY event_id LIMIT 50"
    ).fetchall()
    assert [r["ts"] for r in got] == [w[0] for w in want]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """The GMV filter must be pushed into the parquet scan (SURVEY scale
    mandate: PushedFilters + pruned ReadSchema)."""
    df = load_table(spark, "events", sf_dir).where(F.col("event_type") == "purchase").select("value")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)" in plan
    assert "ReadSchema: struct<event_type:string,value:double>" in plan


def test_broadcast_join_for_dims(spark, sf_dir):
    from e_commerce_streaming_datapipeline_spark.operators.joins import q_region_revenue

    plan = q_region_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_join_semantics(spark, sf_dir):
    """Every matched purchase must be the latest one at-or-before the click;
    unmatched clicks must have no earlier purchase by that user."""
    from e_commerce_streaming_datapipeline_spark.operators.advanced import q_asof_last_purchase

    res = q_asof_last_purchase(spark, sf_dir)
    assert res.where(F.col("last_purchase_ts") > F.col("ts")).count() == 0

    events = load_table(spark, "events", sf_dir)
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    unmatched = res.where(F.col("last_purchase_ts").isNull())
    bad = unmatched.join(
        purchases,
        (unmatched.user_id == purchases.p_user) & (purchases.p_ts <= unmatched.ts),
    )
    assert bad.count() == 0


def test_range_join_bucketing_matches_naive(spark, sf_dir):
    """The bucketed range-join rewrite must agree with the naive inequality
    join it replaces."""
    from e_commerce_streaming_datapipeline_spark.operators.advanced import q_user_activity_1h

    events = load_table(spark, "events", sf_dir)
    left = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.select(F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"))
    naive = (
        left.join(
            right,
            (left.user_id == right.r_user)
            & (right.r_ts >= left.ts - F.expr("INTERVAL 1 HOUR"))
            & (right.r_ts < left.ts),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("r_ts").alias("n"))
    )
    got = {r["event_id"]: r["events_prev_1h"] for r in q_user_activity_1h(spark, sf_dir).collect()}
    want = {r["event_id"]: r["n"] for r in naive.collect()}
    assert got == want


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    """The bucketed rewrite must plan as a hash equi-join — if the bucket
    keys fell out of the join condition, Catalyst would fall back to
    BroadcastNestedLoopJoin and the operator would not survive scale."""
    from e_commerce_streaming_datapipeline_spark.operators.advanced import q_user_activity_1h

    plan = q_user_activity_1h(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan


def test_order_details_plan_avoids_distinct_expand(spark, sf_dir):
    """COUNT(DISTINCT) via pre-aggregation: the physical plan must not
    contain an Expand node (the distinct-aggregate rewrite that doubles the
    shuffled row count)."""
    from e_commerce_streaming_datapipeline_spark.operators.joins import q_order_details

    plan = q_order_details(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_incremental_dedup_plan_is_broadcast_anti_join(spark, sf_dir):
    """The existing-corpus side must reach the anti join as a distinct-ed
    broadcast hash relation (the dedup index), never a sort-merge of raw
    documents."""
    from e_commerce_streaming_datapipeline_spark.operators.dedup import q_incremental_dedup

    plan = q_incremental_dedup(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_plan_pushes_topk_below_shuffle(spark, sf_dir):
    """The per-doc top-3 must plan as a WindowGroupLimit (partial top-k
    before the doc_id shuffle) — the rank-filter pushdown that keeps the
    window sort bounded at any corpus size."""
    from e_commerce_streaming_datapipeline_spark.operators.text import q_tfidf_top_terms

    plan = q_tfidf_top_terms(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_embedding_centroids_partial_agg_before_shuffle(spark, sf_dir):
    """Dimension-wise means must combine map-side (partial_avg before the
    (label, pos) exchange) so 10^9 vectors shuffle |labels| x dims partials,
    not vectors."""
    from e_commerce_streaming_datapipeline_spark.operators.similarity import q_embedding_centroids

    plan = q_embedding_centroids(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "partial_avg" in plan


def test_train_test_split_is_exhaustive_and_disjoint(spark, sf_dir):
    """Hash-split property: every document lands in exactly one split, and
    re-running assigns identically (content-addressed, not rand-seeded)."""
    from e_commerce_streaming_datapipeline_spark.operators.text import q_train_test_split

    res = q_train_test_split(spark, sf_dir)
    total = res.agg(F.sum("docs")).collect()[0][0]
    assert total == load_table(spark, "documents", sf_dir).count()
    a = sorted(map(tuple, res.collect()))
    b = sorted(map(tuple, q_train_test_split(spark, sf_dir).collect()))
    assert a == b


def test_dropoff_sample_is_bounded_topk(spark, sf_dir):
    """The id sample must plan as a partial WindowGroupLimit (<= 3 rows per
    group leave each map task) — never a full collect_list shuffle."""
    from e_commerce_streaming_datapipeline_spark.operators.dropoff import q_dropoff_hourly

    plan = q_dropoff_hourly(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_grouping_sets_single_expand_pass(spark, sf_dir):
    """GROUPING SETS must plan as ONE scan + Expand + hash agg — never one
    scan per grouping combination."""
    from e_commerce_streaming_datapipeline_spark.operators.setops import q_grouping_sets_revenue

    plan = q_grouping_sets_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_salted_join_stays_on_shuffle_path(spark, sf_dir):
    """The salted join must exercise the shuffle-join path it exists to fix
    (a broadcast would silently bypass the salt) and carry the salt in the
    join keys."""
    from e_commerce_streaming_datapipeline_spark.operators.setops import q_salted_priority_revenue

    plan = q_salted_priority_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "__salt" in plan


def test_group_sample_is_bounded_topk(spark, sf_dir):
    """The per-group sampler must plan as a partial WindowGroupLimit (<= 5
    rows per group leave each map task)."""
    from e_commerce_streaming_datapipeline_spark.operators.sampling import q_group_sample_topk

    plan = q_group_sample_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_stratified_sample_stable_under_append(spark, sf_dir):
    """Hash sampling must keep previously-selected rows selected when the
    corpus grows (the reproducibility property seeded sampleBy lacks)."""
    from e_commerce_streaming_datapipeline_spark.operators.sampling import hash_bucket

    docs = load_table(spark, "documents", sf_dir)
    pct = F.when(F.col("lang") == "en", 50).when(F.col("lang") == "de", 30).otherwise(20)
    full = {r.doc_id for r in docs.where(hash_bucket(F.col("doc_id"), 100) < pct).select("doc_id").collect()}
    half = docs.where(F.col("doc_id") < 200)
    sub = {r.doc_id for r in half.where(hash_bucket(F.col("doc_id"), 100) < pct).select("doc_id").collect()}
    assert sub == {d for d in full if d < 200}


def test_embedding_quantize_roundtrip_error_bounded(spark, sf_dir):
    """Dequantized vectors must be within half a quantization step of the
    original (the invariant that makes int8 ANN recall predictable)."""
    from e_commerce_streaming_datapipeline_spark.operators.sampling import q_embedding_quantize

    q = q_embedding_quantize(spark, sf_dir).limit(50).collect()
    emb = {r.vec_id: r.embedding for r in load_table(spark, "embeddings", sf_dir).limit(500).collect()}
    checked = 0
    for row in q:
        vec = emb.get(row.vec_id)
        if vec is None or row.scale_4dp == 0:
            continue
        absmax = max(abs(x) for x in vec)
        scale = 127.0 / max(absmax, 1e-12)
        qvec = [int(s) for s in row.qvec.split(",")]
        for x, qx in zip(vec, qvec):
            assert abs(qx - x * scale) <= 0.5 + 1e-6
        checked += 1
    assert checked > 0


def test_partition_pruning_prunes_files(spark, sf_dir):
    """A single-day filter on the date-partitioned layout must touch only
    that day's files, and the scan must carry a PartitionFilter."""
    from e_commerce_streaming_datapipeline_spark.operators.connectors import partitioned_events_dir

    import re

    part_dir = partitioned_events_dir(spark, sf_dir)
    events = spark.read.parquet(part_dir)
    one_day = events.where(F.col("event_date") == F.lit("2024-01-10"))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the day filter must land in PartitionFilters (directory-level pruning,
    # no file opened outside the day), not in DataFilters (row-level)
    assert re.search(r"PartitionFilters: \[[^\]]*event_date#\d+ = 2024-01-10", plan), plan
    assert "DataFilters: []" in plan


def test_shipping_priority_plan(spark, sf_dir):
    """Q3 shape must keep date filters in the scans, top-10 as
    TakeOrderedAndProject (per-partition heap, no global sort), and no
    nested-loop/cartesian fallback."""
    from e_commerce_streaming_datapipeline_spark.operators.joins import q_shipping_priority

    plan = q_shipping_priority(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("PushedFilters: [IsNotNull") >= 2


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed by the join key: the join subplan must contain
    ZERO shuffle Exchange nodes — co-location replaces the shuffle.  At
    fixture scale the planner would broadcast instead (equally shuffle-free),
    so broadcast is disabled to surface the path a 100-TB fact-fact join
    takes."""
    from e_commerce_streaming_datapipeline_spark.operators.connectors import bucketed_order_lineitem_join

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            bucketed_order_lineitem_join(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert plan.count("Bucketed: true") == 2


def test_order_priority_check_is_semi_join(spark, sf_dir):
    """Q4's EXISTS must plan as a LEFT SEMI join (one probe hit per order,
    no row multiplication) with the non-equi lateness conjunct as a join
    residual, and the date range pushed into the orders scan."""
    from e_commerce_streaming_datapipeline_spark.operators.tpch_shapes import q_order_priority_check

    plan = q_order_priority_check(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "GreaterThan(o_orderdate" in plan or "o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_idle_rich_customers_is_anti_join(spark, sf_dir):
    """Q22's NOT EXISTS must plan as a LEFT ANTI join, and the scalar
    average threshold as a 1-row broadcast (no per-row recompute)."""
    from e_commerce_streaming_datapipeline_spark.operators.tpch_shapes import q_idle_rich_customers

    plan = q_idle_rich_customers(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_large_volume_customers_aggregates_fact_once(spark, sf_dir):
    """Q18 must scan lineitem ONCE (aggregate-then-join), not re-join the
    raw fact after the HAVING subquery like the literal spec plan would."""
    from e_commerce_streaming_datapipeline_spark.operators.tpch_shapes import q_large_volume_customers

    plan = q_large_volume_customers(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in plan


def test_discount_revenue_pushdown(spark, sf_dir):
    """Q6 is the pushdown canary: all three predicates must reach the
    parquet scan as PushedFilters and ReadSchema must prune to the 4
    referenced lineitem columns — a regression here means every scan in
    the engine got slower."""
    import re

    from e_commerce_streaming_datapipeline_spark.operators.tpch_shapes2 import q_discount_revenue_potential

    df = q_discount_revenue_potential(spark, sf_dir)
    # toString() abbreviates long PushedFilters lists; formatted mode doesn't
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for pushed in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                   "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
                   "LessThan(l_quantity"):
        assert pushed in plan, f"{pushed} not pushed to scan"
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) == 4, plan


def test_windowed_totals_scan_fact_once(spark, sf_dir):
    """Q15/Q20 compute their scalar-max / per-part totals as a window over
    the already-aggregated relation, NOT an aggregate-then-join-back (whose
    branches canonicalize differently and plan two fact scans).  The final
    AQE plan must contain exactly one lineitem scan each; Q2's join-back
    variant must show ReuseExchange firing instead."""
    from e_commerce_streaming_datapipeline_spark.operators.tpch_shapes2 import (
        q_dominant_part_suppliers,
        q_min_cost_supplier,
        q_top_supplier,
    )

    for builder in (q_top_supplier, q_dominant_part_suppliers):
        df = builder(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        scans = [l for l in final.splitlines()
                 if "FileScan" in l and "lineitem.parquet" in l]
        assert len(scans) == 1, f"{builder.__name__}: {len(scans)} lineitem scans"

    df = q_min_cost_supplier(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final or "ReusedQueryStage" in final


def test_no_accidental_cartesian_or_nested_loop_joins(spark, sf_dir):
    """Registry-wide plan lint: no batch query may plan a CartesianProduct,
    and BroadcastNestedLoopJoin is allowed ONLY for the queries that
    deliberately cross-join a 1-row scalar relation (threshold / query-
    vector / corpus-stat broadcasts).  Catches the classic silent
    regression where a dropped join condition or a non-equi predicate
    downgrades an equi-join into an O(n*m) loop that only explodes at
    scale."""
    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries

    # Deliberate nested-loop joins that remain after the round-3 whitelist
    # trim (1-row THRESHOLD attachments now go through
    # functions/scalars.scalar_join, a broadcast HASH join, and need no
    # allowance).  What's left is genuinely non-equi or small-grid fan-out:
    scalar_cross = {
        "embedding_topk",         # query-vector x corpus fan-out (Q x N scan)
        "ngram_jaccard_topk",     # query document x corpus fan-out
        "lsh_recall_audit",       # inherits embedding_topk's query-vector cross join
        "lsh_multiprobe_recall_audit",  # ditto + 5-row probe-levels cross join
        "hard_negative_mining",   # anchor-sample broadcast, label-mismatch predicate
        "embedding_topk_sq",      # query-vector broadcast (quantized candidate scan)
        "matryoshka_recall_audit",  # inherits embedding_topk's query-vector cross join
        "knn_label_accuracy",     # ditto (brute-force pairs feed the vote)
        "pr_curve_thresholds",    # 9-threshold x bounded score-grid range join
        "mmr_diversified_topk",   # query-vector fan-out feeding the MMR kernel
        "kmeans_lloyd_step",      # K-row centroid-table broadcast (Lloyd assignment)
        "trained_ivf_topk",       # same K-row centroid broadcast, x3 (train/assign/probe)
        "embedding_topk_ivf_adc", # inherits the K-row centroid crossJoin (ivf_assign)
        "ivf_probe_recall_audit", # ditto + 3-row nprobe-levels cross join
        "source_fuzzy_pairs",     # 20-row distinct-key self-join, length-banded
        "revenue_theilsen_trend", # daily-aggregate pair expansion (n_days^2/2)
        "locf_value_15min",       # spine x |event types| tiny-relation grid
        "sql_udf_revenue",        # 4-row discount-band table function, range-joined
        "decontam_threshold_sweep",  # 4-row threshold grid x per-doc hit counts
    }
    # builders with side effects or streaming runs — not pure explain targets:
    skip_substr = ("_stream", "bucketed", "partitioned_scan", "csv_source", "orc_source",
                   "multimodal", "merge_upsert",
                   # round-3 side-effecting builders (streaming runs, Derby
                   # DDL/MERGE, catalog DDL + INSERT OVERWRITE, observe()'s
                   # noop pass, the dims^2 driver collect) — not pure
                   # explain targets either
                   "lambda_unified", "jdbc_upsert", "warehouse_", "observed_",
                   "embedding_top_pc")
    from e_commerce_streaming_datapipeline_spark.plans.lint import lint_plan

    # Single-partition windows allowed ONLY over relations whose size is
    # bounded by something other than the data (the round-4 global-window
    # rule; unbounded ones were rewired onto functions/ranks.py —
    # ngram_zipf_slope, conversion_latency_stats, revenue_gini,
    # rfm_segments, clv (deciling), equi_depth_histogram,
    # source_quantile_normalize, zorder_layout_stats).  Each entry names
    # its bound:
    bounded_global_window = {
        "approx_topk_event_types",   # exploded approx_top_k sketch: <= 5 rows
        "auc_quality_langid",        # 2dp score grid: <= ~10^4 distinct scores
        "decision_stump_train",      # split tallies over the n_chars NDV grid
        "kaplan_meier_conversion",   # KM chain over the day-grain (horizon-
                                     # bounded) step relation
        "bootstrap_revenue_ci",      # 200 bootstrap replicate means
        "calibration_bins",          # 10 reliability bins
        "chi2_independence",         # lang x source contingency grid
        "clv_pareto_deciles",        # cum-share window over the 10 deciles
        "compaction_plan",           # file manifest (metadata, not rows)
        "compaction_rewrite_roundtrip",  # same manifest-sized inventory window
        "daily_revenue_ma",          # daily spine (#days)
        "forecast_backtest_snaive",  # daily spine
        "gmv_pattern_topk",          # minutely spine (#minutes in range)
        "kfold_auc",                 # k=5 per-fold summary rows
        "knn_label_accuracy",        # N_QUERIES query rows
        "lateness_watermark_profile",  # bucket-summary relation (id-range/512)
        "locf_value_15min",          # 15-min spine x |event types| grid
        "markov_attribution",        # <= 51-row transition matrix
        "neyman_allocation_sample",  # largest-remainder rank over <= |langs| strata
        "matryoshka_recall_audit",   # N_QUERIES rows
        "popularity_rec_hitrate",    # segment x top-5 recommendation grid
        "psi_value_drift",           # fixed PSI bins
        "quantile_pinball_backtest", # decile grid x daily spine
        "residual_anomaly_days",     # daily spine
        "retrieval_eval_mrr",        # N_QUERIES rows
        "revenue_cusum_changepoints",  # daily spine
        "revenue_dod",               # daily spine
        "revenue_rolling_7d",        # daily spine
        "revenue_theilsen_trend",    # daily-pair slopes (n_days^2/2)
        "running_revenue",           # daily spine
        "seasonal_decompose_daily",  # daily spine
        "top_supplier",              # supplier-dim relation (one skinny row
                                     # per supplier; see its docstring)
    }
    checked = 0
    for name, q in sorted(all_queries().items()):
        if any(s in name for s in skip_substr):
            continue
        findings = lint_plan(
            q.builder(spark, sf_dir),
            allow_nested_loop=name in scalar_cross,
            allow_expand=True,  # cube/rollup/grouping-sets Expands are intended
            allow_global_window=name in bounded_global_window,
        )
        findings = [f for f in findings if f.rule != "unbounded-collect"]
        assert not findings, f"{name}: {[str(f) for f in findings]}"
        checked += 1
    assert checked > 80


def test_decontam_is_broadcast_join_corpus_never_shuffles(spark, sf_dir):
    """The benchmark n-gram set must reach the contamination join as a
    broadcast relation — the 100 TB training side probes map-side and never
    shuffles raw n-grams (SCALE.md corpus curation)."""
    from e_commerce_streaming_datapipeline_spark.operators.curation import q_benchmark_decontam

    plan = q_benchmark_decontam(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_user_erasure_marks_via_broadcast(spark, sf_dir):
    """The erasure-request list is tiny by nature: the mark join must be a
    broadcast left outer — the fact side never shuffles for a delete."""
    from e_commerce_streaming_datapipeline_spark.operators.curation import q_user_erasure

    plan = q_user_erasure(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_packing_single_window_shuffle(spark, sf_dir):
    """Cumsum binning must cost exactly ONE exchange (the lang partition for
    the running sum); the bin aggregation reuses that partitioning."""
    from e_commerce_streaming_datapipeline_spark.operators.curation import q_sequence_packing

    plan = q_sequence_packing(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    # count distinct Exchange operators (AQE may reuse); expect 1 shuffle
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}:\n{plan}"


def test_pii_redaction_prunes_scan_to_two_columns(spark, sf_dir):
    """Redaction touches only (doc_id, text): the parquet ReadSchema must
    prune lang/source/n_chars — at 100 TB reading dead columns IS the cost."""
    from e_commerce_streaming_datapipeline_spark.operators.curation import q_pii_redaction

    plan = q_pii_redaction(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_approx_percentiles_bracket_exact(spark, sf_dir):
    """approx_percentile (GK sketch, accuracy 10000 ⇒ rank error < 1 row on
    the fixture) returns a DISCRETE order statistic while the exact twin
    interpolates — so the right sanity floor is a quantile bracket: the
    sketch's p-quantile must lie within the exact [p-0.02, p+0.02] value
    range (tighter than the registered query's ±0.05 driver envelope, so
    this test is the binding local floor).  The raw GK values stay out of
    the hashed query output (engine-specific); since r9 the registered
    query instead hashes per-quantile in-bracket booleans — asserted
    all-TRUE here too."""
    from e_commerce_streaming_datapipeline_spark.operators.advanced import (
        q_approx_value_percentiles,
    )
    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    events = load_table(spark, "events", sf_dir)
    brackets = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            *[
                F.percentile(F.col("value"), max(p - 0.02, 0.0)).alias(f"lo{i}")
                for i, p in enumerate((0.5, 0.9, 0.99))
            ],
            *[
                F.percentile(F.col("value"), min(p + 0.02, 1.0)).alias(f"hi{i}")
                for i, p in enumerate((0.5, 0.9, 0.99))
            ],
            *[
                F.approx_percentile(F.col("value"), p, 10000).alias(f"gk{i}")
                for i, p in enumerate((0.5, 0.9, 0.99))
            ],
        )
        .collect()
    }
    assert brackets
    for et, b in brackets.items():
        for i in range(3):
            assert b[f"lo{i}"] - 1e-9 <= b[f"gk{i}"] <= b[f"hi{i}"] + 1e-9, (
                et,
                i,
                b[f"gk{i}"],
            )
    audited = {
        r["event_type"]: r
        for r in q_approx_value_percentiles(spark, sf_dir).collect()
    }
    assert audited.keys() == brackets.keys()
    for et, a in audited.items():
        assert a["p50_in_bracket"] and a["p90_in_bracket"] and a["p99_in_bracket"], et


def test_ordered_funnel_single_fact_shuffle(spark, sf_dir):
    """Three funnel stages must share ONE user_id exchange (each stage is a
    window expression over the same partitioning, not a self-join); only the
    final 1-row rollup adds a SinglePartition exchange."""
    from e_commerce_streaming_datapipeline_spark.operators.funnel import q_ordered_funnel

    plan = q_ordered_funnel(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash == 1, f"expected 1 hash exchange, got {n_hash}:\n{plan}"
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_lint_plan_flags_and_allows(spark, sf_dir):
    """lint_plan (the library form of this suite's plan gates) must flag a
    genuine cartesian product and a nested loop, stay quiet on a clean
    equi-join, and honor the allow flags."""
    from e_commerce_streaming_datapipeline_spark.plans.lint import lint_plan

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang").limit(10)
    other = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("id2")
    ).limit(10)

    cross = docs.crossJoin(other)
    rules = {f.rule for f in lint_plan(cross)}
    assert "cartesian" in rules or "nested-loop" in rules

    nlj = docs.join(other, docs.doc_id < other.id2)
    assert any(f.rule == "nested-loop" for f in lint_plan(nlj))
    assert not any(
        f.rule == "nested-loop" for f in lint_plan(nlj, allow_nested_loop=True)
    )

    clean = docs.join(other, docs.doc_id == other.id2)
    assert lint_plan(clean) == []

    distinct_mix = load_table(spark, "events", sf_dir).groupBy("event_type").agg(
        F.count("*"), F.count_distinct("user_id"), F.count_distinct("event_id")
    )
    assert any(f.rule == "distinct-expand" for f in lint_plan(distinct_mix))


def test_lint_flags_global_window_and_spares_bounded_forms(spark, sf_dir):
    """The round-4 global-window rule: an unpartitioned ranking window must
    be flagged; a rank-filtered top-k (WindowGroupLimit pushdown bounds the
    single-partition exchange), a partitioned window, and the two-phase
    rank's own __rank_pid offsets window must not; allow_global_window
    silences it for documented bounded relations."""
    from pyspark.sql import Window

    from e_commerce_streaming_datapipeline_spark.functions.ranks import global_row_number
    from e_commerce_streaming_datapipeline_spark.plans.lint import lint_plan

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")

    naive = docs.withColumn(
        "r", F.row_number().over(Window.orderBy("n_chars", "doc_id"))
    )
    assert any(f.rule == "global-window" for f in lint_plan(naive))
    assert not any(
        f.rule == "global-window"
        for f in lint_plan(naive, allow_global_window=True)
    )

    topk = docs.withColumn(
        "r", F.row_number().over(Window.orderBy("n_chars", "doc_id"))
    ).where(F.col("r") <= 5)
    assert not any(f.rule == "global-window" for f in lint_plan(topk))

    partitioned = docs.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy(F.col("doc_id") % 7).orderBy("n_chars", "doc_id")
        ),
    )
    assert not any(f.rule == "global-window" for f in lint_plan(partitioned))

    two_phase = global_row_number(docs, [F.col("n_chars"), F.col("doc_id")])
    assert not any(f.rule == "global-window" for f in lint_plan(two_phase))


def test_two_phase_rank_matches_global_window(spark, sf_dir):
    """global_row_number must assign exactly the ranks of
    row_number() OVER (ORDER BY ...) under a total order, for ascending,
    descending, and mixed keys, and its total_col must equal count(*);
    ntile_from_rank must reproduce SQL NTILE for every (n, k) fill shape."""
    from pyspark.sql import Window

    from e_commerce_streaming_datapipeline_spark.functions.ranks import (
        global_row_number,
        ntile_from_rank,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars", "lang")
    for order in (
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        [F.col("n_chars").desc(), F.col("doc_id").asc_nulls_last()],
        [F.col("lang").asc_nulls_last(), F.col("doc_id").desc()],
    ):
        expected = {
            r["doc_id"]: r["r"]
            for r in docs.withColumn("r", F.row_number().over(Window.orderBy(*order)))
            .select("doc_id", "r")
            .collect()
        }
        got = {
            r["doc_id"]: r["r"]
            for r in global_row_number(docs, order, rank_col="r", total_col="n")
            .select("doc_id", "r")
            .collect()
        }
        assert got == expected
    n_total = (
        global_row_number(docs, [F.col("doc_id")], total_col="n")
        .select("n")
        .distinct()
        .collect()
    )
    assert [r["n"] for r in n_total] == [docs.count()]

    # NTILE parity across uneven fills: every (n, k) with n in 1..13, k in 1..5
    import pandas as pd

    for n in range(1, 14):
        for k in range(1, 6):
            pdf = spark.createDataFrame(
                pd.DataFrame({"rank": list(range(1, n + 1)), "total": [n] * n})
            )
            got_tiles = [
                r["t"]
                for r in pdf.select(
                    "rank",
                    ntile_from_rank(F.col("rank"), F.col("total"), k).alias("t"),
                )
                .orderBy("rank")
                .collect()
            ]
            sql_tiles = [
                r["t"]
                for r in spark.createDataFrame(
                    pd.DataFrame({"v": list(range(1, n + 1))})
                )
                .select(F.ntile(k).over(Window.orderBy("v")).alias("t"), "v")
                .orderBy("v")
                .select("t")
                .collect()
            ]
            assert got_tiles == sql_tiles, (n, k)


def test_external_session_can_run_closure_pickling_queries(tmp_path):
    """A driver-like process (foreign cwd, vanilla SparkSession, no
    PYTHONPATH) must be able to run operators whose closures pickle by
    reference — executor workers get the package via the addPyFile shipping
    in ensure_session_conf.  Regression: multimodal mapInPandas + the Python
    DataSource failed exactly this way before the fix."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "__spark_entry__", "/root/repo/__spark_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[2]").getOrCreate()
        qs = mod.queries()
        # python_datasource_feed FIRST: it must ship the package itself via
        # register() -> ensure_session_conf, not ride on a prior query's
        # addPyFile side effect
        for name in ("python_datasource_feed", "multimodal_decode"):
            assert qs[name](spark, "/root/testdata/sf0.001").count() > 0, name
        print("EXTERNAL_SESSION_OK")
        """
    )
    import os

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the property under test: no import-path help
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "EXTERNAL_SESSION_OK" in proc.stdout, proc.stderr[-2000:]


def test_no_complex_typed_output_columns(spark, sf_dir):
    """Driver-canonicalizer contract: every registered query's result schema
    is scalar-only.  Array/map/struct output columns are unhashable by
    pandas-based result canonicalizers (sort_values -> factorize ->
    `unhashable type: 'list'`), so vector-ish results are emitted as
    comma-joined fixed-point strings instead (see embedding_centroids,
    embedding_quantize, multimodal_features, multimodal_frame_sample,
    dropoff_hourly).  Schema access analyzes the plan without executing it,
    so this sweeps all queries cheaply."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries

    offenders = {}
    for name, q in sorted(all_queries().items()):
        fields = q.builder(spark, sf_dir).schema.fields
        bad = [f.name for f in fields if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed output columns: {offenders}"


def test_salting_balances_skewed_join_reducers(spark):
    """Skew-resilience evidence for the salting pattern behind
    salted_priority_revenue (operators/setops.py): on a deliberately skewed
    join key (~75% of fact rows on ONE hot key), the unsalted shuffle-hash
    join lands the hot key's rows on a single reducer, while the 8-way
    salted twin spreads them across reducers.  Asserted on rows-per-output-
    partition of the join itself (the shuffle-size evidence, deterministic —
    no timing), with AQE disabled so nothing rebalances behind the test.

    Two measurement traps this test works around: load_table ->
    ensure_session_conf re-enables AQE, so the disable must come AFTER the
    loads; and spark_partition_id() gets project-pushed below the exchange
    (reporting scan-side partitions), so distribution is read via
    rdd.mapPartitions — the true physical output partitioning."""
    from tests.conftest import SF_DIR_T2

    li = load_table(spark, "lineitem", SF_DIR_T2).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    was_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # deterministic skew: 3 of 4 rows collapse onto key 1
        fact = li.withColumn(
            "k",
            F.when(F.col("l_orderkey") % 4 != 0, F.lit(1)).otherwise(
                F.col("l_orderkey")
            ),
        )
        dim = fact.select("k").distinct().withColumn("prio", F.col("k") % 5)

        def partition_counts(df):
            return df.rdd.mapPartitions(
                lambda it: iter([sum(1 for _ in it)])
            ).collect()

        plain = fact.join(dim.hint("shuffle_hash"), "k")
        # salt must vary within the hot key: (orderkey, linenumber) is
        # row-unique, whereas linenumber alone has only 7 distinct values.
        # 32 buckets >> 8 reducers: the hot key's salt groups hash into
        # partitions with collisions (birthday problem), so the bucket count
        # must exceed the target parallelism for the spread to smooth out.
        n_salt = 32
        salted_f = fact.withColumn(
            "__salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(n_salt))
        )
        salted_d = dim.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        salted = salted_f.join(
            salted_d.hint("shuffle_hash"),
            (salted_f.k == salted_d.k) & (salted_f.__salt == salted_d.__salt),
        )

        total = fact.count()
        assert salted.count() == plain.count() == total  # same join result size

        plain_max = max(partition_counts(plain))
        salted_max = max(partition_counts(salted))
        # unsalted: the hot key's ~75% of rows sit on one reducer
        assert plain_max >= 0.7 * total, (plain_max, total)
        # salted: the hot key spreads 8 ways; worst reducer carries a
        # fraction of the unsalted hot partition
        assert salted_max <= plain_max / 3, (salted_max, plain_max)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", was_aqe)


def test_diagnosed_salting_balances_hot_key(spark):
    """salted_join_rewrite's mechanism (diagnosed_salted_join) on a
    deliberately skewed key, with AQE fully disabled so nothing rebalances
    behind the rewrite: the hot key's rows must spread across reducers
    while the join result stays identical to the plain join — the
    partial-salting twin of test_salting_balances_skewed_join_reducers
    (which salts every key)."""
    from e_commerce_streaming_datapipeline_spark.operators.setops import (
        diagnosed_salted_join,
    )
    from tests.conftest import SF_DIR_T2

    li = load_table(spark, "lineitem", SF_DIR_T2).select(
        "l_orderkey", "l_linenumber"
    )
    was_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # ~75% of fact rows collapse onto key 1; the rest keep their key
        fact = li.withColumn(
            "k",
            F.when(F.col("l_orderkey") % 4 != 0, F.lit(1)).otherwise(
                F.col("l_orderkey")
            ),
        )
        dim = fact.groupBy("k").agg(F.count("*").alias("n_k"))
        # diagnose: mean-multiple threshold finds exactly the planted key
        thr_row = dim.agg((F.avg("n_k") * 3).alias("t")).collect()[0]
        hot = dim.where(F.col("n_k") > thr_row["t"]).select("k")
        assert hot.count() == 1

        plain = fact.join(dim.hint("shuffle_hash"), "k")
        salted = diagnosed_salted_join(
            fact,
            dim,
            "k",
            hot,
            buckets=32,
            probe_salt=F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(32)),
        )

        def partition_counts(df):
            return df.rdd.mapPartitions(
                lambda it: iter([sum(1 for _ in it)])
            ).collect()

        total = fact.count()
        assert salted.count() == plain.count() == total

        plain_max = max(partition_counts(plain))
        salted_max = max(partition_counts(salted))
        assert plain_max >= 0.7 * total, (plain_max, total)
        assert salted_max <= plain_max / 3, (salted_max, plain_max)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", was_aqe)


def test_aqe_replans_smj_to_broadcast_at_runtime(spark, sf_dir):
    """AQE evidence: a join whose build side only becomes broadcast-small
    AFTER a selective filter (stats unknown at plan time on the filtered
    relation because the 1-file scan estimate is pessimistic) must be
    re-planned to BroadcastHashJoin from runtime shuffle statistics — the
    local[32] stand-in for the 1000-executor case where static planning
    cannot see post-filter sizes."""
    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    # force the static planner away from broadcast, then let AQE reverse it
    # from runtime shuffle stats.  The adaptive threshold must be set
    # explicitly: it FALLS BACK to the static one, and -1 there would
    # disable AQE's conversion too.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    try:
        small = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        joined = lineitem.join(small, lineitem.l_orderkey == small.o_orderkey).agg(
            F.count("*").alias("n")
        )
        joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan isFinalPlan=true" in final
        assert "BroadcastHashJoin" in final.split("== Initial Plan ==")[0], (
            "AQE did not convert the shuffle join to broadcast at runtime"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)


def test_observation_metrics_ride_the_query(spark, sf_dir):
    """`df.observe` evidence: accumulator-style metrics collected DURING a
    query (no second scan) — the production monitoring hook the streaming
    side gets from StreamingQueryListener, on the batch path."""
    from pyspark.sql import Observation

    li = load_table(spark, "lineitem", sf_dir)
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("discounted"),
    )
    n = observed.where(F.col("l_quantity") > 0).count()
    got = obs.get
    assert got["rows_seen"] == li.count() == n
    assert 0 < got["discounted"] < got["rows_seen"]
