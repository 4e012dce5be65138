"""Semantic invariants for the round-2 operator families — properties the
DuckDB hash check cannot express (it proves Spark ≡ oracle, not that the
shared definition is *right*).  Each invariant is a mathematical fact of the
operator's definition, so a failure means the implementation (and its
oracle twin) drifted together."""

from __future__ import annotations

import math

from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries


def _rows(name, spark, sf_dir):
    return all_queries()[name].builder(spark, sf_dir).collect()


def test_cms_estimates_are_one_sided(spark, sf_dir):
    """Count-min sketch error is strictly one-sided: estimate >= exact for
    every key (hash collisions only ever add)."""
    rows = _rows("heavy_hitters_cms", spark, sf_dir)
    assert rows, "threshold produced no heavy hitters at this SF"
    for r in rows:
        assert r["cms_estimate"] >= r["exact_n"], r
        assert r["overcount"] == r["cms_estimate"] - r["exact_n"]


def test_pagerank_mass_conservation(spark, sf_dir):
    """Every rank >= the teleport floor (1-d)/N, and total mass <= 1
    (dangling-node mass is dropped, never created)."""
    rows = _rows("nation_pagerank", spark, sf_dir)
    n = len(rows)
    floor = (1 - 0.85) / n - 1e-9
    total = sum(r["pagerank"] for r in rows)
    assert all(r["pagerank"] >= floor for r in rows)
    assert total <= 1.0 + 1e-6, total


def test_twa_lies_within_value_range(spark, sf_dir):
    """A time-weighted average is a convex combination of the observed
    values — it cannot leave the corpus's purchase-value envelope."""
    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    purchases = load_table(spark, "events", sf_dir).where(
        F.col("event_type") == "purchase"
    )
    lo, hi = purchases.agg(
        F.min(F.coalesce("value", F.lit(0.0))), F.max(F.coalesce("value", F.lit(0.0)))
    ).first()
    for r in _rows("event_value_twa", spark, sf_dir):
        assert lo - 1e-4 <= r["twa_value"] <= hi + 1e-4, r


def test_entropy_bounds(spark, sf_dir):
    """Shannon entropy of the event-type mix is within [0, ln(n_types)]."""
    for r in _rows("user_behavior_features", spark, sf_dir):
        assert -1e-9 <= r["type_entropy"] <= math.log(r["n_types"]) + 1e-4, r


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    """Per from_type, transition probabilities sum to 1 (within the 4dp
    per-cell rounding budget)."""
    sums: dict[str, float] = {}
    for r in _rows("event_transition_matrix", spark, sf_dir):
        assert 0.0 <= r["p_transition"] <= 1.0
        sums[r["from_type"]] = sums.get(r["from_type"], 0.0) + r["p_transition"]
    assert sums
    for ft, s in sums.items():
        assert abs(s - 1.0) < 0.01, (ft, s)


def test_cohort_day_zero_retention_is_total(spark, sf_dir):
    """Offset 0 counts every cohort member (each user is active on their
    own first-seen day) — retention at day 0 is exactly 100%."""
    rows = [r for r in _rows("cohort_retention", spark, sf_dir) if r["day_offset"] == 0]
    assert rows
    for r in rows:
        assert r["n_active"] == r["cohort_size"], r
        assert r["retention_pct"] == 100.0, r


def test_dynamic_sessions_partition_events(spark, sf_dir):
    """Dynamic-gap sessions partition the event stream: per-session counts
    sum to the corpus total and every window is properly ordered."""
    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    total = load_table(spark, "events", sf_dir).count()
    rows = _rows("session_dynamic_gap_stats", spark, sf_dir)
    assert sum(r["n_events"] for r in rows) == total
    for r in rows:
        assert r["session_end"] > r["session_start"], r
        assert r["n_purchases"] <= r["n_events"], r


def test_full_outer_stream_match_typing(spark, sf_dir):
    """Sentinel/typing discipline of the full-outer join output: ids are -1
    exactly on the unmatched side, and matched rows respect the 30-minute
    conversion window."""
    for r in _rows("click_purchase_full_outer_stream", spark, sf_dir):
        if r["match_type"] == "matched":
            assert r["click_id"] != -1 and r["purchase_id"] != -1
            delta = (r["purchase_ts"] - r["click_ts"]).total_seconds()
            assert 0 <= delta <= 1800, r
        elif r["match_type"] == "click_only":
            assert r["click_id"] != -1 and r["purchase_id"] == -1
            assert r["purchase_ts"] is None
        else:
            assert r["match_type"] == "purchase_only"
            assert r["purchase_id"] != -1 and r["click_id"] == -1
            assert r["click_ts"] is None


def test_kmeans_assignment_is_argmin(spark, sf_dir):
    """Brute-force re-check of the Lloyd step on a vector sample: the
    assigned cluster truly minimizes the exact rational-centroid distance
    (ties to the smaller label)."""
    import numpy as np
    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", "label", "embedding")
        .collect()
    )
    q4 = {r["vec_id"]: np.round(np.array(r["embedding"], dtype=np.float64) * 10000)
          for r in emb}
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for r in emb:
        sums[r["label"]] = sums.get(r["label"], 0) + q4[r["vec_id"]]
        counts[r["label"]] = counts.get(r["label"], 0) + 1
    assigned = {r["vec_id"]: r["assigned_label"]
                for r in _rows("kmeans_lloyd_step", spark, sf_dir)}
    sample = sorted(q4)[:25]
    for vid in sample:
        best = min(
            sorted(sums),
            key=lambda k: (
                float(((counts[k] * q4[vid] - sums[k]) ** 2).sum()) / counts[k] ** 2,
                k,
            ),
        )
        assert assigned[vid] == best, (vid, assigned[vid], best)


def test_chunk_dedup_retention_bounds(spark, sf_dir):
    """Retention is a fraction of the doc's own chunks; shared counts are
    bounded by totals."""
    for r in _rows("chunk_dedup_retention", spark, sf_dir):
        assert 0 <= r["n_shared_chunks"] <= r["n_chunks"], r
        assert -1e-9 <= r["retention_frac"] <= 1.0 + 1e-9, r


def test_integrity_report_clean_fixture(spark, sf_dir):
    """The driver fixtures are referentially clean by construction — the
    expectation gate must report zero violations on every check (and
    nonzero populations)."""
    for r in _rows("integrity_report", spark, sf_dir):
        assert r["violations"] == 0, r
        assert r["checked"] > 0, r


def test_zorder_tightens_user_spans(spark, sf_dir):
    """Z-order's whole point: sorting by the interleaved code must give
    materially tighter per-file user-bucket ranges than time order (events
    arrive in time order, so user ids are uniformly spread per file), and a
    user point-predicate must open no MORE files than under natural order."""
    rows = {r["layout"]: r for r in _rows("zorder_layout_stats", spark, sf_dir)}
    assert set(rows) == {"natural", "zorder"}
    assert (
        rows["zorder"]["avg_user_span_x10000"]
        < rows["natural"]["avg_user_span_x10000"]
    )
    assert (
        rows["zorder"]["probe_user_files_hit"]
        <= rows["natural"]["probe_user_files_hit"]
    )
    assert rows["natural"]["n_files"] == rows["zorder"]["n_files"] == 64


def test_bloom_filter_is_sound_and_useful(spark, sf_dir):
    """A Bloom filter has no false negatives (every true match passes) and
    its measured false-positive rate should sit under the theoretical bound
    by a wide margin for this load factor: with n keys, k=2 hashes, m=16384
    bits, fp <= (1 - e^(-2n/m))^2 plus slack."""
    (r,) = _rows("bloom_filter_prejoin", spark, sf_dir)
    assert r["n_candidates"] >= r["n_true"]  # no false negatives
    assert r["n_false_pos"] == r["n_candidates"] - r["n_true"]
    theoretical = (1 - math.exp(-2 * r["n_build_keys"] / 16384.0)) ** 2
    assert r["false_pos_rate"] <= max(theoretical * 3, 0.05), (
        r["false_pos_rate"],
        theoretical,
    )


def test_equi_depth_buckets_are_equal_and_ordered(spark, sf_dir):
    """Equi-depth invariants: bucket sizes differ by at most 1 (ntile
    contract), bucket value ranges are non-overlapping and ascending, and
    the per-bucket mean lies inside [lo, hi]."""
    rows = sorted(_rows("equi_depth_histogram", spark, sf_dir), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == list(range(1, 17))
    sizes = [r["n_orders"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for prev, cur in zip(rows, rows[1:]):
        assert prev["hi"] <= cur["lo"] + 0.011  # rounded boundary ties allowed
    for r in rows:
        assert r["lo"] - 0.011 <= r["avg_price"] <= r["hi"] + 0.011


def _plan(spark, sf_dir, name):
    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries

    return (
        all_queries()[name]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_cdc_compaction_bounds_shuffle_with_window_group_limit(spark, sf_dir):
    """The latest-row election must plan a partial WindowGroupLimit so each
    map task forwards only top-1-per-key candidates into the shuffle —
    compaction cost scales with keys, not change-log length."""
    assert "WindowGroupLimit" in _plan(spark, sf_dir, "cdc_apply_latest")


def test_bloom_prejoin_never_shuffles_the_fact_table(spark, sf_dir):
    """The whole point of a runtime filter: membership tests are broadcast
    hash joins on the fact scan; a SortMergeJoin would mean the fact table
    shuffled to learn what it could have filtered map-side."""
    plan = _plan(spark, sf_dir, "bloom_filter_prejoin")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # bits x2 + truth


def test_copurchase_topk_is_take_ordered(spark, sf_dir):
    """Top-20 pairs must plan TakeOrderedAndProject (per-partition top-k +
    merge), never a global Sort of the pair relation."""
    plan = _plan(spark, sf_dir, "copurchase_pairs")
    assert "TakeOrderedAndProject" in plan


def test_pit_lookup_interval_stays_on_equi_join(spark, sf_dir):
    """The SCD2 interval predicate must ride as a residual on the custkey
    equi-join — a BroadcastNestedLoopJoin here means the non-equi bounds
    demoted the join and the plan is O(n*m) at scale."""
    plan = _plan(spark, sf_dir, "scd2_pit_lookup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shard_assignment_is_balanced_and_exhaustive(spark, sf_dir):
    """Multiplicative-hash sharding must touch every shard, cover every doc,
    and keep doc skew near 1 (uniform key domain)."""
    (r,) = _rows("training_shard_assignment", spark, sf_dir)
    assert r["n_shards"] == 64
    assert r["min_docs"] >= 1
    assert 1.0 <= r["doc_skew"] < 2.0, r["doc_skew"]


def test_negative_samples_never_collide_with_positives(spark, sf_dir):
    """The anti-join guarantee: negatives-per-positive must be below the
    generation rate (collisions and duplicates removed), and every count
    consistent."""
    (r,) = _rows("negative_samples", spark, sf_dir)
    assert r["n_candidates"] == r["n_positives"] * 3
    assert 0 < r["n_negatives"] <= r["n_candidates"]
    assert r["neg_per_pos"] <= 3.0


def test_leakage_safe_labels_use_disjoint_windows(spark, sf_dir):
    """No feature may be computed from the label window: every user's
    pre-cutoff counts must equal a direct recount over ts < cutoff, and
    label-positive users must actually have a held-out purchase."""
    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    events = load_table(spark, "events", sf_dir)
    cut = events.agg(F.max("ts")).collect()[0][0]
    import datetime

    cutoff = cut - datetime.timedelta(days=7)
    rows = _rows("leakage_safe_labels", spark, sf_dir)
    before = {
        r["user_id"]: r["n"]
        for r in events.where(F.col("ts") < F.lit(cutoff))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    held_out_buyers = {
        r["user_id"]
        for r in events.where(
            (F.col("ts") >= F.lit(cutoff)) & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r["n_events_before"] == before[r["user_id"]]
        assert r["label"] == (r["user_id"] in held_out_buyers)


def test_sequence_export_is_capped_and_ordered(spark, sf_dir):
    """Sequences are at most 50 chars, truncation flags agree with length,
    and the alphabet is the event-type initials."""
    rows = _rows("user_sequence_export", spark, sf_dir)
    assert rows
    for r in rows:
        assert 1 <= r["seq_len"] == len(r["sequence"]) <= 50
        if r["seq_len"] < 50:
            assert not r["truncated"]
        assert set(r["sequence"]) <= {"c", "e", "p", "s", "v"}


def test_wilson_interval_brackets_rate(spark, sf_dir):
    """Wilson interval must contain the point rate, sit inside [0,1], and
    shrink below the naive +-z/2sqrt(n) bound's width at this n."""
    (r,) = _rows("conversion_rate_ci", spark, sf_dir)
    assert 0.0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1.0
    width = r["ci_hi"] - r["ci_lo"]
    assert width < 2 * 1.96 * 0.5 / math.sqrt(r["n_viewer_days"]) + 1e-9


def test_ab_null_experiment_is_not_significant(spark, sf_dir):
    """The arms are a hash split of exchangeable users on a uniform fixture
    — the null should look null: |z| modest, and the significance flag must
    agree with the |z| > 1.96 rule."""
    (r,) = _rows("ab_test_zscore", spark, sf_dir)
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["significant_95"] == (abs(r["z_score"]) > 1.959963985)
    assert abs(r["z_score"]) < 4.0  # exchangeable arms: no real effect


def test_seasonality_indices_average_to_one(spark, sf_dir):
    """Seasonal indices are day-count-weighted deviations from the grand
    mean — their weighted average must be 1 and all seven weekdays present."""
    rows = _rows("weekday_seasonality", spark, sf_dir)
    assert sorted(r["weekday"] for r in rows) == list(range(7))
    n = sum(r["n_days"] for r in rows)
    wavg = sum(r["seasonal_index"] * r["n_days"] for r in rows) / n
    assert abs(wavg - 1.0) < 0.01, wavg


def test_theilsen_pairs_count_is_choose_two(spark, sf_dir):
    """n_pairs must be exactly C(n_days, 2) and the slope must lie within
    the min/max pairwise slope envelope (it IS one of the slopes)."""
    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    events = load_table(spark, "events", sf_dir)
    n_days = (
        events.where(F.col("event_type") == "purchase")
        .select((F.unix_timestamp("ts") / 86400).cast("long"))
        .distinct()
        .count()
    )
    (r,) = _rows("revenue_theilsen_trend", spark, sf_dir)
    assert r["n_pairs"] == n_days * (n_days - 1) // 2
    assert r["trending_up"] == (r["theilsen_slope_per_day"] > 0)
