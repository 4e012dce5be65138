"""Measured scaling probe: replicate the sf0.1 fixtures k× (keys remapped so
join fan-outs stay constant) into /tmp and time representative queries at
each factor — the empirical is-it-actually-linear evidence behind SCALE.md's
plan arguments.

Run:  python scripts/scaling_probe.py            # factors 1, 2, 4
      SPARK_GRAFT_SCALE_FACTORS=1,2,4,8 python scripts/scaling_probe.py

Prints one JSON line per (factor, query) plus a summary table; results are
recorded in SCALE.md's "Measured scaling" section.  Writes only under /tmp.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_FACTORS", "1,2,4").split(",")]
OUT_ROOT = "/tmp/e_commerce_streaming_datapipeline_scaling"

# (table, key columns to offset per replica so keys stay unique and joins
# keep constant fan-out)
TABLES = {
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "customer": [],   # dims are NOT replicated — broadcast sides stay fixed
    "supplier": [],
    "nation": [],
    "region": [],
    "part": [],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
KEY_OFFSET = 10_000_000_000

QUERIES = [
    "pricing_summary",      # scan + hash agg over lineitem
    "gmv_minutely",         # windowed agg over events
    "user_sessions",        # per-user window sort (sessionization)
    "dedup_events",         # keyed dedup
    "order_details",        # fact-fact join orders x lineitem
    "chunk_dedup_retention",  # text chunk hash + count join
    "cdc_apply_latest",       # WindowGroupLimit-bounded latest-per-key
    "bloom_filter_prejoin",   # broadcast runtime-filter membership joins
    "copurchase_pairs",       # basket self-join pair mining + top-k
    # round-3 additions
    "cdc_chunks",             # per-doc window chunking + chunk-hash counts
    "dup_ngram_coverage",     # gram expansion + gram-keyed join back
    "bigram_perplexity",      # vocab-keyed LM joins (Zipf-skewed keys)
    "semantic_dedup",         # cluster-blocked pair expansion (note: per-
                              # cluster QUADRATIC by design — replicating the
                              # corpus without adding clusters grows block
                              # size, so expect ~k^2 here, the documented
                              # IVF-blocking trade; K scales with N in prod)
    # round-3 late additions
    "rfm_segments",           # fact agg + dim-sized NTILE windows (customer
                              # dim is NOT replicated: windows stay constant)
    "interpurchase_survival", # custkey-partitioned lag + one aggregate pass
    "bigram_pmi_topk",        # bigram flatMap + vocab-keyed joins
    "source_unigram_divergence",  # vocab-keyed pair join (counts scale, vocab doesn't)
    "bootstrap_revenue_ci",   # resamples the day-grain rollup (spine-sized)
    "dpp_partitioned_join",   # runtime-pruned partition scan
    # round-5 additions
    "dsir_importance_sample", # vocab-keyed LM-ratio scoring + TakeOrdered
    "bpe_encode_tokens",      # trainer rounds on the vocab relation + census
    "embedding_topk_ivf_adc", # IVF-pruned ADC: candidate set ~ nprobe/K * N
    "complete_funnel_stream", # agg->agg->join streaming chain (state = windows)
    "dsir_admission_stream",  # stateless foreachBatch gate vs fitted model
    # round-6 additions
    "logreg_sgd_step",        # 2 corpus aggregates (data-parallel GD steps)
    "prefix_filter_simjoin",  # prefix-posting join; NOTE replication keeps
                              # text identical across replicas, so every doc
                              # gains k-1 exact clones and TRUE pairs grow
                              # ~k^2 — the measured super-linearity is the
                              # output's, not the algorithm's (same effect
                              # as semantic_dedup's block-growth note)
    "kmv_set_overlap",        # hash-agg to per-user flags + TakeOrdered(k)
    "ivm_delta_merge",        # two partial rollups + groups-sized merge
    "hilbert_layout_stats",   # 2x two-phase rank + map-side curve columns
    # round-7 additions
    "jaccard_threshold_sweep",  # LSH candidates + 5-row threshold grid;
                                # same clone-pair ~k^2 output note as
                                # prefix_filter_simjoin
    "packing_efficiency_sweep",  # 4x map expansion into one (budget, lang)
                                 # window shuffle
    "conversion_window_sweep",   # union + one reverse as-of window pass
    "cross_source_leakage_matrix",  # distinct (source, gram) + gram join
                                    # (pair expansion <= sources per gram)
    "kanon_generalization_ladder",  # 4x level expansion, QI-grid aggs
    "benford_revenue_audit",     # map-side digit + 9-cell agg
    "schema_drift_audit",        # 5x stack + two-phase NDV distinct
    "embedding_outlier_topk",    # 64-row moments + row-local scoring fold
    "session_funnel_conversion", # one user shuffle: sessionize + 3 windows
    "cohort_ltv_triangle",       # user-grain aggs + broadcast cohort dim
    "partition_evolution_scan",  # two-spec write + pruned union scan
    "intra_doc_repetition_audit",  # row-local gram explode + 2 hash aggs
    "column_stats_stream",       # per-batch stats sink (batch-count bound)
    "props_schema_census",       # map-side JSON keys + shape-grain agg
    "experiment_power_advisor",  # user-day agg folded to 1 row + 4-row grid
    "vocabulary_growth_curve",   # 1 tokenize pass + vocab-sized grid aggs
    "revenue_concentration_hhi", # 2 hash aggs, day-sized output
    # round-8 additions (r7 VERDICT task #5: the lakehouse/audit families)
    "deletion_vector_scan",      # file-grain anti-join against position DVs
    "index_delta_merge",         # term-keyed stats merge (vocab-sized)
    "index_tombstone_merge",     # per-term subtraction merge (vocab-sized)
    "telemetry_double_fire_audit",  # 3x-explode bucketed interval self-join
    # round-8 operators
    "symspell_typo_linkage",     # x9 variant explode + equi-join (dims NOT
                                 # replicated: customer is a dim, so this
                                 # measures fixed-size overhead)
    "golden_record_survivorship",  # one cluster-key shuffle (agg + top-1)
    "golden_record_stream",      # per-batch partials + store merge
    "revenue_acf",               # 1 fact scan -> day-sized lag joins
    "decision_stump_train",      # 1 fact scan -> NDV-grid window
    "encoding_advisor",          # 3x stack -> (col, day) window + 2 aggs
    "hour_value_heatmap",        # 1 scan -> bounded 24x12 grid
    "ivm_retract_merge",         # 3 rollups of base/retract/reinsert
    "branch_merge_conflicts",    # single-scan 3-way diff grid
    "group_kfold_assignment",    # fold-grain agg + user-grain audit
    "wap_publish_gate",          # stage/audit/publish file lifecycle
    "session_gap_sensitivity",   # one lag pass + conditional counters
    "kaplan_meier_conversion",   # 2 user shuffles -> day-grain KM chain
    "supplier_link_prediction",  # part-keyed wedge join + TakeOrdered
    "dsar_access_export",        # broadcast request set + user-grain agg
    "purged_timeseries_folds",   # day-grain agg + bounded x5 fold grid
    "sorted_neighborhood_pairs",  # two-phase rank + rank-bucket pair join
    "stratified_uplift_ipw",     # dim broadcast join + stratum-grain agg
    "label_propagation_communities",  # 3 unrolled edge-label join rounds
    "rake_keyphrases",           # phrase explode + vocab-grain score join
    "supplier_pareto_frontier",  # supplier-grain agg + per-nation windows
    "stream_state_size_advisor",  # (type, minute) agg + 3 range windows
    "event_burst_detection",     # (type, hour) agg + islands window
    "ab_srm_check",              # per-arm distinct users + 2-row pivot
    "boolean_and_search",        # filtered postings + one hash agg
    "kcore_decomposition",       # 4 peel rounds (agg + 2 joins each)
    "peak_concurrent_sessions",  # user shuffle + day-partitioned sweep
    "holt_winters_backtest",     # day-grain rollup + in-task P-array fold
    "burst_detection_stream",    # per-batch (type, hour) partials + merge
]

# optional subset: SPARK_GRAFT_SCALE_QUERIES=a,b,c
_only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
if _only:
    QUERIES = [q for q in QUERIES if q in {s.strip() for s in _only.split(",")}]


def build_factor_dir(factor: int) -> str:
    out = os.path.join(OUT_ROOT, f"x{factor}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for table, keys in TABLES.items():
        src = os.path.join(BASE_SF, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        dst = os.path.join(out, f"{table}.parquet")
        if factor == 1 or not keys:
            shutil.copyfile(src, dst)
            continue
        base = pq.read_table(src)
        parts = [base]
        for i in range(1, factor):
            t = base
            for k in keys:
                t = t.set_column(
                    t.schema.get_field_index(k),
                    k,
                    pc.add(t.column(k), i * KEY_OFFSET),
                )
            parts.append(t)
        pq.write_table(pa.concat_tables(parts), dst)
    return out


def main() -> None:
    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries
    from e_commerce_streaming_datapipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="e_commerce_streaming_datapipeline-scaling-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    for factor in FACTORS:
        sf_dir = build_factor_dir(factor)
        for name in QUERIES:
            q = registry[name]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name][factor] = round(best, 3)
            print(json.dumps({"query": name, "factor": factor, "sec": results[name][factor]}))

    print("\nquery".ljust(26), *[f"x{f}".rjust(8) for f in FACTORS], "   xN/x1 ratio")
    for name in QUERIES:
        row = results[name]
        ratio = row[FACTORS[-1]] / row[FACTORS[0]] if row[FACTORS[0]] else float("nan")
        print(name.ljust(26), *[f"{row[f]:8.2f}" for f in FACTORS], f"   {ratio:6.2f}")


if __name__ == "__main__":
    main()
