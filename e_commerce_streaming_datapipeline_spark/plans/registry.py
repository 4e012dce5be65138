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
]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB ANSI SQL; None => driver does rows-only check
    doc: str = ""


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    return all_queries()[name]


def queries_map() -> dict[str, Builder]:
    return {n: q.builder for n, q in all_queries().items()}


def oracle_sql_map() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
