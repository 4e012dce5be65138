"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``e_commerce_streaming_datapipeline_spark.plans.registry`` — every operator from
SURVEY.md §2 (plus the BASELINE.json scale-up operators) registers a named
``(spark, sf_dir) -> DataFrame`` builder and, where SQL-expressible, a DuckDB
oracle with matching column names/types.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from e_commerce_streaming_datapipeline_spark.plans.registry import oracle_sql_map, queries_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from e_commerce_streaming_datapipeline_spark.operators.gmv import q_gmv_minutely

    return q_gmv_minutely(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omitted entries (approx sketches,
    custom stateful streaming) get the driver's rows-only check."""
    return oracle_sql_map()
