from e_commerce_streaming_datapipeline_spark.plans.registry import (
    Query,
    all_queries,
    get_query,
    oracle_sql_map,
    queries_map,
    query,
)

__all__ = [
    "Query",
    "all_queries",
    "get_query",
    "oracle_sql_map",
    "queries_map",
    "query",
]
