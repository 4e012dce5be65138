from e_commerce_streaming_datapipeline_spark.sources.batch import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
