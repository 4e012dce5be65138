from e_commerce_streaming_datapipeline_spark.functions.windows import sliding_window, tumbling_window
from e_commerce_streaming_datapipeline_spark.functions.vector import cosine_similarity_expr, to_double_array

__all__ = [
    "sliding_window",
    "tumbling_window",
    "cosine_similarity_expr",
    "to_double_array",
]
