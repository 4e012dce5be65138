"""Time-window bucketing helpers.

The reference buckets everything with ``F.window(ts, "1 minute", "30
seconds")`` (stream_processor.py:33-39 wiring; used in every processor).
These helpers produce the same buckets but project flat, oracle-friendly
``window_start``/``window_end`` columns.

Scale note: ``F.window`` is a narrow projection (no shuffle by itself); the
shuffle comes from the subsequent groupBy — keys are (window, ...) which hash-
distribute evenly as long as the time domain is wide, so no skew handling is
needed for window keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import fround


def tumbling_window(df: DataFrame, ts: str, duration: str) -> DataFrame:
    """Assign each row to its tumbling window; adds window_start/window_end.

    NULL-event-time policy (shared with ``sliding_window``): a row with no
    event time cannot be windowed — the streaming twin could not watermark
    it either — so it is dropped EXPLICITLY here.  Spark's ``window()``
    already drops such rows silently; making the filter explicit keeps the
    batch plan honest and the DuckDB oracles (whose ``date_trunc(NULL)``
    would otherwise emit a NULL-window group) in agreement via their own
    ``WHERE ts IS NOT NULL``."""
    w = F.window(F.col(ts), duration)
    return (
        df.where(F.col(ts).isNotNull())
        .withColumn("__w", w)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def sliding_window(df: DataFrame, ts: str, duration: str, slide: str) -> DataFrame:
    """Assign each row to all overlapping sliding windows (Spark semantics:
    ``duration/slide`` windows per row; 1m/30s => exactly 2).  NULL event
    times are dropped explicitly — see ``tumbling_window``."""
    w = F.window(F.col(ts), duration, slide)
    return (
        df.where(F.col(ts).isNotNull())
        .withColumn("__w", w)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def safe_rate(num: Column, denom: Column, scale: float = 100.0) -> Column:
    """Reference's safe-division rate idiom (funnel_processor.py:49-55):
    ``when(denom > 0, round(num/denom*scale, 2)).otherwise(0.0)``."""
    return F.when(denom > 0, fround(num / denom * scale, 2)).otherwise(F.lit(0.0))
