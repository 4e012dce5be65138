"""Real-time funnel — reference operator A1
(src/processors/funnel_processor.py:23-61).

Semantics reproduced: one windowed aggregation over the event stream with
conditional stage counts (``sum(when(stage, 1).otherwise(0))`` — the
reference's status buckets at funnel_processor.py:29-41) and safe-division
conversion rates (funnel_processor.py:49-55).  Fixture mapping: funnel stages
are ``event_type`` values view → click → signup → purchase (FIXTURES.md §B).

Spark-first notes: conditional sums compile to a single hash aggregate — one
pass, one shuffle on the window key; the rates are a post-aggregation
projection, not a second aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.windows import safe_rate, tumbling_window
from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def _stage(event_type: str):
    return F.sum(F.when(F.col("event_type") == event_type, 1).otherwise(0))


def funnel_metrics(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    agg = (
        tumbling_window(events, "ts", duration)
        .groupBy("window_start", "window_end")
        .agg(
            F.count("*").alias("total_events"),
            F.count_distinct(F.col("user_id")).alias("unique_users"),
            _stage("view").alias("views"),
            _stage("click").alias("clicks"),
            _stage("signup").alias("signups"),
            _stage("purchase").alias("purchases"),
        )
    )
    return agg.select(
        "window_start",
        "window_end",
        "total_events",
        "unique_users",
        "views",
        "clicks",
        "signups",
        "purchases",
        safe_rate(F.col("clicks"), F.col("views")).alias("click_rate"),
        safe_rate(F.col("purchases"), F.col("clicks")).alias("purchase_rate"),
        (F.col("views") - F.col("clicks")).alias("dropped_after_view"),
        (F.col("clicks") - F.col("signups")).alias("dropped_after_click"),
    )


_FUNNEL_ORACLE = """
WITH agg AS (
    SELECT
        date_trunc('hour', ts)                      AS window_start,
        date_trunc('hour', ts) + INTERVAL '1 hour'  AS window_end,
        count(*)                                    AS total_events,
        count(DISTINCT user_id)                     AS unique_users,
        CAST(count_if(event_type = 'view') AS BIGINT)     AS views,
        CAST(count_if(event_type = 'click') AS BIGINT)    AS clicks,
        CAST(count_if(event_type = 'signup') AS BIGINT)   AS signups,
        CAST(count_if(event_type = 'purchase') AS BIGINT) AS purchases
    FROM events
    GROUP BY 1, 2
)
SELECT
    window_start, window_end, total_events, unique_users,
    views, clicks, signups, purchases,
    -- same operation order as the Spark plan (num/denom*100) so the two
    -- engines' float rounding agrees bit-for-bit
    CASE WHEN views > 0
         THEN round(clicks / views * 100, 2) ELSE 0.0 END  AS click_rate,
    CASE WHEN clicks > 0
         THEN round(purchases / clicks * 100, 2) ELSE 0.0 END AS purchase_rate,
    views - clicks   AS dropped_after_view,
    clicks - signups AS dropped_after_click
FROM agg
"""


@query("funnel_hourly", oracle=_FUNNEL_ORACLE)
def q_funnel_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: hourly funnel with stage counts, safe-division conversion rates
    and drop counts (reference real_time_funnel table, init_metrics.sql:15-43)."""
    return funnel_metrics(load_table(spark, "events", sf_dir), "1 hour")
