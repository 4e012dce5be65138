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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import fround
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
    -- event-time policy: NULL-ts rows cannot be windowed (windows.py)
    WHERE ts IS NOT NULL
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


@query(
    "ordered_funnel",
    oracle="""
WITH w1 AS (
    SELECT user_id, event_type, ts,
        min(CASE WHEN event_type = 'view' THEN ts END)
            OVER (PARTITION BY user_id) AS tv
    FROM events
), w2 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts >= tv THEN ts END)
            OVER (PARTITION BY user_id) AS tc
    FROM w1
), w3 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= tc THEN ts END)
            OVER (PARTITION BY user_id) AS tp
    FROM w2
), per_user AS (
    SELECT user_id, max(tv) AS tv, max(tc) AS tc, max(tp) AS tp
    FROM w3 GROUP BY user_id
)
SELECT
    CAST(count(*) AS INT)   AS n_users,
    CAST(count(tv) AS INT)  AS n_view,
    CAST(count(tc) AS INT)  AS n_view_click,
    CAST(count(tp) AS INT)  AS n_full_funnel,
    round(count(tp) * 100.0 / count(*) * 100) / 100 AS conversion_pct
FROM per_user
""",
)
def q_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE sequential funnel — the capability the reference advertises but
    never implements (SURVEY §2.4: processors accept three streams, each
    reads one; funnel "stages" are proxied from status values,
    funnel_processor.py:29-41).  Here order matters: a user converts only
    if a click follows their first view and a purchase follows that first
    qualifying click.

    Plan: three chained window-min expressions over ``partitionBy(user_id)``
    then a per-user rollup — the window partitioning satisfies the groupBy,
    so the whole funnel costs ONE shuffle of the events table regardless of
    stage count (each added stage is another window expression over the
    same exchange, not another join).  The self-join formulation
    (events ⋈ events ⋈ events on user + ts ordering) that naive funnel SQL
    uses would be three fact shuffles and a quadratic tail on power users."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id")
    tv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = events.withColumn("tv", tv)
    tc = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") >= F.col("tv")), F.col("ts"))
    ).over(w)
    staged = staged.withColumn("tc", tc)
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("tc")), F.col("ts")
        )
    ).over(w)
    staged = staged.withColumn("tp", tp)
    per_user = staged.groupBy("user_id").agg(
        F.max("tv").alias("tv"), F.max("tc").alias("tc"), F.max("tp").alias("tp")
    )
    return per_user.agg(
        F.count("*").cast("int").alias("n_users"),
        F.count("tv").cast("int").alias("n_view"),
        F.count("tc").cast("int").alias("n_view_click"),
        F.count("tp").cast("int").alias("n_full_funnel"),
        fround(F.count("tp") * 100.0 / F.count("*"), 2).alias("conversion_pct"),
    )
