"""Drop-off analysis — reference operator A3
(src/processors/dropoff_processor.py:30-70).

Semantics reproduced: windowed aggregation grouped by window **plus a status
key**, with ``count``, ``count_distinct(customer)``, a drop rate, a boolean
alert flag, and a ≤3-element sample of ids (the reference's
``slice(collect_list(order_id), 1, 3)`` at dropoff_processor.py:67).

Determinism upgrade (SURVEY §7 hard-part 2): the reference's
``collect_list`` order is undefined under parallel execution — here samples
are ``slice(array_sort(collect_list(...)), 1, 3)`` so results are stable and
oracle-hashable.  ``first(is_dropoff)`` is replaced by deriving the flag from
the grouping key itself (it is functionally dependent on event_type — the
reference's ``first`` only worked by accident).

Scale notes: ``collect_list`` of an unbounded group is a memory AND shuffle
hazard at 100 TB — the partial aggregation ships every element to the
reducer.  The sample branch therefore computes the 3 smallest ids with
``row_number() <= 3``, which Spark 3.5 plans as a partial ``WindowGroupLimit``
BEFORE the shuffle: each map task emits at most 3 rows per group, so the
sample shuffle is bounded by 3 x #tasks x #groups regardless of corpus size,
and the ``collect_list`` that follows runs over <= 3 rows per group.  The
count/distinct metrics aggregate in a separate branch joined back on the
group key (aggregate-then-join, SURVEY §2.4 J2); the ``drop_rate``
denominator is a window function over the *aggregated* relation — #windows
rows, not #events rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import fround

from e_commerce_streaming_datapipeline_spark.functions.windows import tumbling_window
from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.schemas import EVENT_DROPOFF_TYPES
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

ALERT_THRESHOLD = 10


def dropoff_analysis(
    events: DataFrame, duration: str = "1 hour", include_samples: bool = True
) -> DataFrame:
    """``include_samples=False`` skips the top-3 sample branch entirely —
    consumers that drop sample_event_ids (active_alerts) would otherwise
    still pay its WindowGroupLimit pass, collect_list, and join: the
    1:1-by-construction join is invisible to column pruning, so Catalyst
    cannot eliminate the branch on their behalf."""
    base = tumbling_window(events, "ts", duration)
    per_status = base.groupBy("window_start", "window_end", "event_type").agg(
        F.count("*").alias("dropped_events"),
        F.count_distinct(F.col("user_id")).alias("unique_users_affected"),
    )
    # window_total BEFORE the samples join: that join's equi-key drops a
    # NULL event_type group (NULL keys never match), which would silently
    # exclude those events from every status's share-of-window denominator
    # — the oracle (and the honest metric) counts ALL events in the window
    # (pinned by the events-edge fixture test)
    over_window = Window.partitionBy("window_start")
    per_status = per_status.withColumn(
        "window_total", F.sum("dropped_events").over(over_window)
    )
    if include_samples:
        # bounded top-3 sample: WindowGroupLimit caps each map task at 3 rows
        # per group before the shuffle (see module docstring)
        wtop = Window.partitionBy("window_start", "event_type").orderBy("eid")
        samples = (
            base.select(
                "window_start", "event_type", F.col("event_id").cast("string").alias("eid")
            )
            .withColumn("__rn", F.row_number().over(wtop))
            .where(F.col("__rn") <= 3)
            .groupBy("window_start", "event_type")
            .agg(F.array_sort(F.collect_list("eid")).alias("sample_event_ids"))
        )
        per_status = per_status.join(samples, ["window_start", "event_type"])
    out = (
        per_status
        .where(F.col("event_type").isin(*EVENT_DROPOFF_TYPES))
        .select(
            "window_start",
            "window_end",
            F.col("event_type").alias("drop_status"),
            "dropped_events",
            "unique_users_affected",
            fround(F.col("dropped_events") / F.col("window_total") * 100, 2).alias("drop_rate"),
            (F.col("dropped_events") > ALERT_THRESHOLD).alias("alert_triggered"),
            *(
                [
                    # comma-joined string, not ArrayType: array columns are not
                    # hashable by pandas-based result canonicalizers downstream
                    F.concat_ws(",", "sample_event_ids").alias("sample_event_ids")
                ]
                if include_samples
                else []
            ),
        )
    )
    return out


_DROPOFF_ORACLE = f"""
WITH per_status AS (
    SELECT
        date_trunc('hour', ts)                     AS window_start,
        date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
        event_type,
        count(*)                                   AS dropped_events,
        count(DISTINCT user_id)                    AS unique_users_affected,
        array_to_string(list_sort(list(CAST(event_id AS VARCHAR)))[1:3], ',') AS sample_event_ids
    FROM events
    WHERE ts IS NOT NULL  -- event-time policy (windows.py)
    GROUP BY 1, 2, 3
), with_total AS (
    SELECT *, CAST(sum(dropped_events) OVER (PARTITION BY window_start) AS BIGINT) AS window_total
    FROM per_status
)
SELECT
    window_start,
    window_end,
    event_type AS drop_status,
    dropped_events,
    unique_users_affected,
    round(dropped_events / window_total * 100, 2) AS drop_rate,
    dropped_events > {ALERT_THRESHOLD} AS alert_triggered,
    sample_event_ids
FROM with_total
WHERE event_type IN ('click', 'error')
"""


@query("dropoff_hourly", oracle=_DROPOFF_ORACLE)
def q_dropoff_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: hourly drop-off per status with sorted id samples, share-of-window
    drop rate, and threshold alerts (reference drop_off_analysis table,
    init_metrics.sql:77-109)."""
    return dropoff_analysis(load_table(spark, "events", sf_dir), "1 hour")
