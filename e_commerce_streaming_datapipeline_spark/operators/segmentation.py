"""Customer-segmentation analytics: RFM scoring, CLV Pareto concentration,
and inter-purchase survival — the classic marketing-science rollups a
production e-commerce warehouse derives from the order fact table (the
reference stops at per-window GMV/funnel metrics, `src/processors/
gmv_processor.py`; these are the downstream segmentation tier a real
deployment builds on top of them).

Scale notes shared by the RFM/Pareto pair: the global NTILE windows run over
the *customer dimension after full aggregation* — one row per customer, i.e.
the |dim| ≪ |fact| reduction has already happened, so the single-partition
window sort is dim-sized (the same cost class as a global top-k), not
fact-sized.  At 10^9 customers, swap the exact NTILE for distributed
quantile thresholds (the `equi_depth_histogram` pattern in statistics.py:
approx percentile boundaries broadcast back as a range join) — one localized
change; every downstream column keeps its meaning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import cents_sum, fround
from e_commerce_streaming_datapipeline_spark.functions.scalars import scalar_join
from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def _customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per customer: order count, exact revenue cents, last order
    date.  The shared first stage of both segmentation rollups — a plain
    map-side-combinable hash aggregate over the fact table."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        cents_sum(F.col("o_totalprice")).alias("revenue_cents"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
    )


@query(
    "rfm_segments",
    oracle="""
WITH cust AS (
    SELECT o_custkey,
           count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents,
           max(CAST(o_orderdate AS DATE)) AS last_date
    FROM orders GROUP BY 1
), anchor AS (
    SELECT max(CAST(o_orderdate AS DATE)) AS anchor_date FROM orders
), scored AS (
    SELECT date_diff('day', last_date, anchor_date) AS recency_days,
           n_orders, revenue_cents,
           ntile(4) OVER (ORDER BY date_diff('day', last_date, anchor_date) ASC,
                          o_custkey) AS r_score,
           ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f_score,
           ntile(4) OVER (ORDER BY revenue_cents DESC, o_custkey) AS m_score
    FROM cust, anchor
)
SELECT CAST(r_score AS INT) AS r_score,
       CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       count(*) AS customers,
       round(CAST(sum(recency_days) AS DOUBLE) / count(*) * 100) / 100
           AS avg_recency_days,
       CAST(sum(revenue_cents) AS DOUBLE) / 100 AS total_revenue
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-score every customer on Recency (days
    since last order vs the corpus anchor date), Frequency (order count) and
    Monetary (exact-cents lifetime revenue), then roll up to the 4x4x4
    segment grid.  Score 1 is best on every axis (most recent / most
    frequent / highest spend).  NTILE ties are broken by custkey so both
    engines assign identical buckets; revenue stays in scaled-long cents
    until the final divide; avg recency divides an exact integer sum, so
    the rounded double is bit-identical cross-engine.

    Scale shape: the customer relation is user-proportional, so each axis's
    quartile comes from the two-phase distributed rank
    (`functions/ranks.py::global_row_number` + `ntile_from_rank`) — three
    range-partitioned rank passes, zero single-partition sorts — instead
    of three global NTILE windows.
    """
    from e_commerce_streaming_datapipeline_spark.functions.ranks import (
        global_row_number,
        ntile_from_rank,
    )

    cust = _customer_value(spark, sf_dir)
    anchor = (
        load_table(spark, "orders", sf_dir)
        .agg(F.max(F.col("o_orderdate").cast("date")).alias("anchor_date"))
    )
    # NOT persisted — measured at sf0.1 (SCALE.md "rank rewiring cost"):
    # Spark's within-execution shuffle-stage reuse already serves each
    # pass's sampling/offsets/final jobs from the same map outputs, so a
    # .persist() here ADDS time (4.0 s -> 5.4-16 s depending on variant:
    # the InMemoryRelation changes plan identity, defeating exchange reuse,
    # and its materialization is an extra job).  The residual r4 regression
    # vs the naive global window is fixed per-job scheduling overhead
    # (3 passes x sampling+offsets+final jobs), not recompute.
    scored = scalar_join(cust, anchor).withColumn(
        "recency_days", F.datediff("anchor_date", "last_date")
    )
    # explicit NULLS LAST on every ASC key: Spark's ASC default is NULLS
    # FIRST while DuckDB's is NULLS LAST — on a corpus with NULL custkeys or
    # all-NULL order dates the NTILE assignment would silently diverge
    # (DESC agrees between the engines already)
    axes = {
        "r_score": [
            F.col("recency_days").asc_nulls_last(),
            F.col("o_custkey").asc_nulls_last(),
        ],
        "f_score": [F.col("n_orders").desc(), F.col("o_custkey").asc_nulls_last()],
        "m_score": [
            F.col("revenue_cents").desc(),
            F.col("o_custkey").asc_nulls_last(),
        ],
    }
    for score_col, order in axes.items():
        scored = (
            global_row_number(scored, order, rank_col="__rn", total_col="__n")
            .withColumn(score_col, ntile_from_rank(F.col("__rn"), F.col("__n"), 4))
            .drop("__rn", "__n")
        )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("customers"),
            fround(
                F.sum("recency_days").cast("double") / F.count("*"), 2
            ).alias("avg_recency_days"),
            (F.sum("revenue_cents").cast("double") / 100).alias("total_revenue"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "clv_pareto_deciles",
    oracle="""
WITH cust AS (
    SELECT o_custkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents
    FROM orders GROUP BY 1
), d AS (
    SELECT ntile(10) OVER (ORDER BY revenue_cents DESC, o_custkey) AS decile,
           revenue_cents
    FROM cust
), g AS (
    SELECT decile, count(*) AS customers, sum(revenue_cents) AS cents
    FROM d GROUP BY 1
), t AS (
    SELECT sum(cents) AS total_cents FROM g
)
SELECT CAST(decile AS INT) AS decile,
       customers,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       round(CAST(cents AS DOUBLE) / total_cents * 1000000) / 1000000
           AS revenue_share,
       round(CAST(sum(cents) OVER (ORDER BY decile) AS DOUBLE) / total_cents
             * 1000000) / 1000000 AS cum_revenue_share
FROM g, t
ORDER BY decile
""",
)
def q_clv_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value concentration (Pareto curve): rank customers
    by exact-cents revenue, split into deciles, report each decile's revenue
    share and the cumulative share (decile 1 = highest spenders; the classic
    '80/20' audit).  All shares divide exact long cents by the exact total,
    so the doubles are bit-identical cross-engine; the cumulative window
    runs over 10 rows.  Deciles come from the two-phase distributed rank +
    `ntile_from_rank` (`functions/ranks.py`) — the customer relation is
    user-proportional, so no global NTILE window may sort it on one task.
    """
    from e_commerce_streaming_datapipeline_spark.functions.ranks import (
        global_row_number,
        ntile_from_rank,
    )

    cust = _customer_value(spark, sf_dir).select("o_custkey", "revenue_cents")
    g = (
        global_row_number(
            cust,
            [F.col("revenue_cents").desc(), F.col("o_custkey").asc_nulls_last()],
            rank_col="__rn",
            total_col="__n",
        )
        .withColumn("decile", ntile_from_rank(F.col("__rn"), F.col("__n"), 10))
        .groupBy("decile")
        .agg(F.count("*").alias("customers"), F.sum("revenue_cents").alias("cents"))
    )
    total = g.agg(F.sum("cents").alias("total_cents"))
    w_cum = Window.orderBy("decile")
    return (
        scalar_join(g, total)
        .withColumn("cum_cents", F.sum("cents").over(w_cum))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "customers",
            (F.col("cents").cast("double") / 100).alias("revenue"),
            fround(F.col("cents").cast("double") / F.col("total_cents"), 6).alias(
                "revenue_share"
            ),
            fround(
                F.col("cum_cents").cast("double") / F.col("total_cents"), 6
            ).alias("cum_revenue_share"),
        )
        .orderBy("decile")
    )


_SURVIVAL_THRESHOLDS = (7, 30, 60, 90)


@query(
    "interpurchase_survival",
    oracle="""
WITH seq AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           lag(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_d
    FROM orders
), gaps AS (
    SELECT date_diff('day', prev_d, d) AS gap FROM seq WHERE prev_d IS NOT NULL
), agg AS (
    SELECT count(*) AS total_gaps,
           CAST(sum(CASE WHEN gap >= 7  THEN 1 ELSE 0 END) AS BIGINT) AS s7,
           CAST(sum(CASE WHEN gap >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS s30,
           CAST(sum(CASE WHEN gap >= 60 THEN 1 ELSE 0 END) AS BIGINT) AS s60,
           CAST(sum(CASE WHEN gap >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS s90
    FROM gaps
)
SELECT 7 AS threshold_days, total_gaps, s7 AS surviving_gaps,
       round(CAST(s7 AS DOUBLE) / total_gaps * 1000000) / 1000000 AS survival_rate
FROM agg
UNION ALL SELECT 30, total_gaps, s30,
       round(CAST(s30 AS DOUBLE) / total_gaps * 1000000) / 1000000 FROM agg
UNION ALL SELECT 60, total_gaps, s60,
       round(CAST(s60 AS DOUBLE) / total_gaps * 1000000) / 1000000 FROM agg
UNION ALL SELECT 90, total_gaps, s90,
       round(CAST(s90 AS DOUBLE) / total_gaps * 1000000) / 1000000 FROM agg
ORDER BY threshold_days
""",
)
def q_interpurchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase survival curve: the fraction of consecutive-order gaps
    (per customer, ordered by orderdate with orderkey tiebreak) that reach
    each retention threshold — the Kaplan-Meier-style repeat-purchase signal
    behind churn models.  The lag window partitions by custkey (fully
    distributed); the four thresholds are conditional sums inside ONE
    aggregate pass, unpivoted from the single result row with ``stack`` —
    no 4x data blowup, no re-scan.  Counts are exact longs; each rate is a
    single IEEE divide, identical cross-engine.
    """
    orders = load_table(spark, "orders", sf_dir)
    # NULLS LAST to match DuckDB's default window ordering (a NULL orderdate
    # must not re-sequence a customer's gaps differently per engine)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    gaps = (
        orders.select(
            F.col("o_orderdate").cast("date").alias("d"),
            F.lag(F.col("o_orderdate").cast("date")).over(w).alias("prev_d"),
        )
        .where(F.col("prev_d").isNotNull())
        .select(F.datediff("d", "prev_d").alias("gap"))
    )
    agg = gaps.agg(
        F.count("*").alias("total_gaps"),
        *[
            F.sum(F.when(F.col("gap") >= t, 1).otherwise(0)).alias(f"s{t}")
            for t in _SURVIVAL_THRESHOLDS
        ],
    )
    stack_args = ", ".join(f"{t}, s{t}" for t in _SURVIVAL_THRESHOLDS)
    return (
        agg.select(
            "total_gaps",
            F.expr(
                f"stack({len(_SURVIVAL_THRESHOLDS)}, {stack_args}) "
                "AS (threshold_days, surviving_gaps)"
            ),
        )
        .select(
            "threshold_days",
            "total_gaps",
            "surviving_gaps",
            fround(
                F.col("surviving_gaps").cast("double") / F.col("total_gaps"), 6
            ).alias("survival_rate"),
        )
        .orderBy("threshold_days")
    )
