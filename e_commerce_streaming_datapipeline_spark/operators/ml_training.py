"""Distributed model-training steps as first-class queries.

The LLM-data-pipeline mandate covers the data side (dedup, curation,
sampling, export); this module adds the TRAINING-side primitive those
pipelines feed: a full-batch gradient-descent step expressed as ONE
aggregation over the fact relation — the shape every data-parallel
trainer (parameter server, all-reduce) reduces to per step.  Companion to
``similarity.kmeans_lloyd_step`` (the unsupervised sibling): corpus-sized
work per step is a single map-side-combinable aggregate; the model state
that crosses steps is feature-dimension-sized, never data-sized.

Exact-arithmetic discipline: logistic regression's sigmoid is libm
territory (``exp`` differs by ULPs across engines — the same reason the
DP release uses integer-geometric noise), so the step uses the HARD
sigmoid ``clamp(1/2 + m/4, 0, 1)`` — the standard piecewise-linear
surrogate from quantized/binarized training (Courbariaux et al. 2016,
"Binarized Neural Networks") — and fixed-point integer weights (scale
1e6).  Every value that crosses an engine boundary is a BIGINT produced
by +, *, ``div`` (both engines truncate toward zero — verified on
negatives), LEAST/GREATEST: bit-exact on any engine, any version.

Reference analog: none — the reference (1.4 kLoC streaming pipeline) has
no model-training surface at all; this is part of the mandated 100 TB
scale-up beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.scalars import scalar_join
from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

# fixed-point scale for weights/probabilities and the inverse learning rate
# (eta = 1/_LR_INV; a power of two so the div is a clean shift in spirit)
_SCALE = 1_000_000
_LR_INV = 1024


def logreg_sgd_step(events: DataFrame) -> DataFrame:
    """Two full-batch gradient steps of logistic regression (hard-sigmoid
    surrogate) predicting "is this event a purchase?" from an intercept,
    the event's whole-dollar value, and its hour-of-day.

    Step 1 starts at w = 0 where the sigmoid is EXACTLY 1/2, so the first
    gradient is pure integer arithmetic: G_j = sum((1 - 2y) * x_j) (twice
    the unscaled gradient).  Step 2 evaluates the hard-sigmoid margin
    under the step-1 weights in 1e6 fixed point and accumulates the
    second gradient the same exact way.  Output: one row per feature with
    both gradients and both weight iterates — every column BIGINT.

    100 TB shape: each step is ONE hash-aggregate over the events
    relation (map-side partial sums — an all-reduce of 3 longs); the
    margin evaluation is a map-side expression against the broadcast
    1-row weight relation (``scalar_join``).  Nothing data-sized crosses
    steps, so k steps = k scans — the textbook data-parallel GD layout.
    Overflow headroom: |p - y*S| <= 1e6 and x <= ~1e3, so per-row terms
    are <= 1e9 and the BIGINT sum holds past 1e9 rows.
    """
    base = events.where(F.col("ts").isNotNull()).select(
        F.col("event_type")
        .eqNullSafe(F.lit("purchase"))
        .cast("long")
        .alias("y"),
        F.lit(1).cast("long").alias("x0"),
        F.round(F.coalesce(F.col("value"), F.lit(0.0))).cast("long").alias("x1"),
        F.hour("ts").cast("long").alias("x2"),
    )

    sgn = F.lit(1) - F.lit(2) * F.col("y")  # (1 - 2y): +1 negatives, -1 positives
    s1 = base.agg(
        F.count("*").alias("n"),
        F.sum(sgn * F.col("x0")).alias("g1_0"),
        F.sum(sgn * F.col("x1")).alias("g1_1"),
        F.sum(sgn * F.col("x2")).alias("g1_2"),
    )
    # w1_j = -eta * G_j / (2N), emitted in 1e6 fixed point; the true
    # gradient at w=0 is G_j / (2N) since p_i = 1/2 exactly
    w1 = s1.select(
        "n",
        "g1_0",
        "g1_1",
        "g1_2",
        *[
            F.expr(f"-(g1_{j} * {_SCALE}) div (2 * n * {_LR_INV})").alias(f"w1_{j}")
            for j in range(3)
        ],
    )

    scored = scalar_join(base, w1).withColumn(
        "m",  # margin in 1e6 fixed point
        F.col("w1_0") * F.col("x0")
        + F.col("w1_1") * F.col("x1")
        + F.col("w1_2") * F.col("x2"),
    )
    # hard sigmoid in fixed point: clamp(S/2 + m div 4, 0, S)
    p = F.least(
        F.greatest(F.lit(_SCALE // 2) + F.expr("m div 4"), F.lit(0)),
        F.lit(_SCALE),
    )
    resid = p - F.col("y") * _SCALE
    s2 = scored.groupBy("n", "g1_0", "g1_1", "g1_2", "w1_0", "w1_1", "w1_2").agg(
        F.sum(resid * F.col("x0")).alias("g2_0"),
        F.sum(resid * F.col("x1")).alias("g2_1"),
        F.sum(resid * F.col("x2")).alias("g2_2"),
    )
    out = s2.select(
        *["n", "g1_0", "g1_1", "g1_2", "w1_0", "w1_1", "w1_2"],
        *[
            # units: G2 = S*N*grad, so the fixed-point update is
            # w2_scaled = w1_scaled - S*grad/L = w1_scaled - G2 div (N*L)
            (F.col(f"w1_{j}") - F.expr(f"g2_{j} div (n * {_LR_INV})")).alias(
                f"w2_{j}"
            )
            for j in range(3)
        ],
        "g2_0",
        "g2_1",
        "g2_2",
    )
    features = F.expr(
        "stack(3, "
        "'bias',    g1_0, w1_0, g2_0, w2_0, "
        "'dollars', g1_1, w1_1, g2_1, w2_1, "
        "'hour',    g1_2, w1_2, g2_2, w2_2) "
        "AS (feature, grad1, w1_x1e6, grad2_x1e6, w2_x1e6)"
    )
    return out.select(features).orderBy("feature")


_LOGREG_ORACLE = f"""
WITH base AS (
    SELECT
        CAST(event_type IS NOT DISTINCT FROM 'purchase' AS BIGINT) AS y,
        CAST(1 AS BIGINT)                                          AS x0,
        CAST(round(coalesce(value, 0.0)) AS BIGINT)                AS x1,
        CAST(hour(ts) AS BIGINT)                                   AS x2
    FROM events WHERE ts IS NOT NULL
), s1 AS (
    SELECT
        count(*)                          AS n,
        CAST(sum((1 - 2*y) * x0) AS BIGINT) AS g1_0,
        CAST(sum((1 - 2*y) * x1) AS BIGINT) AS g1_1,
        CAST(sum((1 - 2*y) * x2) AS BIGINT) AS g1_2
    FROM base
), w1 AS (
    SELECT n, g1_0, g1_1, g1_2,
           (-(g1_0 * {_SCALE})) // (2 * n * {_LR_INV}) AS w1_0,
           (-(g1_1 * {_SCALE})) // (2 * n * {_LR_INV}) AS w1_1,
           (-(g1_2 * {_SCALE})) // (2 * n * {_LR_INV}) AS w1_2
    FROM s1
), scored AS (
    SELECT b.y, b.x0, b.x1, b.x2,
           LEAST(GREATEST({_SCALE // 2}
                          + (w.w1_0*b.x0 + w.w1_1*b.x1 + w.w1_2*b.x2) // 4,
                          0), {_SCALE}) AS p
    FROM base b, w1 w
), s2 AS (
    SELECT
        CAST(sum((p - y*{_SCALE}) * x0) AS BIGINT) AS g2_0,
        CAST(sum((p - y*{_SCALE}) * x1) AS BIGINT) AS g2_1,
        CAST(sum((p - y*{_SCALE}) * x2) AS BIGINT) AS g2_2
    FROM scored
)
SELECT f.feature,
       CAST(f.grad1 AS BIGINT)      AS grad1,
       CAST(f.w1_x1e6 AS BIGINT)    AS w1_x1e6,
       CAST(f.grad2_x1e6 AS BIGINT) AS grad2_x1e6,
       CAST(f.w1_x1e6 - f.grad2_x1e6 // (f.n * {_LR_INV}) AS BIGINT)
                                    AS w2_x1e6
FROM (
    SELECT 'bias' AS feature, w.g1_0 AS grad1, w.w1_0 AS w1_x1e6,
           s2.g2_0 AS grad2_x1e6, w.n FROM w1 w, s2
    UNION ALL
    SELECT 'dollars', w.g1_1, w.w1_1, s2.g2_1, w.n FROM w1 w, s2
    UNION ALL
    SELECT 'hour', w.g1_2, w.w1_2, s2.g2_2, w.n FROM w1 w, s2
) f
ORDER BY f.feature
"""


@query("logreg_sgd_step", oracle=_LOGREG_ORACLE)
def q_logreg_sgd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two exact full-batch gradient-descent steps of hard-sigmoid logistic
    regression (purchase propensity from value + hour), each step one
    aggregate over events — bit-exact fixed-point weights (module doc)."""
    return logreg_sgd_step(load_table(spark, "events", sf_dir))
