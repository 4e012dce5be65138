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


# --------------------------------------------------------------------------
# Decision-stump training: the exact best 1-feature threshold split
# --------------------------------------------------------------------------

_STUMP_TOP_K = 5


@query(
    "decision_stump_train",
    oracle=f"""
WITH pts AS (
    SELECT n_chars AS x,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
    FROM documents WHERE n_chars IS NOT NULL
), grouped AS (
    SELECT x, count(*) AS cnt, sum(y) AS pos FROM pts GROUP BY 1
), cum AS (
    SELECT x,
           sum(cnt) OVER (ORDER BY x) AS nl,
           sum(pos) OVER (ORDER BY x) AS pl
    FROM grouped
), tot AS (
    SELECT count(*) AS n, sum(y) AS p FROM pts
), gains AS (
    SELECT c.x AS threshold,
           CAST(c.nl AS BIGINT) AS n_left,
           CAST(c.pl AS BIGINT) AS pos_left,
           CAST(t.n - c.nl AS BIGINT) AS n_right,
           CAST(t.p - c.pl AS BIGINT) AS pos_right,
           CAST(floor(1000000.0 * (
               2.0 * t.p * (t.n - t.p) / (CAST(t.n AS DOUBLE) * t.n)
               - (2.0 / t.n) * (
                   CAST(c.pl AS DOUBLE) * (c.nl - c.pl) / c.nl
                   + CAST(t.p - c.pl AS DOUBLE) * ((t.n - c.nl) - (t.p - c.pl))
                     / (t.n - c.nl))
           ) + 0.5) AS BIGINT) AS gini_gain_x1e6
    FROM cum c, tot t
    WHERE c.nl < t.n  -- the max value splits nothing off
)
SELECT threshold, n_left, pos_left, n_right, pos_right, gini_gain_x1e6
FROM (
    SELECT *, row_number() OVER (
        ORDER BY gini_gain_x1e6 DESC, threshold
    ) AS rn FROM gains
) WHERE rn <= {_STUMP_TOP_K}
ORDER BY gini_gain_x1e6 DESC, threshold
""",
)
def q_decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a DECISION STUMP exactly — the best single threshold on
    ``n_chars`` predicting ``lang = 'en'`` by Gini-impurity decrease,
    reporting the top-{_STUMP_TOP_K} candidate splits with their left/right
    class counts.  The stump is the base learner of boosting and the
    standard strong-baseline/feature-screening model; unlike sampled or
    binned trainers this evaluates EVERY distinct feature value as a
    threshold, exactly.

    Exactness: class counts are integers; the Gini gain is one fixed
    expression of those integers evaluated in IEEE doubles IDENTICALLY on
    both engines, quantized to micros via floor(g·1e6 + 0.5), and the
    top-k RANKS ON THE QUANTIZED integer (never the raw double), so a
    float tie can't let the engines pick different splits.  NULL n_chars
    rows are unsplittable and drop on both engines; NULL lang counts as a
    negative (the `auc_quality_langid` labeling policy).

    Scale shape: ONE corpus pass reduces to the distinct-feature-value
    relation (hash agg with map-side combine); the cumulative split
    tallies are a window over that NDV-BOUNDED relation (document lengths
    — thousands of rows, not corpus rows; registered in the bounded-
    global-window allowlist like the daily-spine family), and the final
    ranking is a WindowGroupLimit top-{_STUMP_TOP_K}.  A wide-feature
    trainer fans this same plan out per feature column."""
    pts = (
        load_table(spark, "documents", sf_dir)
        .where(F.col("n_chars").isNotNull())
        .select(
            F.col("n_chars").alias("x"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        )
    )
    grouped = pts.groupBy("x").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    from pyspark.sql import Window

    cw = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = grouped.select(
        "x",
        F.sum("cnt").over(cw).alias("nl"),
        F.sum("pos").over(cw).alias("pl"),
    )
    tot = pts.agg(F.count("*").alias("__n"), F.sum("y").alias("__p"))
    n, p = F.col("__n"), F.col("__p")
    nl, pl = F.col("nl"), F.col("pl")
    gain = (
        F.lit(2.0) * p * (n - p) / (n.cast("double") * n)
        - (F.lit(2.0) / n)
        * (
            pl.cast("double") * (nl - pl) / nl
            + (p - pl).cast("double") * ((n - nl) - (p - pl)) / (n - nl)
        )
    )
    gains = (
        scalar_join(cum, tot)
        .where(nl < n)
        .select(
            F.col("x").alias("threshold"),
            nl.cast("long").alias("n_left"),
            pl.cast("long").alias("pos_left"),
            (n - nl).cast("long").alias("n_right"),
            (p - pl).cast("long").alias("pos_right"),
            F.floor(F.lit(1000000.0) * gain + F.lit(0.5))
            .cast("long")
            .alias("gini_gain_x1e6"),
        )
    )
    rw = Window.orderBy(F.col("gini_gain_x1e6").desc(), "threshold")
    return (
        gains.withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") <= _STUMP_TOP_K)
        .drop("rn")
        .orderBy(F.col("gini_gain_x1e6").desc(), "threshold")
    )
