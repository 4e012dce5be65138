"""Data-quality expectations (BASELINE.json scale-up mandate): a declarative
constraint suite — not-null, domain/range, set membership, composite-key
uniqueness, referential integrity — evaluated over a fact table and reported
as one row per constraint with violation counts and pass rates, the contract
gate a 100 TB ingest runs before publishing a partition.

Scale shape: every scan-level constraint folds into ONE aggregate pass over
the fact (conditional sums riding a single scan — adding a constraint adds a
column, not a pass); uniqueness rides the same pass as ``count - count
distinct``; referential integrity is the only extra relation touch, a
LEFT ANTI join against the parent keys (key-projected, broadcast when the
parent is dimension-sized).  The wide 1-row aggregate then unpivots via
``stack`` — driver-sized, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import fround
from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def _violation(cond) -> F.Column:
    """1 where the constraint is VIOLATED, else 0 — NULL-safe by contract:
    callers express range/domain checks as ``value IS NOT NULL AND NOT ok``
    so missingness is counted once by its own not-null constraint, not
    double-counted by every downstream check."""
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))


@query(
    "dq_expectations",
    oracle="""
WITH scan AS (
    SELECT
        count(*) AS checked,
        sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_nn_orderkey,
        sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS v_nn_quantity,
        sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_nn_shipdate,
        sum(CASE WHEN l_quantity IS NOT NULL
                  AND NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS v_rng_quantity,
        sum(CASE WHEN l_discount IS NOT NULL
                  AND NOT (l_discount BETWEEN 0 AND 0.1) THEN 1 ELSE 0 END) AS v_rng_discount,
        sum(CASE WHEN l_extendedprice IS NOT NULL
                  AND l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_pos_price,
        sum(CASE WHEN l_returnflag IS NOT NULL
                  AND l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS v_set_returnflag,
        sum(CASE WHEN l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
                 THEN 1 ELSE 0 END)
        - count(DISTINCT CASE WHEN l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
                              THEN (l_orderkey, l_linenumber) END) AS v_unique_line
    FROM lineitem
), ref AS (
    SELECT count(*) AS v_ref_orders
    FROM lineitem l
    WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
), rows_out AS (
    SELECT 'not_null_l_orderkey' AS constraint_name, v_nn_orderkey AS violations, checked FROM scan
    UNION ALL SELECT 'not_null_l_quantity', v_nn_quantity, checked FROM scan
    UNION ALL SELECT 'not_null_l_shipdate', v_nn_shipdate, checked FROM scan
    UNION ALL SELECT 'range_l_quantity_1_50', v_rng_quantity, checked FROM scan
    UNION ALL SELECT 'range_l_discount_0_0.1', v_rng_discount, checked FROM scan
    UNION ALL SELECT 'positive_l_extendedprice', v_pos_price, checked FROM scan
    UNION ALL SELECT 'set_l_returnflag_ANR', v_set_returnflag, checked FROM scan
    UNION ALL SELECT 'unique_orderkey_linenumber', v_unique_line, checked FROM scan
    UNION ALL SELECT 'ref_orderkey_in_orders', ref.v_ref_orders, scan.checked FROM ref, scan
)
SELECT constraint_name,
       CAST(violations AS BIGINT) AS violations,
       CAST(checked AS BIGINT)    AS checked,
       round((checked - violations) / checked * 1000000, 0) / 1000000 AS pass_rate
FROM rows_out
""",
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over lineitem: 8 scan-level constraints
    (not-null ×3, range ×2, positivity, set membership, composite-key
    uniqueness) in ONE aggregate pass, plus referential integrity
    (l_orderkey ⊆ orders) as a key-projected LEFT ANTI join — one row per
    constraint with violations / checked / pass_rate.

    The publish-or-quarantine check of a production ingest: constraints are
    data (names in the output), adding one is a new conditional column on
    the same scan, and the whole report is a 9-row relation regardless of
    fact size.  NULL discipline: range/domain checks skip NULLs (counted
    once by their own not-null constraint) — the NULL-edge lineitem fixture
    exercises every branch."""
    li = load_table(spark, "lineitem", sf_dir)
    scan = li.agg(
        F.count("*").alias("checked"),
        _violation(F.col("l_orderkey").isNull()).alias("v_nn_orderkey"),
        _violation(F.col("l_quantity").isNull()).alias("v_nn_quantity"),
        _violation(F.col("l_shipdate").isNull()).alias("v_nn_shipdate"),
        _violation(
            F.col("l_quantity").isNotNull()
            & ~F.col("l_quantity").between(1, 50)
        ).alias("v_rng_quantity"),
        _violation(
            F.col("l_discount").isNotNull()
            & ~F.col("l_discount").between(0, 0.1)
        ).alias("v_rng_discount"),
        _violation(
            F.col("l_extendedprice").isNotNull() & (F.col("l_extendedprice") <= 0)
        ).alias("v_pos_price"),
        _violation(
            F.col("l_returnflag").isNotNull()
            & ~F.col("l_returnflag").isin("A", "N", "R")
        ).alias("v_set_returnflag"),
        # uniqueness over FULLY-KEYED rows only (Spark's COUNT(DISTINCT a,b)
        # skips any-NULL rows; the minuend must skip the same rows, and the
        # oracle mirrors with a CASE-NULL struct)
        (
            F.sum(
                F.when(
                    F.col("l_orderkey").isNotNull()
                    & F.col("l_linenumber").isNotNull(),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("v_unique_line"),
    )
    orphans = (
        li.where(F.col("l_orderkey").isNotNull())
        .join(
            load_table(spark, "orders", sf_dir).select(
                F.col("o_orderkey").alias("l_orderkey")
            ),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count("*").alias("v_ref_orders"))
    )
    from e_commerce_streaming_datapipeline_spark.functions.scalars import scalar_join

    wide = scalar_join(scan, orphans)  # two 1-row relations, hash-join attach
    report = wide.select(
        F.expr(
            "stack(9, "
            "'not_null_l_orderkey', v_nn_orderkey, "
            "'not_null_l_quantity', v_nn_quantity, "
            "'not_null_l_shipdate', v_nn_shipdate, "
            "'range_l_quantity_1_50', v_rng_quantity, "
            "'range_l_discount_0_0.1', v_rng_discount, "
            "'positive_l_extendedprice', v_pos_price, "
            "'set_l_returnflag_ANR', v_set_returnflag, "
            "'unique_orderkey_linenumber', v_unique_line, "
            "'ref_orderkey_in_orders', v_ref_orders"
            ") AS (constraint_name, violations)"
        ),
        F.col("checked"),
    )
    return report.select(
        "constraint_name",
        F.col("violations").cast("long").alias("violations"),
        F.col("checked").cast("long").alias("checked"),
        fround(
            (F.col("checked") - F.col("violations")) / F.col("checked"), 6
        ).alias("pass_rate"),
    )
