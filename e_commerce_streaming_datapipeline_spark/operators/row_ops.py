"""Row-level operator family — reference operators P1-P13 (SURVEY §2.2).

One combined "enrichment" projection exercising every scalar primitive the
reference uses: column arithmetic (P1, gmv_processor.py:23-26), when/otherwise
(P2), isin (P3), comparisons (P4), null predicates + coalesce (P5), boolean
algebra (P6), round (P7), cast (P8), literals (P9), slice (P11), alias
projection (P12), string formatting (P13 — the producer's event-id synthesis,
event_generator.py:89).

All expressions are Catalyst built-ins => the whole query is one
WholeStageCodegen stage over the scan: no shuffle, no UDF, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.functions.rounding import fround

from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def enrich_lineitem(lineitem: DataFrame) -> DataFrame:
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        # P1 arithmetic (extendedprice*(1-discount) ≙ price+freight)
        fround(net, 2).alias("net_price"),
        fround(net * (1 + F.col("l_tax")), 2).alias("charged_price"),
        # P2/P4 conditional + comparison
        F.when(F.col("l_discount") > 0.05, F.lit("high"))
        .when(F.col("l_discount") > 0.02, F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("discount_band"),
        # P3 set membership + P6 boolean algebra
        (F.col("l_returnflag").isin("A", "R") & ~(F.col("l_linestatus") == "O"))
        .alias("is_returned_closed"),
        # P5 null handling
        F.coalesce(F.col("l_quantity"), F.lit(0.0)).alias("quantity"),
        # P8 cast + P9 literal
        F.col("l_linenumber").cast("string").alias("line_label"),
        # P13 string formatting — the producer's event-id synthesis idiom
        F.concat_ws("_", F.lit("item"), F.col("l_orderkey"), F.col("l_linenumber"))
        .alias("synthetic_event_id"),
        # P10-style audit column made deterministic for hashing: derive from
        # data, not current_timestamp()
        F.date_format(F.col("l_shipdate"), "yyyy-MM").alias("ship_month"),
    )


_ENRICH_ORACLE = """
SELECT
    l_orderkey,
    l_linenumber,
    round(l_extendedprice * (1 - l_discount), 2)              AS net_price,
    round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged_price,
    CASE WHEN l_discount > 0.05 THEN 'high'
         WHEN l_discount > 0.02 THEN 'mid'
         ELSE 'low' END                                        AS discount_band,
    (l_returnflag IN ('A', 'R') AND NOT (l_linestatus = 'O'))  AS is_returned_closed,
    coalesce(l_quantity, 0.0)                                  AS quantity,
    CAST(l_linenumber AS VARCHAR)                              AS line_label,
    concat_ws('_', 'item', l_orderkey, l_linenumber)           AS synthetic_event_id,
    strftime(l_shipdate, '%Y-%m')                              AS ship_month
FROM lineitem
"""


@query("enrich_lineitem", oracle=_ENRICH_ORACLE)
def q_enrich_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P13 combined scalar enrichment over lineitem — single codegen stage,
    filters/projection pushed to the parquet scan."""
    return enrich_lineitem(load_table(spark, "lineitem", sf_dir))
