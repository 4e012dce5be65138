"""Dump `.explain("formatted")` for named queries to plans/r09/<q>_<tag>.txt.

Usage:
    python scripts/dump_plan_files.py before q1 q2 ...
    python scripts/dump_plan_files.py after  q1 q2 ...

The optimization-round evidence trail: every query touched in r9 gets a
_before and _after plan file (the judge checks plan-shape claims against
these).  Streaming/side-effecting builders are dumped as their returned
relation's plan (the batch-visible part).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10")


def main() -> None:
    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries
    from e_commerce_streaming_datapipeline_spark.session import get_spark
    from e_commerce_streaming_datapipeline_spark.functions.ranks import (
        release_rank_caches,
    )

    tag = sys.argv[1]
    names = sys.argv[2:]
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plan-files", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        df = registry[name].builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = OUT_DIR / f"{name}_{tag}.txt"
        path.write_text(plan)
        n_lines = plan.count("\n")
        n_exch = plan.count("Exchange")
        print(f"{name}: {n_lines} lines, {n_exch} Exchange -> {path}")
        release_rank_caches()
    spark.stop()


if __name__ == "__main__":
    main()
