"""Measured crossover: naive global-window rank vs the two-phase
distributed rank (``functions/ranks.py::global_row_number``).

Round-4 rewired every corpus-proportional ``row_number() OVER (ORDER BY
...)`` onto the two-phase rank, which costs MORE at sf0.1 (extra
sampling/offsets jobs) — this probe quantifies what that buys: at k× the
rows, the naive variant funnels the whole relation through ONE task's sort
(its longest stage has numTasks=1 and its wall time grows ~linearly with
the data on a single core), while the two-phase variant's longest stage
stays a parallel 32-task sort.

Both variants rank the same synthetic relation — events(sf0.1) replicated
k× in-memory with event_id disambiguated per replica (total order, so the
rank checksum must agree bit-for-bit between variants) — and reduce to
``sum(rank * (event_id % 97))`` so the whole rank materializes.

Per (variant, factor) we report wall seconds plus, from the Spark UI REST
API, the longest completed stage's wall time and its task count — the
"max task duration" evidence: a 1-task stage's wall IS its task duration.

Run:  python scripts/rank_crossover_probe.py          # factors 1, 10, 60
      SPARK_GRAFT_RANK_FACTORS=1,10 python scripts/rank_crossover_probe.py

Results recorded in SCALE.md ("Two-phase rank crossover").
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_RANK_FACTORS", "1,10,60").split(",")
]
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _completed_stages(spark) -> dict[int, dict]:
    """Completed stages from the UI REST API, keyed by stageId."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return {s["stageId"]: s for s in stages}


def _stage_wall_sec(s: dict) -> float:
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        t0 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
        t1 = datetime.strptime(s["completionTime"], fmt)
        return (t1 - t0).total_seconds()
    except (KeyError, ValueError):
        return 0.0


def run_variant(spark, base: DataFrame, variant: str) -> dict:
    keys = [F.col("ts").asc_nulls_last(), F.col("rid").asc_nulls_last()]
    if variant == "naive":
        ranked = base.withColumn("r", F.row_number().over(Window.orderBy(*keys)))
    else:
        from e_commerce_streaming_datapipeline_spark.functions.ranks import global_row_number

        ranked = global_row_number(base, keys, rank_col="r")
    before = set(_completed_stages(spark))
    t0 = time.perf_counter()
    row = ranked.agg(
        F.sum(F.col("r") * (F.col("rid") % 97)).alias("chk"),
        F.count("*").alias("n"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    stages = [s for i, s in _completed_stages(spark).items() if i not in before]
    longest = max(stages, key=_stage_wall_sec, default=None)
    return {
        "variant": variant,
        "wall_sec": round(wall, 2),
        "chk": int(row["chk"]),
        "n": int(row["n"]),
        "n_stages": len(stages),
        "longest_stage_sec": round(_stage_wall_sec(longest), 2) if longest else None,
        "longest_stage_tasks": longest["numTasks"] if longest else None,
    }


def main() -> None:
    from e_commerce_streaming_datapipeline_spark.session import get_spark
    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="e_commerce_streaming_datapipeline-rank-crossover",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, "events", BASE_SF).select("event_id", "ts")
    rows = []
    for k in FACTORS:
        # k in-memory replicas; rid stays a unique BIGINT so (ts, rid) is a
        # total order and both variants must produce the identical checksum
        # materialized (localCheckpoint) and pre-spread over the cores so
        # the probe times the RANK, not the serial 1-task replication of a
        # single-file parquet scan
        base = (
            events.crossJoin(spark.range(k).withColumnRenamed("id", "rep"))
            .select(
                (F.col("event_id") * k + F.col("rep")).alias("rid"),
                "ts",
            )
            .repartition(cpus)
            .localCheckpoint(eager=True)
        )
        if k == FACTORS[0]:  # JVM/codegen warmup outside the measurement
            for variant in ("two_phase", "naive"):
                run_variant(spark, base, variant)
        per_factor = {}
        for variant in ("two_phase", "naive"):
            res = run_variant(spark, base, variant)
            res["factor"] = k
            per_factor[variant] = res
            rows.append(res)
            print(json.dumps(res))
        assert (
            per_factor["naive"]["chk"] == per_factor["two_phase"]["chk"]
        ), f"rank checksum diverged at x{k}"

    print("\nfactor  variant     wall    longest-stage  tasks-in-longest")
    for r in rows:
        print(
            f"x{r['factor']:<6} {r['variant']:<10} {r['wall_sec']:>6.2f}s"
            f" {r['longest_stage_sec']:>10.2f}s  {r['longest_stage_tasks']:>6}"
        )


if __name__ == "__main__":
    main()
