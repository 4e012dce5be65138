"""Isolate and time a subset of registry queries (optimization-round tool).

Usage:
    python scripts/bench_subset.py q1 q2 ...            # min-of-3 + cold
    SPARK_GRAFT_BENCH_ITERS=5 python scripts/bench_subset.py q1

Same methodology as bench.py (builder + noop sink, warmup at sf0.001,
release_rank_caches between queries) so numbers are comparable, but runs
only the named queries — the measure-first loop of the optimization guide
(§1.4) without paying for the full 372-query sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))


def main() -> None:
    from e_commerce_streaming_datapipeline_spark.plans.registry import all_queries
    from e_commerce_streaming_datapipeline_spark.session import get_spark
    from e_commerce_streaming_datapipeline_spark.functions.ranks import (
        release_rank_caches,
    )

    names = sys.argv[1:]
    spark = get_spark(
        app_name="bench-subset",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for n in names:
        spark.sparkContext.setJobDescription(f"warmup:{n}")
        registry[n].builder(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_rank_caches()

    out: dict[str, dict[str, float]] = {}
    for n in names:
        iters: list[float] = []
        for i in range(ITERS):
            spark.sparkContext.setJobDescription(f"{n}:iter{i}")
            start = time.perf_counter()
            registry[n].builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            iters.append(time.perf_counter() - start)
        release_rank_caches()
        out[n] = {
            "cold": round(iters[0], 3),
            "warm_min": round(min(iters[1:]) if len(iters) > 1 else iters[0], 3),
            "iters": [round(x, 3) for x in iters],
        }
        print(json.dumps({n: out[n]}), flush=True)
    print(json.dumps({"total_warm_min": round(sum(v["warm_min"] for v in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
