"""Leg-by-leg profile of python_datasource_sink_roundtrip (r9 VERDICT #1).

Times each leg of the roundtrip separately so the ×2.2 regression can be
attributed: (1) feed scan -> noop, (2) feed -> JSONL sink write,
(3) manifest read-back -> agg -> noop.  Methodology mirrors bench.py
(warmup once, then N timed iterations, min reported).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "4"))


def main() -> None:
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.session import get_spark
    from e_commerce_streaming_datapipeline_spark.sources import python_datasource as pds

    spark = get_spark(app_name="sink-profile", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    pds.register(spark)
    pds.register_sink(spark)

    def feed():
        return spark.read.format("ecommerce_replay").option("n", 10_000).load()

    def leg_feed_noop():
        feed().write.format("noop").mode("overwrite").save()

    def leg_sink_write():
        out = os.path.join(tempfile.gettempdir(), "sinkprof", uuid.uuid4().hex)
        feed().write.format("ecommerce_jsonl").option("path", out).mode(
            "append"
        ).save()
        return out

    def leg_readback(out):
        files, _ = pds.read_manifest_files(out)
        back = spark.read.schema(
            "event_id long, user_id long, event_type string, amount_cents double"
        ).json(files)
        back.groupBy((F.col("user_id") % 10).alias("user_bucket")).agg(
            F.count("*").alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
            (F.sum("amount_cents") / 100.0).alias("total_amount"),
        ).write.format("noop").mode("overwrite").save()

    # warmup
    leg_feed_noop()
    out0 = leg_sink_write()
    leg_readback(out0)

    res: dict[str, list[float]] = {"feed_noop": [], "sink_write": [], "readback": []}
    for _ in range(ITERS):
        t0 = time.perf_counter()
        leg_feed_noop()
        res["feed_noop"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        out = leg_sink_write()
        res["sink_write"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        leg_readback(out)
        res["readback"].append(time.perf_counter() - t0)

    print(json.dumps({
        k: {"min": round(min(v), 3), "iters": [round(x, 3) for x in v]}
        for k, v in res.items()
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
