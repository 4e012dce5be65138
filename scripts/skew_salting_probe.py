"""Skew-hardening measurement (VERDICT r3 task #8): rows-per-reducer and
wall-time of a hot-key join, unsalted vs diagnosed-partial-salted
(operators/setops.py::diagnosed_salted_join), with AQE disabled so the
rewrite itself must do the balancing.

Synthesizes a fact relation with a planted hot key (60% of rows on one key,
uniform tail over 50k cold keys), diagnoses hot keys with the same
mean-multiple rule as `salted_join_rewrite`, then joins against the per-key
dim both ways and reports the reducer-load histogram of the join output —
the deterministic task-size evidence behind a task-TIME histogram (time is
row-proportional for a hash join probe).

Usage: python scripts/skew_salting_probe.py [n_rows]   (default 2_000_000)
Paste the printed markdown into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from e_commerce_streaming_datapipeline_spark.operators.setops import (  # noqa: E402
    diagnosed_salted_join,
)
from e_commerce_streaming_datapipeline_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
BUCKETS = 64
REDUCERS = 32


def pct(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


def main() -> None:
    spark = get_spark(
        app_name="skew-salting-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count() or 8)}]",
        shuffle_partitions=REDUCERS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # 60% of rows on key 0, the rest uniform over 50k cold keys
    fact = spark.range(N).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 6, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(50_000)) + 1)
        .alias("k"),
    )
    dim = fact.groupBy("k").agg(F.count("*").alias("n_k"))
    thr = dim.agg((F.avg("n_k") * 3).alias("t")).collect()[0]["t"]
    hot = dim.where(F.col("n_k") > thr).select("k")
    n_hot = hot.count()

    plain = fact.join(dim.hint("shuffle_hash"), "k")
    salted = diagnosed_salted_join(
        fact,
        dim,
        "k",
        hot,
        buckets=BUCKETS,
        probe_salt=F.pmod(F.hash("row_id"), F.lit(BUCKETS)),
    )

    def measure(df):
        t0 = time.perf_counter()
        counts = df.rdd.mapPartitions(lambda it: iter([sum(1 for _ in it)])).collect()
        wall = time.perf_counter() - t0
        return wall, counts

    # warm both once (codegen), then measure
    for df in (plain, salted):
        df.write.format("noop").mode("overwrite").save()
    rows = []
    for name, df in (("unsalted", plain), ("diagnosed-salted", salted)):
        wall, counts = measure(df)
        rows.append(
            (name, wall, len(counts), min(counts), pct(counts, 0.5), max(counts))
        )

    print(
        f"\nPlanted skew: {N:,} fact rows, 60% on one key, {n_hot} key(s) "
        f"diagnosed hot (> 3x mean), {BUCKETS} salt buckets, "
        f"{REDUCERS} reducers, AQE off\n"
    )
    print("| variant | wall s | reducers | min rows | p50 rows | max rows |")
    print("|---|---|---|---|---|---|")
    for name, wall, n, mn, md, mx in rows:
        print(f"| {name} | {wall:.2f} | {n} | {mn:,} | {md:,} | {mx:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
