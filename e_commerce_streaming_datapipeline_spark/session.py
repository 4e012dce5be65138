"""SparkSession factory.

Mirrors the intent of the reference's ``config/spark_config.py:21-33`` (AQE on,
tuned shuffle parallelism, Kryo, graceful shutdown) but sized for the test
host and designed so the same settings scale to a real cluster:

* AQE on (coalesce partitions, skew-join) — at 100 TB this is what turns a
  static ``shuffle.partitions`` guess into runtime-sized partitions.
* ``shuffle.partitions`` defaults to the local core count; on a cluster you
  override via ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` (rule of thumb: 2-3x total
  cores, AQE coalesces down).
* Arrow enabled for the few Pandas-UDF operators (similarity/multimodal).
* Session timezone pinned to UTC so window bucketing is reproducible across
  engines (the DuckDB oracle is tz-naive).
* ``parquet.nanosAsLong`` — the driver fixtures write pandas ns timestamps;
  Spark 4 refuses TIMESTAMP(NANOS) without it. sources/batch.py converts the
  raw long back to a proper TimestampType column.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


_STATESTORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
}


def get_spark(
    app_name: str = "e_commerce_streaming_datapipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Cluster-scale notes: everything here is config, not code — on a 1000-
    executor cluster the same plans run with ``master=yarn``/``k8s`` and a
    larger shuffle partition count; operators never assume local mode.
    """
    cpus = _default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode runs every executor thread inside the driver JVM, whose
        # default heap is 1g — far under this host's memory and an OOM at
        # ~5M-row shuffles.  Applies only when this process launches the JVM
        # (a pre-existing session keeps its own setting).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # -- optimizer / execution (reference: config/spark_config.py:26-33) --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE partition-coalescing policy, env-parameterized.  Local default
        # keeps Spark's parallelismFirst=true: an r9 A/B over a 32-query
        # cross-section at sf0.1 measured parallelismFirst=false 46% SLOWER
        # (53.0 s vs 36.3 s warm) — at this scale per-stage compute is real
        # but small, and collapsing KB-sized shuffles to one 64 MB-advisory
        # task serializes work 32 cores finish faster (OPTIMIZATION_r09.md).
        # On a production 100 TB cluster, flip SPARK_GRAFT_AQE_PARALLELISM_
        # FIRST=false so post-shuffle partitions honor the advisory size
        # (Spark's own tuning-guide recommendation once shuffles are GB-
        # scale and scheduling overhead is amortized).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_SIZE", "64m"))
        # Join-strategy preference (optimization-guide §9 suggests allowing
        # shuffled-hash joins); env-tunable so the choice is measured, not
        # assumed — r9 A/B legs at sf0.1 were inside the machine's noise
        # band, so the Spark default (sort-merge preferred) stands locally.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"))
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime row-level filtering for big fact-fact joins: inject a bloom
        # filter built from the smaller join side into the larger side's scan
        # (cuts shuffle volume for selective joins like orders ⋈ lineitem at
        # 100 TB; no-op for broadcast joins, which already prune).
        # NOTE: runtimeFilter.semiJoinReduction.enabled is deliberately NOT
        # set — on Spark 4.1.2 it hangs every query (first action never
        # completes; verified by bisection on a bare session).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # -- determinism across engines --
        .config("spark.sql.session.timeZone", "UTC")
        # -- python interop --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- fixture compatibility: pandas writes TIMESTAMP(NANOS) --
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # fixture timestamp[us] columns carry isAdjustedToUTC=false; read them
        # as plain TIMESTAMP (session tz = UTC) rather than TIMESTAMP_NTZ
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # -- streaming (reference: spark_config.py:27, stream graceful stop) --
        # Default = Spark's HDFS/heap-backed store: windowed-agg state here is
        # #windows rows, far under heap, and RocksDB costs ~7 s native init +
        # per-batch JNI.  SPARK_GRAFT_STATESTORE=rocksdb flips to RocksDB for
        # deployments where state exceeds heap (100 TB dedup/session state).
        .config("spark.sql.streaming.stateStore.providerClass",
                _STATESTORE_PROVIDERS.get(
                    os.environ.get("SPARK_GRAFT_STATESTORE", "hdfs").lower(),
                    os.environ.get("SPARK_GRAFT_STATESTORE", ""),
                ))
        .config("spark.streaming.stopGracefullyOnShutdown", "true")
    )
    # deployment-specific overrides without code changes (e.g. cluster
    # shuffle codecs, memoryOverhead):  SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2".
    # Limitation: ';' separates pairs, so VALUES cannot contain ';' — use
    # spark-defaults.conf / --conf for those.  Entries without '=' are a
    # typo'd override that would otherwise be silently ignored: warn loudly
    # (r9 ADVICE #4).
    for pair in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            k, _, v = pair.partition("=")
            builder = builder.config(k.strip(), v.strip())
        elif pair.strip():
            import warnings

            warnings.warn(
                f"SPARK_GRAFT_EXTRA_CONF entry {pair!r} has no '=' and was "
                "ignored (format: 'key=value;key2=value2')",
                stacklevel=2,
            )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


@contextmanager
def spark_session(**kwargs) -> Iterator[SparkSession]:
    spark = get_spark(**kwargs)
    try:
        yield spark
    finally:
        spark.stop()
