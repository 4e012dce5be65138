"""Streaming sources — reference operators S1-S4
(src/consumers/stream_processor.py:96-136).

Two interchangeable builders behind one API:

* ``read_kafka_stream`` — the production path, byte-for-byte the reference's
  source semantics: subscribe topic, ``startingOffsets=latest``,
  ``failOnDataLoss=false``, ``maxOffsetsPerTrigger`` backpressure, metadata
  projection (S2), ``from_json`` + corrupt-drop (S3), struct flatten (S4).
  Requires the spark-sql-kafka package on the classpath; guarded so the rest
  of the engine works without a broker.
* ``read_file_stream`` — the deterministic test harness: the same downstream
  plan over a parquet file source with ``trigger(availableNow=True)``
  (SURVEY §2.1 S1 "test harness substitutes parquet").

Upgrade over the reference (SURVEY §2.5 D3): callers get event-time columns
and are expected to ``withWatermark`` — the reference configured a watermark
(.env.example SPARK_WATERMARK_DELAY) and never applied it, so its streaming
state grows unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DEFAULT_MAX_OFFSETS_PER_TRIGGER = 10_000  # reference: stream_processor.py:108

# (sf_dir, glob) -> StructType; see read_file_stream
_SCHEMA_CACHE: dict[tuple[str, str], StructType] = {}


def read_kafka_stream(
    spark: SparkSession,
    topic: str,
    payload_schema: StructType,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int = DEFAULT_MAX_OFFSETS_PER_TRIGGER,
) -> DataFrame:
    """S1-S4: Kafka scan -> metadata projection -> JSON decode -> flatten."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .load()
    )
    meta = raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("value").cast("string").alias("raw_value"),
        F.col("timestamp").alias("kafka_timestamp"),
        "partition",
        "offset",
    )
    parsed = meta.withColumn("parsed", F.from_json(F.col("raw_value"), payload_schema))
    # PERMISSIVE parse + drop-corrupt (reference stream_processor.py:117-122)
    return (
        parsed.filter(F.col("parsed").isNotNull())
        .select("kafka_key", "kafka_timestamp", "partition", "offset", "parsed.*")
    )


def read_file_stream(
    spark: SparkSession,
    sf_dir: str,
    filename: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Deterministic replay source over the fixture parquet (S1 test twin +
    S6 replay source).  Emits the same columns as the batch loader.

    File streams require an explicit schema; we take it from a batch read of
    the same file (plus the same timestamp normalization), so the streaming
    and batch paths can never disagree about fixture physical types.

    The file source requires a directory path; ``pathGlobFilter`` narrows it
    to the one fixture file (globs work too — multi-file replay).

    ``max_files_per_trigger`` throttles ingestion to N files per micro-batch
    (the file-source analogue of Kafka's ``maxOffsetsPerTrigger``), so a
    chunked directory replays as a REAL multi-batch stream with watermark
    progression between batches — used by the cross-batch equivalence tests.
    """
    from e_commerce_streaming_datapipeline_spark.sources.batch import (
        _normalize_ns_timestamps,
        ensure_session_conf,
    )

    ensure_session_conf(spark)
    # footer-read once per (dir, glob): a multi-leg stream query (e.g. the
    # 3-way journey join) builds this source repeatedly, and the fixture
    # schema never changes within a process
    key = (sf_dir, filename)
    physical = _SCHEMA_CACHE.get(key)
    if physical is None:
        physical = (
            spark.read.option("pathGlobFilter", filename).parquet(sf_dir).schema
        )
        _SCHEMA_CACHE[key] = physical
    reader = spark.readStream.schema(physical).option("pathGlobFilter", filename)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _normalize_ns_timestamps(reader.parquet(sf_dir))
