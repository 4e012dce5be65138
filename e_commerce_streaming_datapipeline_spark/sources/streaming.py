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
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

from e_commerce_streaming_datapipeline_spark.schemas import EVENTS_SCHEMA

DEFAULT_MAX_OFFSETS_PER_TRIGGER = 10_000  # reference: stream_processor.py:108


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


def _streaming_events_schema() -> StructType:
    """EVENTS_SCHEMA with ts as raw long — matches what the parquet reader
    yields under nanosAsLong (file streams require an explicit schema)."""
    return StructType([
        StructField(f.name, LongType() if isinstance(f.dataType, TimestampType) else f.dataType,
                    f.nullable)
        for f in EVENTS_SCHEMA.fields
    ])


def read_file_stream(
    spark: SparkSession, sf_dir: str, filename: str = "events.parquet"
) -> DataFrame:
    """Deterministic replay source over the fixture parquet (S1 test twin +
    S6 replay source).  Emits the same columns as the batch loader.

    The file source requires a directory path; ``pathGlobFilter`` narrows it
    to the one fixture file.
    """
    raw = (
        spark.readStream.schema(_streaming_events_schema())
        .option("pathGlobFilter", filename)
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
