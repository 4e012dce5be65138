"""Multimodal column plumbing (BASELINE.json scale-up mandate).

Images/audio/video are opaque ``binary`` payloads with typed metadata
structs; decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas UDFs over ``mapInPandas``.  The media codec libraries are not in this
container, so the *decode kernel* is stubbed (deterministic fake derived from
the payload bytes, clearly marked) while everything Spark-side — schema,
batch iteration, partitioning, UDF signatures — is real and tested.

Scale notes: binary payloads ride in parquet column chunks; the metadata-only
queries never deserialize them (column pruning), and the decode stage is an
embarrassingly parallel ``mapInPandas`` whose batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound executor memory at
large asset sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_streaming_datapipeline_spark.plans.registry import query
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

MODALITIES = ("image", "audio", "video", "text")


def as_assets(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a multimodal asset table:
    (asset_id, modality, payload binary, meta struct)."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), F.pmod(F.col("doc_id"), F.lit(4)).cast("int") + 1
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.length(F.col("text")).alias("n_bytes_decl"),
        ).alias("meta"),
    )


@query(
    "multimodal_asset_stats",
    oracle="""
WITH assets AS (
    SELECT
        doc_id AS asset_id,
        ['image', 'audio', 'video', 'text'][(doc_id % 4) + 1] AS modality,
        encode(text) AS payload
    FROM documents
)
SELECT
    modality,
    count(*)                                  AS n_assets,
    CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
    round(avg(octet_length(payload)), 2)       AS avg_bytes,
    CAST(max(octet_length(payload)) AS INT)    AS max_bytes
FROM assets
GROUP BY 1
""",
)
def q_multimodal_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup over binary asset payloads — the query pattern
    that must NOT read the blobs: only byte lengths and metadata columns."""
    assets = as_assets(load_table(spark, "documents", sf_dir))
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length(F.col("payload"))).cast("long").alias("total_bytes"),
        F.round(F.avg(F.length(F.col("payload"))), 2).alias("avg_bytes"),
        F.max(F.length(F.col("payload"))).alias("max_bytes"),
    )


def decode_asset_bytes(payload: bytes, modality: str) -> dict:
    """STUB decode kernel — deterministic fake in place of PIL/ffmpeg (not in
    this container).  Real deployments swap this one function; the Spark
    plumbing around it is unchanged.

    The fake derives pseudo-metadata from an md5 of the payload so tests are
    reproducible.
    """
    digest = hashlib.md5(payload).digest()
    if modality == "image":
        return {"width": 64 + digest[0] * 4, "height": 64 + digest[1] * 4, "frames": 1}
    if modality == "video":
        return {"width": 64 + digest[0] * 4, "height": 64 + digest[1] * 4,
                "frames": 1 + digest[2]}
    if modality == "audio":
        return {"width": 0, "height": 0, "frames": 1 + digest[3] * 100}
    return {"width": 0, "height": 0, "frames": 0}


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over (asset_id, modality,
    payload) -> decoded metadata.  This is the real 100 TB shape: one Python
    worker per core, Arrow batches in, no driver involvement."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_asset_bytes(p, m) for p, m in zip(pdf["payload"], pdf["modality"])]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [m["width"] for m in meta],
                "height": [m["height"] for m in meta],
                "frames": [m["frames"] for m in meta],
            })

    return assets.mapInPandas(
        decode,
        "asset_id long, modality string, n_bytes long, width long, height long, frames long",
    )


@query(
    "multimodal_decode",
    oracle="""
WITH assets AS (
    SELECT
        doc_id AS asset_id,
        ['image', 'audio', 'video', 'text'][(doc_id % 4) + 1] AS modality,
        encode(text) AS payload
    FROM documents
), decoded AS (
    SELECT
        asset_id,
        modality,
        CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        ('0x' || substr(md5(payload::VARCHAR), 1, 2))::BIGINT AS b0,
        ('0x' || substr(md5(payload::VARCHAR), 3, 2))::BIGINT AS b1,
        ('0x' || substr(md5(payload::VARCHAR), 5, 2))::BIGINT AS b2,
        ('0x' || substr(md5(payload::VARCHAR), 7, 2))::BIGINT AS b3
    FROM assets
)
SELECT
    asset_id,
    modality,
    n_bytes,
    CASE WHEN modality IN ('image', 'video') THEN 64 + b0 * 4 ELSE 0 END AS width,
    CASE WHEN modality IN ('image', 'video') THEN 64 + b1 * 4 ELSE 0 END AS height,
    CASE modality WHEN 'image' THEN 1
                  WHEN 'video' THEN 1 + b2
                  WHEN 'audio' THEN 1 + b3 * 100
                  ELSE 0 END AS frames
FROM decoded
""",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pipeline end-to-end (binary -> Pandas UDF -> metadata).
    The stub kernel is md5-derived, so even this Python stage is
    oracle-checkable — DuckDB reproduces the fake decode in SQL."""
    return decode_assets(as_assets(load_table(spark, "documents", sf_dir)))
