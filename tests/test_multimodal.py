"""Multimodal plumbing tests: binary payload columns, Arrow batch decode,
and the deterministic stub kernel."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from e_commerce_streaming_datapipeline_spark.operators.multimodal import (
    as_assets,
    decode_asset_bytes,
    decode_assets,
)
from e_commerce_streaming_datapipeline_spark.sources.batch import load_table


def test_asset_schema(spark, sf_dir):
    assets = as_assets(load_table(spark, "documents", sf_dir))
    assert isinstance(assets.schema["payload"].dataType, BinaryType)
    meta = assets.schema["meta"].dataType
    assert [f.name for f in meta.fields] == ["origin", "lang", "n_bytes_decl"]
    row = assets.orderBy("asset_id").first()
    assert isinstance(row["payload"], (bytes, bytearray))


def test_decode_stub_deterministic():
    payload = b"spark graft multimodal"
    a = decode_asset_bytes(payload, "image")
    b = decode_asset_bytes(payload, "image")
    assert a == b
    digest = hashlib.md5(payload).digest()
    assert a["width"] == 64 + digest[0] * 4


def test_decode_pipeline_round_trip(spark, sf_dir):
    assets = as_assets(load_table(spark, "documents", sf_dir))
    decoded = decode_assets(assets)
    rows = decoded.orderBy("asset_id").limit(20).collect()
    src = assets.orderBy("asset_id").limit(20).collect()
    for got, a in zip(rows, src):
        want = decode_asset_bytes(bytes(a["payload"]), a["modality"])
        assert got["n_bytes"] == len(a["payload"])
        assert (got["width"], got["height"], got["frames"]) == (
            want["width"], want["height"], want["frames"],
        )
