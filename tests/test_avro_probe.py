"""Per-round availability probe for the spark-avro SQL connector.

The reference declares Avro schemas (`src/schemas/avro_schemas.py:1-51`)
but serializes JSON and uses them only for required-field validation
(`src/producers/base_producer.py:25,46`) — those validation semantics are
ported (operators/connectors.py).  TRUE binary `from_avro`/`to_avro`
needs the org.apache.spark:spark-avro connector jar, which this container
does not ship (the avro-core jars are present but
``to_avro`` raises AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE at execution —
re-probed round 9, 2026-08-17).  When this probe starts passing, add a
`kafka_payload_avro_roundtrip` twin of `kafka_payload_roundtrip` that
wire-encodes with to_avro and hash-checks the decode.

This test PASSES either way: it asserts the probe's OUTCOME is one of the
two expected states and fails only if the connector is present but the
roundtrip breaks (a real regression worth failing on).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_avro_connector_probe(spark):
    from pyspark.sql.avro.functions import from_avro, to_avro

    df = spark.range(3).select(F.struct(F.col("id")).alias("s"))
    schema = (
        '{"type":"record","name":"r","fields":'
        '[{"name":"id","type":"long"}]}'
    )
    try:
        got = sorted(
            r.id
            for r in df.select(to_avro("s").alias("b"))
            .select(from_avro("b", schema).alias("s"))
            .select("s.id")
            .collect()
        )
    except Exception as exc:
        assert "AVRO_NOT_LOADED" in str(exc), (
            "avro roundtrip failed with an UNEXPECTED error (not the "
            f"missing-connector class): {exc}"
        )
        return  # documented container gap, unchanged
    # connector appeared: the roundtrip must be lossless, and the
    # kafka_payload_avro_roundtrip twin should now be added
    assert got == [0, 1, 2]
