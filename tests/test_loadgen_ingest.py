"""A15 load generator determinism + A9 Kafka source config shape."""

from __future__ import annotations

from iceberg_playground_spark.ingest import strict_json_decode, validate
from iceberg_playground_spark.loadgen import gen_assets


def test_gen_assets_deterministic(spark):
    a = gen_assets(spark, 200, partitions=4).collect()
    b = gen_assets(spark, 200, partitions=8).collect()
    # same rows regardless of partitioning (seeded from id, not rand())
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 200


def test_gen_assets_schema_classes(spark):
    df = gen_assets(spark, 10)
    kinds = dict(df.dtypes)
    assert kinds["network_interface"] == "string"  # JSON-in-string
    assert kinds["contributing_sources"] == "array<string>"
    assert kinds["custom_field1"].startswith("array<struct")
    assert kinds["created_time"].startswith("timestamp")


def test_gen_assets_json_decodes_strictly(spark):
    df = gen_assets(spark, 50)
    decoded = validate(
        strict_json_decode(
            df,
            "network_interface",
            "ipAddress STRING, macAddress STRING, networkName STRING",
            required=["ipAddress", "macAddress", "networkName"],
        )
    )
    assert decoded.count() == 50
