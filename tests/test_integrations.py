"""Environment-gated integration tests (VERDICT r2 items 5 & 8).

Neither an Iceberg Spark runtime jar nor a Kafka broker ships in this
sandbox, so the real-runtime branches in session.py / ingest.py are
config that nothing executes. These tests flip them to "tested" the
moment a later environment provides either dependency, with zero new
code: the jar test round-trips actual ``USING iceberg`` DDL +
``writeTo`` + ``VERSION AS OF`` (reference: src/main.rs:44-93); the
Kafka test drains a real topic through ``ingest.kafka_stream``. Both
skip cleanly (with the reason) when the dependency is absent.

The consumer-config assertion runs UNCONDITIONALLY: the option map the
reference pins (kafka-bench.rs:43-52) must be exactly what
kafka_stream would hand the source, broker or not.
"""

from __future__ import annotations

import os
import uuid

import pytest

from iceberg_playground_spark.ingest import kafka_options
from iceberg_playground_spark.session import _iceberg_jar_present

KAFKA_ENV = "SPARK_GRAFT_KAFKA_BOOTSTRAP"


def test_kafka_options_match_reference_consumer():
    # kafka-bench.rs:44-47 — bootstrap.servers, auto.offset.reset=
    # earliest; :52 — subscribe(["demo"]). Spark spells offset reset
    # startingOffsets; SASL client props ride the kafka. prefix
    # (main.go:339-350 — credentials always passed in, never copied).
    opts = kafka_options(
        "localhost:9092",
        "demo",
        sasl={
            "security.protocol": "SASL_SSL",
            "sasl.mechanism": "SCRAM-SHA-512",
        },
        max_offsets_per_trigger=2,  # ready_chunks(2), kafka-bench.rs:191
    )
    assert opts["kafka.bootstrap.servers"] == "localhost:9092"
    assert opts["subscribe"] == "demo"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "2"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-512"


@pytest.mark.skipif(
    not os.environ.get(KAFKA_ENV),
    reason=f"no Kafka broker: set {KAFKA_ENV}=host:port to enable",
)
def test_kafka_live_smoke(spark):
    # A9/A16 live path: read whatever is on the topic right now via one
    # availableNow drain — proves the source wiring, not the data.
    from iceberg_playground_spark.ingest import kafka_stream

    stream = kafka_stream(
        spark, os.environ[KAFKA_ENV], os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", "demo")
    )
    q = (
        stream.selectExpr("CAST(value AS STRING) AS raw")
        .writeStream.format("memory")
        .queryName(f"kafka_smoke_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert q.lastProgress is not None


def test_kafka_batch_query_gated_standin(spark, monkeypatch):
    # B5 registered query: with no broker configured it runs the SAME
    # decode + per-partition aggregation over the deterministic local
    # stand-in (events framed as Kafka records, 5 partitions per the
    # reference topic layout) — never a Kafka data-source touch (the
    # jar may be absent). Strictness faults are seeded, so each
    # partition must show violations (missing key) while wrong-typed
    # payloads stay silent NULLs (they count as messages, not
    # violations — sum_k just skips them).
    from iceberg_playground_spark.queries.kafka import b05_kafka_batch_source

    monkeypatch.delenv("SPARK_GRAFT_KAFKA", raising=False)
    monkeypatch.delenv(KAFKA_ENV, raising=False)
    out = b05_kafka_batch_source(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert [f.name for f in out.schema.fields] == [
        "topic", "partition", "n_messages", "n_violations", "sum_k",
    ]
    assert [r["partition"] for r in rows] == [0, 1, 2, 3, 4]
    n_events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).count()
    assert sum(r["n_messages"] for r in rows) == n_events
    assert all(0 < r["n_violations"] < r["n_messages"] for r in rows)


@pytest.mark.skipif(
    not os.environ.get(KAFKA_ENV) and not os.environ.get("SPARK_GRAFT_KAFKA"),
    reason=f"no Kafka broker: set {KAFKA_ENV}=host:port to enable",
)
def test_kafka_batch_query_live(spark):
    # B5 live path: batch-read the topic through the registered query;
    # per-partition counts must be non-negative and schema-stable.
    from iceberg_playground_spark.queries.kafka import b05_kafka_batch_source

    out = b05_kafka_batch_source(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert all(r.n_messages >= r.n_violations >= 0 for r in rows)


@pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="no iceberg-spark-runtime jar on the pyspark classpath",
)
def test_real_iceberg_roundtrip(tmp_path):
    # The reference's actual lifecycle against a real Iceberg catalog
    # (src/main.rs:41-93): create namespace + table, append twice,
    # read HEAD, time-travel to the first snapshot.
    from iceberg_playground_spark.session import get_spark

    spark = get_spark(
        app_name="ips-iceberg-it", warehouse=str(tmp_path / "wh")
    )
    if spark.conf.get("spark.sql.catalog.lake", None) is None:
        pytest.skip("session predates iceberg catalog config")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.it_ns")
    spark.sql("DROP TABLE IF EXISTS lake.it_ns.t")
    spark.sql(
        "CREATE TABLE lake.it_ns.t (id INT, name STRING) USING iceberg"
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, name STRING")
    df.writeTo("lake.it_ns.t").append()
    spark.createDataFrame(
        [(3, "c")], "id INT, name STRING"
    ).writeTo("lake.it_ns.t").append()
    assert spark.table("lake.it_ns.t").count() == 3
    first = spark.sql(
        "SELECT snapshot_id FROM lake.it_ns.t.snapshots "
        "ORDER BY committed_at LIMIT 1"
    ).first()[0]
    v1 = spark.read.option("snapshot-id", first).table("lake.it_ns.t")
    assert v1.count() == 2  # VERSION AS OF the first append


def test_dictionary_encoded_parquet_reads_transparently(spark, tmp_path):
    # The reference declares a dict-array experiment it never wrote
    # (Cargo.toml:44-46, src/bin/dict_array.rs absent). Close the
    # roadmap hint with evidence: parquet written with dictionary
    # encoding FORCED reads back through Spark's vectorized reader
    # bit-identically to the plain-encoded copy — no user-level work
    # exists, which is the SURVEY's claim for this row.
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "k": pa.array(list(range(1000))),
            "cat": pa.array(["alpha", "beta", "gamma"][i % 3] for i in range(1000)),
        }
    )
    dict_path = str(tmp_path / "dict.parquet")
    plain_path = str(tmp_path / "plain.parquet")
    pq.write_table(tbl, dict_path, use_dictionary=True)
    pq.write_table(tbl, plain_path, use_dictionary=False)
    # the dictionary file must actually carry dictionary-encoded pages
    col = pq.ParquetFile(dict_path).metadata.row_group(0).column(1)
    assert any("DICTIONARY" in str(e) for e in col.encodings)
    a = sorted(map(tuple, spark.read.parquet(dict_path).collect()))
    b = sorted(map(tuple, spark.read.parquet(plain_path).collect()))
    assert a == b and len(a) == 1000
