"""iceberg_playground_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of ``mnpw/iceberg-playground``
(an Apache Iceberg ingest playground whose query surface is delegated to a
bundled spark-iceberg service), re-expressed Spark-first:

- ``session``   — SparkSession factory tuned for local[32] tests and
                  cluster-scale defaults (AQE, shuffle partitions, UTC).
- ``tables``    — snapshot-versioned lakehouse table layer: namespaces,
                  atomic CAS appends, merge-on-read equality deletes,
                  time travel, rewrite compaction, interval-batched
                  commits (Iceberg semantics over parquet; session.py
                  additionally configures a real Iceberg catalog when a
                  runtime jar is on the classpath).
- ``ingest``    — strict schema-directed JSON decode (the reference's
                  Kafka → JSON → columnar path) + Kafka source config.
- ``loadgen``   — deterministic synthetic asset-stream generator.
- ``queries``   — the full relational / streaming / UDF / LLM-pipeline
                  operator surface, one registered query per operator.
- ``registry``  — the (name → query fn, name → oracle SQL) registry that
                  ``__spark_entry__.py`` exposes to the driver.
"""

__version__ = "0.1.0"

# Lazy re-exports (PEP 562): the common entry points without forcing a
# pyspark import on bare package import.
_EXPORTS = {
    "get_spark": ("iceberg_playground_spark.session", "get_spark"),
    "load": ("iceberg_playground_spark.session", "load"),
    "LakeCatalog": ("iceberg_playground_spark.tables", "LakeCatalog"),
    "LakeTable": ("iceberg_playground_spark.tables", "LakeTable"),
    "BatchedCommitter": (
        "iceberg_playground_spark.tables",
        "BatchedCommitter",
    ),
    "CommitConflict": ("iceberg_playground_spark.tables", "CommitConflict"),
    "strict_json_decode": (
        "iceberg_playground_spark.ingest",
        "strict_json_decode",
    ),
    "gen_assets": ("iceberg_playground_spark.loadgen", "gen_assets"),
}


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        mod, attr = _EXPORTS[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
