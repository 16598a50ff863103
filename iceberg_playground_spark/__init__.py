"""iceberg_playground_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of ``mnpw/iceberg-playground``
(an Apache Iceberg ingest playground whose query surface is delegated to a
bundled spark-iceberg service), re-expressed Spark-first:

- ``session``   — SparkSession factory tuned for local[32] tests and
                  cluster-scale defaults (AQE, shuffle partitions, UTC).
- ``tables``    — snapshot-versioned lakehouse table layer: namespaces,
                  atomic appends, merge-on-read equality deletes, time
                  travel, compaction (Iceberg semantics over parquet;
                  swaps to real Iceberg when the runtime jar is present).
- ``ingest``    — strict schema-directed JSON ingestion (the reference's
                  Kafka → JSON → columnar path) and the decoupled
                  writers/single-committer streaming sink.
- ``queries``   — the full relational / streaming / UDF / LLM-pipeline
                  operator surface, one registered query per operator.
- ``registry``  — the (name → query fn, name → oracle SQL) registry that
                  ``__spark_entry__.py`` exposes to the driver.
"""

__version__ = "0.1.0"
