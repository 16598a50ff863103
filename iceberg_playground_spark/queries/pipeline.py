"""Round-3 training-data-pipeline extensions (Layer C continuation).

Registered after the never-graded legacy block (llm, lakehouse,
streaming, udfs) and before the relational surface already proven in
rounds 1-2 — see registry.load_all for why order matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import query
