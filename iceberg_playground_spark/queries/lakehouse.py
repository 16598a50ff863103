"""Layer A/B write-path queries: snapshot scan (B2) + sink (B6).

These exercise tables.py — the pure-PySpark stand-in for the
reference's Iceberg write path (append src/main.rs:44-93, equality
delete src/bin/deletes.rs:60-110, snapshot log) — through the driver's
query contract. Each run builds its own throwaway warehouse under /tmp,
so the queries are idempotent at any scale factor.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from iceberg_playground_spark.queries import relational
from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import ORACLES, query
from iceberg_playground_spark.tables import LakeCatalog


@query(
    "b02_snapshot_scan",
    oracle="""
    SELECT * FROM (VALUES (1, 5), (2, 10), (3, 6))
      AS t(version, n_rows)
    """,
)
def b02_snapshot_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B2/A4/A5: snapshot-versioned reads (`VERSION AS OF` semantics).

    Builds a table, appends region twice (fast-append: v2 keeps v1's
    files), then equality-deletes r_regionkey >= 3 merge-on-read (v3
    masks keys 3,4 in BOTH appends without touching data files). The
    result is the row count each snapshot serves — the exact visibility
    contract of the reference's append+delete transactions. The counts
    are computed distributedly; only the 3-row summary is assembled on
    the driver. Oracle = the predicted visibility table."""
    tmp = tempfile.mkdtemp(prefix="ips_lake_b02_")
    try:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "region_v", "r_regionkey INT, r_name STRING",
            drop_if_exists=True,
        )
        region = load(spark, sf, "region").select("r_regionkey", "r_name")
        t.append(region)
        t.append(region)
        t.delete_where("r_regionkey >= 3", ["r_regionkey"])
        rows = [
            (v, t.read(version=v).count()) for v in t.versions()
        ]
        return spark.createDataFrame(rows, "version INT, n_rows BIGINT")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query("b06_parquet_sink")  # oracle attached below (reuses b21's)
def b06_parquet_sink(spark: SparkSession, sf: str) -> DataFrame:
    """B6: parquet/lakehouse sink round-trip — run the flagship
    aggregate, append it to a lake table (executors write the files,
    driver commits the snapshot — src/main.rs:46-93), read the table
    back. Hash-matching b21's own oracle proves write+read is lossless
    end-to-end. The temp warehouse outlives the call (the returned
    DataFrame reads lazily from it)."""
    tmp = tempfile.mkdtemp(prefix="ips_lake_b06_")
    cat = LakeCatalog(spark, tmp)
    result = relational.b21_pricing_summary(spark, sf)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in result.schema.fields)
    t = cat.create_table("demo", "pricing", ddl, drop_if_exists=True)
    t.append(result)
    return t.read()


# The sink round-trip must reproduce the flagship bit-for-bit.
ORACLES["b06_parquet_sink"] = ORACLES["b21_pricing_summary"]
