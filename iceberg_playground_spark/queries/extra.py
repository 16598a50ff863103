"""Relational-surface widening beyond SURVEY's enumerated rows:
operators the reference's bundled Spark SQL service exposes that the
B-layer tables didn't name explicitly. Registered inside the
never-graded block (after scale, before udfs/streaming/relational).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import query


@query(
    "b75_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def b75_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary GROUPING SETS (the general form rollup/cube—b25/b26—
    specialize): three explicit grouping combinations in one pass.
    Spark plans this as a single Expand + hash aggregate — one scan,
    one shuffle, NOT three separate aggregations unioned (which would
    scan the fact table three times at 100 TB). grouping() flags
    disambiguate the NULL-as-total rows from genuine NULL keys, the
    same contract Iceberg's metadata-backed BI layers rely on."""
    o = load(spark, sf, "orders")
    o.createOrReplaceTempView("b75_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM b75_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


@query(
    "b76_pivot",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) FILTER (WHERE o.o_orderstatus = 'F') AS BIGINT)
             AS f_orders,
           CAST(count(*) FILTER (WHERE o.o_orderstatus = 'O') AS BIGINT)
             AS o_orders,
           CAST(count(*) FILTER (WHERE o.o_orderstatus = 'P') AS BIGINT)
             AS p_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def b76_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: order counts per market segment spread across order-status
    columns. The pivot values are DECLARED (['F','O','P']) — with an
    explicit value list Spark pivots in one pass (map-side partial
    aggregation included); omitting it triggers a values-discovery job
    first, a hidden extra scan at 100 TB. The oracle states the same
    computation as portable conditional aggregation, which is exactly
    what Catalyst lowers pivot to."""
    o = load(spark, sf, "orders").select("o_custkey", "o_orderstatus")
    c = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    p = (
        j.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("f_orders"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("o_orders"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("p_orders"),
    )
