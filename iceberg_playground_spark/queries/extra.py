"""Relational-surface widening beyond SURVEY's enumerated rows:
operators the reference's bundled Spark SQL service exposes that the
B-layer tables didn't name explicitly. Registered inside the
never-graded block (after scale, before udfs/streaming/relational).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
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


@query(
    "b80_gap_fill",
    oracle="""
    WITH ev AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket FROM events),
    b AS (SELECT min(bucket) AS b0, max(bucket) AS b1 FROM ev),
    hours AS (
      SELECT unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      FROM b),
    grid AS (
      SELECT t.event_type, hours.bucket
      FROM (SELECT DISTINCT event_type FROM ev) t, hours),
    c AS (SELECT event_type, bucket, count(*) AS n
          FROM ev GROUP BY event_type, bucket)
    SELECT grid.event_type,
           strftime(grid.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM grid LEFT JOIN c
      ON grid.event_type = c.event_type AND grid.bucket = c.bucket
    """,
)
def b80_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """B80: time-series gap filling — hourly event counts per type with
    ZERO rows for silent hours (a dashboard/alerting query cannot tell
    "no data" from "no row" without them). The dense bucket grid is
    generated, never stored: sequence(min, max, 1 hour) over the
    observed span × the distinct type set, then a left join picks up
    the real counts.

    Scale shape: span bounds AND the type set come from ONE tiny
    aggregate pass (min/max timestamps + a collect_set of the ≤handful
    of types — not a separate distinct scan); the grid is
    |types|×|hours| rows — metadata-sized next to the fact table,
    built by explode, joined broadcast. The fact table is scanned
    exactly twice total (grid metadata + counts; plan-pinned) and
    never shuffled wider than the (type, bucket) aggregate."""
    ev = load(spark, sf, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    )
    meta0 = ev.agg(
        F.min("bucket").alias("b0"),
        F.max("bucket").alias("b1"),
        F.array_sort(F.collect_set("event_type")).alias("types"),
    )
    grid = meta0.select(
        F.explode("types").alias("event_type"), "b0", "b1"
    ).select(
        "event_type",
        F.explode(
            F.sequence("b0", "b1", F.expr("interval 1 hour"))
        ).alias("bucket"),
    )
    counts = ev.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n")
    )
    return grid.join(counts, ["event_type", "bucket"], "left").select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, integer microseconds


@query(
    "b81_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
    m AS (
      SELECT user_id, event_id, ts, us,
             lag(us) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_us
      FROM e),
    s AS (
      SELECT user_id, ts,
             CAST(sum(CASE WHEN prev_us IS NULL
                           OR us - prev_us > {_SESSION_GAP_US}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM m)
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def b81_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """B81: batch sessionization — split each user's event stream into
    sessions at >30-minute silences (lag + running flag-sum, the
    classic formulation) and summarize each session. This is the
    hash-matched batch complement of b70's engine-native
    session_window, whose state semantics DuckDB cannot mirror
    (rows-only there; exact oracle here).

    Gap arithmetic runs in INTEGER microseconds (epoch_us both
    engines) — a float seconds delta could ulp-flip a boundary gap.
    Both windows order by (ts, event_id): a bare ts ordering would
    leave the ROWS-frame running sum ambiguous if two events of one
    user ever share a timestamp at a session boundary, letting the two
    engines assign different session_ids (latent at the shipped SFs —
    no (user_id, ts) duplicates exist — but the tie-break makes the
    query correct on any input, not just this one).
    Scale shape: one shuffle on user_id for the window, reused as-is
    by the session aggregate (same key prefix, no second exchange);
    every user is independent, so skew is bounded by the hottest user,
    not the corpus."""
    ev = load(spark, sf, "events").select("user_id", "event_id", "ts")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    m = ev.select(
        "user_id", "event_id", "ts", us.alias("us"),
        F.lag(us).over(w).alias("prev_us"),
    )
    new_sess = F.when(
        F.col("prev_us").isNull()
        | (F.col("us") - F.col("prev_us") > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    ws = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = m.select(
        "user_id", "ts", F.sum(new_sess).over(ws).alias("session_id")
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
    )
