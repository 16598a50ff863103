"""Layer B — the relational query surface (SURVEY.md §2, B1-B46 + B64).

The reference delegates all querying to its bundled spark-iceberg SQL
service (`/root/reference/docker-compose.yml:58-81`); this module makes
that surface first-class PySpark. Every operator is a declarative
DataFrame plan — Catalyst handles pushdown, pruning, join selection,
partial aggregation; no hand-scheduling. Each query has a DuckDB oracle
unless its semantics are approximate/engine-native (see registry).

Scale notes are inline per operator: what shuffles, what broadcasts,
and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import B21_ORACLE, dec, dsum, load
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# Scans & sources (B1, B3, B4)
# ---------------------------------------------------------------------------


@query(
    "b01_parquet_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def b01_parquet_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B1: bare columnar parquet scan (ref reads/writes parquet data files,
    /root/reference/src/main.rs:50-57)."""
    return load(spark, sf, "region").select("r_regionkey", "r_name")


@query(
    "b03_json_lines_decode",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(TRY_CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k
    FROM events
    """,
)
def b03_json_lines_decode(spark: SparkSession, sf: str) -> DataFrame:
    """B3/A12: schema-directed JSON decode. The reference's core move is
    JSON → typed columns (json_to_arrow, /root/reference/src/bin/
    kafka-bench.rs:261-334). Here: from_json with an explicit schema —
    stays in the JVM, vectorized, no Python."""
    ev = load(spark, sf, "events")
    parsed = ev.select(
        F.from_json(F.col("props"), "k INT").alias("p")
    )
    return parsed.agg(
        F.count("*").alias("n"),
        F.sum("p.k").cast("bigint").alias("sum_k"),
    )


@query(
    "b04_csv_decode",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(string_split(csv_line, ',')[2] AS BIGINT)) AS BIGINT)
             AS sum_key
    FROM (SELECT r_name || ',' || r_regionkey AS csv_line FROM region)
    """,
)
def b04_csv_decode(spark: SparkSession, sf: str) -> DataFrame:
    """B4: CSV decode via from_csv (schema-directed, JVM-side), modeling a
    delimited-text source without synthesizing input files."""
    r = load(spark, sf, "region")
    lines = r.select(
        F.concat_ws(",", F.col("r_name"), F.col("r_regionkey")).alias("csv_line")
    )
    parsed = lines.select(
        F.from_csv(F.col("csv_line"), "name STRING, key BIGINT").alias("c")
    )
    return parsed.agg(
        F.count("*").alias("n"),
        F.sum("c.key").cast("bigint").alias("sum_key"),
    )


# ---------------------------------------------------------------------------
# Projection / filter / predicates (B8-B12)
# ---------------------------------------------------------------------------


@query(
    "b08_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS disc_price
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def b08_projection(spark: SparkSession, sf: str) -> DataFrame:
    """B8: projection + computed column. Catalyst prunes the scan to the
    three referenced columns (check ReadSchema in explain)."""
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("disc_price"),
    )


@query(
    "b09_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 50000 AND 150000
      AND o_orderpriority LIKE '1-%'
      AND NOT (o_custkey IS NULL)
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    """,
)
def b09_filter_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """B9/B10: comparison, IN, BETWEEN, LIKE, IS NULL, boolean composition.
    All predicates push down to the parquet scan (PushedFilters)."""
    o = load(spark, sf, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderpriority").like("1-%")
        & ~F.col("o_custkey").isNull()
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "b11_case_conditional",
    oracle="""
    SELECT size_class, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
    FROM (
      SELECT CASE WHEN l_quantity < 10 THEN 'small'
                  WHEN l_quantity < 30 THEN 'medium'
                  ELSE 'large' END AS size_class,
             l_quantity
      FROM lineitem)
    GROUP BY size_class
    """,
)
def b11_case_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """B11: CASE WHEN bucketing — mirrors the reference's size classes
    small/medium/large (/root/reference/src/main.rs:58-67)."""
    li = load(spark, sf, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("size_class")
    )
    return li.select(bucket, "l_quantity").groupBy("size_class").agg(
        F.count("*").alias("n"), dsum("l_quantity", "qty")
    )


@query(
    "b12_null_handling",
    oracle="""
    SELECT
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(count(nullif(l_discount, 0.0)) AS BIGINT) AS n_discounted,
      CAST(sum(CAST(coalesce(nullif(l_discount, 0.0), 1.0) AS DECIMAL(18,4)))
           AS DOUBLE) AS coalesced_sum
    FROM lineitem
    """,
)
def b12_null_handling(spark: SparkSession, sf: str) -> DataFrame:
    """B12: nullif / coalesce / null-aware counting."""
    li = load(spark, sf, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count(d).alias("n_discounted"),
        F.sum(dec(F.coalesce(d, F.lit(1.0)))).cast("double").alias(
            "coalesced_sum"
        ),
    )


# ---------------------------------------------------------------------------
# Joins (B13-B20)
# ---------------------------------------------------------------------------


@query(
    "b13_inner_join",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def b13_inner_join(spark: SparkSession, sf: str) -> DataFrame:
    """B13: large-large equi-join. Both sides shuffle on the join key
    (sort-merge at scale); AQE may switch to shuffled-hash. No broadcast:
    at 100 TB both fact tables are huge."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice", "total_price"))
    )


@query(
    "b14_broadcast_join",
    oracle="""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY p_brand
    """,
)
def b14_broadcast_join(spark: SparkSession, sf: str) -> DataFrame:
    """B14: broadcast hash join — dim side filtered then broadcast, so the
    fact table never shuffles for the join (map-side join at any scale
    as long as the filtered dim fits in memory)."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), dsum("l_quantity", "qty"))
    )


@query(
    "b15_outer_join",
    oracle="""
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 0)
                AS DOUBLE) AS spend
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey
    """,
)
def b15_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """B15: left outer join with an ON-clause predicate (kept on the join,
    not a post-filter — outer semantics differ)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"),
        "left",
    )
    return joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(F.sum(dec("o_totalprice")), F.lit(0))
        .cast("double")
        .alias("spend"),
    )


@query(
    "b16_semi_anti_join",
    oracle="""
    SELECT 'with_urgent' AS side, CAST(count(*) AS BIGINT) AS n FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'without_urgent' AS side, CAST(count(*) AS BIGINT) AS n FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    """,
)
def b16_semi_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """B16: left-semi (EXISTS) and left-anti (NOT EXISTS) joins."""
    c = load(spark, sf, "customer")
    urgent = load(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").agg(
        F.count("*").alias("n")
    ).select(F.lit("with_urgent").alias("side"), "n")
    anti = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").agg(
        F.count("*").alias("n")
    ).select(F.lit("without_urgent").alias("side"), "n")
    return semi.unionAll(anti)


@query(
    "b17_cross_join",
    oracle="""
    SELECT r_name, o_orderstatus,
           r_regionkey * 10 + CASE o_orderstatus
               WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END AS cell_id
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
)
def b17_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    """B17: cross join of two tiny inputs (cartesian grid). Bounded sides
    only — never cross-join two fact tables at scale."""
    r = load(spark, sf, "region").select("r_regionkey", "r_name")
    s = load(spark, sf, "orders").select("o_orderstatus").distinct()
    cell = (
        F.col("r_regionkey") * 10
        + F.when(F.col("o_orderstatus") == "F", 0)
        .when(F.col("o_orderstatus") == "O", 1)
        .otherwise(2)
    ).alias("cell_id")
    return r.crossJoin(s).select("r_name", "o_orderstatus", cell)


@query(
    "b18_range_join",
    oracle="""
    SELECT strftime(m_start, '%Y-%m-%d') AS month,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN (SELECT DISTINCT date_trunc('month', o_orderdate) AS m_start
          FROM orders) m
      ON o_orderdate >= m_start
     AND o_orderdate < m_start + INTERVAL 1 MONTH
    GROUP BY m_start
    """,
)
def b18_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """B18: non-equi (band) join against a derived calendar dim. The dim is
    tiny → broadcast nested-loop join; the fact side streams through it
    without a shuffle. (A band join against a large dim would bucketize
    the range key into an equi-join first.)"""
    o = load(spark, sf, "orders")
    months = o.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("m_start")
    ).distinct()
    joined = o.join(
        F.broadcast(months),
        (o.o_orderdate >= months.m_start)
        & (o.o_orderdate < months.m_start + F.expr("INTERVAL 1 MONTH")),
    )
    return joined.groupBy("m_start").agg(F.count("*").alias("n_orders")).select(
        F.date_format("m_start", "yyyy-MM-dd").alias("month"), "n_orders"
    )


@query(
    "b19_asof_join",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_error_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
)
def b19_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """B19: as-of join (latest error at-or-before each purchase, per user).

    Spark has no native ASOF; the scalable formulation is a union +
    last-value window: tag both streams, sort within user by ts, carry
    the last error ts forward. One shuffle on user_id, no self-join
    blowup — this is the 100 TB-safe plan."""
    ev = load(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
    tagged = ev.filter(F.col("event_type").isin("purchase", "error")).withColumn(
        "err_ts",
        F.when(F.col("event_type") == "error", F.col("ts")),
    )
    # At equal ts an error matches a purchase (p.ts >= e.ts) → sort errors first.
    order = [F.col("ts"), F.when(F.col("event_type") == "error", 0).otherwise(1)]
    w = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        W.unboundedPreceding, 0
    )
    carried = tagged.withColumn("last_error_ts", F.last("err_ts", True).over(w))
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.date_format("last_error_ts", fmt).alias("last_error_ts"),
    )


@query(
    "b20_star_join",
    oracle="""
    SELECT r_name, n_name,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - CAST(l_discount AS DECIMAL(5,4))
                           AS DECIMAL(6,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def b20_star_join(spark: SparkSession, sf: str) -> DataFrame:
    """B20: five-way star join. Tiny dims (nation, region) broadcast
    explicitly; lineitem⋈orders⋈customer shuffle on their keys. Catalyst
    reorders; AQE fixes skew at runtime."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    # tight factor type + rescale-before-cast: see b21's decimal notes
    disc_factor = (F.lit(1) - dec("l_discount", precision=5)).cast(
        "decimal(6,4)"
    )
    revenue = (
        F.sum(dec("l_extendedprice") * disc_factor)
        .cast("decimal(30,4)")
        .cast("double")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_lines"), revenue.alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Aggregations (B21-B28)
# ---------------------------------------------------------------------------


@query("b21_pricing_summary", oracle=B21_ORACLE)
def b21_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """B21 (flagship): TPC-H Q1-shaped pricing summary — filter → hash
    aggregate (map-side partial + final) → 6 aggregates over 2 group keys.
    One shuffle of ~|groups| rows; scales linearly in input.

    Decimal typing is deliberate: discount/tax are 4-dp fractions, so
    DECIMAL(5,4) factors keep the 3-factor charge product at
    precision 32 scale 12 — EXACT in both engines. Wider factor types
    push the product past precision 38, where Spark silently truncates
    the scale (allowPrecisionLoss) while DuckDB switches to float —
    divergent bits (caught at sf0.001)."""
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    price, disc, tax, qty = (
        dec("l_extendedprice"),
        dec("l_discount", precision=5),
        dec("l_tax", precision=5),
        dec("l_quantity"),
    )
    disc_factor = (F.lit(1) - disc).cast("decimal(6,4)")
    tax_factor = (F.lit(1) + tax).cast("decimal(6,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        # rescale to the true data scale (2dp×2dp ⇒ 4; ×2dp ⇒ 6) before
        # the double cast: keeps the unscaled integer < 2^53 so DuckDB's
        # int128-then-divide conversion can't double-round (1-ulp
        # divergence caught at sf0.001 with the raw scale-12 sum)
        F.sum(price * disc_factor)
        .cast("decimal(30,4)")
        .cast("double")
        .alias("sum_disc_price"),
        F.sum(price * disc_factor * tax_factor)
        .cast("decimal(30,6)")
        .cast("double")
        .alias("sum_charge"),
        (F.sum(qty).cast("double") / F.count("l_quantity")).alias("avg_qty"),
        (F.sum(price).cast("double") / F.count("l_extendedprice")).alias(
            "avg_price"
        ),
        F.count("*").alias("count_order"),
    )


@query(
    "b22_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b22_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """B22: multi-distinct aggregate, dedup-first. A naive triple
    countDistinct makes Catalyst Expand every row 3× before the
    shuffle (3×|lineitem| shuffle volume — the round-1 audit's
    flagged bottleneck). Instead each column dedups independently:
    partial aggregation collapses (flag, key) pairs map-side, so each
    of the three shuffles carries only the DISTINCT pairs — bounded by
    key cardinality, not table size — and the final join is on
    |flags| rows. Same result, same oracle; at 100 TB swap in HLL
    (b23) when ±1% is acceptable."""
    li = load(spark, sf, "lineitem")

    def nd(col: str, alias: str) -> DataFrame:
        return (
            li.select("l_returnflag", col)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count("*").alias(alias))
        )

    return (
        nd("l_orderkey", "n_orders")
        .join(nd("l_partkey", "n_parts"), "l_returnflag")
        .join(nd("l_suppkey", "n_supps"), "l_returnflag")
    )


@query("b23_approx_count_distinct")  # approximate → rows-only check
def b23_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """B23: HLL approximate distinct — the scale path for cardinality at
    100 TB (no exact shuffle of every key). Approximate ⇒ no DuckDB hash
    oracle; the driver records rows-only."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
    )


@query(
    "b24_global_agg",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)
             AS avg_price,
           CAST(min(o_orderdate) AS DATE) AS first_day,
           CAST(max(o_orderdate) AS DATE) AS last_day
    FROM orders
    """,
)
def b24_global_agg(spark: SparkSession, sf: str) -> DataFrame:
    """B24: global (no-group) aggregate — partial agg per partition then a
    single-row final merge; constant cost at any scale."""
    o = load(spark, sf, "orders")
    return o.agg(
        F.count("*").alias("n"),
        dsum("o_totalprice", "total"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (F.sum(dec("o_totalprice")).cast("double") / F.count("*")).alias(
            "avg_price"
        ),
        F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
    )


@query(
    "b25_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def b25_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """B25a: ROLLUP hierarchy totals (flag, flag+status, grand total)."""
    li = load(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", "qty")
    )


@query(
    "b26_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def b26_cube(spark: SparkSession, sf: str) -> DataFrame:
    """B25b: CUBE — all grouping-set combinations."""
    o = load(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )


@query(
    "b27_filtered_agg",
    oracle="""
    SELECT l_returnflag,
      CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
        AS n_high_discount,
      CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                    FILTER (WHERE l_quantity >= 25), 0) AS DOUBLE)
        AS bulk_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b27_filtered_agg(spark: SparkSession, sf: str) -> DataFrame:
    """B26: conditional aggregation (FILTER/CASE inside agg)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_high_discount"),
        F.coalesce(
            F.sum(F.when(F.col("l_quantity") >= 25, dec("l_extendedprice"))),
            F.lit(0),
        )
        .cast("double")
        .alias("bulk_price"),
    )


@query(
    "b28_stats_agg",
    oracle="""
    WITH s AS (
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
                  AS DECIMAL(30,4)) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))
                      * CAST(c_acctbal AS DECIMAL(18,4)))
                  AS DECIMAL(30,4)) AS DOUBLE) AS sxx,
             CAST(CAST(sum(CAST(c_nationkey AS DECIMAL(18,4)))
                  AS DECIMAL(30,4)) AS DOUBLE) AS sy,
             CAST(CAST(sum(CAST(c_nationkey AS DECIMAL(18,4))
                      * CAST(c_nationkey AS DECIMAL(18,4)))
                  AS DECIMAL(30,4)) AS DOUBLE) AS syy,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))
                      * CAST(c_nationkey AS DECIMAL(18,4)))
                  AS DECIMAL(30,4)) AS DOUBLE) AS sxy
      FROM customer GROUP BY c_mktsegment)
    SELECT c_mktsegment, n,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_bal,
           (sxx - sx * sx / n) / (n - 1) AS var_bal,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))
             AS corr_bal_nation
    FROM s
    """,
)
def b28_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    """B27: statistical aggregates. Built from exact decimal moment sums
    so Spark and the oracle produce bit-identical doubles (native
    stddev/corr stream in float and are order-sensitive). Moment sums
    rescale to scale 4 (exact for 2-dp × 2-dp products) before the
    double cast — see _util.py's rescale-before-cast rule (the raw
    scale-8 sxx sum exceeds 2^53 unscaled at sf0.1 and DuckDB's
    conversion double-rounds)."""
    c = load(spark, sf, "customer")
    x = dec("c_acctbal")
    y = dec(F.col("c_nationkey").cast("double"))

    def m(expr, alias):
        return F.sum(expr).cast("decimal(30,4)").cast("double").alias(alias)

    s = c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        m(x, "sx"),
        m(x * x, "sxx"),
        m(y, "sy"),
        m(y * y, "syy"),
        m(x * y, "sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (
        F.col("n"),
        F.col("sx"),
        F.col("sxx"),
        F.col("sy"),
        F.col("syy"),
        F.col("sxy"),
    )
    return s.select(
        "c_mktsegment",
        "n",
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_bal"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_bal"),
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("corr_bal_nation"),
    )


@query("b29_percentiles")  # approximate → rows-only check
def b29_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """B27b: approximate percentiles (t-digest style sketch — the 100 TB
    path; exact percentile needs a full sort)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.95).alias("p95"),
    )


@query(
    "b30_collect_list",
    oracle="""
    SELECT n_regionkey AS r_key,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def b30_collect_list(spark: SparkSession, sf: str) -> DataFrame:
    """B28: array aggregation (collect_list) — sorted for determinism,
    serialized to CSV at the output boundary (array cells become numpy
    ndarrays in the driver's pandas comparator and crash it)."""
    n = load(spark, sf, "nation")
    return n.groupBy(F.col("n_regionkey").alias("r_key")).agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
            "nations"
        ),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Window functions (B29-B32)
# ---------------------------------------------------------------------------


@query(
    "b31_window_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal, rn,
           CAST(rank() OVER w2 AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w2 AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(row_number() OVER wi AS BIGINT) AS rn
      FROM customer
      WINDOW wi AS (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey)
      QUALIFY rn <= 20)
    WINDOW w  AS (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal DESC, c_custkey),
           w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    """,
)
def b31_window_ranking(spark: SparkSession, sf: str) -> DataFrame:
    """B29: ranking windows, phased for scale. Phase 1 is row_number +
    `rn <= 20`, which Catalyst's InferWindowGroupLimit pushes below the
    shuffle (each map task keeps only its local top-20 per segment —
    at 100 TB the shuffle carries ~20×|segments| rows, not the table).
    Phase 2 computes rank/dense_rank/ntile over the survivors only:
    every row with a strictly-higher acctbal has a smaller rn and also
    survives, so rank/dense_rank equal their full-partition values,
    while ntile(4) quartiles the surviving top-20 by definition. Both
    windows share one partitioning, so phase 2 reuses the exchange."""
    c = load(spark, sf, "customer")
    wi = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    top = (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(wi).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 20)
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w2 = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return top.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        "rn",
        F.rank().over(w2).cast("bigint").alias("rnk"),
        F.dense_rank().over(w2).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "b32_window_analytic",
    oracle="""
    SELECT event_id, user_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def b32_window_analytic(spark: SparkSession, sf: str) -> DataFrame:
    """B30: lag/lead/first/last analytic windows over the event stream."""
    ev = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(wfull).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
    )


@query(
    "b33_window_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS running_value,
           CAST(sum(CAST(value AS DECIMAL(18,4)))
                  OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(value)
                  OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def b33_window_running(spark: SparkSession, sf: str) -> DataFrame:
    """B31: running sum + moving average frames (decimal-exact so frame
    evaluation order can't change the bits)."""
    ev = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    wmov = w.rowsBetween(-3, 0)
    v = dec("value")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(v).over(wrun).cast("double").alias("running_value"),
        (
            F.sum(v).over(wmov).cast("double") / F.count("value").over(wmov)
        ).alias("moving_avg"),
    )


@query(
    "b34_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def b34_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """B32: time-range frame — trailing 1 h per user, keyed on floored
    epoch seconds so both engines bound the frame identically."""
    ev = load(spark, sf, "events")
    secs = F.col("ts").cast("timestamp").cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(secs.alias("epoch_s"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(dec("value")).over(w).cast("double").alias(
            "value_last_hour"
        ),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (B33-B35)
# ---------------------------------------------------------------------------


@query(
    "b35_global_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def b35_global_sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    """B33/B34: global multi-key sort + limit. Catalyst plans
    TakeOrderedAndProject — per-partition top-k then a driver merge of k
    rows, never a full global sort; this is the 100 TB-safe top-k."""
    o = load(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(100)
    )


@query(
    "b36_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def b36_limit_offset(spark: SparkSession, sf: str) -> DataFrame:
    """B34: LIMIT/OFFSET pagination over a deterministic order."""
    o = load(spark, sf, "orders")
    return (
        o.orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(100)
        .limit(50)
    )


@query(
    "b37_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) <= 5
    """,
)
def b37_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """B35: top-k per group via ranking window; Catalyst's
    InferWindowGroupLimit turns it into per-partition group-limits
    before the shuffle, so it scales."""
    c = load(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Set operations (B36-B39)
# ---------------------------------------------------------------------------


@query(
    "b38_union",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ) GROUP BY o_custkey
    """,
)
def b38_union(spark: SparkSession, sf: str) -> DataFrame:
    """B36: UNION ALL (bag union — no shuffle, just concatenated scans)."""
    o = load(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.unionAll(b).groupBy("o_custkey").agg(F.count("*").alias("n"))


@query(
    "b39_intersect_except",
    oracle="""
    SELECT 'both_years' AS tag, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    UNION ALL
    SELECT 'only_1996' AS tag, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    """,
)
def b39_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    """B37/B38: INTERSECT / EXCEPT (distinct set semantics)."""
    o = load(spark, sf, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    both = (
        y96.intersect(y97)
        .agg(F.count("*").alias("n"))
        .select(F.lit("both_years").alias("tag"), "n")
    )
    only = (
        y96.subtract(y97)  # EXCEPT (distinct) semantics
        .agg(F.count("*").alias("n"))
        .select(F.lit("only_1996").alias("tag"), "n")
    )
    return both.unionAll(only)


@query(
    "b40_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def b40_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """B39: DISTINCT / dropDuplicates (hash aggregate on all columns)."""
    li = load(spark, sf, "lineitem")
    return li.select("l_returnflag", "l_linestatus").dropDuplicates()


# ---------------------------------------------------------------------------
# Scalar function packs (B40-B46)
# ---------------------------------------------------------------------------


@query(
    "b41_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substring(p_name, 1, 8) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CAST(instr(p_type, 'O') AS BIGINT) AS o_pos
    FROM part WHERE p_partkey < 100
    """,
)
def b41_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """B40: string function pack."""
    p = load(spark, sf, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias(
            "brand_type"
        ),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "trimmed"
        ),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr(F.col("p_type"), "O").cast("bigint").alias("o_pos"),
    )


@query(
    "b42_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)
             AS days_since_epoch_start,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS epoch_s
    FROM orders WHERE o_orderkey < 200
    """,
)
def b42_datetime_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """B41: date/time function pack."""
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        d.cast("date").alias("order_day"),
        d.cast("timestamp").cast("long").alias("epoch_s"),
    )


@query(
    "b43_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_rounded,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_extendedprice - 50000.0) AS price_dev,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(l_extendedprice), 9) AS price_ln,
           round(pow(l_discount, 2), 9) AS disc_sq,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS key_mod,
           CAST(sign(l_extendedprice - 50000.0) AS DOUBLE) AS dev_sign
    FROM lineitem WHERE l_orderkey < 300
    """,
)
def b43_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """B42: math function pack (libm outputs rounded where the engines'
    last-ulp behavior could differ)."""
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 300)
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 1).alias("price_rounded"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(price - 50000.0).alias("price_dev"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.log(price), 9).alias("price_ln"),
        F.round(F.pow(F.col("l_discount"), 2), 9).alias("disc_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_mod"),
        F.signum(price - 50000.0).alias("dev_sign"),
    )


@query(
    "b44_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           array_to_string(list_transform(embedding[1:4],
                           x -> printf('%.7f', CAST(x AS DOUBLE) * 2)), ',')
             AS head_x2,
           round(CAST(embedding[1] AS DOUBLE), 7) AS first_val,
           array_to_string(list_sort(list_transform(embedding[1:4],
                           x -> printf('%.7f', CAST(x AS DOUBLE)))), ',')
             AS head_sorted,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           flatten([embedding[1:2], embedding[3:4]]) = embedding[1:4]
             AS flatten_roundtrip
    FROM embeddings WHERE vec_id < 50
    """,
)
def b44_array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """B43: array functions + higher-order functions over the embedding
    vectors (size, slice, transform, filter, sort, flatten). Array
    results are rendered to fixed-format CSV strings at the boundary
    (float32→double is exact and %.7f can't hit a decimal halfway case
    on dyadic inputs, so Spark and DuckDB render identical text; raw
    array cells would crash the driver's pandas comparator)."""
    e = load(spark, sf, "embeddings").filter(F.col("vec_id") < 50)
    emb = F.col("embedding")
    head = F.slice(emb, 1, 4)
    fmt = lambda c: F.format_string("%.7f", c)  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.concat_ws(
            ",", F.transform(head, lambda x: fmt(x.cast("double") * 2))
        ).alias("head_x2"),
        F.round(F.element_at(emb, 1).cast("double"), 7).alias("first_val"),
        F.concat_ws(
            ",",
            F.array_sort(F.transform(head, lambda x: fmt(x.cast("double")))),
        ).alias("head_sorted"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        (
            F.flatten(F.array(F.slice(emb, 1, 2), F.slice(emb, 3, 2)))
            == head
        ).alias("flatten_roundtrip"),
    )


@query(
    "b45_explode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE), 7) AS val
    FROM embeddings
    WHERE vec_id < 10
    """,
)
def b45_explode(spark: SparkSession, sf: str) -> DataFrame:
    """B43b: posexplode — unnest array to rows with ordinality."""
    e = load(spark, sf, "embeddings").filter(F.col("vec_id") < 10)
    ex = e.select("vec_id", F.posexplode("embedding").alias("pos0", "v"))
    return ex.select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round(F.col("v").cast("double"), 7).alias("val"),
    )


@query(
    "b46_map_funcs",
    oracle="""
    SELECT r_regionkey,
           'key,name' AS prop_keys,
           CAST(r_regionkey AS VARCHAR) AS key_val,
           r_name AS name_val,
           CAST(2 AS INT) AS n_entries
    FROM region
    """,
)
def b46_map_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """B44: map functions — build a map column, then read it back out via
    map_keys/element_at/size (scalar outputs only: map/array cells crash
    the driver's pandas comparator, so the key list is CSV-joined)."""
    r = load(spark, sf, "region")
    m = F.create_map(
        F.lit("key"),
        F.col("r_regionkey").cast("string"),
        F.lit("name"),
        F.col("r_name"),
    )
    return r.select(
        "r_regionkey",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("prop_keys"),
        F.element_at(m, "key").alias("key_val"),
        F.element_at(m, "name").alias("name_val"),
        F.size(m).alias("n_entries"),
    )


@query(
    "b47_json_funcs",
    oracle="""
    SELECT event_id,
           props->>'$.k' AS k_str,
           TRY_CAST(props->>'$.k' AS INT) AS k_int,
           CASE WHEN TRY_CAST(props->>'$.k' AS INT) IS NOT NULL
                THEN 1 ELSE 0 END AS valid,
           CASE WHEN TRY_CAST(props->>'$.k' AS INT) IS NOT NULL
                THEN to_json(struct_pack(
                       k := TRY_CAST(props->>'$.k' AS INT)))::VARCHAR
                ELSE '{}' END AS roundtrip
    FROM events WHERE event_id < 500
    """,
)
def b47_json_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """B45/A12: JSON-in-string operators over events.props — the
    reference's core JSON→typed conversion (/root/reference/src/bin/
    kafka-bench.rs:261-334) plus to_json round-trip. ``valid`` means
    "an integer k was extracted" on BOTH sides (json_valid would
    diverge on valid JSON without an int k), and the roundtrip is
    pinned to '{}' when k is absent (Spark's to_json drops null fields
    while DuckDB would emit {"k":null})."""
    ev = load(spark, sf, "events").filter(F.col("event_id") < 500)
    k_int = F.from_json(F.col("props"), "k INT").getField("k")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.when(k_int.isNotNull(), 1).otherwise(0).alias("valid"),
        F.to_json(F.struct(k_int.alias("k"))).alias("roundtrip"),
    )


@query(
    "b48_hash_funcs",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS name_sha256,
           md5(c_name) AS name_md5,
           CAST(length(md5(c_name)) AS INT) AS md5_len
    FROM customer WHERE c_custkey < 200
    """,
)
def b48_hash_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """B46: cryptographic hash functions (content addressing — the basis
    of exact dedup C1)."""
    c = load(spark, sf, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.col("c_name")).alias("name_md5"),
        F.length(F.md5(F.col("c_name"))).cast("int").alias("md5_len"),
    )


@query("b49_idgen")  # engine-native id generation → rows-only check
def b49_idgen(spark: SparkSession, sf: str) -> DataFrame:
    """B46b: id generation — monotonically_increasing_id + uuid are
    engine-native (partition-dependent), so rows-only."""
    r = load(spark, sf, "region")
    return r.select(
        "r_regionkey",
        F.monotonically_increasing_id().alias("mono_id"),
        F.length(F.expr("uuid()")).cast("int").alias("uuid_len"),
        F.crc32(F.col("r_name").cast("binary")).alias("name_crc32"),
        F.xxhash64(F.col("r_name")).alias("name_xxhash64"),
    )


@query(
    "b64_exact_percentile",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_transform(
             quantile_cont(l_extendedprice, [0.25, 0.5, 0.9, 0.99]),
             x -> CAST(x AS VARCHAR)), ',') AS pcts,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b64_exact_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """B27b: EXACT interpolated percentiles — Spark's `percentile`
    (full-sort-per-group exact quantiles) against DuckDB's
    `quantile_cont`; both interpolate linearly with the same double
    arithmetic, so the bits hash-match (verified) — unlike
    `percentile_approx` (b29, rows-only by design). Scale note: exact
    percentiles buffer each group's values — use where groups are
    bounded (here: 3 return flags); at unbounded cardinality the
    approx sketch (b29) is the 100 TB path. Array output serialized
    per the driver boundary rule."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.5, 0.9, 0.99))"
            ).alias("p"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            F.concat_ws(
                ",", F.transform("p", lambda x: x.cast("string"))
            ).alias("pcts"),
            "n",
        )
    )


# One ANSI string both engines execute verbatim — the point of B66.
_Q3_SQL = """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE)
             AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@query("b66_raw_sql", oracle=_Q3_SQL)
def b66_raw_sql(spark: SparkSession, sf: str) -> DataFrame:
    """B66: the raw-SQL interface — the reference delegates all querying
    to its bundled Spark SQL service (docker-compose.yml's
    spark-iceberg), so a switching user's FIRST expectation is to run
    their SQL strings unchanged. The test tables register as temp views
    and the EXACT oracle string executes on Spark — same text, two
    engines, hash-matched answers (TPC-H Q3 shape: segment-filtered
    3-way join, revenue agg, top-10). Catalyst applies the same
    pushdown/broadcast/top-k treatment SQL or DataFrame, since both
    lower to the same logical plan."""
    from iceberg_playground_spark.session import register_views

    register_views(spark, sf)
    return spark.sql(_Q3_SQL)
