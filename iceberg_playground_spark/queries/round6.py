"""Round-6 operators: recursive SQL, procedural-SQL surface, mergeable
sketches, temperature resampling.

- b111: WITH RECURSIVE (Spark 4's recursive CTE) — iterative queries a
  reference user previously needed a driver loop for (c24's pointer
  jumping is the DataFrame-API complement).
- b112: SQL-language UDFs + session variables — the CREATE FUNCTION /
  DECLARE VARIABLE surface of the bundled Spark SQL service
  (docker-compose.yml:58-81): logic shared across queries without
  leaving SQL or paying Python-UDF serialization.
- c34: HyperLogLog sketch aggregation — the MERGEABLE distinct-count
  path: per-partition sketches union hierarchically, so a 100 TB
  rollup reuses per-group sketches instead of rescanning (b23's
  approx_count_distinct computes one estimate and throws the state
  away).
- c35: temperature-based domain resampling (alpha=0.5) — the standard
  multilingual-mix move (upsample rare languages toward
  p_l^alpha/sum p^alpha) with deterministic per-doc replication, the
  up-sampling complement of p05's keep-rate rebalancing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import (
    bucket_sql,
    hash_bucket,
    int_ln_micro_col,
    int_ln_micro_cte_sql,
    lit_double_array,
    load,
)
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.session import register_views
from iceberg_playground_spark.tables import LakeCatalog


# ---------------------------------------------------------------------------
# b111 — recursive CTE (hierarchy walk)
# ---------------------------------------------------------------------------

# Same text, two engines (the b66 contract). The customer key space is
# dense from 0, so parent(k) = floor(k/10) defines a synthetic forest
# whose edges all EXIST in the table — the recursive term is a genuine
# join against customer, not key arithmetic alone. floor() (not a
# bare CAST) because double→int casts round half-even in DuckDB but
# truncate in Spark.
_RECURSIVE_SQL = """
    WITH RECURSIVE chain(start_key, cur_key, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      UNION ALL
      SELECT ch.start_key, p.c_custkey, ch.depth + 1
      FROM chain ch
      JOIN customer p ON p.c_custkey = CAST(floor(ch.cur_key / 10) AS BIGINT)
      WHERE ch.cur_key >= 10
    )
    SELECT start_key AS c_custkey,
           CAST(max(depth) AS INT) AS depth,
           CAST(max_by(cur_key, depth) AS BIGINT) AS root_key
    FROM chain
    GROUP BY start_key
    ORDER BY c_custkey
"""


@query("b111_recursive_cte", oracle=_RECURSIVE_SQL)
def b111_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    """B111: WITH RECURSIVE hierarchy walk, same-text-two-engines.
    Spark 4 executes recursive CTEs natively (UnionLoop): each
    superstep joins the previous frontier against customer on
    parent(k) = floor(k/10) until every chain bottoms out below 10,
    then an aggregate reports per-customer depth and root. The
    per-round dedup/join is distributed; only loop CONTROL sits on
    the driver — exactly c24's pointer-jumping contract, now in pure
    SQL (a reference user's hierarchical query needs no driver loop).

    Scale: rounds grow as log10(max_key) — 5 supersteps at 100 TB key
    spaces, each a broadcast-able join of the shrinking frontier
    against the dimension. Frontier rows leave the loop the moment
    their WHERE fails, so state never exceeds one frontier."""
    register_views(spark, sf)
    return spark.sql(_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# b112 — SQL-language UDFs + session variables
# ---------------------------------------------------------------------------

_SQLUDF_ORACLE = """
    SELECT l_returnflag, band,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(6,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM (
      SELECT l_returnflag, l_extendedprice, l_discount,
             CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity < 30 THEN 'mid'
                  ELSE 'high' END AS band
      FROM lineitem
      WHERE l_quantity <= 45
    ) t
    GROUP BY l_returnflag, band
    ORDER BY l_returnflag, band
"""


@query("b112_sql_udf", oracle=_SQLUDF_ORACLE)
def b112_sql_udf(spark: SparkSession, sf: str) -> DataFrame:
    """B112: SQL-language UDFs + session variables — the procedural
    surface of the reference's bundled SQL service. ``CREATE
    TEMPORARY FUNCTION ... RETURN <expr>`` (Spark 4 SQL UDFs) centers
    the money arithmetic and the quantity banding in ONE definition
    reused across queries, and ``DECLARE VARIABLE`` + ``SET VAR``
    parameterizes the quantity cutoff the way a dashboard user would.
    The oracle inlines both bodies — proving SQL UDFs are pure
    Catalyst inlining (the plan is identical to the handwritten
    expression; NO serialization boundary, unlike b55's Python UDF).

    Scale: zero cost by construction — after inlining this IS b27's
    filtered aggregate: pushed scan filter, partial+final hash agg."""
    register_views(spark, sf)
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(
               ep DOUBLE, disc DOUBLE) RETURNS DECIMAL(25,8)
           RETURN CAST(ep AS DECIMAL(18,4))
                  * CAST(1 - disc AS DECIMAL(6,4))"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE)
           RETURNS STRING
           RETURN CASE WHEN q < 10 THEN 'low'
                       WHEN q < 30 THEN 'mid'
                       ELSE 'high' END"""
    )
    spark.sql("DECLARE OR REPLACE VARIABLE qty_cutoff DOUBLE DEFAULT 50.0")
    spark.sql("SET VAR qty_cutoff = 45.0")
    return spark.sql(
        """
        SELECT l_returnflag, qty_band(l_quantity) AS band,
               CAST(CAST(sum(disc_price(l_extendedprice, l_discount))
                    AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_quantity <= qty_cutoff
        GROUP BY l_returnflag, qty_band(l_quantity)
        ORDER BY l_returnflag, band
        """
    )


# ---------------------------------------------------------------------------
# b113 — type-widening schema evolution
# ---------------------------------------------------------------------------


@query(
    "b113_widen_column",
    oracle="""
    SELECT n_nationkey AS id, CAST(n_regionkey AS BIGINT) AS qty,
           CAST(CAST(CAST(n_nationkey AS DOUBLE) * 0.5 AS FLOAT)
                AS DOUBLE) AS score,
           TRUE AS files_untouched, TRUE AS old_delete_still_masks
    FROM nation WHERE n_regionkey <> 2
    UNION ALL SELECT 900, 5000000000, 1.5e200, TRUE, TRUE
    """,
)
def b113_widen_column(spark: SparkSession, sf: str) -> DataFrame:
    """B113: type-widening schema evolution — Iceberg's legal primitive
    promotions (int→long, float→double), metadata-only. The sequence
    proves the hard interactions: an equality delete keyed on the
    still-narrow column lands first (its key file stores int32
    values), BOTH promotions follow (zero data files touched —
    files_untouched compares the file lists), then an append lands
    values only the wide types can hold (a 5-billion qty, a 1.5e200
    score). One HEAD read serves both generations: old files cast up
    per entry (each records its write-time DDL), the old delete still
    masks through the type change (the anti-join coerces its narrow
    keys), and `VERSION AS OF` replays the narrow schema. Completes
    the evolution triple: add (b74), rename (b105), widen (b113).

    Scale shape: the widen commit is KB-sized metadata; reads gain a
    per-entry cast inside the scan projection — free, and only on the
    generations written before the promotion."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "metrics_w", "id INT, qty INT, score FLOAT",
            drop_if_exists=True,
        )
        t.append(
            load(spark, sf, "nation").select(
                F.col("n_nationkey").cast("int").alias("id"),
                F.col("n_regionkey").cast("int").alias("qty"),
                (F.col("n_nationkey").cast("double") * 0.5)
                .cast("float")
                .alias("score"),
            )
        )
        t.delete_where("qty = 2", ["qty"])  # int32 keys, pre-widening
        before = t.current_version()
        t.widen_column("qty", "bigint")
        t.widen_column("score", "double")
        files_untouched = (
            t.snapshot(t.current_version())["data_files"]
            == t.snapshot(before)["data_files"]
        )
        t.append(
            spark.createDataFrame(
                [(900, 5_000_000_000, 1.5e200)],
                "id INT, qty BIGINT, score DOUBLE",
            )
        )
        masks = t.read().filter("qty = 2").count() == 0
        return t, files_untouched, masks

    t, files_untouched, masks = _built(spark, sf, "b113", build)
    return t.read().select(
        "id",
        "qty",
        "score",
        F.lit(files_untouched).alias("files_untouched"),
        F.lit(masks).alias("old_delete_still_masks"),
    )


# ---------------------------------------------------------------------------
# b114 — metadata-aligned DELETE
# ---------------------------------------------------------------------------


@query(
    "b114_metadata_delete",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price,
           TRUE AS status_drop_metadata_only,
           FALSE AS price_drop_metadata_only,
           TRUE AS no_delete_files_after_status_drop
    FROM orders
    WHERE o_orderstatus <> 'F'
      AND NOT (o_totalprice >= 0 AND o_totalprice <= 50000)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def b114_metadata_delete(spark: SparkSession, sf: str) -> DataFrame:
    """B114: metadata-aligned DELETE — Iceberg's delete planning. A
    predicate aligned to the partition layout (drop status 'F') removes
    WHOLE files from the snapshot by bounds alone: zero delete files
    written, zero data I/O, plan-summary metadata_only=True and the
    delete-file list still empty afterwards (both graded as flag
    columns). A misaligned predicate (a totalprice range crossing
    every file) degrades gracefully: boundary files stay live and ONE
    positional delete (b104's machinery) masks just their matching
    rows — metadata_only=False. The changelog recovers dropped-file
    rows by diffing live-file sets, so CDC consumers still see every
    deleted row.

    Scale shape: planning walks KB-sized manifest bounds (the
    retention DELETE on a 100 TB table touches no data); the residual
    scan opens only boundary files."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "orders_md",
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE",
            partition_by=["o_orderstatus"], drop_if_exists=True,
        )
        t.append(
            load(spark, sf, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
        )
        v1, s1 = t.delete_range("o_orderstatus", "F", "F")
        no_dfiles = len(t.snapshot(v1)["delete_files"]) == 0
        _, s2 = t.delete_range("o_totalprice", 0.0, 50000.0)
        status_meta = bool(s1["metadata_only"] and s1["files_dropped"] > 0)
        price_meta = bool(s2["metadata_only"])
        return t, status_meta, price_meta, no_dfiles

    t, status_meta, price_meta, no_dfiles = _built(spark, sf, "b114", build)
    return (
        t.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            "sum_price",
            F.lit(status_meta).alias("status_drop_metadata_only"),
            F.lit(price_meta).alias("price_drop_metadata_only"),
            F.lit(no_dfiles).alias("no_delete_files_after_status_drop"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# b115 — drop-column schema evolution
# ---------------------------------------------------------------------------


@query(
    "b115_drop_column",
    oracle="""
    SELECT n_nationkey, n_name, CAST(NULL AS INT) AS n_regionkey,
           TRUE AS files_untouched
    FROM nation WHERE n_regionkey <> 3
    UNION ALL SELECT 900, 'NEWLAND', NULL, TRUE
    UNION ALL SELECT 901, 'READDED', 7, TRUE
    """,
)
def b115_drop_column(spark: SparkSession, sf: str) -> DataFrame:
    """B115: DROP-column schema evolution, metadata-only — the last
    member of the evolution quadruple (add b74, rename b105, widen
    b113). The column renames in place to a hidden tombstone (the
    name-based stand-in for Iceberg's field-ID drop), so zero data
    files are touched (files_untouched compares file lists) and old
    snapshots replay the column. The sequence proves the hard parts:
    an equality delete KEYED ON the doomed column lands first and
    still masks after the drop (its keys translate to the tombstone,
    which stays materialized through assembly), and the same name is
    then RE-ADDED as a fresh field — pre-drop rows read NULL for it
    (their old values belong to the tombstone), exactly Iceberg's
    drop-then-add contract, while a post-re-add append carries real
    values.

    Scale shape: one KB-sized metadata commit; reads lose a column
    from the projection (scans get NARROWER, never wider)."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "nation_dc",
            "n_nationkey INT, n_name STRING, n_regionkey INT",
            drop_if_exists=True,
        )
        t.append(
            load(spark, sf, "nation").select(
                "n_nationkey", "n_name", "n_regionkey"
            )
        )
        t.delete_where("n_regionkey = 3", ["n_regionkey"])  # doomed key
        before = t.current_version()
        t.drop_column("n_regionkey")
        files_untouched = (
            t.snapshot(t.current_version())["data_files"]
            == t.snapshot(before)["data_files"]
        )
        t.append(
            spark.createDataFrame(
                [(900, "NEWLAND")], "n_nationkey INT, n_name STRING"
            )
        )
        t.add_column("n_regionkey", "int")  # fresh field, same name
        t.append(
            spark.createDataFrame(
                [(901, "READDED", 7)],
                "n_nationkey INT, n_name STRING, n_regionkey INT",
            )
        )
        return t, files_untouched

    t, files_untouched = _built(spark, sf, "b115", build)
    return t.read().select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.lit(files_untouched).alias("files_untouched"),
    )


# ---------------------------------------------------------------------------
# b116 — schema-drift ingestion (mergeSchema append)
# ---------------------------------------------------------------------------


@query(
    "b116_schema_drift",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN event_id % 3 <> 2 THEN 1 END) AS BIGINT)
             AS n_user,
           CAST(count(CASE WHEN event_id % 3 = 1 THEN 1 END) AS BIGINT)
             AS n_value,
           CAST(sum(CASE WHEN event_id % 3 = 1
                    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
             AS value_cents,
           CAST(count(DISTINCT CASE WHEN event_id % 3 = 2
                      THEN event_type END) AS BIGINT) AS n_types
    FROM events
    """,
)
def b116_schema_drift(spark: SparkSession, sf: str) -> DataFrame:
    """B116: schema-drift ingestion — ``append(df, merge_schema=True)``,
    the Iceberg mergeSchema/accept-any-schema write in ONE atomic
    commit (an ALTER is never visible without its data). Three
    producer generations land: the original narrow shape, a batch
    whose user_id arrives WIDER (int → bigint, auto-promoted) and
    which introduces a value column (auto-added), and a batch missing
    user_id entirely while introducing event_type (missing → NULL).
    One HEAD read serves all three; the aggregate counts exactly which
    generation carried which column. This is the reality of the
    reference's Kafka firehose (kafka-load-gen's AssetMessage grew
    fields over time — main.go:51-120): the pipeline keeps ingesting,
    the table evolves underneath, readers never break.

    Scale shape: the merged-DDL commit is the ordinary append commit;
    alignment is a map-side projection in the writer."""

    def build(tmp: str) -> LakeCatalog:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "drift", "event_id BIGINT, user_id INT",
            drop_if_exists=True,
        )
        ev = load(spark, sf, "events")
        t.append(
            ev.filter("event_id % 3 = 0").select(
                "event_id", F.col("user_id").cast("int").alias("user_id")
            )
        )
        t.append(  # wider user_id (promotes) + new value column (adds)
            ev.filter("event_id % 3 = 1").select(
                "event_id", "user_id", "value"
            ),
            merge_schema=True,
        )
        t.append(  # user_id missing (NULL) + new event_type column
            ev.filter("event_id % 3 = 2").select("event_id", "event_type"),
            merge_schema=True,
        )
        return t

    t = _built(spark, sf, "b116", build)
    return t.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("user_id").cast("bigint").alias("n_user"),
        F.count("value").cast("bigint").alias("n_value"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
        F.count_distinct("event_type").cast("bigint").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# b117 — XML decode (the third semi-structured face)
# ---------------------------------------------------------------------------


@query(
    "b117_xml_decode",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def b117_xml_decode(spark: SparkSession, sf: str) -> DataFrame:
    """B117: XML decode — Spark 4's native XML support closes the
    semi-structured trio next to JSON (b03/b47) and VARIANT (b100):
    a reference user fed XML feeds gets the same schema-directed
    decode contract as A12's JSON path. Events serialize to XML
    per-row (``format_string``) and parse back with ``from_xml``
    under an explicit schema; the aggregate proves lossless typed
    round-trip (Java's double→string→double is exact, so value cents
    match the source bit-for-bit). The file-source variant
    (``spark.read.format("xml")``) is pinned in tests.

    Scale shape: serialize + parse are narrow per-row JVM ops inside
    the scan stage; the aggregate is the usual tiny-key hash agg."""
    ev = load(spark, sf, "events")
    xml = ev.select(
        F.format_string(
            "<e><id>%s</id><ty>%s</ty><v>%s</v></e>",
            "event_id", "event_type", "value",
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml("x", "id BIGINT, ty STRING, v DOUBLE").alias("p")
    ).select("p.*")
    return (
        parsed.groupBy(F.col("ty").alias("event_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.expr("CAST(round(v * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("value_cents"),
            F.max("id").cast("bigint").alias("max_id"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# b118 — in-pass observed metrics
# ---------------------------------------------------------------------------


@query(
    "b118_observed_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_cents,
           CAST(count(CASE WHEN l_discount >= 0.05 THEN 1 END) AS BIGINT)
             AS n_discounted
    FROM lineitem
    """,
)
def b118_observed_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """B118: in-pass observability — ``df.observe`` (the Observation
    API) collects named aggregates DURING a query's own execution:
    the data-quality counters an ingest pipeline wants (row count,
    quantity mass, discounted-line count) cost ZERO extra scans,
    unlike a monitoring query that re-reads the table (the reference
    instruments its ingest stages the same way, with in-line timers —
    bench-kafka.rs:42-173; A14). The observed values are returned as
    a one-row DataFrame and hash-checked against a direct aggregate —
    proving the side-channel sees every row exactly once.

    Scale shape: observation metrics are accumulator-style partial
    aggregates merged on the driver; the observed pass itself here is
    a full materialization to the noop sink."""
    from pyspark.sql import Observation

    li = load(spark, sf, "lineitem")
    obs = Observation("ingest_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CAST(round(l_quantity * 100) AS BIGINT)")).alias(
            "qty_cents"
        ),
        F.count(F.when(F.col("l_discount") >= 0.05, 1)).alias(
            "n_discounted"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), int(m["qty_cents"]), int(m["n_discounted"]))],
        "n_rows BIGINT, qty_cents BIGINT, n_discounted BIGINT",
    )


# ---------------------------------------------------------------------------
# b119 — SQL pipe syntax
# ---------------------------------------------------------------------------

_PIPE_ORACLE = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS base_price
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND l_quantity >= 10
    GROUP BY l_returnflag
    HAVING count(*) > 10
    ORDER BY l_returnflag
"""


@query("b119_pipe_sql", oracle=_PIPE_ORACLE)
def b119_pipe_sql(spark: SparkSession, sf: str) -> DataFrame:
    """B119: SQL pipe syntax — Spark 4's ``|>`` operators express the
    same logical plan as nested SELECTs in data-flow order (the way
    an analyst reads it: source, filter, aggregate, filter again,
    order). The oracle is the classic GROUP BY/HAVING formulation —
    hash-matching proves pipes are pure surface syntax over the same
    Catalyst plan, with the filters still pushed into the scan.

    Scale shape: identical to b27's filtered aggregate after
    parsing; nothing new executes."""
    register_views(spark, sf)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
                 AND l_quantity >= 10
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_lines,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                          AS DOUBLE) AS base_price
           GROUP BY l_returnflag
        |> WHERE n_lines > 10
        |> SELECT l_returnflag, n_lines, base_price
        |> ORDER BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# b120 — parameterized SQL
# ---------------------------------------------------------------------------


@query(
    "b120_parameterized_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice >= 100000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def b120_parameterized_sql(spark: SparkSession, sf: str) -> DataFrame:
    """B120: parameterized SQL — named parameter markers
    (``:status``, ``:floor``) bound via ``spark.sql(query, args=…)``,
    the injection-safe templating a reference user's dashboards and
    services need (values bind as typed literals in the plan, never
    string-spliced — a status of ``'; DROP TABLE`` binds as data).
    The oracle inlines the same constants; hash-matching proves
    binding is semantically identical to literal text, including the
    pushed scan filters.

    Scale shape: parameters fold to literals before optimization —
    pushdown/pruning see exactly the literal plan."""
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE o_orderstatus = :status
          AND o_totalprice >= :floor
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"status": "O", "floor": 100000.0},
    )


# ---------------------------------------------------------------------------
# b121 — regression aggregates from exact integer moments
# ---------------------------------------------------------------------------

# Least-squares slope/intercept of extendedprice (cents) on quantity,
# per returnflag, from INTEGER moment sums: Sx, Sy, Sxy, Sxx are exact
# BIGINT aggregates (associative — shuffle-order-proof), and every
# value stays under 2^53 at bench scale, so the final double formula
# is a fixed sequence of exactly-representable operands in both
# engines. The native regr_slope/regr_intercept would accumulate
# DOUBLES whose partial-sum order varies per shuffle — never
# hash-matchable; the moment form is the deterministic equivalent.
_REGR_SQL = """
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_lines,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS slope_cents_per_qty,
           (CAST(sy AS DOUBLE)
             - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept_cents
    FROM (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
             sum(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
             sum(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS sxx
      FROM lineitem GROUP BY l_returnflag
    ) m
    ORDER BY l_returnflag
"""


@query("b121_regression_agg", oracle=_REGR_SQL)
def b121_regression_agg(spark: SparkSession, sf: str) -> DataFrame:
    """B121: regression aggregates (the regr_slope/regr_intercept
    family, SURVEY B28's statistical pack extended) — least-squares
    fit of line price on quantity per returnflag, computed from exact
    integer MOMENT sums rather than the native float-accumulating
    aggregates (whose partial-sum order varies per shuffle and can
    never hash-match). Same text, two engines.

    Scale shape: one partial+final integer hash agg — the cheapest
    possible statistics pass. At 1e12-row scale the cent moments
    outgrow 2^53 and the sums would move to DECIMAL with a scale-0
    rescale before the double cast (_util's boundary rule); the
    moment formulation itself is unchanged."""
    register_views(spark, sf)
    return spark.sql(_REGR_SQL)


# ---------------------------------------------------------------------------
# b122 — error-safe arithmetic under ANSI mode
# ---------------------------------------------------------------------------


@query(
    "b122_try_arithmetic",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(CASE WHEN l_tax = 0 THEN 1 END) AS BIGINT)
             AS n_div_null,
           CAST(sum(CASE WHEN l_tax = 0 THEN NULL
                    ELSE CAST(floor(l_extendedprice / l_tax) AS BIGINT)
                    END) AS BIGINT) AS ratio_floor_sum,
           CAST(count(TRY_CAST(CASE WHEN l_quantity < 10
                      THEN '#' || CAST(CAST(round(l_quantity) AS INT)
                                       AS VARCHAR)
                      ELSE CAST(CAST(round(l_quantity) AS INT)
                                AS VARCHAR) END AS INT)) AS BIGINT)
             AS n_cast_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def b122_try_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    """B122: error-safe arithmetic — this session runs Spark 4's
    DEFAULT ANSI mode, where a plain division by zero or bad cast
    ABORTS the query; ``try_divide``/``try_cast`` are the sanctioned
    per-row escape: NULL for the poisoned row, the query survives
    (the ingest reality: one malformed record must not kill a 100 TB
    pass — the same philosophy as A12's coerce-to-null rule for
    wrong-typed JSON fields). The oracle spells the same semantics
    with guards (CASE WHEN divisor=0 / TRY_CAST), hash-matching the
    NULL placement and the surviving values.

    Scale shape: per-row expressions inside the scan stage feeding a
    tiny-key aggregate; zero extra cost over the unguarded form."""
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(CASE WHEN try_divide(l_extendedprice, l_tax)
                          IS NULL THEN 1 END) AS BIGINT) AS n_div_null,
               CAST(sum(CAST(floor(try_divide(l_extendedprice, l_tax))
                             AS BIGINT)) AS BIGINT) AS ratio_floor_sum,
               CAST(count(try_cast(CASE WHEN l_quantity < 10
                          THEN '#' || CAST(CAST(round(l_quantity) AS INT)
                                           AS STRING)
                          ELSE CAST(CAST(round(l_quantity) AS INT)
                                    AS STRING) END AS INT)) AS BIGINT)
                 AS n_cast_ok
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# b123 — exact distinct via bitmap aggregation
# ---------------------------------------------------------------------------


@query(
    "b123_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def b123_bitmap_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """B123: EXACT distinct counting via bitmap aggregation — the
    third member of the distinct-count triangle: b22's
    count(distinct) shuffles every distinct VALUE, c34/b23's sketches
    are approximate; bitmaps are exact AND mergeable. Keys partition
    into 32k-bit buckets (``bitmap_bucket_number``), each bucket
    aggregates to a fixed 4 KB bitmap (``bitmap_construct_agg``), and
    counts sum — at 100 TB the shuffle moves only bucket bitmaps
    (|key-space|/32768 rows of 4 KB), never the values, and partial
    bitmaps OR together map-side. Hash-matched against the plain
    count(distinct).

    (The same bitmaps stored per partition would make the count
    incrementally maintainable — ``bitmap_or_agg`` merges them — the
    exact analogue of c34's sketch rollup.)"""
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(cnt) AS BIGINT) AS n_distinct_parts
        FROM (
          SELECT l_returnflag,
                 bitmap_count(bitmap_construct_agg(
                   bitmap_bit_position(l_partkey))) AS cnt
          FROM lineitem
          GROUP BY l_returnflag, bitmap_bucket_number(l_partkey)
        ) buckets
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# p15 — sequence packing with document span maps
# ---------------------------------------------------------------------------

_P15_CTX = 512
_P15_SHARDS = 8

_P15_ORACLE = f"""
    WITH t AS (
      SELECT lang, doc_id,
             CAST({bucket_sql('doc_id')} % {_P15_SHARDS} AS INT) AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    c AS (
      SELECT lang, shard, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev
      FROM t),
    s AS (
      SELECT lang, shard,
             CAST(floor(prev / {_P15_CTX}.0) AS BIGINT) AS pack_id,
             doc_id, n_tokens,
             CAST(prev - floor(prev / {_P15_CTX}.0) * {_P15_CTX}
                  AS BIGINT) AS start
      FROM c)
    SELECT lang, shard, pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(sum(CASE WHEN start + n_tokens > {_P15_CTX}
                    THEN start + n_tokens - {_P15_CTX} ELSE 0 END)
                AS BIGINT) AS spill_tokens,
           string_agg(CAST(doc_id AS VARCHAR)
                      || ':' || CAST(start AS VARCHAR)
                      || '+' || CAST(n_tokens AS VARCHAR),
                      ' ' ORDER BY doc_id) AS spans
    FROM s GROUP BY lang, shard, pack_id
    ORDER BY lang, shard, pack_id
"""


@query("p15_packing_spans", oracle=_P15_ORACLE)
def p15_packing_spans(spark: SparkSession, sf: str) -> DataFrame:
    """P15: sequence packing WITH span maps — c19 reports pack sizes;
    training additionally needs, per context window, exactly WHERE
    each document sits (the attention-mask boundaries that stop
    cross-document attention, and the spill amount when a doc crosses
    into the next window). Spans serialize as ``docid:start+len``,
    ordered NUMERICALLY by doc_id on both sides (Spark sorts
    struct(doc_id, span) arrays, the oracle ORDER BYs the int column) —
    a zero-pad-and-sort-lexicographically scheme silently diverges
    once doc_id outgrows the pad width.

    Scale shape: identical to c19 — ONE shuffle on the (lang, shard)
    window key (the hash shard bounds partitions under language
    skew), then per-row arithmetic; the span concat rides the SAME
    grouped exchange as the counts."""
    d = load(spark, sf, "documents")
    t = d.select(
        "lang",
        (hash_bucket(F.col("doc_id")) % _P15_SHARDS)
        .cast("int")
        .alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    s = c.select(
        "lang",
        "shard",
        F.floor(F.col("prev") / F.lit(float(_P15_CTX)))
        .cast("bigint")
        .alias("pack_id"),
        "doc_id",
        "n_tokens",
        (
            F.col("prev")
            - F.floor(F.col("prev") / F.lit(float(_P15_CTX)))
            * _P15_CTX
        )
        .cast("bigint")
        .alias("start"),
    )
    span = F.concat_ws(
        "",
        F.col("doc_id").cast("string"),
        F.lit(":"),
        F.col("start").cast("string"),
        F.lit("+"),
        F.col("n_tokens").cast("string"),
    )
    return (
        s.withColumn("span", span)
        .groupBy("lang", "shard", "pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.sum(
                F.greatest(
                    F.lit(0),
                    F.col("start") + F.col("n_tokens") - _P15_CTX,
                )
            )
            .cast("bigint")
            .alias("spill_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "span"))
                    ),
                    lambda x: x["span"],
                ),
            ).alias("spans"),
        )
        .orderBy("lang", "shard", "pack_id")
    )


# ---------------------------------------------------------------------------
# b124 — LOCF forward fill (ignore-nulls windows)
# ---------------------------------------------------------------------------

# Purchases carry a price, every other event reads the LAST purchase
# price carried forward (last-observation-carried-forward — the
# standard sensor/price-series densification). (ts, event_id) ordering
# makes ties deterministic; cents floor keeps the aggregate
# integer-exact. The ONLY divergence between the two texts is
# IGNORE NULLS placement: Spark takes it as a second argument
# (`last_value(x, true)`), DuckDB inside the parens per the standard.
_LOCF_BODY = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(carried) AS BIGINT) AS n_with_price,
           CAST(sum(CAST(floor(carried * 100) AS BIGINT)) AS BIGINT)
             AS carried_cents
    FROM (
      SELECT event_type,
             last_value({ignore_nulls}) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS carried
      FROM events
    ) filled
    GROUP BY event_type
    ORDER BY event_type
"""
_LOCF_CASE = "CASE WHEN event_type = 'purchase' THEN value END"
_LOCF_SQL_SPARK = _LOCF_BODY.format(ignore_nulls=_LOCF_CASE + ", true")
_LOCF_SQL_DUCK = _LOCF_BODY.format(ignore_nulls=_LOCF_CASE + " IGNORE NULLS")


@query("b124_locf_fill", oracle=_LOCF_SQL_DUCK)
def b124_locf_fill(spark: SparkSession, sf: str) -> DataFrame:
    """B124: forward fill (LOCF) via IGNORE NULLS windows — every
    event reads the latest purchase price at-or-before it, carried
    forward per user (the sparse→dense move for sensor readings,
    prices, config states; b80's gap fill densifies the TIME axis,
    this densifies the VALUE axis). ``last_value(... IGNORE NULLS)``
    with a running frame is the engine-native form — no self-join, no
    explode; events before a user's first purchase stay NULL and are
    counted. One shared text except IGNORE NULLS placement (Spark
    argument form vs the standard's in-parens form).

    Scale shape: one shuffle on user_id serves the window; the frame
    is running (state = one value), never a re-scan of history."""
    register_views(spark, sf)
    return spark.sql(_LOCF_SQL_SPARK)


# ---------------------------------------------------------------------------
# b125 — SCD2 point-in-time lookup
# ---------------------------------------------------------------------------

# Dimension: each purchase opens a price-band validity interval
# [ts, next purchase ts); facts (clicks/views) join the interval
# ACTIVE at their event time — the slowly-changing-dimension Type 2
# pattern every warehouse migration carries.
_SCD2_SQL = """
    WITH dim AS (
      SELECT user_id,
             CASE WHEN value < 30 THEN 'low'
                  WHEN value < 70 THEN 'mid'
                  ELSE 'high' END AS band,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'purchase'
    ),
    fact AS (
      SELECT user_id, ts FROM events
      WHERE event_type IN ('click', 'view')
    )
    SELECT d.band,
           CAST(count(*) AS BIGINT) AS n_facts,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users
    FROM fact f
    JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    GROUP BY d.band
    ORDER BY d.band
"""


@query("b125_scd2_lookup", oracle=_SCD2_SQL)
def b125_scd2_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """B125: slowly-changing-dimension (Type 2) point-in-time lookup —
    the dimension's validity intervals are BUILT with a lead() window
    (each purchase opens a price-band version, closed by the user's
    next purchase) and facts join the version active at their event
    time. The as-of join (b19) returns the latest row at-or-before t;
    SCD2 additionally enforces the interval's END, so late facts
    never bleed into a newer version. Same text, two engines.

    Scale shape: the interval predicate rides an EQUI join on user_id
    (one shuffle, sort-merge; never a cartesian) with the band check
    as join residual — per-user interval counts are purchase counts,
    so the residual is bounded. At 100 TB the dim side is the small
    relation and broadcasts."""
    register_views(spark, sf)
    return spark.sql(_SCD2_SQL)


# ---------------------------------------------------------------------------
# b126 — incremental aggregate maintenance over the changelog
# ---------------------------------------------------------------------------


@query(
    "b126_incremental_agg",
    oracle="""
    SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'X'
                ELSE o_orderstatus END AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                    * CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END)
                AS BIGINT) AS cents,
           TRUE AS matches_full_recompute
    FROM orders
    WHERE NOT (o_orderkey % 10 <> 0 AND o_orderstatus = 'P')
    GROUP BY status
    ORDER BY status
    """,
)
def b126_incremental_agg(spark: SparkSession, sf: str) -> DataFrame:
    """B126: incremental aggregate maintenance — a per-status
    (count, cents) aggregate table kept current by applying the CDC
    changelog's deltas (insert rows +, delete rows −) instead of
    re-aggregating the table: materialized-view maintenance, the
    consumption pattern b87's changelog exists FOR. The window covers
    an upsert (whose delete+insert pair MOVES mass between groups
    when the key's status changes) and a plain delete; the maintained
    result is asserted equal to a full recompute at HEAD
    (matches_full_recompute) and hash-checked against the oracle's
    closed-form prediction.

    Scale shape: the refresh reads ONLY the window's delta files and
    key-sized delete joins (changelog cost), then a |groups|-row
    outer-merge — at 100 TB a daily refresh touches the day's files,
    never the table. Deletions can empty a group (n → 0 drops the
    row), which a naive "add the new rows" refresh would miss."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "orders_ivm",
            "o_orderkey BIGINT, status STRING, cents BIGINT",
            drop_if_exists=True,
        )
        src = load(spark, sf, "orders").select(
            "o_orderkey",
            F.col("o_orderstatus").alias("status"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
        t.append(src)  # v1: the base the aggregate was built from
        t.upsert(  # v2: every %10 key re-lands as status X, doubled
            src.filter("o_orderkey % 10 = 0").select(
                "o_orderkey",
                F.lit("X").alias("status"),
                (F.col("cents") * 2).alias("cents"),
            ),
            ["o_orderkey"],
        )
        t.delete_where("status = 'P'", ["o_orderkey"])  # v3

        base = t.read(version=1).groupBy("status").agg(
            F.count("*").alias("n_orders"), F.sum("cents").alias("cents")
        )
        sign = F.when(F.col("change_type") == "insert", 1).otherwise(-1)
        delta = (
            t.changelog(1, 3)
            .groupBy("status")
            .agg(
                F.sum(sign).alias("dn"),
                F.sum(sign * F.col("cents")).alias("dcents"),
            )
        )
        maintained = (
            base.join(delta, "status", "full_outer")
            .select(
                "status",
                (F.coalesce("n_orders", F.lit(0))
                 + F.coalesce("dn", F.lit(0))).alias("n_orders"),
                (F.coalesce("cents", F.lit(0))
                 + F.coalesce("dcents", F.lit(0))).alias("cents"),
            )
            .filter(F.col("n_orders") > 0)
        )
        recompute = t.read().groupBy("status").agg(
            F.count("*").alias("n_orders"), F.sum("cents").alias("cents")
        )
        m_rows = sorted(map(tuple, maintained.collect()))
        r_rows = sorted(map(tuple, recompute.collect()))
        return t, m_rows, m_rows == r_rows

    _, m_rows, matches = _built(spark, sf, "b126", build)
    return spark.createDataFrame(
        [(s, n, c, matches) for s, n, c in m_rows],
        "status STRING, n_orders BIGINT, cents BIGINT, "
        "matches_full_recompute BOOLEAN",
    ).orderBy("status")


# ---------------------------------------------------------------------------
# b127 / b128 — analyst-ergonomics SQL surface
# ---------------------------------------------------------------------------

_GBA_SQL = """
    SELECT l_returnflag,
           CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(6,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) < DATE '1999-01-01'
    GROUP BY ALL
    ORDER BY ALL
"""


@query("b127_group_by_all", oracle=_GBA_SQL)
def b127_group_by_all(spark: SparkSession, sf: str) -> DataFrame:
    """B127: GROUP BY ALL / ORDER BY ALL — the analyst shorthand both
    modern engines converged on (every non-aggregate select item
    groups; every output column orders). Hash-matching the same text
    proves both engines infer the SAME grouping set — a silent
    divergence here would corrupt every dashboard using the shorthand.

    Scale shape: resolves at parse time to the explicit b21-family
    aggregate; nothing new executes."""
    register_views(spark, sf)
    return spark.sql(_GBA_SQL)


_LCA_SQL = """
    SELECT l_returnflag,
           CAST(CAST(sum(disc_price) AS DECIMAL(30,4)) AS DOUBLE)
             AS sum_disc_price,
           CAST(CAST(sum(charge) AS DECIMAL(30,6)) AS DOUBLE)
             AS sum_charge,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l_discount AS DECIMAL(6,4)) AS disc_price,
             disc_price
               * CAST(1 + CAST(l_tax AS DECIMAL(5,4)) AS DECIMAL(6,4))
               AS charge
      FROM lineitem
    ) t
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query("b128_lateral_alias", oracle=_LCA_SQL)
def b128_lateral_alias(spark: SparkSession, sf: str) -> DataFrame:
    """B128: lateral column aliases — ``charge`` is defined in terms
    of ``disc_price`` IN THE SAME select list (no repeated expression,
    no extra subquery level in the user's mental model); b21 writes
    the same arithmetic fully expanded. Hash-matching the same text
    proves both engines resolve the alias chain to identical decimal
    expressions, rounding rules included.

    Scale shape: aliases inline during analysis; the plan is b21's
    partial+final aggregate exactly."""
    register_views(spark, sf)
    return spark.sql(_LCA_SQL)


# ---------------------------------------------------------------------------
# p16 — dataset card
# ---------------------------------------------------------------------------

_SH_SQL_P16 = """list_distinct(list_transform(
      range(1, len(string_split(text, ' ')) - 1),
      i -> string_split(text, ' ')[i] || ' ' ||
           string_split(text, ' ')[i+1] || ' ' ||
           string_split(text, ' ')[i+2]))"""

_CARD_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN {bucket_sql('doc_id')} < 90 THEN 'train'
                  WHEN {bucket_sql('doc_id')} < 95 THEN 'val'
                  ELSE 'test' END AS split,
             md5(text) AS exact_key,
             list_aggregate(list_transform({_SH_SQL_P16},
                            x -> md5(x)), 'min') AS fp
      FROM documents
    )
    SELECT 'docs' AS metric, '__corpus__' AS scope,
           CAST(count(*) AS BIGINT) AS value FROM d
    UNION ALL
    SELECT 'langs', '__corpus__', CAST(count(DISTINCT lang) AS BIGINT)
    FROM d
    UNION ALL
    SELECT 'exact_dup_docs', '__corpus__',
           CAST(COALESCE(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM d GROUP BY exact_key) g
    WHERE n > 1
    UNION ALL
    SELECT 'fingerprint_dup_docs', '__corpus__',
           CAST(COALESCE(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM d GROUP BY fp) g WHERE n > 1
    UNION ALL
    SELECT 'docs', split, CAST(count(*) AS BIGINT) FROM d GROUP BY split
    UNION ALL
    SELECT 'chars', split, CAST(sum(n_chars) AS BIGINT)
    FROM d GROUP BY split
    UNION ALL
    SELECT 'docs', lang, CAST(count(*) AS BIGINT) FROM d GROUP BY lang
    ORDER BY metric, scope
"""


@query("p16_dataset_card", oracle=_CARD_ORACLE)
def p16_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    """P16: dataset card — the summary every shipped training corpus
    carries, as ONE long-format relation (metric, scope, value):
    corpus totals, language census, per-split (c17's hash split)
    doc/char budgets, and the duplicate mass at both dedup levels
    (exact content hash vs c14 fingerprints — the fingerprint number
    exceeding the exact one is the near-dup tail p13 histograms).
    All-integer values hash-match the oracle exactly.

    Scale shape: ONE text scan builds the enriched doc frame
    (lazily checkpointed so seven aggregates don't re-shingle);
    every aggregate is key-bounded (splits, langs, digest groups).
    On a cluster the checkpoint becomes a staging table and the card
    recomputes only on ingest (or maintains via b126's deltas)."""
    d = load(spark, sf, "documents")
    from iceberg_playground_spark.queries.llm import _shingles

    bucket = hash_bucket(F.col("doc_id"))
    enriched = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
        F.md5("text").alias("exact_key"),
        F.array_min(
            F.transform(_shingles(F.split("text", " ")), F.md5)
        ).alias("fp"),
    ).localCheckpoint(eager=False)

    def dup_mass(key: str):
        return (
            enriched.groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .agg(
                F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                .cast("bigint")
                .alias("value")
            )
        )

    parts = [
        enriched.agg(F.count("*").cast("bigint").alias("value")).select(
            F.lit("docs").alias("metric"),
            F.lit("__corpus__").alias("scope"),
            "value",
        ),
        enriched.agg(
            F.count_distinct("lang").cast("bigint").alias("value")
        ).select(
            F.lit("langs").alias("metric"),
            F.lit("__corpus__").alias("scope"),
            "value",
        ),
        dup_mass("exact_key").select(
            F.lit("exact_dup_docs").alias("metric"),
            F.lit("__corpus__").alias("scope"),
            "value",
        ),
        dup_mass("fp").select(
            F.lit("fingerprint_dup_docs").alias("metric"),
            F.lit("__corpus__").alias("scope"),
            "value",
        ),
        enriched.groupBy("split")
        .agg(F.count("*").cast("bigint").alias("value"))
        .select(
            F.lit("docs").alias("metric"),
            F.col("split").alias("scope"),
            "value",
        ),
        enriched.groupBy("split")
        .agg(F.sum("n_chars").cast("bigint").alias("value"))
        .select(
            F.lit("chars").alias("metric"),
            F.col("split").alias("scope"),
            "value",
        ),
        enriched.groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("value"))
        .select(
            F.lit("docs").alias("metric"),
            F.col("lang").alias("scope"),
            "value",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("metric", "scope")


# ---------------------------------------------------------------------------
# c36 — product quantization (the IVF+PQ vector-compression pair)
# ---------------------------------------------------------------------------

_PQ_SUB = 8       # subspaces (64 dims -> 8 x 8)
_PQ_DIM = 8
_PQ_K = 16        # centroids per subspace -> 4-bit codes, 8 B/vector
_PQ_ITERS = 2
_PQ_TOPK = 10


@query("c36_product_quantization")  # rows-only: centroid training is
# float averaging (shuffle-order bits) — the recall contract is pinned
# in tests instead.
def c36_product_quantization(spark: SparkSession, sf: str) -> DataFrame:
    """C36: product quantization — the vector-compression standard
    behind FAISS-style IVF+PQ indexes: each 64-dim embedding splits
    into 8 subvectors, each quantized to its subspace's nearest of 16
    trained centroids, so a vector stores as 8 four-bit codes (64x
    smaller than float32) and query distances come from a 8x16 lookup
    table (ADC) built ONCE per query — no float math per candidate.
    Completes the vector-scale set: c21 int8 scalar quantization
    (4x), c27 random projection (fewer dims), c36 codebooks (bytes).
    Training is k-means per subspace (deterministic md5-seeded init,
    2 Lloyd iterations) in the c24 pattern: DRIVER loops over
    supersteps, every heavy step is a distributed join/agg against
    KB-sized broadcast codebooks; update aggregates are bounded by
    8x16x8 keys regardless of corpus size. Output: the ADC top-10 for
    a fixed probe next to the exact top-10 with per-rank hit flags
    and the recall, plus the k-means inertia before/after training.

    Honest-fixture note: these embeddings are near-uniform random
    (measured intra-label 1.96 vs inter-label 2.00 mean d2 —
    distance concentration), so ADC recall beyond the self-hit is
    chance-level BY CONSTRUCTION of the data; the graded contract is
    what quantization must guarantee regardless of structure — the
    probe's own vector survives to rank 1, codebooks train (inertia
    strictly drops), codes spread across centroids. On clustered
    real embeddings the same plan's recall climbs with structure.

    Scale: encode is one scan against a broadcast codebook; search
    scans CODES (8 B/vector) with table lookups; at 100 TB the
    codebook trains on a sample and c11's IVF cells prune candidates
    before ADC — both compose with this plan unchanged."""
    emb = load(spark, sf, "embeddings")
    slices = F.array(
        *[
            F.slice("embedding", s * _PQ_DIM + 1, _PQ_DIM)
            for s in range(_PQ_SUB)
        ]
    )
    subvecs = emb.select(
        "vec_id", F.posexplode(slices).alias("s", "sub")
    ).localCheckpoint(eager=False)

    # deterministic seeds: the md5-bottom-16 vectors' subvectors
    seed_rows = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_PQ_K)
        .select("embedding")
        .collect()
    )
    centroids = [
        [
            [
                float(seed_rows[j]["embedding"][s * _PQ_DIM + d])
                for d in range(_PQ_DIM)
            ]
            for j in range(_PQ_K)
        ]
        for s in range(_PQ_SUB)
    ]

    def cent_df():
        return spark.createDataFrame(
            [
                (s, j, centroids[s][j])
                for s in range(_PQ_SUB)
                for j in range(_PQ_K)
            ],
            "s INT, j INT, cent ARRAY<DOUBLE>",
        )

    dist = F.aggregate(
        F.zip_with("sub", "cent", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def assign():
        return (
            subvecs.join(F.broadcast(cent_df()), "s")
            .withColumn("d2", dist)
            .groupBy("vec_id", "s")
            .agg(
                F.min_by("j", F.struct("d2", "j")).alias("code"),
                F.min("d2").alias("d2min"),
            )
        )

    def inertia(a) -> float:
        return a.agg(F.avg("d2min").alias("i")).collect()[0]["i"]

    inertia_init = inertia(assign())
    for _ in range(_PQ_ITERS):
        # Lloyd update: per-(subspace, code, dim) means — an aggregate
        # bounded by 8*16*8 keys however large the corpus
        upd = (
            assign()
            .join(subvecs, ["vec_id", "s"])
            .select("s", "code", F.posexplode("sub").alias("d", "x"))
            .groupBy("s", "code", "d")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        for r in upd:
            centroids[r["s"]][r["code"]][r["d"]] = float(r["m"])

    codes = assign().localCheckpoint(eager=False)
    inertia_final = inertia(codes)

    # probe = vector 0; ADC table built driver-side from the codebook
    q = emb.filter("vec_id = 0").select("embedding").collect()[0][
        "embedding"
    ]
    adc = [
        (
            s,
            j,
            sum(
                (float(q[s * _PQ_DIM + d]) - centroids[s][j][d]) ** 2
                for d in range(_PQ_DIM)
            ),
        )
        for s in range(_PQ_SUB)
        for j in range(_PQ_K)
    ]
    adc_df = spark.createDataFrame(adc, "s INT, code INT, qd DOUBLE")
    est = (
        codes.join(F.broadcast(adc_df), ["s", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd").alias("est_d2"))
        .orderBy("est_d2", "vec_id")
        .limit(_PQ_TOPK)
        .select("vec_id", "est_d2")
        .collect()
    )
    qlit = lit_double_array(q)
    exact = (
        emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding", qlit, lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
        .orderBy("d2", "vec_id")
        .limit(_PQ_TOPK)
        .collect()
    )
    exact_ids = [r["vec_id"] for r in exact]
    exact_set = set(exact_ids)
    hits = sum(1 for r in est if r["vec_id"] in exact_set)
    rows = [
        (
            rank + 1,
            int(est[rank]["vec_id"]),
            int(exact_ids[rank]),
            est[rank]["vec_id"] in exact_set,
            hits,
            int(inertia_init * 1e6),
            int(inertia_final * 1e6),
        )
        for rank in range(_PQ_TOPK)
    ]
    return spark.createDataFrame(
        rows,
        "rank INT, pq_pick BIGINT, exact_pick BIGINT, hit BOOLEAN, "
        "recall_hits_at_10 INT, inertia_init_micro BIGINT, "
        "inertia_final_micro BIGINT",
    )


# ---------------------------------------------------------------------------
# b129 — CTAS / RTAS
# ---------------------------------------------------------------------------


@query(
    "b129_ctas_rtas",
    oracle="""
    SELECT r_name, CAST(r_regionkey * r_regionkey AS BIGINT) AS key_sq,
           TRUE AS history_kept, TRUE AS old_schema_replays
    FROM region
    """,
)
def b129_ctas_rtas(spark: SparkSession, sf: str) -> DataFrame:
    """B129: CREATE TABLE AS SELECT + REPLACE TABLE AS SELECT — the
    table-from-query lifecycle a SQL user runs daily. CTAS derives
    the schema from the query and lands creation + first snapshot
    together; RTAS swaps content AND schema in ONE atomic commit
    while KEEPING history (the old version still reads under its own
    schema — history_kept / old_schema_replays are computed, not
    assumed), which is what separates Iceberg's REPLACE TABLE from a
    drop-and-recreate that orphans every snapshot. The changelog
    renders the swap as full-delete + full-insert (pinned in tests),
    so CDC consumers see data change, never a table identity change.

    Scale shape: CTAS is an ordinary parallel append; RTAS is one
    replace commit (the compaction machinery) — metadata swap plus
    the new content's write, nothing rewritten twice."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        region = load(spark, sf, "region")
        t = cat.create_table_as(
            "demo", "ctas_t",
            region.select(
                "r_regionkey", "r_name",
                F.length("r_name").cast("int").alias("name_len"),
            ),
            drop_if_exists=True,
        )
        v1 = t.current_version()
        t.replace_as(
            region.select(
                "r_name",
                (F.col("r_regionkey") * F.col("r_regionkey"))
                .cast("bigint")
                .alias("key_sq"),
            )
        )
        old = t.read(version=v1)
        history_kept = old.count() == 5
        old_schema = old.columns == ["r_regionkey", "r_name", "name_len"]
        return t, history_kept, old_schema

    t, history_kept, old_schema = _built(spark, sf, "b129", build)
    return t.read().select(
        "r_name",
        "key_sq",
        F.lit(history_kept).alias("history_kept"),
        F.lit(old_schema).alias("old_schema_replays"),
    )


# ---------------------------------------------------------------------------
# b130 / b131 — join hints and cached scans
# ---------------------------------------------------------------------------

_HINTS_ORACLE = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("b130_join_hints", oracle=_HINTS_ORACLE)
def b130_join_hints(spark: SparkSession, sf: str) -> DataFrame:
    """B130: join strategy hints — the tuning surface users reach for
    when statistics mislead the optimizer: ``/*+ SHUFFLE_MERGE */``
    here forces a sort-merge join where AQE would otherwise pick a
    broadcast (orders is under the threshold at test scale). The
    oracle is the UNHINTED query — a hint must never change rows,
    only the physical strategy (strategy change is pinned in tests,
    row-identity is the hash-match). The other hints (BROADCAST,
    SHUFFLE_HASH, SHUFFLE_REPLICATE_NL, REBALANCE) ride the same
    grammar; tests pin BROADCAST and SHUFFLE_HASH too.

    Scale shape: at 100 TB this is exactly the knob that matters —
    a mis-broadcast OOMs every executor; the hint pins the safe
    strategy while the fix lands."""
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT /*+ SHUFFLE_MERGE(orders) */ o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "b131_cached_scan",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_qty,
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_discount >= 0.05) AS BIGINT) AS n_discounted
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def b131_cached_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B131: cached relations — ``df.cache()`` materializes the scan
    into Spark's columnar in-memory store so EVERY consumer reads the
    cache instead of re-scanning parquet (the interactive-notebook
    workflow of the reference's bundled Jupyter service,
    docker-compose.yml:58-66). Two aggregates consume the same cached
    frame; results hash-match the uncached oracle (a cache must never
    change values) and the plan's InMemoryTableScan is pinned in
    tests. The cache is released before returning — a graded query
    must not leak executor memory into the rest of the run.

    Scale shape: caching trades memory for scan elimination —
    worth it for a hot dimension or an iterated working set, never
    for a single-pass 100 TB fact (storage-level spill makes it
    disk-bound re-reads); the Iceberg-side equivalent for cold data
    is b61's metadata skipping, which costs no memory."""
    li = load(spark, sf, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount"
    )
    li = li.cache()
    try:
        n_disc = li.filter(F.col("l_discount") >= 0.05).count()
        out = (
            li.groupBy("l_returnflag")
            .agg(
                F.count("*").cast("bigint").alias("n_lines"),
                F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .withColumn("n_discounted", F.lit(n_disc).cast("bigint"))
            .orderBy("l_returnflag")
        )
        # materialize while the cache is alive; the returned frame is
        # a literal result (the driver re-executes collect on it).
        # SIZE GUARD: this collect-and-rebuild is legitimate ONLY
        # because `out` is a |returnflag|-row AGGREGATE (bounded by
        # the group-key cardinality, not the corpus) — never copy
        # this pattern onto a non-aggregated frame, where it becomes
        # a driver-side materialization of the whole relation.
        rows = out.collect()
    finally:
        li.unpersist()
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# c37 — bigram-LM quality scoring
# ---------------------------------------------------------------------------

# c37's model-row ln((c+1)/(pcnt+v)) is an exact integer ratio — the
# integer kernel evaluates it identically in both engines (round 13).
_C37_LN_CHAIN = int_ln_micro_cte_sql(
    "modelin", "lang, pair", "microlog", prefix="_c37"
)

_C37_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
    ),
    pairs AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(ts)),
                    i -> ts[i] || ' ' || ts[i+1])) AS pair
      FROM tok
    ),
    pc AS (SELECT lang, pair, count(*) AS c FROM pairs GROUP BY 1, 2),
    prevc AS (
      SELECT lang, split_part(pair, ' ', 1) AS prev, count(*) AS pcnt
      FROM pairs GROUP BY 1, 2
    ),
    vocab AS (
      SELECT lang, count(DISTINCT t) AS v
      FROM (SELECT lang, unnest(ts) AS t FROM tok) u GROUP BY 1
    ),
    modelin AS MATERIALIZED (
      SELECT pc.lang, pc.pair,
             CAST(prevc.pcnt + vocab.v AS BIGINT) AS num,
             CAST(pc.c + 1 AS BIGINT) AS den
      FROM pc
      JOIN prevc ON pc.lang = prevc.lang
                AND split_part(pc.pair, ' ', 1) = prevc.prev
      JOIN vocab ON pc.lang = vocab.lang
    ),
    {_C37_LN_CHAIN},
    model AS (SELECT lang, pair, microlog FROM _c37_fin)
    SELECT p.doc_id, p.lang,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(m.microlog) AS DOUBLE)
                 / (count(*) * 1000000.0), 4) AS avg_logprob
    FROM pairs p
    JOIN model m ON p.lang = m.lang AND p.pair = m.pair
    GROUP BY p.doc_id, p.lang
"""


@query("c37_bigram_lm_score", oracle=_C37_ORACLE)
def c37_bigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """C37: bigram-LM quality scoring — c23's unigram scorer upgraded
    to CONTEXT: each document scores by its mean conditional
    log-probability ln P(w|prev) under an add-one-smoothed per-language
    bigram model (the word-salad failure mode c23 cannot see —
    plausible tokens in implausible ORDER — scores low here). Same
    determinism discipline as c23: every probability is a ratio of
    integers, each contribution rounds to an integer microlog (ulp
    noise absorbed), per-doc sums are associative, one division at
    the boundary.

    Scale shape: bigrams build as zip-of-shifted-slices (O(tokens)
    per doc, c32's machinery); the pair stream is computed once
    (lazy checkpoint) and feeds training aggregates AND the scoring
    join; the model is |lang|x|vocab|^2-bounded → broadcast, so
    scoring adds no corpus-sized shuffle beyond the final doc agg."""
    d = load(spark, sf, "documents")
    ts = F.split("text", " ")
    n = F.size(ts)
    z = F.arrays_zip(
        F.slice(ts, 1, n - 1).alias("a"), F.slice(ts, 2, n - 1).alias("b")
    )
    pair_arr = F.transform(z, lambda s: F.concat_ws(" ", s["a"], s["b"]))
    pairs = (
        d.select("doc_id", "lang", F.explode(pair_arr).alias("pair"))
        .localCheckpoint(eager=False)
    )
    pc = pairs.groupBy("lang", "pair").agg(F.count("*").alias("c"))
    prevc = (
        pairs.select(
            "lang", F.split("pair", " ").getItem(0).alias("prev")
        )
        .groupBy("lang", "prev")
        .agg(F.count("*").alias("pcnt"))
    )
    vocab = (
        d.select("lang", F.explode(ts).alias("t"))
        .groupBy("lang")
        .agg(F.count_distinct("t").alias("v"))
    )
    model_in = (
        pc.withColumn("prev", F.split("pair", " ").getItem(0))
        .join(prevc, ["lang", "prev"])
        .join(vocab, "lang")
        .select(
            "lang",
            "pair",
            (F.col("pcnt") + F.col("v")).cast("bigint").alias("num"),
            (F.col("c") + 1).cast("bigint").alias("den"),
        )
    )
    # ln((c+1)/(pcnt+v)) through the integer kernel (round 13)
    model = int_ln_micro_col(model_in, "num", "den", "microlog").select(
        "lang", "pair", "microlog"
    )
    return (
        pairs.join(F.broadcast(model), ["lang", "pair"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum("microlog").cast("double")
                / (F.count("*") * F.lit(1000000.0)),
                4,
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# c34 — mergeable HLL sketch rollup
# ---------------------------------------------------------------------------


@query("c34_hll_rollup")  # rows-only: DataSketches estimates are
# engine-native (DuckDB's HLL differs); tests bound the relative error
# against exact counts instead.
def c34_hll_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """C34: mergeable distinct-count sketches — per-language HLL
    sketches over the 3-gram shingle stream, UNIONED into a
    corpus-level estimate without rescanning. b23's
    approx_count_distinct yields one number and discards its state;
    ``hll_sketch_agg`` keeps the sketch as a value, so rollups
    compose: per-(shard, lang) sketches at 100 TB merge to per-lang,
    then to global, each level KB-sized — the cardinality analogue of
    b61's reusable per-file stats. Shingles, not tokens: the corpus
    vocabulary is ~31 words (llm._shingles' rationale), so token
    cardinality is below HLL resolution; 3-gram cardinality is in the
    thousands, where estimation is real. Both estimates ship next to
    exact countDistinct at test scale so the error is measurable
    (tests pin <5%).

    Scale: the explode feeds a partial hll_sketch_agg BEFORE the
    exchange — only |langs| sketch buffers shuffle, never shingles.
    The union agg moves |langs| KB-sized buffers to one reducer."""
    from iceberg_playground_spark.queries.llm import _shingles

    docs = load(spark, sf, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            _shingles(F.split(F.lower("text"), r"\s+"))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    per_lang = toks.groupBy("lang").agg(
        F.hll_sketch_agg("tok").alias("sk"),
        F.count_distinct("tok").alias("exact_distinct"),
    )
    lang_rows = per_lang.select(
        "lang",
        F.hll_sketch_estimate("sk").alias("est_distinct"),
        "exact_distinct",
    )
    # Corpus level: union the per-lang sketches (shared tokens across
    # languages dedupe inside the sketch — a plain sum of per-lang
    # counts could not), exact value from one distinct over tokens.
    global_est = per_lang.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct")
    )
    global_exact = toks.agg(
        F.count_distinct("tok").alias("exact_distinct")
    )
    global_row = global_est.crossJoin(global_exact).select(
        F.lit("__ALL__").alias("lang"), "est_distinct", "exact_distinct"
    )
    return lang_rows.unionByName(global_row).orderBy("lang")


# ---------------------------------------------------------------------------
# c35 — temperature-based domain resampling
# ---------------------------------------------------------------------------

_TEMP_MIX_ORACLE = f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_in,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000)
                  AS BIGINT) AS micro
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n_in) AS BIGINT) AS n_total,
             CAST(sum(micro) AS BIGINT) AS micro_total
      FROM counts
    ), rates AS (
      SELECT lang, n_in,
             CAST(floor(CAST(n_total AS DOUBLE) * CAST(micro AS DOUBLE)
                   / CAST(micro_total AS DOUBLE) / CAST(n_in AS DOUBLE))
                  AS BIGINT) AS rep_floor,
             CAST(floor((CAST(n_total AS DOUBLE) * CAST(micro AS DOUBLE)
                   / CAST(micro_total AS DOUBLE) / CAST(n_in AS DOUBLE)
                   - floor(CAST(n_total AS DOUBLE) * CAST(micro AS DOUBLE)
                     / CAST(micro_total AS DOUBLE) / CAST(n_in AS DOUBLE)))
                  * 100) AS BIGINT) AS extra_pct
      FROM counts, tot
    ), assigned AS (
      SELECT d.lang, d.n_chars, r.n_in, r.rep_floor, r.extra_pct,
             r.rep_floor
               + CASE WHEN {bucket_sql('d.doc_id')} < r.extra_pct
                      THEN 1 ELSE 0 END AS rep
      FROM documents d JOIN rates r ON d.lang = r.lang
    ), replicas AS (
      SELECT lang, n_chars, n_in, rep_floor, extra_pct,
             unnest(generate_series(1, rep)) AS copy_i
      FROM assigned WHERE rep >= 1
    )
    SELECT lang,
           max(n_in) AS n_in,
           CAST(count(*) AS BIGINT) AS n_out,
           CAST(sum(n_chars) AS BIGINT) AS chars_out,
           max(rep_floor) AS rep_floor,
           max(extra_pct) AS extra_pct
    FROM replicas
    GROUP BY lang
    ORDER BY lang
"""


@query("c35_temperature_mix", oracle=_TEMP_MIX_ORACLE)
def c35_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """C35: temperature-based language resampling (alpha = 0.5) — the
    standard multilingual training mix: target share of language l is
    n_l^0.5 / sum_m n_m^0.5, so rare languages UP-sample (replicated
    docs) and dominant ones down-sample, with the corpus size
    preserved. Replication is deterministic: every doc gets
    floor(rate) copies plus one more iff its md5 bucket (_util's
    engine-neutral stamp — the same stamp c17/c18/p05 sample by)
    falls under the percent-quantized fractional part, so re-runs and
    retries replicate the SAME docs (c17's reproducibility property,
    extended from keep/drop to copy counts). Per-language sqrt sums
    run in integer micro units — a double SUM over langs would be
    shuffle-order-dependent.

    Scale: two tiny aggregates (|langs| rows) broadcast back; the
    corpus is scanned once, replica fan-out is map-side explode with
    rate bounded by sqrt skew (never data-sized), and the report agg
    is the only corpus-wide shuffle. The up-sampled output feeds
    p10's deterministic shuffle unchanged."""
    docs = load(spark, sf, "documents")
    counts = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_in"),
        F.floor(F.sqrt(F.count("*").cast("double")) * 1000000)
        .cast("bigint")
        .alias("micro"),
    )
    tot = counts.agg(
        F.sum("n_in").cast("bigint").alias("n_total"),
        F.sum("micro").cast("bigint").alias("micro_total"),
    )
    rate = (
        F.col("n_total").cast("double")
        * F.col("micro").cast("double")
        / F.col("micro_total").cast("double")
        / F.col("n_in").cast("double")
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_in",
            F.floor(rate).cast("bigint").alias("rep_floor"),
            F.floor((rate - F.floor(rate)) * 100)
            .cast("bigint")
            .alias("extra_pct"),
        )
    )
    assigned = docs.join(F.broadcast(rates), "lang").withColumn(
        "rep",
        F.col("rep_floor")
        + F.when(
            hash_bucket(F.col("doc_id")) < F.col("extra_pct"), 1
        ).otherwise(0),
    )
    replicas = assigned.filter(F.col("rep") >= 1).select(
        "lang",
        "n_chars",
        "n_in",
        "rep_floor",
        "extra_pct",
        F.explode(F.sequence(F.lit(1), F.col("rep"))).alias("copy_i"),
    )
    return (
        replicas.groupBy("lang")
        .agg(
            F.max("n_in").alias("n_in"),
            F.count("*").cast("bigint").alias("n_out"),
            F.sum("n_chars").cast("bigint").alias("chars_out"),
            F.max("rep_floor").alias("rep_floor"),
            F.max("extra_pct").alias("extra_pct"),
        )
        .orderBy("lang")
    )
