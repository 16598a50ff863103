"""Lakehouse metadata introspection — Iceberg's metadata tables.

Iceberg exposes the snapshot log as queryable relations
(``SELECT * FROM t.snapshots`` / ``t.files`` — the surface an operator
of the reference's pipeline uses to watch the committer work, e.g. to
confirm decouple.rs's 5 s cadence actually coalesced 20,000 files into
dozens of snapshots). ``tables.py`` records the same facts in its
snapshot JSON; this module surfaces them as a registered query.

Also here, as the round-4 past-budget block: the compaction rollup
(b82), the Python Data Source queries (b83 batch, b84 streaming —
`pysource.py`), random-projection embedding compression (c27), and the
wide-asset-message pipeline over the load generator (b85).

Round-4 history: this block registered past the driver's 50-entry
grading budget (the round-4 prefix was exactly full) and so was never
driver-graded that round. Grading order has been pinned by explicit registry lists since
round 5; this module's queries were driver-graded green in round 6
(CORRECTNESS_r06), each with full hash-match oracles (b85 rows-only
by design) and local-suite coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.tables import LakeCatalog, LakeTable


@query(
    "b79_snapshot_metadata",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'append',  1, 0, 0),
      (2, 'append',  2, 0, 1),
      (3, 'delete',  2, 1, 2),
      (4, 'compact', 1, 0, 3)
    ) AS t(version, operation, n_data_sets, n_delete_files, parent)
    """,
)
def b79_snapshot_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """B79: the snapshot log as a relation (Iceberg's ``t.snapshots``
    metadata table). A deterministic op sequence — append, append,
    equality delete, compact — then one row per snapshot: operation,
    committed data-SET count (append dirs, invariant under write
    parallelism), live delete-file count, parent version. The compact
    row proves rewrite semantics in metadata alone: one replacing set,
    deletes folded in (zero remain).

    Scale note: this reads ONLY the snapshot JSON — KB of metadata, no
    data file is opened. That is the point of metadata tables at 100 TB:
    answering "how many live files / what did the last commit do" must
    never scan the lake. The tiny result is built driver-side from the
    committed log exactly like Iceberg serves its metadata relations
    from manifests."""

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "region_meta", "r_regionkey INT, r_name STRING",
            drop_if_exists=True,
        )
        r = load(spark, sf, "region").select("r_regionkey", "r_name")
        t.append(r)
        t.append(r.filter("r_regionkey < 2"))
        t.delete_where("r_regionkey = 0", ["r_regionkey"])
        t.compact(target_files=2)
        return t

    t = _built(spark, sf, "b79", build)
    return t.snapshots()


@query(
    "b82_compaction_rollup",
    oracle="""
    SELECT * FROM (VALUES
      ('pre-compact',  8, 1, CAST(0 AS BIGINT)),
      ('post-compact', 1, 0, CAST(0 AS BIGINT))
    ) AS t(phase, n_data_sets, n_delete_files, row_drift)
    """,
)
def b82_compaction_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """B82: small-file compaction, graded end-to-end — the maintenance
    the reference's fast-append-only pipeline defers forever (20,000
    data files per decouple run, decouple.rs:25-28, and nothing ever
    merges them). Eight writer flushes land through the 5 s-cadence
    BatchedCommitter as snapshots of small sets, one delete masks a
    slice, then rewrite_data_files-style compaction collapses the MoR
    view to ONE set with ZERO live delete files. ``row_drift`` proves
    rows are conserved: count(view before) - count(view after) == 0 —
    compaction must never lose or invent a row.

    Metadata assertions (set counts) are parallelism-invariant; row
    parity is computed by Spark aggregates over the live table (lazy;
    the subtraction happens in the returned plan, not the driver)."""
    from iceberg_playground_spark.tables import BatchedCommitter

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "orders_sf", "o_orderkey BIGINT, o_totalprice DOUBLE",
            drop_if_exists=True,
        )
        o = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
        committer = BatchedCommitter(t, interval_s=0.0)  # flush every add
        for b in range(8):  # 8 writer flushes -> 8 small sets
            committer.add(t.stage_append(o.filter(F.pmod("o_orderkey", F.lit(8)) == b)))
        committer.flush()
        t.delete_where("o_orderkey % 100 = 0", ["o_orderkey"])
        pre_version = t.current_version()
        pre_sets = len(t.snapshot(pre_version)["data_files"])
        pre_dels = len(t.snapshot(pre_version)["delete_files"])
        t.compact(target_files=4)
        return t, pre_version, pre_sets, pre_dels

    t, pre_v, pre_sets, pre_dels = _built(spark, sf, "b82", build)
    cur = t.snapshot(t.current_version())
    post = spark.createDataFrame(
        [
            ("pre-compact", pre_sets, pre_dels),
            ("post-compact", len(cur["data_files"]), len(cur["delete_files"])),
        ],
        "phase STRING, n_data_sets INT, n_delete_files INT",
    )
    drift = (
        t.read(version=pre_v).agg(F.count("*").alias("n"))
        .crossJoin(t.read().agg(F.count("*").alias("m")))
        .select((F.col("n") - F.col("m")).alias("row_drift"))
    )
    return post.crossJoin(F.broadcast(drift))


_GEN_ROWS = 10_000


def _register_assetgen(spark: SparkSession) -> None:
    """Register the ``assetgen`` Python data source once per session.

    Registration failures PROPAGATE: a blanket ``except: pass`` here
    would also swallow genuine failures (missing Data Source API, a
    bad source class), deferring them to a confusing
    DATA_SOURCE_NOT_FOUND at read time. Only the benign
    already-registered duplicate is tolerated, and a session-scoped
    flag makes the common re-invocation path not even re-register."""
    if getattr(spark, "_assetgen_registered", False):
        return
    from iceberg_playground_spark.pysource import build_assetgen_source

    try:
        spark.dataSource.register(build_assetgen_source())
    except Exception as e:
        if "already" not in str(e).lower():
            raise
    spark._assetgen_registered = True


@query(
    "b83_python_datasource",
    oracle=f"""
    WITH g AS (
      SELECT i,
             CAST('0x' || substring(md5('u' || CAST(i AS VARCHAR)), 1, 8)
                  AS BIGINT) % 1000 AS user_id,
             CAST('0x' || substring(md5('c' || CAST(i AS VARCHAR)), 1, 8)
                  AS BIGINT) % 5 AS cat_i,
             CAST('0x' || substring(md5('a' || CAST(i AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100000 AS amount_cents
      FROM range(0, {_GEN_ROWS}) t(i))
    SELECT ['compute','storage','network','identity','edge'][cat_i + 1]
             AS category,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(amount_cents) AS BIGINT) AS total_cents,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM g GROUP BY category
    """,
)
def b83_python_datasource(spark: SparkSession, sf: str) -> DataFrame:
    """B83/A15: synthetic load as a first-class SOURCE — Spark 4's
    Python Data Source API replaces the reference's external Go
    generator binary (kafka-load-gen/main.go:317-399). The ``assetgen``
    format generates one InputPartition per topic-partition analogue,
    ON the executors (the A15 worker fleet is Spark's own task
    parallelism), with every field a pure function of the row id —
    reproducible across runs, retries, and engines, which is what lets
    DuckDB mirror the generator arithmetically and hash-match the
    aggregate. sf-independent by design (the generator IS the data)."""
    _register_assetgen(spark)
    g = (
        spark.read.format("assetgen")
        .option("rows", _GEN_ROWS)
        .option("partitions", 10)
        .load()
    )
    return g.groupBy("category").agg(
        F.count("*").alias("n"),
        F.sum("amount_cents").cast("bigint").alias("total_cents"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


@query(
    "b84_streaming_datasource",
    oracle=f"""
    WITH g AS (
      SELECT i,
             CAST('0x' || substring(md5('c' || CAST(i AS VARCHAR)), 1, 8)
                  AS BIGINT) % 5 AS cat_i,
             CAST('0x' || substring(md5('a' || CAST(i AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100000 AS amount_cents
      FROM range(0, {_GEN_ROWS}) t(i))
    SELECT ['compute','storage','network','identity','edge'][cat_i + 1]
             AS category,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(amount_cents) AS BIGINT) AS total_cents
    FROM g GROUP BY category
    """,
)
def b84_streaming_datasource(spark: SparkSession, sf: str) -> DataFrame:
    """B84/A9': the generator as a custom STREAMING source — Spark 4's
    DataSourceStreamReader. Offsets are checkpointed row counts (the
    exactly-once contract the reference's consumer gets from committed
    Kafka offsets); ``availableNow`` drains the bounded run in one
    epoch; generation still executes partition-parallel on executors.
    With the file-stream stand-ins (b68-b54) this completes the source
    triangle: built-in file stream, env-gated Kafka, and a custom
    Python source, all feeding the same engine. Aggregate hash-matches
    the arithmetic mirror (b83's oracle minus the user dimension)."""
    from iceberg_playground_spark.queries.streaming import _run_to_memory

    _register_assetgen(spark)
    g = (
        spark.readStream.format("assetgen")
        .option("rows", _GEN_ROWS)
        .option("partitions", 10)
        .load()
    )
    agg = g.groupBy("category").agg(
        F.count("*").alias("n"),
        F.sum("amount_cents").cast("bigint").alias("total_cents"),
    )
    return _run_to_memory(agg, mode="complete")


# ---------------------------------------------------------------------------
# c27 — random-projection embedding compression (Layer C continuation)
# ---------------------------------------------------------------------------

# Deterministic ±1 sign matrix (16 output dims × 64 input dims), derived
# from md5 in PYTHON once and embedded as a literal in BOTH engines'
# expressions — the engines never have to agree on a hash, only on
# float multiply-add over identical literals (sequential fold, the c03
# dot-product rule).
import hashlib as _hashlib

_RP_OUT, _RP_IN = 16, 64
_RP_SIGNS = [
    [
        1.0
        if int(_hashlib.md5(f"rp{j}:{i}".encode()).hexdigest(), 16) % 2 == 0
        else -1.0
        for i in range(_RP_IN)
    ]
    for j in range(_RP_OUT)
]


def _rp_y_sql(j: int) -> str:
    lit = "[" + ",".join(str(s) for s in _RP_SIGNS[j]) + "]"
    return (
        f"list_reduce(list_transform(range(1, {_RP_IN} + 1), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]), "
        f"(x, y) -> x + y)"
    )


_RP_ORACLE = f"""
    WITH y AS (
      SELECT vec_id,
             {', '.join(f'round({_rp_y_sql(j)}, 6) AS y{j}'
                        for j in range(_RP_OUT))},
             round(sqrt(list_reduce(list_transform(
                     range(1, {_RP_IN} + 1),
                     i -> CAST(embedding[i] AS DOUBLE)
                          * CAST(embedding[i] AS DOUBLE)),
                   (x, y) -> x + y)), 6) AS norm64
      FROM embeddings)
    SELECT vec_id, y0, y1, y2, y3,
           round(sqrt({' + '.join(f'y{j}*y{j}' for j in range(_RP_OUT))})
                 / {float(_RP_OUT ** 0.5)} / norm64, 4) AS jl_ratio
    FROM y
"""


@query("c27_random_projection", oracle=_RP_ORACLE)
def c27_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    """C27: random-projection compression 64→16 dims — with c21's int8
    quantization this completes the embedding-compression pair (dims ×
    precision), the 4× storage move before any vector index is built at
    100 TB. Signs are a fixed ±1 matrix (sign random projection), so
    each output dim is one sequential-fold dot product per row — pure
    JVM arithmetic, zero shuffle, single scan. ``jl_ratio`` reports the
    Johnson-Lindenstrauss norm-preservation ratio (‖y‖/√k/‖v‖ ≈ 1),
    the check that tells you the projection is safe to search over."""
    e = load(spark, sf, "embeddings")
    # the 16 projection dots + norm render as parsed SQL (round-16
    # rule: identical _dot/_norm fold trees, one parse per column
    # instead of ~15 py4j calls each)
    dbl_emb = "transform(embedding, x -> cast(x as double))"

    def _y_expr(j: int) -> str:
        signs = ",".join(str(int(s)) for s in _RP_SIGNS[j])
        return (
            f"round(aggregate(zip_with({dbl_emb}, "
            f"transform(array({signs}), x -> cast(x as double)), "
            f"(x, y) -> x * y), 0.0D, (acc, x) -> acc + x), 6) AS y{j}"
        )

    y = e.selectExpr(
        "vec_id",
        *[_y_expr(j) for j in range(_RP_OUT)],
        f"round(sqrt(aggregate(transform({dbl_emb}, x -> x * x), "
        "0.0D, (acc, x) -> acc + x)), 6) AS norm64",
    )
    sq = F.expr(
        " + ".join(f"y{j} * y{j}" for j in range(_RP_OUT))
    )
    return y.select(
        "vec_id",
        "y0",
        "y1",
        "y2",
        "y3",
        F.round(
            F.sqrt(sq) / float(_RP_OUT ** 0.5) / F.col("norm64"), 4
        ).alias("jl_ratio"),
    )


@query("b85_asset_pipeline")  # rows-only: loadgen is xxhash64-seeded
def b85_asset_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """B85/A15: the reference's WIDE asset message, processed end to
    end as a registered query — loadgen synthesizes the AssetMessage
    shape classes (kafka-load-gen/main.go:51-120: JSON-in-string
    networkInterface, array<string> contributingSources, array<struct>
    customField1), then the query does what a consumer of that topic
    does: parse the embedded JSON, explode the custom-field structs,
    and aggregate per (region, custom-field source). rows-only by
    design: the generator seeds from xxhash64 (JVM-fast, the 100 TB
    choice) which no SQL oracle can mirror; the *shape* plumbing is
    what this grades, and pytest pins the generator's determinism.

    Scale shape: generation is partition-parallel column arithmetic
    (spark.range across 10 tasks); the only shuffle is the final
    bounded aggregate. JSON parse + explode are per-row JVM ops."""
    from iceberg_playground_spark.loadgen import gen_assets

    a = gen_assets(spark, 10_000, partitions=10)
    ni = F.from_json(
        F.col("network_interface"),
        "ipAddress STRING, macAddress STRING, networkName STRING",
    )
    parsed = a.select(
        "cloud_region",
        ni.getField("networkName").alias("network_name"),
        F.explode("custom_field1").alias("cf"),
        "cpu_usage",
        "is_active",
    )
    return (
        parsed.select(
            "cloud_region",
            "network_name",
            F.col("cf.source").alias("cf_source"),
            F.size("cf.values").alias("n_values"),
            "cpu_usage",
            "is_active",
        )
        .groupBy("cloud_region", "cf_source")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum(F.col("is_active").cast("long")).alias("n_active"),
            F.round(F.avg("cpu_usage"), 2).alias("avg_cpu"),
            F.sum("n_values").alias("n_custom_values"),
            F.count_distinct("network_name").alias("n_networks"),
        )
        .orderBy("cloud_region", "cf_source")
    )


@query(
    "b86_snapshot_tags",
    oracle="""
    SELECT * FROM (VALUES
      ('baseline', 1, CAST(5 AS BIGINT)),
      ('head',     3, CAST(7 AS BIGINT))
    ) AS t(ref, version, n_rows)
    """,
)
def b86_snapshot_tags(spark: SparkSession, sf: str) -> DataFrame:
    """B86: named snapshot refs (Iceberg TAGS) with ref-based
    retention, graded end to end. v1 is tagged 'baseline', two more
    appends land, then expire_snapshots(keep_last=1) runs: the
    untagged middle version expires, the tagged v1 survives (tags PIN
    their snapshots — Iceberg's retention rule), and both refs still
    read their exact row sets. This is the audit/repro workflow — "the
    corpus we trained on is tag v2024-01" — that time travel by number
    alone cannot provide once retention runs.

    The returned plan computes both counts lazily (two 1-row
    aggregates unioned); the build's expiration already proved the
    pinned read works."""

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "region_tags", "r_regionkey INT, r_name STRING",
            drop_if_exists=True,
        )
        r = load(spark, sf, "region").select("r_regionkey", "r_name")
        t.append(r)  # v1: the 5 regions
        t.create_tag("baseline")
        t.append(r.filter("r_regionkey = 0"))  # v2 (will expire)
        t.append(r.filter("r_regionkey = 1"))  # v3 = HEAD
        t.expire_snapshots(keep_last=1, orphan_older_than_s=0)
        return t

    t = _built(spark, sf, "b86", build)
    parts = []
    for ref, v in [("baseline", t.resolve_ref("baseline")),
                   ("head", t.current_version())]:
        parts.append(
            t.read(version=v)
            .agg(F.count("*").cast("bigint").alias("n_rows"))
            .select(
                F.lit(ref).alias("ref"),
                F.lit(v).cast("int").alias("version"),
                "n_rows",
            )
        )
    return parts[0].unionByName(parts[1])
