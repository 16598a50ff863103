"""Round-5 operator widening, part 2.

Lakehouse: write-audit-publish branches (b90 — Iceberg branch refs +
fast_forward, the staging workflow the reference's always-on ingest
would need for validated publishes), snapshot expiration graded (b91 —
previously pytest-only Layer A+ retention), the files metadata table
(b92 — Iceberg's ``t.files``: maintenance planning from manifests, not
scans) and metadata-only count(*) (b93 — the manifest-stats shortcut,
with its MoR-delete fallback). LLM-pipeline: adjacent-pair (BPE merge
step) statistics (c32), quality-aware canonical selection for dup
clusters (c33), duplicate-cluster size histogram (p13). Streaming:
stream-stream LEFT OUTER join (b95 — watermark-driven null emission,
the state-eviction semantics b65's inner join never exercises).
DML/maintenance closure: snapshot rollback (b94 — Iceberg's
rollback_to_snapshot, metadata-only incident recovery) and the
three-clause conditional MERGE (b96 — matched-delete + update +
insert in one transaction, completing b62's upsert).

Grading order is pinned by explicit registry lists; every query
here carries a hash-match oracle and was driver-graded green in
round 6 (CORRECTNESS_r06).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.queries.llm import _SH_SQL, _shingles, _tokens
from iceberg_playground_spark.queries.streaming import (
    _CENTS,
    _run_to_memory,
    _stream_events,
)
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.tables import LakeCatalog, LakeTable


# ---------------------------------------------------------------------------
# b90 — write-audit-publish branch
# ---------------------------------------------------------------------------


@query(
    "b90_wap_branch",
    oracle="""
    SELECT CAST((SELECT count(*) FROM region) AS BIGINT) AS n_main_before,
           CAST((SELECT count(*) FROM region) + 2 AS BIGINT) AS n_branch,
           CAST((SELECT count(*) FROM region) + 2 AS BIGINT) AS n_after,
           CAST(2 AS BIGINT) AS n_audit_rows
    """,
)
def b90_wap_branch(spark: SparkSession, sf: str) -> DataFrame:
    """B90: write-audit-publish via branch refs (Iceberg branches +
    fast_forward; Delta/Nessie call the same workflow WAP). Two
    appends land on an ``audit`` branch: main's HEAD and row count are
    UNTOUCHED while the branch is live (n_main_before), the branch
    view serves base+staged for validation (n_branch), and
    fast_forward publishes both appends as ONE atomic snapshot
    (n_after, n_audit_rows) — the reference's continuous-ingest
    pipeline gains a validated-publish gate with zero file rewrites.

    Scale shape: branch appends are ordinary parallel staged writes;
    publish is one metadata CAS commit (KB of JSON) that refuses —
    CommitConflict — if main moved past the fork base, so divergent
    histories can never merge silently (tests/test_write_path.py)."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "region_wap", "r_regionkey INT, r_name STRING",
            drop_if_exists=True,
        )
        t.append(load(spark, sf, "region").select("r_regionkey", "r_name"))
        t.create_branch("audit")
        t.append_to_branch(
            "audit",
            spark.createDataFrame(
                [(90, "AUDIT A")], "r_regionkey INT, r_name STRING"
            ),
        )
        t.append_to_branch(
            "audit",
            spark.createDataFrame(
                [(91, "AUDIT B")], "r_regionkey INT, r_name STRING"
            ),
        )
        n_main_before = t.read().count()  # branch writes invisible
        n_branch = t.read_branch("audit").count()  # audit view
        t.fast_forward("audit")  # one publish snapshot
        return t, n_main_before, n_branch

    t, n_main_before, n_branch = _built(spark, sf, "b90", build)
    return t.read().agg(
        F.count("*").cast("bigint").alias("n_after"),
        F.sum(F.when(F.col("r_regionkey") >= 90, 1).otherwise(0))
        .cast("bigint")
        .alias("n_audit_rows"),
    ).select(
        F.lit(n_main_before).cast("bigint").alias("n_main_before"),
        F.lit(n_branch).cast("bigint").alias("n_branch"),
        "n_after",
        "n_audit_rows",
    )


# ---------------------------------------------------------------------------
# b91 — snapshot expiration, graded
# ---------------------------------------------------------------------------


@query(
    "b91_snapshot_expiration",
    oracle="""
    SELECT CAST((SELECT count(*) FROM nation) + 1 AS BIGINT) AS n_live,
           CAST((SELECT count(*) FROM nation WHERE n_regionkey < 2)
                AS BIGINT) AS n_tagged,
           CAST(2 AS INT) AS n_versions_left,
           TRUE AS middle_expired, TRUE AS expired_read_fails
    """,
)
def b91_snapshot_expiration(spark: SparkSession, sf: str) -> DataFrame:
    """B91: snapshot expiration with ref-based retention, graded — the
    Layer A+ maintenance previously proven only in pytest
    (tables.expire_snapshots; Iceberg's expire_snapshots +
    remove_orphan_files). Three versions land (v1 half the nations —
    tagged 'audited' — v2 the rest, v3 a marker row); expire
    keep_last=1 drops exactly the untagged middle version: v3 survives
    as HEAD, v1 survives because a tag PINS it, v2's snapshot is gone
    and time travel to it fails by design while the live read and the
    tag read are byte-identical to before.

    Scale shape: expiration is a snapshot-log walk plus directory
    unlinks — metadata work; data dirs still referenced by surviving
    snapshots are never touched (v2's files live on inside v3's list)."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "nation_exp",
            "n_nationkey INT, n_name STRING, n_regionkey INT",
            drop_if_exists=True,
        )
        n = load(spark, sf, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        t.append(n.filter(F.col("n_regionkey") < 2))  # v1
        t.create_tag("audited")
        t.append(n.filter(F.col("n_regionkey") >= 2))  # v2
        t.append(
            spark.createDataFrame(
                [(999, "MARKER", 0)],
                "n_nationkey INT, n_name STRING, n_regionkey INT",
            )
        )  # v3
        out = t.expire_snapshots(keep_last=1, orphan_older_than_s=0)
        middle_expired = out["expired_versions"] == [2]
        try:
            t.read(version=2).count()
            expired_read_fails = False
        except FileNotFoundError:
            expired_read_fails = True
        return t, middle_expired, expired_read_fails

    t, middle_expired, expired_read_fails = _built(spark, sf, "b91", build)
    live = t.read().agg(F.count("*").cast("bigint").alias("n_live"))
    tagged = t.read(tag="audited").agg(
        F.count("*").cast("bigint").alias("n_tagged")
    )
    return live.crossJoin(F.broadcast(tagged)).select(
        "n_live",
        "n_tagged",
        F.lit(len(t.versions())).cast("int").alias("n_versions_left"),
        F.lit(middle_expired).alias("middle_expired"),
        F.lit(expired_read_fails).alias("expired_read_fails"),
    )


# ---------------------------------------------------------------------------
# b92 — files metadata table
# ---------------------------------------------------------------------------


@query(
    "b92_files_metadata",
    oracle="""
    SELECT CAST(o_orderkey % 3 + 1 AS INT) AS version,
           CAST(4 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders GROUP BY version
    """,
)
def b92_files_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """B92: the ``files`` metadata table (Iceberg's ``t.files``) as a
    queryable relation — per data file: committing sequence and record
    count, answered from snapshot metadata with ZERO data files
    opened. Orders land in three appends (split on o_orderkey % 3),
    each hash-repartitioned into 4 files; the rollup proves per-file
    stats reconstruct exactly what a scan would count: 4 files per
    version, per-version row counts equal to the raw table's.

    This is b79's snapshot log taken one level deeper (file grain, not
    commit grain) — the relation a compaction scheduler reads to find
    small-file debt. At the reference's own 20,000-file envelope
    (decouple.rs:25-28) the difference between planning maintenance
    from KB of manifests vs re-scanning TB of data is the whole game.
    Hash repartitioning makes file counts parallelism-invariant (the
    b61/b67 determinism rule: never depend on input split counts)."""

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "orders_files", "o_orderkey BIGINT, o_custkey BIGINT",
            drop_if_exists=True,
        )
        o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
        for i in range(3):
            t.append(
                o.filter(F.col("o_orderkey") % 3 == i).repartition(
                    4, "o_orderkey"
                )
            )
        return t

    t = _built(spark, sf, "b92", build)
    return (
        t.files()
        .groupBy(F.col("seq").alias("version"))
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# b93 — metadata-only count(*)
# ---------------------------------------------------------------------------


@query(
    "b93_metadata_count",
    oracle="""
    SELECT 'append-only' AS phase,
           CAST((SELECT count(*) FROM supplier) AS BIGINT) AS n_rows,
           TRUE AS from_metadata
    UNION ALL
    SELECT 'after-delete',
           (SELECT count(*) FROM supplier WHERE s_nationkey <> 3),
           FALSE
    """,
)
def b93_metadata_count(spark: SparkSession, sf: str) -> DataFrame:
    """B93: metadata-only count(*) — Iceberg answers SELECT count(*)
    from manifest record counts without opening a data file, the
    cheapest query a 100 TB table ever serves. Phase 1 (append-only):
    the metadata answer equals the raw table count and from_metadata
    is TRUE. Phase 2 (after a MoR equality delete): the masked-row
    count is unknowable from stats, metadata_count() correctly refuses
    (None) and the count falls back to a real scan — correctness never
    degrades, only the shortcut. (b92 is the same stats surfaced as a
    relation; this is the OPTIMIZATION they enable.)"""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "supplier_mc", "s_suppkey BIGINT, s_nationkey INT",
            drop_if_exists=True,
        )
        t.append(
            load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
        )
        meta_n = t.metadata_count()  # phase 1: pure metadata
        t.delete_where("s_nationkey = 3", ["s_suppkey"])
        meta_after = t.metadata_count()  # phase 2: must be None
        return t, meta_n, meta_after

    t, meta_n, meta_after = _built(spark, sf, "b93", build)
    phase1 = spark.createDataFrame(
        [("append-only", int(meta_n), meta_n is not None)],
        "phase STRING, n_rows BIGINT, from_metadata BOOLEAN",
    )
    phase2 = t.read().agg(
        F.count("*").cast("bigint").alias("n_rows")
    ).select(
        F.lit("after-delete").alias("phase"),
        "n_rows",
        F.lit(meta_after is not None).alias("from_metadata"),
    )
    return phase1.unionByName(phase2)


# ---------------------------------------------------------------------------
# c32 — adjacent-pair statistics (the BPE merge-step count)
# ---------------------------------------------------------------------------

_TOPK_PAIRS = 5


@query(
    "c32_bpe_pair_stats",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             unnest(list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i+1])) AS pair
      FROM documents),
    c AS (SELECT lang, pair, count(*) AS pair_count FROM t GROUP BY 1, 2)
    SELECT lang, pair, CAST(pair_count AS BIGINT) AS pair_count,
           CAST(row_number() OVER (
             PARTITION BY lang ORDER BY pair_count DESC, pair) AS INT)
             AS pair_rank
    FROM c QUALIFY pair_rank <= {_TOPK_PAIRS}
    """,
)
def c32_bpe_pair_stats(spark: SparkSession, sf: str) -> DataFrame:
    """C32: adjacent-token-pair frequencies, top-5 per language — the
    counting step of a BPE/WordPiece merge iteration (the pair a
    tokenizer trainer would merge next is exactly pair_rank=1). Unlike
    c05's unigram stats this counts OCCURRENCES of ordered bigrams, so
    no distinct anywhere. Full (count DESC, pair) ordering makes the
    top-k boundary tie-proof across engines.

    Scale shape: bigrams via the zip-of-shifted-slices form (the
    _shingles rule — an index-lambda would re-inline split() per
    element, O(tokens²)/doc), explode feeds a (lang, pair) hash
    aggregate with map-side partials, and InferWindowGroupLimit pushes
    the per-lang top-5 ahead of the final exchange — the full pair
    vocabulary never concentrates anywhere. One real BPE trainer
    iterates this plan; each iteration is this same bounded shape."""
    # hash-repartition before the bigram construct (the c31/c08 rule,
    # round 17): the zip-of-slices + explode is this cell's CPU and
    # otherwise inherits the scan's one-split partitioning (cell
    # measured 1.1 -> 0.6 s at sf0.1 on 32 cores)
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "lang", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = _tokens()
    n = F.size(toks)
    z = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("a"),
        F.slice(toks, 2, n - 1).alias("b"),
    )
    grams = F.transform(z, lambda s: F.concat_ws(" ", s["a"], s["b"]))
    pairs = d.select(
        "lang",
        F.explode(
            F.when(n >= 2, grams).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy("lang", "pair").agg(
        F.count("*").cast("bigint").alias("pair_count")
    )
    w = W.partitionBy("lang").orderBy(F.col("pair_count").desc(), "pair")
    return (
        counts.withColumn(
            "pair_rank", F.row_number().over(w).cast("int")
        )
        .filter(F.col("pair_rank") <= _TOPK_PAIRS)
    )


# ---------------------------------------------------------------------------
# c33 — quality-aware canonical selection for duplicate clusters
# ---------------------------------------------------------------------------


@query(
    "c33_canonical_selection",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, n_chars,
             list_aggregate(list_transform({_SH_SQL}, x -> md5(x)), 'min')
               AS fingerprint
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3)
    SELECT fingerprint,
           CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT)
             AS cluster_size,
           doc_id AS canonical_doc, n_chars AS canonical_chars
    FROM fp
    QUALIFY count(*) OVER (PARTITION BY fingerprint) >= 2
        AND row_number() OVER (
              PARTITION BY fingerprint
              ORDER BY n_chars DESC, doc_id) = 1
    """,
)
def c33_canonical_selection(spark: SparkSession, sf: str) -> DataFrame:
    """C33: quality-aware canonical selection — for every content
    fingerprint shared by ≥2 docs (c14's min-digest clusters), keep
    the BEST copy (longest, tie-break lowest doc_id), not the
    arbitrary first. This is the survivor policy a production dedup
    actually wants: c01/c02 keep min-id; a curated corpus keeps the
    highest-quality member and records cluster provenance
    (cluster_size) for downsampling decisions.

    Scale shape: fingerprint is per-row array math (no shuffle); one
    exchange on fingerprint serves BOTH window functions (same
    partitioning), and the row_number filter is group-limit-pushable.
    Quality here is n_chars; any scalar score (c23's LM score, c07's
    gates) slots into the same ORDER BY."""
    # hash-repartition before the fingerprint map (the c31/c08 rule,
    # round 17): the per-doc shingle + md5-min transform is this
    # cell's CPU and otherwise inherits the scan's one-split
    # partitioning (cell measured 1.6 -> 1.0 s at sf0.1 on 32 cores)
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "n_chars", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    sh = _shingles(_tokens())
    fp = (
        d.select(
            "doc_id",
            "n_chars",
            F.array_min(F.transform(sh, F.md5)).alias("fingerprint"),
        )
        .filter(F.col("fingerprint").isNotNull())
    )
    w_cnt = W.partitionBy("fingerprint")
    w_rank = W.partitionBy("fingerprint").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return (
        fp.withColumn(
            "cluster_size", F.count("*").over(w_cnt).cast("bigint")
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter((F.col("cluster_size") >= 2) & (F.col("rn") == 1))
        .select(
            "fingerprint",
            "cluster_size",
            F.col("doc_id").alias("canonical_doc"),
            F.col("n_chars").alias("canonical_chars"),
        )
    )


# ---------------------------------------------------------------------------
# p13 — duplicate-cluster size histogram
# ---------------------------------------------------------------------------


@query(
    "p13_cluster_histogram",
    oracle=f"""
    WITH k AS (
      SELECT 'exact' AS method, md5(text) AS h FROM documents
      UNION ALL
      SELECT 'fingerprint',
             list_aggregate(list_transform({_SH_SQL}, x -> md5(x)), 'min')
      FROM documents WHERE len(string_split(text, ' ')) >= 3),
    c AS (SELECT method, h, count(*) AS cluster_size
          FROM k GROUP BY 1, 2)
    SELECT method, CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM c GROUP BY method, cluster_size
    """,
)
def p13_cluster_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """P13: duplicate-cluster size histogram, per dedup method — how
    many clusters exist at each multiplicity under exact content
    hashing (c01's key) vs content fingerprinting (c14's min-digest,
    the near-dup key), and how many docs they hold. THE first
    diagnostic a dedup owner reads: exact≈all-singletons with a fat
    fingerprint tail (this corpus) means near-dups dominate — route to
    c02/c33, not c01; huge clusters under both mean boilerplate (p07);
    and Σdocs−Σclusters per method predicts exactly what each dedup
    level would remove.

    Scale shape: both keys are per-row map-side arithmetic computed in
    ONE corpus scan (a 2× explode of (method, key) structs — only
    16-byte digests ever shuffle, never text); then two bounded hash
    aggregates, the second over |distinct keys| rows grouped by tiny
    integers."""
    d = load(spark, sf, "documents")
    sh = _shingles(_tokens())
    fp = F.array_min(F.transform(sh, F.md5))
    keys = d.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("exact").alias("method"),
                    F.md5("text").alias("h"),
                ),
                F.struct(
                    F.lit("fingerprint").alias("method"), fp.alias("h")
                ),
            )
        ).alias("k")
    ).select("k.method", "k.h").filter(F.col("h").isNotNull())
    clusters = keys.groupBy("method", "h").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        clusters.groupBy("method", "cluster_size")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .select(
            "method",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# b95 — stream-stream LEFT OUTER join
# ---------------------------------------------------------------------------


@query(
    "b95_stream_outer_join",
    oracle=f"""
    WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, {_CENTS} AS cents
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click'),
         wm AS (SELECT least((SELECT max(ts) FROM p),
                             (SELECT max(ts) FROM c))
                       - INTERVAL 30 MINUTE AS w),
         j AS (SELECT p.user_id, p.cents, p.ts AS p_ts, c.ts AS c_ts
               FROM p LEFT JOIN c
                 ON p.user_id = c.user_id
                AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts)
    SELECT user_id,
           CAST(count(c_ts) AS BIGINT) AS n_matched,
           CAST(count(*) - count(c_ts) AS BIGINT) AS n_unmatched,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM j, wm
    WHERE c_ts IS NOT NULL OR p_ts < w
    GROUP BY user_id
    """,
)
def b95_stream_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """B95: stream-stream LEFT OUTER join — b65's band join, but
    purchases with NO click in the preceding 30 minutes must still
    emit (with nulls). This exercises the semantics an inner join
    never touches: the engine can only emit an unmatched left row when
    the WATERMARK proves no future click can match, i.e. once the
    global watermark (min over both inputs of max-event-time minus
    delay) passes the purchase's band. Purchases newer than the final
    watermark stay in state forever on a drained run — they are NOT
    emitted, and the oracle encodes exactly that: unmatched rows
    qualify only when p_ts < min(max_p, max_c) − 30 min. That
    watermark-conditioned batch equivalence is the contract.

    Scale shape: state is the 30-minute band per user on each side
    (watermarks evict), identical to b65; the outer emission adds no
    state, only an eviction-time null flush."""
    p = (
        _stream_events(spark, sf)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.expr(_CENTS).alias("cents"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    c = (
        _stream_events(spark, sf)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "30 minutes")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    )
    sink = _run_to_memory(joined.select("user_id", "cents", "p_ts", "c_ts"))
    return sink.groupBy("user_id").agg(
        F.count("c_ts").cast("bigint").alias("n_matched"),
        (F.count("*") - F.count("c_ts")).cast("bigint").alias("n_unmatched"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# b94 — snapshot rollback
# ---------------------------------------------------------------------------


@query(
    "b94_rollback",
    oracle="""
    SELECT r_regionkey, r_name, TRUE AS bad_was_visible,
           TRUE AS history_preserved
    FROM region
    """,
)
def b94_rollback(spark: SparkSession, sf: str) -> DataFrame:
    """B94: snapshot rollback (Iceberg's rollback_to_snapshot) — the
    incident-recovery move. v2 lands a bad batch AND a bad delete
    (merge); rollback(1) commits a NEW snapshot whose entries are
    copied verbatim from v1, so HEAD reads the original content
    bit-for-bit while history stays append-only: the bad version
    remains time-travelable for the post-incident audit
    (bad_was_visible is read FROM v2 after the rollback), and the
    rollback could itself be rolled back.

    Scale shape: pure metadata — the rollback reads and writes KB of
    snapshot JSON under the same CAS as every commit; zero data files
    move. At 100 TB this is why table-format rollback beats restoring
    files from backup by hours."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "region_rb", "r_regionkey INT, r_name STRING",
            drop_if_exists=True,
        )
        t.append(load(spark, sf, "region").select("r_regionkey", "r_name"))
        t.merge(
            spark.createDataFrame(
                [(0, "CORRUPTED", False), (1, None, True)],
                "r_regionkey INT, r_name STRING, is_delete BOOLEAN",
            ),
            ["r_regionkey"],
            delete_col="is_delete",
        )  # v2: bad update + bad delete
        t.rollback(1)  # v3: metadata-only restore
        bad = t.read(version=2)
        bad_was_visible = (
            bad.filter("r_name = 'CORRUPTED'").count() == 1
            and bad.filter("r_regionkey = 1").count() == 0
        )
        history_preserved = t.versions() == [1, 2, 3]
        return t, bad_was_visible, history_preserved

    t, bad_was_visible, history_preserved = _built(spark, sf, "b94", build)
    return t.read().select(
        "r_regionkey",
        "r_name",
        F.lit(bad_was_visible).alias("bad_was_visible"),
        F.lit(history_preserved).alias("history_preserved"),
    )


# ---------------------------------------------------------------------------
# b96 — three-clause conditional MERGE
# ---------------------------------------------------------------------------


@query(
    "b96_conditional_merge",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN n_regionkey = 0 THEN 'UPDATED' ELSE n_name END
             AS n_name,
           n_regionkey
    FROM nation WHERE n_regionkey <> 1
    UNION ALL SELECT 900, 'NEWLAND', 9
    """,
)
def b96_conditional_merge(spark: SparkSession, sf: str) -> DataFrame:
    """B96: the full three-clause MERGE INTO — WHEN MATCHED AND flag
    THEN DELETE, WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN
    INSERT — in ONE snapshot (b62's upsert is the two-clause subset).
    Region-0 nations update, region-1 nations delete, a new key
    inserts; untouched rows pass through. One transaction means a
    reader never observes the intermediate state where the deletes
    landed but the updates didn't.

    Scale shape: identical to upsert — the delete side is key tuples
    only (broadcast at read), the update/insert side is a parallel
    staged append, and the sequence rule scopes the delete to strictly
    older files so the transaction never masks its own appends."""

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "nation_merge",
            "n_nationkey INT, n_name STRING, n_regionkey INT",
            drop_if_exists=True,
        )
        n = load(spark, sf, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        t.append(n)
        src = (
            n.filter(F.col("n_regionkey").isin(0, 1))
            .select(
                "n_nationkey",
                F.lit("UPDATED").alias("n_name"),
                "n_regionkey",
                (F.col("n_regionkey") == 1).alias("is_delete"),
            )
            .unionByName(
                spark.createDataFrame(
                    [(900, "NEWLAND", 9, False)],
                    "n_nationkey INT, n_name STRING, n_regionkey INT, "
                    "is_delete BOOLEAN",
                )
            )
        )
        t.merge(src, ["n_nationkey"], delete_col="is_delete")
        return t

    t = _built(spark, sf, "b96", build)
    return t.read()


# ---------------------------------------------------------------------------
# p14 — incremental ingest dedup report (lakehouse x pipeline composition)
# ---------------------------------------------------------------------------

_P14_FP_SQL = (
    "list_aggregate(list_transform(" + _SH_SQL + ", x -> md5(x)), 'min')"
)


def _p14_oracle() -> str:
    from iceberg_playground_spark.queries._util import bucket_sql

    b = bucket_sql("doc_id")
    return f"""
    WITH base AS (SELECT * FROM documents WHERE {b} < 80),
         delta AS (SELECT * FROM documents WHERE {b} >= 80),
         bfp AS (SELECT DISTINCT {_P14_FP_SQL} AS fp FROM base
                 WHERE len(string_split(text, ' ')) >= 3),
         dfp AS (SELECT lang,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
                        {_P14_FP_SQL} AS fp
                 FROM delta)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_new,
           CAST(sum(tok) AS BIGINT) AS new_tokens,
           CAST(count(*) FILTER (WHERE fp IN (SELECT fp FROM bfp))
                AS BIGINT) AS n_dup_vs_base,
           CAST(count(*) - count(*) FILTER (WHERE fp IN (SELECT fp FROM bfp))
                AS BIGINT) AS n_novel
    FROM dfp GROUP BY lang
    """


@query("p14_ingest_dedup_report", oracle=_p14_oracle())
def p14_ingest_dedup_report(spark: SparkSession, sf: str) -> DataFrame:
    """P14: incremental ingest dedup report — the operational question
    of a continuously-ingested training corpus: WHAT did this batch
    add, and how much of it duplicates what we already hold? The
    corpus lives as a lake table (80% of docs at v1); an ingestion
    batch lands as v2; the report reads ONLY the delta
    (read_incremental — file selection is snapshot metadata, the tail
    consumer never rescans history) and joins its content fingerprints
    (c14's min-digest) against the existing corpus's distinct
    fingerprint set, per language: new docs, new tokens, dups vs base,
    novel docs. Short docs (<3 tokens) carry no fingerprint and count
    as novel — both engines agree because NULL never matches a join
    key or an IN.

    Scale shape: fingerprints are per-row array math on each side; the
    dup check is a DIGEST-ONLY left join (base side pre-deduplicated —
    at 100 TB the fingerprint index is what you'd maintain as its own
    table, exactly c22's decontamination shape applied at ingest
    time); the report aggregate is |langs| rows."""
    from iceberg_playground_spark.queries._util import hash_bucket

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "docs_inc", "doc_id BIGINT, lang STRING, text STRING",
            drop_if_exists=True,
        )
        d = load(spark, sf, "documents").select("doc_id", "lang", "text")
        bucket = hash_bucket(F.col("doc_id"))
        t.append(d.filter(bucket < 80))   # v1: the existing corpus
        t.append(d.filter(bucket >= 80))  # v2: the ingestion batch
        return t

    t = _built(spark, sf, "p14", build)
    fp = F.array_min(F.transform(_shingles(_tokens()), F.md5))
    base_fp = (
        t.read(version=1)
        .select(fp.alias("fp"))
        .filter(F.col("fp").isNotNull())
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    delta = t.read_incremental(1, 2).select(
        "lang",
        F.size(_tokens()).cast("bigint").alias("tok"),
        fp.alias("fp"),
    )
    return (
        delta.join(base_fp, on="fp", how="left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_new"),
            F.sum("tok").cast("bigint").alias("new_tokens"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("bigint")
            .alias("n_dup_vs_base"),
            (F.count("*") - F.sum(F.coalesce(F.col("is_dup"), F.lit(0))))
            .cast("bigint")
            .alias("n_novel"),
        )
    )


# ---------------------------------------------------------------------------
# b103 — TIMESTAMP AS OF time travel
# ---------------------------------------------------------------------------


@query(
    "b103_timestamp_travel",
    oracle="""
    SELECT CAST((SELECT count(*) FROM region) AS BIGINT) AS n_at_mid,
           CAST((SELECT count(*) FROM region) + 1 AS BIGINT) AS n_now,
           CAST(1 AS INT) AS v_at_mid, CAST(2 AS INT) AS v_now
    """,
)
def b103_timestamp_travel(spark: SparkSession, sf: str) -> DataFrame:
    """B103: `TIMESTAMP AS OF` time travel — every snapshot records its
    commit wall time, and a reader resolves any past instant to the
    LAST version committed at or before it (Iceberg's timestamp
    resolution; the audit question "what did the dashboard show at
    09:00?"). A wall time captured between v1 and v2 resolves to v1
    and reads its exact content; "now" resolves to HEAD. Resolution is
    a snapshot-log walk — KB of metadata, zero data files opened; the
    reads are ordinary pruned snapshot scans."""
    import time as _time

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "region_ts", "r_regionkey INT, r_name STRING",
            drop_if_exists=True,
        )
        t.append(load(spark, sf, "region").select("r_regionkey", "r_name"))
        t_mid = _time.time()  # strictly after v1's commit stamp
        t.append(
            spark.createDataFrame(
                [(90, "LATE ROW")], "r_regionkey INT, r_name STRING"
            )
        )
        return t, t_mid

    t, t_mid = _built(spark, sf, "b103", build)
    mid = t.read(as_of_ts=t_mid).agg(
        F.count("*").cast("bigint").alias("n_at_mid")
    )
    now = t.read(as_of_ts=_time.time()).agg(
        F.count("*").cast("bigint").alias("n_now")
    )
    return mid.crossJoin(F.broadcast(now)).select(
        "n_at_mid",
        "n_now",
        F.lit(t.version_at(t_mid)).cast("int").alias("v_at_mid"),
        F.lit(t.current_version()).cast("int").alias("v_now"),
    )


# ---------------------------------------------------------------------------
# b104 — position deletes (registered for the round-6 window)
# ---------------------------------------------------------------------------


@query(
    "b104_position_delete",
    oracle="""
    SELECT r_regionkey, r_name, TRUE AS files_untouched
    FROM region WHERE r_regionkey NOT IN (1, 3)
    UNION ALL SELECT 1, 'REGION ONE RETURNS', TRUE
    """,
)
def b104_position_delete(spark: SparkSession, sf: str) -> DataFrame:
    """B104: POSITION deletes, merge-on-read — Iceberg's second
    delete-file kind (format v2; the reference writes only equality
    deletes, deletes.rs:60-110, but a switching user's other engines
    may emit either). The delete file stores (file_path, row_index)
    pairs captured from Spark's ``_metadata`` scan columns — exact
    physical rows, so a later re-append of a deleted key is visible by
    CONSTRUCTION (it lives in a new file), and data files are never
    rewritten (files_untouched compares the file lists across the
    delete commit). Registered past the round-5 grading window;
    leads round 6's per the registry rule.

    Scale shape: the read path gains one broadcast anti-join on
    (file, position) — the same cost as the equality kind; position
    columns are attached to a scan ONLY when a positional delete
    actually applies to it."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "region_pd", "r_regionkey INT, r_name STRING",
            drop_if_exists=True,
        )
        t.append(load(spark, sf, "region").select("r_regionkey", "r_name"))
        t.delete_where_positional("r_regionkey IN (1, 3)")  # v2
        t.append(
            spark.createDataFrame(
                [(1, "REGION ONE RETURNS")],
                "r_regionkey INT, r_name STRING",
            )
        )  # v3: the deleted key returns in a NEW file
        files_untouched = (
            t.snapshot(2)["data_files"] == t.snapshot(1)["data_files"]
        )
        return t, files_untouched

    t, files_untouched = _built(spark, sf, "b104", build)
    return t.read().select(
        "r_regionkey",
        "r_name",
        F.lit(files_untouched).alias("files_untouched"),
    )


# ---------------------------------------------------------------------------
# b105 — rename-column schema evolution (registered for the round-6 window)
# ---------------------------------------------------------------------------


@query(
    "b105_rename_column",
    oracle="""
    SELECT n_nationkey, n_name AS nation_name, n_regionkey, TRUE AS
           files_untouched, TRUE AS old_delete_still_masks
    FROM nation WHERE n_regionkey <> 2
    UNION ALL SELECT 900, 'NEWLAND', 9, TRUE, TRUE
    """,
)
def b105_rename_column(spark: SparkSession, sf: str) -> DataFrame:
    """B105: rename-column schema evolution, metadata-only (Iceberg's
    ALTER TABLE RENAME COLUMN, field-ID based there; here each data
    entry records its write-time DDL and the read maps positionally).
    The sequence proves the hard interactions: an equality delete
    lands FIRST (its key file stores the old name), the rename
    follows (zero files touched — files_untouched compares the file
    lists), and an append under the NEW schema lands after; one HEAD
    read serves all three generations with the deleted rows still
    masked (the delete's key names translate forward through the
    rename history).

    Scale shape: rename is one KB-sized metadata commit; reads gain a
    per-entry positional projection — free inside the scan."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "nation_rn",
            "n_nationkey INT, n_name STRING, n_regionkey INT",
            drop_if_exists=True,
        )
        t.append(
            load(spark, sf, "nation").select(
                "n_nationkey", "n_name", "n_regionkey"
            )
        )
        t.delete_where("n_regionkey = 2", ["n_name"])  # old-name keys
        t.rename_column("n_name", "nation_name")  # metadata-only
        t.append(
            spark.createDataFrame(
                [(900, "NEWLAND", 9)],
                "n_nationkey INT, nation_name STRING, n_regionkey INT",
            )
        )
        files_untouched = (
            t.snapshot(3)["data_files"] == t.snapshot(1)["data_files"]
        )
        masks = t.read().filter("n_regionkey = 2").count() == 0
        return t, files_untouched, masks

    t, files_untouched, masks = _built(spark, sf, "b105", build)
    return t.read().select(
        "n_nationkey",
        "nation_name",
        "n_regionkey",
        F.lit(files_untouched).alias("files_untouched"),
        F.lit(masks).alias("old_delete_still_masks"),
    )
