"""Round-10 operators, third batch: the partitions metadata table,
contrastive triplet mining, and the composed v3 release report
(registered in _R10_NEW_TAIL — graded round 11).

- b158: PARTITIONS METADATA TABLE — Iceberg's ``t.partitions``, the
  sibling of b92's ``files`` table one level up: per live identity
  partition, file count and record count answered from snapshot
  metadata alone (partition values ride the hive paths, record
  counts are committed per-file stats — zero data files opened).
  This is the relation retention (b135), compaction (b82) and skew
  decisions read first; the graded query also drops one partition
  via an aligned metadata-only delete_range and the table must
  reflect it without any file I/O.
- c67: TRIPLET MINING — the metric-learning dataset assembler
  (contrastive/triplet training à la FaceNet/SimCSE): for each
  anchor vector, the nearest SAME-label vector (the positive) and
  the nearest DIFFERENT-label vector (the hard negative), with the
  triplet margin (neg_dist − pos_dist; ≤ 0 marks the hard cases a
  curriculum surfaces first). c03/c04 answer retrieval queries;
  c67 assembles training rows. Exact integer distances under c54's
  fixed-point contract make the full triplet set hash-gradeable.
- p34: RELEASE REPORT v3 — the modern release recipe composed from
  this round's parts: Gopher-rule quality gate (p29's exact flags) →
  exact-dedup survivor selection among passing docs (c33's min-id
  canon) → leakage-safe cluster split (p32's stamp — the SAME salt,
  so the release agrees with the standalone split op), rolled up per
  (split, lang): docs in, quality drops, duplicate drops, kept docs,
  kept tokens. c20/p20 are the fingerprint- and LSH-level builds;
  p34 is the quality-gated one a 2024-era pipeline ships
  (FineWeb-style: filter first, dedup what survives, split safely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import (
    bucket_sql,
    hash_bucket,
    load,
)
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.tables import LakeCatalog

# ---------------------------------------------------------------------------
# b158 — partitions metadata table (+ metadata-only partition drop)
# ---------------------------------------------------------------------------

_B158_ORACLE = """
SELECT 'o_orderstatus=' || o_orderstatus AS partition,
       CAST(2 AS BIGINT) AS n_files,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders WHERE o_orderstatus <> 'F'
GROUP BY o_orderstatus ORDER BY partition
"""


@query("b158_partitions_metadata", oracle=_B158_ORACLE)
def b158_partitions_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """B158: the ``partitions`` metadata table — see module docstring
    and tables.py::partitions.

    Orders land partitioned by o_orderstatus in two appends (split on
    o_orderkey % 2, each repartitioned BY the partition column so
    every partition gets exactly one file per append — the b92
    parallelism-invariance rule); then partition F drops via an
    ALIGNED delete_range, which the build asserts was metadata-only
    (whole files leave the snapshot by committed bounds — zero delete
    files, zero data I/O). The graded relation is the post-drop
    partitions table: per surviving status, 2 files and exactly the
    raw per-status row count — file counts and record counts
    reconstructed from manifests alone."""

    def build(tmp: str):
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "orders_parts",
            "o_orderkey BIGINT, o_orderstatus STRING",
            drop_if_exists=True, partition_by=["o_orderstatus"],
        )
        o = load(spark, sf, "orders").select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            "o_orderstatus",
        )
        for i in range(2):
            t.append(
                o.filter(F.col("o_orderkey") % 2 == i).repartition(
                    "o_orderstatus"
                )
            )
        _, plan = t.delete_range("o_orderstatus", "F", "F")
        if not plan.get("metadata_only"):
            raise RuntimeError(
                "aligned partition drop degraded to a data-file scan"
            )
        return t

    t = _built(spark, sf, "b158", build)
    return t.partitions().orderBy("partition")


# ---------------------------------------------------------------------------
# c67 — triplet mining (anchor / positive / hard negative)
# ---------------------------------------------------------------------------

_C67_ANCHORS = 10
_C67_SCALE = 1000

_C67_ORACLE = f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {_C67_SCALE}) AS BIGINT)) AS qv
  FROM embeddings),
a AS (SELECT vec_id AS anchor_id, label AS anchor_label, qv AS aq
      FROM q WHERE vec_id < {_C67_ANCHORS}),
pairs AS (
  SELECT a.anchor_id, a.anchor_label, c.vec_id, c.label = a.anchor_label
           AS same,
         list_aggregate(list_transform(range(1, len(c.qv) + 1),
           i -> (c.qv[i] - a.aq[i]) * (c.qv[i] - a.aq[i])), 'sum')
           AS dist
  FROM a, q c WHERE c.vec_id <> a.anchor_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY anchor_id, same ORDER BY dist, vec_id) AS rn
  FROM pairs)
SELECT anchor_id::BIGINT AS anchor_id, anchor_label,
       CAST(max(CASE WHEN same AND rn = 1 THEN vec_id END) AS BIGINT)
         AS pos_id,
       CAST(max(CASE WHEN same AND rn = 1 THEN dist END) AS BIGINT)
         AS pos_dist,
       CAST(max(CASE WHEN NOT same AND rn = 1 THEN vec_id END) AS BIGINT)
         AS neg_id,
       CAST(max(CASE WHEN NOT same AND rn = 1 THEN dist END) AS BIGINT)
         AS neg_dist,
       CAST(max(CASE WHEN NOT same AND rn = 1 THEN dist END)
            - max(CASE WHEN same AND rn = 1 THEN dist END) AS BIGINT)
         AS margin
FROM ranked GROUP BY anchor_id, anchor_label ORDER BY anchor_id
"""


@query("c67_triplet_mining", oracle=_C67_ORACLE)
def c67_triplet_mining(spark: SparkSession, sf: str) -> DataFrame:
    """C67: (anchor, positive, hard negative) triplet assembly — see
    module docstring. Anchors are the first 10 vec_ids (c54's
    deterministic-seed rule); positives/negatives tie-break on vec_id.

    Scale shape: the anchor side is BOUNDED (10 rows) and broadcasts;
    the candidate pass is |anchors|·N map work (the c03 brute
    contract — the LSH-bucketed c04/c29 path drops in when the anchor
    set grows); per-(anchor, same) bests ride ONE ranking window over
    the pair rows with the group limit pushed, then a 10-row pivot.
    The only join is the broadcast nested loop against the 10-row
    anchor table (the sanctioned eval-arm shape)."""
    e = load(spark, sf, "embeddings")
    q = e.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _C67_SCALE).cast("bigint"),
        ).alias("qv"),
    )
    a = (
        q.filter(F.col("vec_id") < _C67_ANCHORS)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.col("qv").alias("aq"),
        )
    )
    pairs = (
        q.crossJoin(F.broadcast(a))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "vec_id",
            (F.col("label") == F.col("anchor_label")).alias("same"),
            F.aggregate(
                F.zip_with("qv", "aq", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("dist"),
        )
    )
    w = W.partitionBy("anchor_id", "same").orderBy("dist", "vec_id")
    best = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    pick = lambda cond, col: F.max(F.when(cond, F.col(col)))  # noqa: E731
    out = best.groupBy("anchor_id", "anchor_label").agg(
        pick(F.col("same"), "vec_id").cast("bigint").alias("pos_id"),
        pick(F.col("same"), "dist").cast("bigint").alias("pos_dist"),
        pick(~F.col("same"), "vec_id").cast("bigint").alias("neg_id"),
        pick(~F.col("same"), "dist").cast("bigint").alias("neg_dist"),
    )
    return out.select(
        "anchor_id",
        "anchor_label",
        "pos_id",
        "pos_dist",
        "neg_id",
        "neg_dist",
        (F.col("neg_dist") - F.col("pos_dist"))
        .cast("bigint").alias("margin"),
    ).orderBy("anchor_id")


# ---------------------------------------------------------------------------
# p34 — release report v3 (quality gate → dedup → leakage-safe split)
# ---------------------------------------------------------------------------


def _p34_oracle() -> str:
    from iceberg_playground_spark.queries.round9c import (
        _P29_ML_HI10,
        _P29_ML_LO10,
        _P29_STOP_MIN,
        _P29_TOP_PCT10,
        _P29_WC_HI,
        _P29_WC_LO,
    )
    from iceberg_playground_spark.queries.round10 import (
        _P32_TRAIN,
        _P32_VAL,
    )

    split_bucket = bucket_sql("'p32:' || CAST(rep AS VARCHAR)")
    return f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
g0 AS (SELECT doc_id, token, count(*) AS cnt FROM t GROUP BY doc_id, token),
g AS (
  SELECT doc_id, sum(cnt) AS n_words,
         sum(length(token) * cnt) AS sum_len,
         sum(CASE WHEN token IN ('a', 'the') THEN cnt ELSE 0 END) AS n_stop,
         max(cnt) AS top_cnt
  FROM g0 GROUP BY doc_id),
flags AS (
  SELECT doc_id, n_words,
         (n_words BETWEEN {_P29_WC_LO} AND {_P29_WC_HI}
          AND {_P29_ML_LO10} * n_words <= 10 * sum_len
          AND 10 * sum_len <= {_P29_ML_HI10} * n_words
          AND n_stop >= {_P29_STOP_MIN}
          AND 10 * top_cnt < {_P29_TOP_PCT10} * n_words) AS pass
  FROM g),
d AS (
  SELECT doc_id, lang, md5(text) AS fp,
         len(string_split(text, ' ')) AS ntok
  FROM documents),
s AS (
  SELECT d.*, f.pass,
         min(d.doc_id) OVER (PARTITION BY d.fp) AS rep,
         CASE WHEN f.pass THEN min(
             CASE WHEN f.pass THEN d.doc_id END)
           OVER (PARTITION BY d.fp) END AS canon
  FROM d JOIN flags f ON d.doc_id = f.doc_id),
labeled AS (
  SELECT *,
    CASE WHEN {split_bucket} < {_P32_TRAIN} THEN 'train'
         WHEN {split_bucket} < {_P32_VAL} THEN 'validation'
         ELSE 'test' END AS split,
    CASE WHEN NOT pass THEN 'quality_drop'
         WHEN doc_id <> canon THEN 'dup_drop'
         ELSE 'kept' END AS fate
  FROM s)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS docs_in,
       CAST(sum(CASE WHEN fate = 'quality_drop' THEN 1 ELSE 0 END)
            AS BIGINT) AS quality_drops,
       CAST(sum(CASE WHEN fate = 'dup_drop' THEN 1 ELSE 0 END)
            AS BIGINT) AS dup_drops,
       CAST(sum(CASE WHEN fate = 'kept' THEN 1 ELSE 0 END)
            AS BIGINT) AS kept_docs,
       CAST(COALESCE(sum(CASE WHEN fate = 'kept' THEN ntok END), 0)
            AS BIGINT) AS kept_tokens
FROM labeled GROUP BY split, lang ORDER BY split, lang
"""


@query("p34_release_report_v3", oracle=_p34_oracle())
def p34_release_report_v3(spark: SparkSession, sf: str) -> DataFrame:
    """P34: the quality-gated release pipeline — see module docstring.
    Per (split, lang): docs in, Gopher-rule drops, duplicate drops
    (survivor = lowest doc_id among PASSING members of the content
    cluster — dropping junk first changes who survives, which is the
    point of gating before dedup), kept docs and kept token budget.
    Split membership is cluster-granular with p32's exact stamp, so
    this report and the standalone split op never disagree.

    Scale shape: the quality arm is p29's two-level aggregate (token
    stream → (doc, token) counts → doc flags — each exchange strictly
    smaller than the last); flags join the doc table on doc_id once;
    ONE fp exchange serves both the cluster representative and the
    passing-survivor windows (same partitioning); the rollup is a
    |splits·langs|-key aggregate. The corpus text itself never
    shuffles — only doc-keyed stat rows."""
    from iceberg_playground_spark.queries.round9c import (
        p29_gopher_quality_rules,
    )
    from iceberg_playground_spark.queries.round10 import (
        _P32_TRAIN,
        _P32_VAL,
    )

    flags = p29_gopher_quality_rules(spark, sf).select(
        "doc_id", (F.col("pass") == 1).alias("pass")
    )
    d = load(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.md5("text").alias("fp"),
        F.size(F.split("text", " ")).cast("bigint").alias("ntok"),
    )
    wfp = W.partitionBy("fp")
    s = (
        d.join(flags, "doc_id")
        .withColumn("rep", F.min("doc_id").over(wfp))
        .withColumn(
            "canon",
            F.when(
                F.col("pass"),
                F.min(F.when(F.col("pass"), F.col("doc_id"))).over(wfp),
            ),
        )
        .withColumn(
            "bucket",
            hash_bucket(
                F.concat(F.lit("p32:"), F.col("rep").cast("string"))
            ),
        )
        .withColumn(
            "split",
            F.when(F.col("bucket") < _P32_TRAIN, "train")
            .when(F.col("bucket") < _P32_VAL, "validation")
            .otherwise("test"),
        )
        .withColumn(
            "fate",
            F.when(~F.col("pass"), "quality_drop")
            .when(F.col("doc_id") != F.col("canon"), "dup_drop")
            .otherwise("kept"),
        )
    )
    return (
        s.groupBy("split", "lang")
        .agg(
            F.count("*").cast("bigint").alias("docs_in"),
            F.sum(F.when(F.col("fate") == "quality_drop", 1).otherwise(0))
            .cast("bigint").alias("quality_drops"),
            F.sum(F.when(F.col("fate") == "dup_drop", 1).otherwise(0))
            .cast("bigint").alias("dup_drops"),
            F.sum(F.when(F.col("fate") == "kept", 1).otherwise(0))
            .cast("bigint").alias("kept_docs"),
            F.coalesce(
                F.sum(F.when(F.col("fate") == "kept", F.col("ntok"))),
                F.lit(0),
            ).cast("bigint").alias("kept_tokens"),
        )
        .orderBy("split", "lang")
    )
