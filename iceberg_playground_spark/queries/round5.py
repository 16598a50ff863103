"""Round-5 operator widening.

Lakehouse: CDC changelog scan (b87 — Iceberg's create_changelog_view
over the tables.py snapshot log), z-order data skipping graded end to
end (b88), partition evolution graded (b89 — previously pytest-only
Layer A+). LLM-pipeline: random-hyperplane LSH blocking report over
embeddings (c29 — the vector-signature member of the dedup family),
deterministic fixed-size per-group sampling (c30), MinHash
Jaccard-estimation accuracy vs exact (c31 — grades the estimator the
c02 dedup path relies on), and train/eval distribution-drift report
(p12 — the check that a split didn't skew a language's token share).

Grading order is pinned by explicit registry lists (import order
stopped mattering in round 5); every query here carries a hash-match
oracle and was driver-graded green in round 6 (CORRECTNESS_r06).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import (
    bucket_sql as _bucket_sql,
    hash_bucket as _hash_bucket,
    load,
)
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.queries.llm import (
    _SH_SQL,
    _shingles,
    _tokens,
)
from iceberg_playground_spark.queries.meta import _RP_SIGNS
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.tables import LakeCatalog, LakeTable


# ---------------------------------------------------------------------------
# b87 — CDC changelog scan
# ---------------------------------------------------------------------------


@query(
    "b87_changelog_scan",
    oracle="""
    SELECT CAST(2 AS INT) AS commit_version, 'insert' AS change_type,
           CAST(0 AS INT) AS r_regionkey, 'REGION ZERO' AS r_name
    UNION ALL SELECT 2, 'insert', 99, 'REGION NEW'
    UNION ALL SELECT 2, 'delete', r_regionkey, r_name
      FROM region WHERE r_regionkey = 0
    UNION ALL SELECT 3, 'delete', r_regionkey, r_name
      FROM region WHERE r_regionkey = 3
    """,
)
def b87_changelog_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B87: CDC changelog between snapshots (Iceberg's
    create_changelog_view; the downstream-consumption complement of
    b72's incremental append scan, which sees only inserts). v1
    appends the regions, v2 UPSERTS (replace key 0, insert key 99),
    v3 deletes key 3, v4 compacts. ``changelog(1, HEAD)`` emits the
    upsert as delete(old row 0) + insert(new 0, new 99) at v2 and the
    masked row at v3 — and emits NOTHING for the compaction, because a
    rewrite changes files, not rows (surfacing it would be CDC noise).

    Scale shape (tables.changelog): per-version file selection is
    snapshot metadata; inserts read only that version's delta files;
    deletes recover masked rows by broadcasting the key-only delete
    files against the prior snapshot — never a full two-snapshot diff."""

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "region_cdc", "r_regionkey INT, r_name STRING",
            drop_if_exists=True,
        )
        t.append(load(spark, sf, "region").select("r_regionkey", "r_name"))
        t.upsert(
            spark.createDataFrame(
                [(0, "REGION ZERO"), (99, "REGION NEW")],
                "r_regionkey INT, r_name STRING",
            ),
            ["r_regionkey"],
        )
        t.delete_where("r_regionkey = 3", ["r_regionkey"])
        t.compact(target_files=1)  # must NOT appear in the changelog
        return t

    t = _built(spark, sf, "b87", build)
    return t.changelog(1, t.current_version())


# ---------------------------------------------------------------------------
# b88 — z-order data skipping, graded
# ---------------------------------------------------------------------------


@query(
    "b88_zorder_skipping",
    oracle="""
    WITH b AS (
      SELECT min(o_orderkey) AS xmn, max(o_orderkey) AS xmx,
             min(o_custkey) AS ymn, max(o_custkey) AS ymx
      FROM orders),
    box AS (
      SELECT xmn + (xmx - xmn) * 2 // 5 AS xlo,
             xmn + (xmx - xmn) * 3 // 5 AS xhi,
             ymn + (ymx - ymn) * 2 // 5 AS ylo,
             ymn + (ymx - ymn) * 3 // 5 AS yhi
      FROM b)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           TRUE AS x_pruned, TRUE AS y_pruned
    FROM orders, box
    WHERE o_orderkey BETWEEN xlo AND xhi
      AND o_custkey BETWEEN ylo AND yhi
    """,
)
def b88_zorder_skipping(spark: SparkSession, sf: str) -> DataFrame:
    """B88: multi-dimensional data skipping via z-order compaction
    (Iceberg/Delta OPTIMIZE ZORDER), graded — the Layer A+ capability
    previously proven only in pytest. Orders is rewritten clustered on
    the bit-interleaved (o_orderkey, o_custkey) key into 16 files;
    a 20%×20% box query then proves BOTH dimensions prune files from
    footer bounds alone — a single-key sort would cluster only its own
    column and prune nothing on the other (pinned by the write-path
    tests). At 100 TB this is the layout for workloads that filter on
    two+ independent dimensions (time × tenant, key × region).

    The box bounds derive from min/max by INTEGER arithmetic mirrored
    exactly in the oracle; exact row/cents aggregates come from the
    residually-filtered pruned scan, and the pruning booleans assert
    ≥4 of the 16 files pruned per dimension — wide margin under
    repartitionByRange's sampled boundaries, which make exact per-file
    counts nondeterministic (the b61/b67 parallelism-invariance rule)."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "orders_z",
            "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE",
            drop_if_exists=True,
        )
        o = load(spark, sf, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        t.append(o)
        t.compact(target_files=16, zorder_by=["o_orderkey", "o_custkey"])
        row = o.agg(
            F.min("o_orderkey"), F.max("o_orderkey"),
            F.min("o_custkey"), F.max("o_custkey"),
        ).first()
        xmn, xmx, ymn, ymx = (int(v) for v in row)
        return (
            t,
            xmn + (xmx - xmn) * 2 // 5, xmn + (xmx - xmn) * 3 // 5,
            ymn + (ymx - ymn) * 2 // 5, ymn + (ymx - ymn) * 3 // 5,
        )

    t, xlo, xhi, ylo, yhi = _built(spark, sf, "b88", build)
    _, pruned_x = t.plan_files("o_orderkey", xlo, xhi)
    _, pruned_y = t.plan_files("o_custkey", ylo, yhi)
    agg = (
        t.scan_where("o_orderkey", xlo, xhi)
        .filter(F.col("o_custkey").between(ylo, yhi))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )
    return agg.select(
        "n_rows",
        "total_cents",
        F.lit(pruned_x >= 4).alias("x_pruned"),
        F.lit(pruned_y >= 4).alias("y_pruned"),
    )


# ---------------------------------------------------------------------------
# b89 — partition evolution, graded
# ---------------------------------------------------------------------------


@query(
    "b89_partition_evolution",
    oracle="""
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
           TRUE AS old_layout_pruned, TRUE AS pruned_to_one_partition
    FROM nation GROUP BY n_regionkey
    """,
)
def b89_partition_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """B89: partition-spec evolution (Iceberg's marquee advantage over
    hive tables), graded — previously pytest-only. Nations of regions
    0-1 land UNPARTITIONED; the spec then evolves to identity-partition
    on n_regionkey (metadata-only — zero files rewritten); regions 2-4
    land in hive layout. One HEAD read serves both generations (the
    per-region counts match the raw table), and a single-region scan
    proves the two pruning paths compose: the old-layout file set
    prunes via FOOTER bounds (its keys are 0-1, the probe is 3) while
    the new layout prunes to exactly the n_regionkey=3 directory from
    the PATH alone — at 100 TB a spec change costs nothing and old
    data keeps skipping."""

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "nation_pe",
            "n_nationkey INT, n_name STRING, n_regionkey INT",
            drop_if_exists=True,
        )
        n = load(spark, sf, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        t.append(n.filter(F.col("n_regionkey") < 2))
        t.set_partition_spec(["n_regionkey"])
        t.append(n.filter(F.col("n_regionkey") >= 2))
        return t

    t = _built(spark, sf, "b89", build)
    kept, _ = t.plan_files("n_regionkey", 3, 3)
    kept_paths = [p for e in kept for p in e.get("paths", [])]
    old_layout_pruned = all("n_regionkey=" in p for p in kept_paths)
    parts = {
        comp.split("=", 1)[1]
        for p in kept_paths
        for comp in p.split("/")
        if comp.startswith("n_regionkey=")
    }
    pruned_to_one = parts == {"3"}
    return (
        t.read()
        .groupBy("n_regionkey")
        .agg(F.count("*").cast("bigint").alias("n_nations"))
        .select(
            "n_regionkey",
            "n_nations",
            F.lit(old_layout_pruned).alias("old_layout_pruned"),
            F.lit(pruned_to_one).alias("pruned_to_one_partition"),
        )
    )


# ---------------------------------------------------------------------------
# c29 — random-hyperplane LSH blocking report
# ---------------------------------------------------------------------------

_LSH_BANDS5 = 4
_LSH_BITS = 4  # bits per band; 16 sign bits total, c27's projection matrix


def _c29_bit_sql(j: int) -> str:
    """Spark-SQL text of sign bit j: the identical
    ``when(_dot(embedding, signs_j) >= 0, 1).otherwise(0)`` tree
    (sequential left-fold dot over double-cast elements; 0.0D keeps
    the fold's zero a DOUBLE literal exactly as F.lit(0.0) did)."""
    signs = ",".join(str(int(s)) for s in _RP_SIGNS[j])
    return (
        "case when (aggregate(zip_with("
        "transform(embedding, x -> cast(x as double)), "
        f"transform(array({signs}), x -> cast(x as double)), "
        "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)) >= 0 "
        "then 1 else 0 end"
    )


def _c29_dot_sql(j: int) -> str:
    lit = "[" + ",".join(str(s) for s in _RP_SIGNS[j]) + "]"
    return (
        f"list_reduce(list_transform(range(1, 65), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]), "
        f"(x, y) -> x + y)"
    )


def _c29_oracle() -> str:
    bit_cols = ", ".join(
        f"CASE WHEN {_c29_dot_sql(j)} >= 0 THEN 1 ELSE 0 END AS bit{j}"
        for j in range(_LSH_BANDS5 * _LSH_BITS)
    )
    band_selects = " UNION ALL ".join(
        "SELECT {b} AS band, {val} AS bval FROM s".format(
            b=b,
            val=" + ".join(
                f"bit{b * _LSH_BITS + r} * {1 << (_LSH_BITS - 1 - r)}"
                for r in range(_LSH_BITS)
            ),
        )
        for b in range(_LSH_BANDS5)
    )
    return f"""
    WITH s AS (SELECT vec_id, {bit_cols} FROM embeddings),
    bands AS ({band_selects}),
    buckets AS (
      SELECT band, bval, count(*) AS k FROM bands GROUP BY band, bval)
    SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(k * (k - 1) // 2) AS BIGINT) AS n_candidate_pairs,
           CAST(max(k) AS BIGINT) AS max_bucket
    FROM buckets GROUP BY band
    """


@query("c29_hyperplane_lsh", oracle=_c29_oracle())
def c29_hyperplane_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """C29: random-hyperplane (sign) LSH over embeddings — the
    VECTOR-signature member of the dedup/blocking family (c02 minhash
    on sets, c08 simhash on tokens, c10 exact label blocks, c11 IVF
    cells). Each vector gets 16 sign bits from c27's fixed ±1
    projection matrix; 4 bands × 4 bits become bucket keys, and the
    report grades the blocking itself: buckets per band, candidate
    pairs Σk(k-1)/2 (the work an LSH near-dup join would do — compare
    to |corpus|²/2 for all-pairs), and the hottest bucket (the skew
    bound; a salted canon-agg absorbs it exactly as c02 does).

    Scale shape: one embeddings scan, 16 fold dot products per row
    (JVM arithmetic), a 4× explode on (band, bval) — tiny integer
    keys — and two bounded aggregations. No pair is ever materialized;
    the candidate count is computed from bucket sizes. Sign bits are
    deterministic: both engines run the identical sequential fold over
    identical literals, so even a dot product at ±ulp of zero lands on
    the same side."""
    e = load(spark, sf, "embeddings")
    # the 16 sign bits + 4 band structs render as ONE parsed SQL
    # expression (round-16 rule) — the identical _dot/when trees
    # built column-by-column cost ~250 py4j round-trips per call
    bands_expr = "array(" + ", ".join(
        "named_struct('band', {b}, 'bval', {val})".format(
            b=b,
            val=" + ".join(
                f"({_c29_bit_sql(b * _LSH_BITS + r)})"
                f" * {1 << (_LSH_BITS - 1 - r)}"
                for r in range(_LSH_BITS)
            ),
        )
        for b in range(_LSH_BANDS5)
    ) + ")"
    bands = e.select(
        "vec_id", F.explode(F.expr(bands_expr)).alias("bk")
    ).select("vec_id", "bk.band", "bk.bval")
    buckets = bands.groupBy("band", "bval").agg(F.count("*").alias("k"))
    return (
        buckets.groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum(F.expr("(k * (k - 1)) div 2"))
            .cast("bigint")
            .alias("n_candidate_pairs"),
            F.max("k").cast("bigint").alias("max_bucket"),
        )
    )


# ---------------------------------------------------------------------------
# c30 — deterministic fixed-size per-group sample
# ---------------------------------------------------------------------------

_SAMPLE_K = 32


@query(
    "c30_group_sample",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(row_number() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
             AS sample_rank
    FROM documents
    QUALIFY sample_rank <= {_SAMPLE_K}
    """,
)
def c30_group_sample(spark: SparkSession, sf: str) -> DataFrame:
    """C30: deterministic fixed-SIZE per-group sampling — exactly k
    docs per language, stable under re-runs and data growth in other
    groups (the eval-set / human-review draw; c18's rate-based cousin
    keeps a fixed FRACTION instead). Ordering by md5(doc_id) is a
    seeded uniform shuffle both engines compute identically, so the
    sample is reproducible anywhere — no rand(), which would re-draw
    on every task retry.

    Scale shape: one shuffle on lang; InferWindowGroupLimit pushes the
    k-limit map-side, so each task forwards at most k rows per group
    to the exchange — the corpus never concentrates on the window
    tasks (same group-limit contract test_plans pins for c01/b37)."""
    d = load(spark, sf, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("int").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= _SAMPLE_K)
    )


# ---------------------------------------------------------------------------
# c31 — MinHash estimation accuracy vs exact Jaccard
# ---------------------------------------------------------------------------

_MH_K = 32
# One-base-hash MinHash (the standard construction): every shingle is
# digested ONCE (md5 → 32-bit integer), and the k "permutations" are k
# affine maps (a·d + b) mod 2^32 over that digest — integer arithmetic
# both engines evaluate bit-identically. vs k independent md5 calls
# this is ~6x cheaper at sf0.1 (the md5 pass dominated the query) and
# is exactly how production MinHash libraries scale k.
_MH_M = 1 << 32
_MH_A = [((1103515245 * (i + 1)) % (1 << 30)) | 1 for i in range(_MH_K)]
_MH_B = [(12345 + 987654321 * i) % (1 << 31) for i in range(_MH_K)]


def _c31_sig_sql() -> str:
    comps = ", ".join(
        f"list_min(list_transform(ds, d -> ({a} * d + {b}) % {_MH_M}))"
        for a, b in zip(_MH_A, _MH_B)
    )
    return f"[{comps}]"


_C31_ORACLE = f"""
    WITH shd AS (
      SELECT doc_id, lang, n_chars, {_SH_SQL} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3),
    dd AS (
      SELECT doc_id, lang, n_chars, sh,
             list_transform(sh, s ->
               CAST('0x' || substring(md5(s), 1, 8) AS BIGINT)) AS ds
      FROM shd),
    sig AS (SELECT doc_id, {_c31_sig_sql()} AS sig FROM dd),
    post AS (
      SELECT doc_id, lang, n_chars, len(sh) AS n_sh, unnest(sh) AS s
      FROM shd),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             a.n_sh AS a_n, b.n_sh AS b_n, count(*) AS inter
      FROM post a JOIN post b
        ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
       AND abs(a.n_chars - b.n_chars) <= 60
      GROUP BY 1, 2, 3, 4),
    sel AS (
      SELECT a_id, b_id, inter, a_n + b_n - inter AS uni
      FROM pairs WHERE inter * 10 >= (a_n + b_n - inter) * 3)
    SELECT a_id, b_id,
           round(inter * 1.0 / uni, 6) AS jaccard,
           round(len(list_filter(
                   list_transform(range(1, {_MH_K} + 1),
                                  i -> sa.sig[i] = sb.sig[i]),
                   x -> x)) / {_MH_K}.0, 6) AS mh_est,
           round(abs(inter * 1.0 / uni
                 - len(list_filter(
                     list_transform(range(1, {_MH_K} + 1),
                                    i -> sa.sig[i] = sb.sig[i]),
                     x -> x)) / {_MH_K}.0), 6) AS abs_err
    FROM sel
    JOIN sig sa ON sa.doc_id = sel.a_id
    JOIN sig sb ON sb.doc_id = sel.b_id
"""


@query("c31_minhash_estimate", oracle=_C31_ORACLE)
def c31_minhash_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """C31: MinHash estimator accuracy report — for every true
    near-dup pair (exact 3-gram Jaccard ≥ 0.3 via c09's
    inverted-index join), the 32-permutation MinHash agreement
    estimate and its absolute error. This grades the estimator the
    LSH dedup path (c02) stakes its recall on: E[agreement] =
    Jaccard, and the report shows the spread at k=32 — the number a
    pipeline owner consults before trading k (signature bytes) for
    dedup recall at 100 TB. Unlike c02's engine-native xxhash64
    signatures (rows-only), these permutations are md5-derived and
    hash-match DuckDB exactly.

    Scale shape: shingles and their base digests compute ONCE (lazy
    localCheckpoint feeds both the postings join and the signatures),
    hash-repartitioned on doc_id first so the md5/permutation CPU work
    parallelizes even when the source is a single parquet file (one
    row group = one input split — maxPartitionBytes cannot divide it);
    candidates come from the same Σdf² postings join as c09 — never
    all pairs; signatures join back by doc_id on pair count (tiny
    after the ≥0.3 filter)."""
    d = load(spark, sf, "documents")
    shd = (
        d.select(
            "doc_id", "lang", "n_chars", _shingles(_tokens()).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn(
            "ds",
            F.transform(
                F.col("sh"),
                lambda s: F.conv(F.md5(s).substr(1, 8), 16, 10).cast(
                    "bigint"
                ),
            ),
        )
        .localCheckpoint(eager=False)
    )

    # The 32-permutation signature array renders as ONE parsed SQL
    # expression — the identical tree built column-by-column cost
    # ~1.3 s of py4j round-trips per call (measured round 16; the
    # OPTIMIZATION_r16.md batch-2 rule). Constants are module ints.
    perms = ", ".join(
        f"array_min(transform(ds, x -> ({int(_MH_A[i])} * x"
        f" + {int(_MH_B[i])}) % {int(_MH_M)}))"
        for i in range(_MH_K)
    )
    sig = shd.select("doc_id", F.expr(f"array({perms})").alias("sig"))
    post = shd.select(
        "doc_id", "lang", "n_chars",
        F.size("sh").alias("n_sh"), F.explode("sh").alias("s"),
    )
    a = post.select(
        F.col("lang").alias("a_lang"), "s",
        F.col("doc_id").alias("a_id"), F.col("n_chars").alias("a_nc"),
        F.col("n_sh").alias("a_n"),
    )
    b = post.select(
        F.col("lang").alias("b_lang"), "s",
        F.col("doc_id").alias("b_id"), F.col("n_chars").alias("b_nc"),
        F.col("n_sh").alias("b_n"),
    )
    pairs = (
        a.join(
            b,
            (F.col("a_lang") == F.col("b_lang"))
            & (a["s"] == b["s"])
            & (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_nc") - F.col("b_nc")) <= 60),
        )
        .groupBy("a_id", "b_id", "a_n", "b_n")
        .agg(F.count("*").alias("inter"))
        .withColumn("uni", F.col("a_n") + F.col("b_n") - F.col("inter"))
        .filter(F.col("inter") * 10 >= F.col("uni") * 3)
    )
    sa = sig.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("sa"))
    sb = sig.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("sb"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sa", "sb", lambda x, y: x == y), lambda m: m
            )
        )
        / float(_MH_K)
    )
    jac = F.col("inter").cast("double") / F.col("uni")
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(jac, 6).alias("jaccard"),
            F.round(est, 6).alias("mh_est"),
            F.round(F.abs(jac - est), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# p12 — train/eval distribution drift report
# ---------------------------------------------------------------------------


@query(
    "p12_split_drift",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             CASE WHEN {_bucket_sql('doc_id')} < 90
                  THEN 'train' ELSE 'eval' END AS split,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      FROM documents),
    per AS (
      SELECT lang,
             CAST(count(*) FILTER (WHERE split = 'train') AS BIGINT)
               AS train_docs,
             CAST(count(*) FILTER (WHERE split = 'eval') AS BIGINT)
               AS eval_docs,
             CAST(COALESCE(sum(tok) FILTER (WHERE split = 'train'), 0)
                  AS BIGINT) AS train_tokens,
             CAST(COALESCE(sum(tok) FILTER (WHERE split = 'eval'), 0)
                  AS BIGINT) AS eval_tokens
      FROM t GROUP BY lang),
    tot AS (
      SELECT sum(train_tokens) AS tt, sum(eval_tokens) AS et FROM per)
    SELECT lang, train_docs, eval_docs,
           CAST(train_tokens * 1000 // tt AS BIGINT) AS train_share_pm,
           CAST(eval_tokens * 1000 // et AS BIGINT) AS eval_share_pm,
           CAST(abs(train_tokens * 1000 // tt - eval_tokens * 1000 // et)
                AS BIGINT) AS drift_pm
    FROM per, tot
    """,
)
def p12_split_drift(spark: SparkSession, sf: str) -> DataFrame:
    """P12: train/eval distribution drift — per language, doc counts
    and token SHARE (per-mille) in each side of c17's hash split, with
    the absolute share drift. This is the report that catches a split
    (or an upstream filter) silently skewing a language's token budget
    between train and eval — the ablation-invalidating failure p11's
    gate matrix guards against within a single corpus.

    All arithmetic is integer (token counts, per-mille via integer
    division) so the report hash-matches bit-for-bit. Scale shape: one
    corpus scan → one |langs|-row aggregate (map-side partials); the
    global totals re-aggregate THAT tiny frame (lazily checkpointed so
    its lineage — the corpus scan — runs once, the c09 rule) and
    broadcast back. The corpus itself is never reshuffled."""
    d = load(spark, sf, "documents")
    split = F.when(_hash_bucket(F.col("doc_id")) < 90, "train").otherwise(
        "eval"
    )
    tok = F.size(_tokens()).cast("bigint")
    base = d.select("lang", split.alias("split"), tok.alias("tok"))
    per = (
        base.groupBy("lang")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .cast("bigint")
            .alias("train_docs"),
            F.sum(F.when(F.col("split") == "eval", 1).otherwise(0))
            .cast("bigint")
            .alias("eval_docs"),
            F.coalesce(
                F.sum(F.when(F.col("split") == "train", F.col("tok"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("train_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("split") == "eval", F.col("tok"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("eval_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per.agg(
        F.sum("train_tokens").alias("tt"), F.sum("eval_tokens").alias("et")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "train_docs",
        "eval_docs",
        F.expr("train_tokens * 1000 div tt").cast("bigint").alias(
            "train_share_pm"
        ),
        F.expr("eval_tokens * 1000 div et").cast("bigint").alias(
            "eval_share_pm"
        ),
        F.expr(
            "abs(train_tokens * 1000 div tt - eval_tokens * 1000 div et)"
        )
        .cast("bigint")
        .alias("drift_pm"),
    )
