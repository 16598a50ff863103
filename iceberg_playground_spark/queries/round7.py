"""Round-7 operators: the compositions a 100 TB training-data
pipeline still lacked (VERDICT r6, item 6), closing the incremental
near-dedup loop end-to-end.

- p17: cross-run INCREMENTAL near-dup — p14's ingest report lifted
  from exact fingerprints to MinHash-LSH: the new batch's band
  signatures (c02's banding) probe the existing corpus's signature
  index over b72's incremental read, so near-dedup composes with CDC
  ingestion instead of rescanning the corpus per batch. (Ref anchor:
  the reference's ingestion loop appends batch-by-batch —
  /root/reference/kafka-load-gen/main.go:51-120 — and never
  re-reads history; the dedup question at ingest time is exactly
  "new batch vs what we already hold".)
- c38: PQ-shortlist → exact re-rank — c36's ADC scan produces a
  bounded candidate shortlist from 8 B/vector codes, then ONLY the
  shortlist's float vectors are read for the exact cosine top-k;
  proves the compression-then-exact composition end-to-end as one
  plan (FAISS's ADC + re-ranking, Jégou et al. 2011, PAPERS.md).
- c39: the signature index p17 probes, MAINTAINED as a lake table by
  MERGE (edited docs' rows replaced, new docs' rows inserted) and
  hash-proved equal to a from-scratch rebuild.
- p18: the same novelty probe run as a STREAMING pipeline (file
  stream → sign → probe static index → land only novel docs), with
  batch/stream parity proved by the oracle.
- c40: the full IVF + ADC + exact-re-rank composition (FAISS's
  IVFADC shape over the deterministic codebook), unifying c11's
  cells with c36/c38's codes.
- p19: contamination-SAFE splitting — c17's hash split with eval
  near-dups dropped from train via the same signature probe
  (decontamination applied where leakage actually happens).
- p20: corpus build v2 — LSH dedup → split → decontamination →
  release report, the whole modern pipeline in one graded plan (and,
  via the affine family, the hash-graded sibling of rows-only c02's
  banded dedup).
- c41/c42: the remaining mergeable-sketch members (theta set
  algebra, KLL quantile rollup) with in-row exact counterparts and
  pinned error contracts (rows-only: DataSketches state).
- b132: offline state-store inspection via Spark 4's state data
  source — checkpointed streaming state read back as a DataFrame and
  hash-proved equal to the batch semantics it encodes.
- b133/b134: a custom Python SINK (the Data Source API's write side,
  batch + streaming) with the reference's two-phase
  writer-fleet/committer protocol and per-epoch manifests, graded by
  write→commit→read round trips.
- b135: time-partitioned retention — the partition-aligned
  delete_range in its production shape, hash-graded INCLUDING the
  metadata-only planner flag.

All are hash-oracle graded: the LSH trio shares c31's one-base-hash
affine MinHash family (portable integer arithmetic, unlike c02's
engine-native xxhash64), c38 skips Lloyd training (the
float-averaging step that forces c36 to rows-only) and quantizes
against the deterministic md5-seeded codebook — every fold on both
sides is the same left-to-right IEEE sequence, so the bits agree
(the llm.py module-docstring determinism contract).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import (
    bucket_sql,
    hash_bucket,
    lit_double_array,
    load,
)
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.queries.llm import (
    _SH_SQL,
    _dot,
    _dot_sql,
    _norm,
    _norm_sql,
    _shingles,
    _tokens,
)
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.tables import LakeCatalog, LakeTable

# ---------------------------------------------------------------------------
# p17 — incremental MinHash-LSH near-dup vs the existing corpus
# ---------------------------------------------------------------------------

_P17_PERMS = 16
_P17_BANDS = 4
_P17_ROWS = _P17_PERMS // _P17_BANDS
# One-base-hash affine MinHash family (c31's construction, round5.py:
# 394-403): every shingle digests ONCE (md5 → 32-bit int) and the 16
# "permutations" are affine maps (a·d + b) mod 2^32 — integer
# arithmetic both engines evaluate bit-identically, ~6x cheaper than
# 16 independent md5 passes (measured on c31 at sf0.1; p17's first
# cut with per-seed md5 benched 5.24 s, this form 2.9 s).
_P17_M = 1 << 32
_P17_A = [((1103515245 * (i + 1)) % (1 << 30)) | 1 for i in range(_P17_PERMS)]
_P17_B = [(12345 + 987654321 * i) % (1 << 31) for i in range(_P17_PERMS)]


def _mh_affine_expr(i: int) -> str:
    """SQL text of permutation i over the per-shingle base digests in
    ``ds`` — the same ``array_min(transform(...))`` tree the old
    column-by-column builder made, rendered as one parsed expression
    (constants are module ints, int()-coerced; the old builder's
    closure-constant rule — llm.py:94 — is moot in SQL text, where
    the constants are inlined)."""
    a, b = int(_P17_A[i]), int(_P17_B[i])
    return f"array_min(transform(ds, d -> ({a} * d + {b}) % {int(_P17_M)}))"


def _band_sig_structs_expr() -> str:
    """SQL text of the 4 (band, sig) structs: sig = md5 of the band's
    4 minhash ints, '|'-joined — one md5 per band per doc (the only
    string hashing left after the affine family). Same trees as the
    old F.struct/F.concat builder, one parse."""
    structs = []
    for b in range(_P17_BANDS):
        parts: list[str] = []
        for r in range(_P17_ROWS):
            if parts:
                parts.append("'|'")
            parts.append(f"cast(mh{b * _P17_ROWS + r} as string)")
        structs.append(
            f"named_struct('band', {b}, 'sig', md5(concat({', '.join(parts)})))"
        )
    return f"array({', '.join(structs)})"


def _digest_col() -> Column:
    """Per-shingle base digest (md5 bottom-32 → bigint), both engines.
    Built lazily — a higher-order-function lambda needs an ACTIVE
    SparkSession at construction, which import time doesn't have."""
    return F.transform(
        F.col("sh"),
        lambda s: F.conv(F.md5(s).substr(1, 8), 16, 10).cast("bigint"),
    )


_DIGEST_SQL = (
    "list_transform(sh, s -> "
    "CAST('0x' || substring(md5(s), 1, 8) AS BIGINT))"
)


def _band_sigs(df: DataFrame, *keep: str) -> DataFrame:
    """(keep..., band, sig) rows for every ≥3-token doc in ``df`` —
    the shared signature pipeline of p17/c39/p18 (also p19/p20/p27/
    c49/c83): one md5 per shingle, 16 affine permutations, one md5
    per band. The 16 permutation columns and the 4 band structs
    render as parsed SQL (identical trees) instead of ~200
    per-element py4j constructions — this builder runs 1-2x inside
    every caller's timed cell, so construction chatter was charged to
    eight bench cells at once (OPTIMIZATION_r16.md batch 2's rule)."""
    mh_exprs = [
        f"{_mh_affine_expr(i)} AS mh{i}" for i in range(_P17_PERMS)
    ]
    return (
        df.select(*keep, _shingles(_tokens()).alias("sh"))
        .filter(F.size("sh") > 0)
        .select(*keep, _digest_col().alias("ds"))
        .selectExpr(*keep, *mh_exprs)
        .select(
            *keep,
            F.explode(F.expr(_band_sig_structs_expr())).alias("bk"),
        )
        .select(*keep, "bk.band", "bk.sig")
    )


def _mh_sql() -> str:
    """The 16 affine-permutation minhash columns over ``ds``."""
    return ",\n             ".join(
        f"list_min(list_transform(ds, d -> ({a} * d + {b}) % {_P17_M}))"
        f" AS mh{i}"
        for i, (a, b) in enumerate(zip(_P17_A, _P17_B))
    )


def _sig_sql(b: int) -> str:
    parts = " || '|' || ".join(
        f"CAST(mh{b * _P17_ROWS + r} AS VARCHAR)" for r in range(_P17_ROWS)
    )
    return f"md5({parts})"


def _bands_union_sql(src: str, keep: str = "") -> str:
    """UNION ALL of the 4 per-band (keep..., band, sig) selects."""
    pre = f"{keep}, " if keep else ""
    return " UNION ALL ".join(
        f"SELECT {pre}{b} AS band, {_sig_sql(b)} AS sig FROM {src}"
        for b in range(_P17_BANDS)
    )


def _p17_oracle() -> str:
    bkt = bucket_sql("doc_id")
    mh = _mh_sql()
    bands_b = _bands_union_sql("bmh")
    bands_d = _bands_union_sql("dmh", "doc_id")
    digest = _DIGEST_SQL
    return f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE {bkt} < 80),
         delta AS (SELECT doc_id, lang, text FROM documents
                   WHERE {bkt} >= 80),
         bsh AS (SELECT doc_id, {digest} AS ds
                 FROM (SELECT doc_id, {_SH_SQL} AS sh FROM base)
                 WHERE len(sh) > 0),
         bmh AS (SELECT doc_id, {mh} FROM bsh),
         bsig AS (SELECT DISTINCT band, sig FROM ({bands_b})),
         dsh AS (SELECT doc_id, {digest} AS ds
                 FROM (SELECT doc_id, {_SH_SQL} AS sh FROM delta)
                 WHERE len(sh) > 0),
         dmh AS (SELECT doc_id, {mh} FROM dsh),
         dsig AS (SELECT DISTINCT doc_id, band, sig FROM ({bands_d})),
         hits AS (SELECT DISTINCT dsig.doc_id
                  FROM dsig JOIN bsig USING (band, sig))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_new,
           CAST(count(hits.doc_id) AS BIGINT) AS n_near_dup_vs_base,
           CAST(count(*) - count(hits.doc_id) AS BIGINT) AS n_novel
    FROM delta LEFT JOIN hits ON delta.doc_id = hits.doc_id
    GROUP BY lang
    """


@query("p17_incremental_lsh_dedup", oracle=_p17_oracle())
def p17_incremental_lsh_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """P17: incremental MinHash-LSH near-dup report — p14's ingest
    question upgraded from exact fingerprints to NEAR duplicates: the
    corpus lives as a lake table (80% at v1), the ingestion batch
    lands as v2, and the report reads ONLY the delta (read_incremental
    — file selection is snapshot metadata) and probes its LSH band
    signatures against the existing corpus's distinct signature index.
    Per language: new docs, near-dups vs base, novel docs.

    Banding is c02's 16-perm × 4-band scheme over c31's one-base-hash
    affine family (portable integer arithmetic → hash-oracle graded;
    c02 keeps the engine-native xxhash64 fast path). A doc is
    near-dup iff ANY band signature collides — P[collide] =
    1-(1-j^4)^4 over 3-gram Jaccard j.

    Scale shape: signatures are per-row array math — each shingle is
    md5-digested ONCE, the 16 permutations are affine maps over that
    digest, and one md5 per band makes the bucket key (one scan per
    side); the probe is a DIGEST-ONLY equi-join on (band, sig) — at
    100 TB the base signature index is exactly the table you'd
    maintain incrementally (4 small rows per corpus doc, appended as
    batches commit), so each ingest batch costs |batch| signature
    rows shuffled against the index, never a corpus rescan. Docs
    under 3 tokens carry no signature and count as novel on both
    engines."""

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "docs_lsh_inc",
            "doc_id BIGINT, lang STRING, text STRING",
            drop_if_exists=True,
        )
        # repartition BEFORE the appends: the documents source is one
        # parquet split, so without it each append writes ONE file and
        # every later read serializes its per-row CPU on one core
        # (c31's single-split parallelization note, round5.py)
        d = (
            load(spark, sf, "documents")
            .select("doc_id", "lang", "text")
            .repartition(8, "doc_id")
        )
        bucket = hash_bucket(F.col("doc_id"))
        t.append(d.filter(bucket < 80))   # v1: the existing corpus
        t.append(d.filter(bucket >= 80))  # v2: the ingestion batch
        return t

    t = _built(spark, sf, "p17", build)
    # no repartition needed before _band_sigs: the build wrote 8
    # files per append, so the shingle/digest CPU is split-parallel
    base_idx = _band_sigs(t.read(version=1)).distinct()
    delta = t.read_incremental(1, 2).select("doc_id", "lang", "text")
    hits = (
        _band_sigs(delta, "doc_id")
        .join(base_idx, ["band", "sig"], "leftsemi")
        .select("doc_id")
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    dup = F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
    return (
        delta.select("doc_id", "lang")
        .join(hits, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_new"),
            dup.cast("bigint").alias("n_near_dup_vs_base"),
            (F.count("*") - dup).cast("bigint").alias("n_novel"),
        )
    )


# ---------------------------------------------------------------------------
# c38 — PQ ADC shortlist → exact re-rank
# ---------------------------------------------------------------------------

_C38_SUB = 8    # subspaces (64 dims -> 8 x 8), c36's geometry
_C38_DIM = 8
_C38_K = 16     # centroids per subspace
_C38_SHORT = 50
_C38_TOPK = 10


def _pq_codebook(spark: SparkSession, emb: DataFrame):
    """Deterministic md5-seeded PQ codebook (c36's seeding, NO Lloyd
    step): centroids[s][j][d] python list + the broadcastable
    (s, j, cent) frame. The collect is codebook-sized (16 rows)."""
    seed_rows = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_C38_K)
        .select("embedding")
        .collect()
    )
    centroids = [
        [
            [
                float(seed_rows[j]["embedding"][s * _C38_DIM + d])
                for d in range(_C38_DIM)
            ]
            for j in range(_C38_K)
        ]
        for s in range(_C38_SUB)
    ]
    cent_df = spark.createDataFrame(
        [
            (s, j, centroids[s][j])
            for s in range(_C38_SUB)
            for j in range(_C38_K)
        ],
        "s INT, j INT, cent ARRAY<DOUBLE>",
    )
    return centroids, cent_df


def _pq_dists(emb: DataFrame, cent_df: DataFrame) -> DataFrame:
    """(vec_id, s, j, d2): every vector's subvectors against every
    subspace centroid — the shared substrate of PQ coding (argmin over
    j per s) and IVF cell assignment (ordered sum over s per j). The
    fold is the same left-to-right IEEE sequence as the oracle's
    list_reduce."""
    slices = F.array(
        *[
            F.slice("embedding", s * _C38_DIM + 1, _C38_DIM)
            for s in range(_C38_SUB)
        ]
    )
    subvecs = emb.select("vec_id", F.posexplode(slices).alias("s", "sub"))
    dist = F.aggregate(
        F.zip_with(
            F.transform("sub", lambda x: x.cast("double")),
            "cent",
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        subvecs.join(F.broadcast(cent_df), "s")
        .withColumn("d2", dist)
        .select("vec_id", "s", "j", "d2")
    )


def _pq_adc(q, centroids) -> list[tuple]:
    """(s, j, qd) ADC rows for query vector ``q`` — python floats ARE
    IEEE doubles and the loop folds in the oracle's order."""
    adc = []
    for s in range(_C38_SUB):
        for j in range(_C38_K):
            qd = 0.0
            for d in range(_C38_DIM):
                t = float(q[s * _C38_DIM + d]) - centroids[s][j][d]
                qd += t * t
            adc.append((s, j, qd))
    return adc


def _ordered_fold(val: str, key: str = "s") -> Column:
    """Deterministic grouped float sum: collect (key, val) structs,
    sort by key, fold left — a plain F.sum over floats is
    shuffle-order-dependent and can never hash-match."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(key, val))),
        F.lit(0.0),
        lambda acc, x: acc + x[val],
    )


def _q_cosine(q) -> Column:
    """Exact cosine vs the literal query vector, rounded at the output
    boundary (c03's determinism contract)."""
    qlit = lit_double_array(q)
    return F.round(
        _dot(F.col("embedding"), qlit)
        / (_norm(F.col("embedding")) * _norm(qlit)),
        6,
    ).alias("cosine")


def _c38_oracle() -> str:
    d = _C38_DIM

    def fold(a: str, b: str) -> str:
        # sequential L2 fold, same left-to-right order as Spark's
        # aggregate(zip_with(...)) — bit-stable across engines
        return (
            f"list_reduce(list_transform(range(1, {d + 1}), "
            f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
            f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
            f"(x, y) -> x + y)"
        )

    qsub = f"list_slice(qe, cent.s * {d} + 1, cent.s * {d} + {d})"
    return f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         ss AS (SELECT unnest(range(0, {_C38_SUB})) AS s),
         seeds AS (
           SELECT row_number() OVER (
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                    AS j,
                  embedding
           FROM embeddings QUALIFY j < {_C38_K}),
         cent AS (
           SELECT ss.s, seeds.j,
                  list_slice(embedding, ss.s * {d} + 1, ss.s * {d} + {d})
                    AS cent
           FROM seeds CROSS JOIN ss),
         sv AS (
           SELECT vec_id, ss.s,
                  list_slice(embedding, ss.s * {d} + 1, ss.s * {d} + {d})
                    AS sub
           FROM embeddings CROSS JOIN ss),
         asg AS (
           SELECT vec_id, s, (min({{'d2': d2, 'j': j}})).j AS code
           FROM (SELECT sv.vec_id, sv.s, cent.j,
                        {fold('sub', 'cent')} AS d2
                 FROM sv JOIN cent USING (s))
           GROUP BY vec_id, s),
         adc AS (
           SELECT cent.s, cent.j AS code, {fold(qsub, 'cent.cent')} AS qd
           FROM cent CROSS JOIN q),
         est AS (
           SELECT vec_id,
                  list_reduce(list(qd ORDER BY asg.s), (x, y) -> x + y)
                    AS est_d2
           FROM asg JOIN adc ON asg.s = adc.s AND asg.code = adc.code
           GROUP BY vec_id),
         short AS (SELECT vec_id FROM est
                   ORDER BY est_d2, vec_id LIMIT {_C38_SHORT})
    SELECT e.vec_id,
           round({_dot_sql('e.embedding', 'qe')}
                 / ({_norm_sql('e.embedding')} * {_norm_sql('qe')}), 6)
             AS cosine
    FROM embeddings e JOIN short USING (vec_id) CROSS JOIN q
    ORDER BY cosine DESC, e.vec_id
    LIMIT {_C38_TOPK}
    """


@query("c38_pq_rerank", oracle=_c38_oracle())
def c38_pq_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """C38: PQ ADC shortlist → EXACT re-rank — the end-to-end shape of
    a compressed vector index (FAISS IVFADC's refine step): quantize
    every vector to 8 four-bit codes against a deterministic codebook
    (c36's geometry, md5-seeded, NO Lloyd step — training's float
    averaging is what forces c36 to rows-only; skipping it keeps every
    arithmetic fold engine-identical and this query hash-graded),
    scan CODES ONLY with an 8x16 ADC lookup table to shortlist the
    top-{_C38_SHORT} candidates, then compute exact cosines for JUST
    the shortlist and return the top-{_C38_TOPK}.

    Scale shape: the candidate scan touches 8 B/vector codes + a
    broadcast KB-sized ADC table — at 100 TB that is the difference
    between scanning ~1 TB of codes and ~100 TB of floats; the exact
    re-rank reads {_C38_SHORT} float vectors (bounded by the LIMIT,
    independent of corpus size — TakeOrderedAndProject keeps the
    shortlist driver-tiny). No pair materializes anywhere. The two
    collects are codebook-sized (16 seed rows, 1 query row) by
    construction. Composes with c11's IVF cells (prune before ADC)
    unchanged."""
    emb = load(spark, sf, "embeddings")
    centroids, cent_df = _pq_codebook(spark, emb)
    codes = (
        _pq_dists(emb, cent_df)
        .groupBy("vec_id", "s")
        .agg(F.min_by("j", F.struct("d2", "j")).alias("code"))
    )
    q = emb.filter("vec_id = 0").select("embedding").collect()[0][
        "embedding"
    ]
    adc_df = spark.createDataFrame(
        _pq_adc(q, centroids), "s INT, code INT, qd DOUBLE"
    )
    est = (
        codes.join(F.broadcast(adc_df), ["s", "code"])
        .groupBy("vec_id")
        .agg(_ordered_fold("qd").alias("est_d2"))
    )
    short = est.orderBy("est_d2", "vec_id").limit(_C38_SHORT).select(
        "vec_id"
    )
    return (
        emb.join(F.broadcast(short), "vec_id")
        .select("vec_id", _q_cosine(q))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_C38_TOPK)
    )


# ---------------------------------------------------------------------------
# c39 — signature-index maintenance via MERGE
# ---------------------------------------------------------------------------


def _c39_oracle() -> str:
    bkt = bucket_sql("doc_id")
    return f"""
    WITH final_docs AS (
      SELECT doc_id,
             CASE WHEN {bkt} < 80 AND doc_id % 50 = 0
                  THEN text || ' v2' ELSE text END AS text
      FROM documents),
    sh0 AS (SELECT doc_id, {{sh}} AS sh FROM final_docs),
    dig AS (SELECT doc_id, {_DIGEST_SQL} AS ds FROM sh0
            WHERE len(sh) > 0),
    mh AS (SELECT doc_id, {_mh_sql()} FROM dig),
    sig AS ({_bands_union_sql('mh', 'doc_id')})
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT sig) AS BIGINT) AS n_distinct_sigs,
           min(sig) AS min_sig, max(sig) AS max_sig
    FROM sig GROUP BY band
    """.replace("{sh}", _SH_SQL)


@query("c39_signature_index_merge", oracle=_c39_oracle())
def c39_signature_index_merge(spark: SparkSession, sf: str) -> DataFrame:
    """C39: LSH signature-index MAINTENANCE — the operational closing
    of p17's loop: the (doc_id, band, sig) index p17 probes is itself
    a lake table kept current by MERGE, never recomputed. v1 seeds
    the index from the existing corpus; an ingestion batch arrives
    carrying NEW docs AND re-ingested EDITS of existing docs (every
    50th base doc with amended text — the CDC update case), and one
    three-clause MERGE (b96's machinery, equality on doc_id) lands
    it: edited docs' stale signature rows are equality-deleted and
    replaced, new docs' rows insert, untouched docs' rows are never
    rewritten. The graded output aggregates the MAINTAINED index per
    band (row count, distinct sigs, min/max sig) and the oracle
    recomputes the whole index FROM SCRATCH — hash-matching proves
    incremental maintenance ≡ full rebuild.

    Scale shape: the MERGE shuffles |batch|·4 signature rows (KB per
    doc) against manifest metadata — the corpus text is read once to
    sign the batch, never to maintain the index; at 100 TB the index
    is ~32 B/doc·4 and the rebuild this replaces is the full-corpus
    shingle pass. (Ref anchor: the reference's equality-delete
    ingestion, src/bin/deletes.rs:60-110, applied to index rows
    instead of data rows.)"""

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        idx = cat.create_table(
            "demo", "sig_index",
            "doc_id BIGINT, band INT, sig STRING",
            drop_if_exists=True,
        )
        d = (
            load(spark, sf, "documents")
            .select("doc_id", "text")
            .repartition(8, "doc_id")
        )
        bucket = hash_bucket(F.col("doc_id"))
        base = d.filter(bucket < 80)
        idx.append(_band_sigs(base, "doc_id"))  # v1: seeded index
        edited = base.filter(F.col("doc_id") % 50 == 0).withColumn(
            "text", F.concat(F.col("text"), F.lit(" v2"))
        )
        batch = d.filter(bucket >= 80).unionByName(edited)
        # one MERGE: stale rows of edited docs masked + replaced, new
        # docs inserted — the index never rebuilds
        idx.merge(_band_sigs(batch, "doc_id"), equality_cols=["doc_id"])
        return idx

    idx = _built(spark, sf, "c39", build)
    return idx.read().groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("sig").cast("bigint").alias("n_distinct_sigs"),
        F.min("sig").alias("min_sig"),
        F.max("sig").alias("max_sig"),
    )


# ---------------------------------------------------------------------------
# p18 — streaming novelty filter (CDC ingest keeps only novel docs)
# ---------------------------------------------------------------------------


def _p18_oracle() -> str:
    # novel docs per language == p17's n_novel, reshaped to one row
    # per (lang) with the count of docs that hit NO base band bucket
    bkt = bucket_sql("doc_id")
    return f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE {bkt} < 80),
         delta AS (SELECT doc_id, lang, text FROM documents
                   WHERE {bkt} >= 80),
         bsh AS (SELECT doc_id, {_DIGEST_SQL} AS ds
                 FROM (SELECT doc_id, {_SH_SQL} AS sh FROM base)
                 WHERE len(sh) > 0),
         bmh AS (SELECT doc_id, {_mh_sql()} FROM bsh),
         bsig AS (SELECT DISTINCT band, sig
                  FROM ({_bands_union_sql('bmh')})),
         dsh AS (SELECT doc_id, {_DIGEST_SQL} AS ds
                 FROM (SELECT doc_id, {_SH_SQL} AS sh FROM delta)
                 WHERE len(sh) > 0),
         dmh AS (SELECT doc_id, {_mh_sql()} FROM dsh),
         dsig AS (SELECT DISTINCT doc_id, band, sig
                  FROM ({_bands_union_sql('dmh', 'doc_id')})),
         hits AS (SELECT DISTINCT dsig.doc_id
                  FROM dsig JOIN bsig USING (band, sig))
    SELECT lang, CAST(count(*) AS BIGINT) AS n_novel
    FROM delta
    WHERE doc_id NOT IN (SELECT doc_id FROM hits)
    GROUP BY lang
    """


@query("p18_streaming_novelty_filter", oracle=_p18_oracle())
def p18_streaming_novelty_filter(
    spark: SparkSession, sf: str, files_per_trigger: int = 1
) -> DataFrame:
    """P18: STREAMING novelty filter — p17's ingest-time near-dedup
    run as a continuous pipeline: incoming documents arrive as a file
    stream (the Kafka-partition analogue, one micro-batch per file),
    each micro-batch signs its docs (the shared LSH pipeline), probes
    the STATIC base signature index, and appends ONLY the novel docs
    to the output lake table through the b54 machinery (executors
    write, one BatchedCommitter snapshot per epoch). b51 deduplicates
    a stream on exact keys; this is its NEAR-dup counterpart — the
    filter CDC ingestion actually wants ("drop re-crawls and
    boilerplate copies before they land").

    Deterministic despite streaming: novelty is judged against the
    static index only (batch boundaries cannot change the answer), so
    the drained table hash-matches p17's batch computation — the
    stream/batch parity Structured Streaming promises.

    Scale shape: per micro-batch work is |batch| signature rows +
    a digest equi-join against the index (broadcast when it fits,
    shuffle otherwise); no cross-batch state, so the stream runs
    forever at constant memory. (Ref anchor: the reference's
    consume→decode→write→commit loop, src/bin/bench-kafka.rs:66-173,
    with the novelty probe inserted between decode and write.)"""
    import shutil

    from iceberg_playground_spark.queries.streaming import _scratch
    from iceberg_playground_spark.tables import BatchedCommitter

    def build(tmp: str) -> tuple:
        d = (
            load(spark, sf, "documents")
            .select("doc_id", "lang", "text")
            .repartition(8, "doc_id")
        )
        bucket = hash_bucket(F.col("doc_id"))
        src = os.path.join(tmp, "incoming")
        # 4 arrival files -> 4 micro-batches: enough to prove
        # multi-epoch behavior while keeping per-epoch fixed costs
        # (plan compile, commit, checkpoint) amortized — at scale the
        # same lesson reads "size micro-batches so epoch overhead is
        # noise against batch work"
        d.filter(bucket >= 80).repartition(4, "doc_id").write.mode(
            "overwrite"
        ).parquet(src)
        idx = os.path.join(tmp, "base_index")
        _band_sigs(d.filter(bucket < 80)).distinct().write.mode(
            "overwrite"
        ).parquet(idx)
        return (src, idx)

    src, idx_path = _built(spark, sf, "p18", build)
    base_idx = spark.read.parquet(idx_path)

    stream = (
        spark.readStream.schema("doc_id BIGINT, lang STRING, text STRING")
        .option("maxFilesPerTrigger", files_per_trigger)  # epochs = 4/this
        .parquet(src)
    )

    out_root = _scratch("ips_stream_novel_")
    try:
        cat = LakeCatalog(spark, out_root)
        t = cat.create_table(
            "stream", "novel_docs", "doc_id BIGINT, lang STRING",
            drop_if_exists=True,
        )
        # interval-batched commits, the reference's committer shape
        # (decouple.rs:13 — flush every 5 s, NOT per writer epoch):
        # epochs stage files; the commit (and its footer-bounds job)
        # lands once at flush. b54 demonstrates the per-epoch variant.
        committer = BatchedCommitter(t, interval_s=5.0)

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            hits = (
                _band_sigs(batch_df, "doc_id")
                .join(base_idx, ["band", "sig"], "leftsemi")
                .select("doc_id")
                .distinct()
            )
            novel = batch_df.join(hits, "doc_id", "left_anti").select(
                "doc_id", "lang"
            )
            committer.add(t.stage_append(novel))

        q = (
            stream.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", _scratch("ips_stream_nvck_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        committer.flush()
        # SIZE GUARD: |langs|-row aggregate only — collected because
        # the scratch output table is deleted in the finally block, so
        # the returned frame must not reference its files (b131's
        # literal-result rule; never copy onto a non-aggregated frame)
        rows = (
            t.read()
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_novel"))
            .collect()
        )
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
    return spark.createDataFrame(rows, "lang STRING, n_novel BIGINT")


# ---------------------------------------------------------------------------
# c40 — IVF + ADC + exact re-rank (the full compressed-index pipeline)
# ---------------------------------------------------------------------------

_C40_NPROBE = 4
_C40_SHORT = 20
_C40_TOPK = 10


def _c40_oracle() -> str:
    d = _C38_DIM

    def fold(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, {d + 1}), "
            f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
            f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
            f"(x, y) -> x + y)"
        )

    qsub = f"list_slice(qe, cent.s * {d} + 1, cent.s * {d} + {d})"
    return f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         ss AS (SELECT unnest(range(0, {_C38_SUB})) AS s),
         seeds AS (
           SELECT row_number() OVER (
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                    AS j,
                  embedding
           FROM embeddings QUALIFY j < {_C38_K}),
         cent AS (
           SELECT ss.s, seeds.j,
                  list_slice(embedding, ss.s * {d} + 1, ss.s * {d} + {d})
                    AS cent
           FROM seeds CROSS JOIN ss),
         sv AS (
           SELECT vec_id, ss.s,
                  list_slice(embedding, ss.s * {d} + 1, ss.s * {d} + {d})
                    AS sub
           FROM embeddings CROSS JOIN ss),
         d2s AS (
           SELECT sv.vec_id, sv.s, cent.j, {fold('sub', 'cent')} AS d2
           FROM sv JOIN cent USING (s)),
         asg AS (
           SELECT vec_id, s, (min({{'d2': d2, 'j': j}})).j AS code
           FROM d2s GROUP BY vec_id, s),
         cellsum AS (
           SELECT vec_id, j,
                  list_reduce(list(d2 ORDER BY s), (x, y) -> x + y)
                    AS cd2
           FROM d2s GROUP BY vec_id, j),
         cells AS (
           SELECT vec_id, (min({{'cd2': cd2, 'j': j}})).j AS cell
           FROM cellsum GROUP BY vec_id),
         adc AS (
           SELECT cent.s, cent.j AS code, {fold(qsub, 'cent.cent')} AS qd
           FROM cent CROSS JOIN q),
         qcells AS (
           SELECT code AS cell
           FROM (SELECT code,
                        list_reduce(list(qd ORDER BY s), (x, y) -> x + y)
                          AS qcd
                 FROM adc GROUP BY code)
           ORDER BY qcd, cell LIMIT {_C40_NPROBE}),
         cand AS (
           SELECT asg.vec_id, asg.s, asg.code
           FROM asg JOIN cells USING (vec_id)
           WHERE cells.cell IN (SELECT cell FROM qcells)),
         est AS (
           SELECT vec_id,
                  list_reduce(list(qd ORDER BY cand.s), (x, y) -> x + y)
                    AS est_d2
           FROM cand JOIN adc ON cand.s = adc.s AND cand.code = adc.code
           GROUP BY vec_id),
         short AS (SELECT vec_id FROM est
                   ORDER BY est_d2, vec_id LIMIT {_C40_SHORT})
    SELECT e.vec_id, cells.cell,
           round({_dot_sql('e.embedding', 'qe')}
                 / ({_norm_sql('e.embedding')} * {_norm_sql('qe')}), 6)
             AS cosine
    FROM embeddings e
    JOIN short USING (vec_id)
    JOIN cells ON cells.vec_id = e.vec_id
    CROSS JOIN q
    ORDER BY cosine DESC, e.vec_id
    LIMIT {_C40_TOPK}
    """


@query("c40_ivf_adc_rerank", oracle=_c40_oracle())
def c40_ivf_adc_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """C40: the FULL compressed-index search pipeline — IVF cell
    pruning, then ADC over codes, then exact re-rank — unifying the
    ANN stack (c11 IVF cells, c36/c38 PQ codes) into FAISS's IVFADC
    shape, hash-graded end-to-end:

    (1) every vector assigns to its nearest of 16 coarse cells —
        reusing the SAME per-subspace distances as PQ coding (cell
        distance = ordered sum over subspaces), so indexing costs ONE
        distance pass for both structures;
    (2) the query probes its {_C40_NPROBE} nearest cells (a
        KB-sized, driver-computed decision — the inverted-file
        prune: only probed cells' codes are scanned);
    (3) ADC shortlists the top-{_C40_SHORT} candidates from 8 B/vector
        codes inside probed cells;
    (4) exact cosine re-ranks ONLY the shortlist to the top-{_C40_TOPK}.

    Codes quantize raw vectors, not residuals — residual encoding
    (true IVFADC) requires trained centroids, which is exactly the
    float-averaging path that forces c36 rows-only; this variant keeps
    every fold engine-identical. The probe's own vector lands in a
    probed cell by construction (its cell distance IS the minimal
    query-cell distance), so the self-hit survives to rank 1.

    Scale shape: one distance pass builds cells + codes (|corpus|·128
    KB-joined rows, map-side); the search scans codes of ~nprobe/nlist
    of the corpus with a broadcast ADC table, the shortlist is
    TakeOrderedAndProject-bounded, and the exact re-rank reads
    {_C40_SHORT} float vectors regardless of corpus size."""
    emb = load(spark, sf, "embeddings")
    centroids, cent_df = _pq_codebook(spark, emb)
    dists = _pq_dists(emb, cent_df).localCheckpoint(eager=False)
    codes = dists.groupBy("vec_id", "s").agg(
        F.min_by("j", F.struct("d2", "j")).alias("code")
    )
    cells = (
        dists.groupBy("vec_id", "j")
        .agg(_ordered_fold("d2").alias("cd2"))
        .groupBy("vec_id")
        .agg(F.min_by("j", F.struct("cd2", "j")).alias("cell"))
    )
    q = emb.filter("vec_id = 0").select("embedding").collect()[0][
        "embedding"
    ]
    adc = _pq_adc(q, centroids)
    adc_df = spark.createDataFrame(adc, "s INT, code INT, qd DOUBLE")
    # probe-cell choice is codebook-sized arithmetic: qcd[j] folds the
    # 8 subspace distances in s-order (same bits as the oracle's
    # list_reduce), top-nprobe by (qcd, j)
    qcd: dict[int, float] = {}
    for s, j, qd in adc:  # adc rows are s-major → s ascending per j
        qcd[j] = qcd.get(j, 0.0) + qd
    probed = [
        j for j, _ in sorted(qcd.items(), key=lambda kv: (kv[1], kv[0]))
    ][:_C40_NPROBE]
    cand = codes.join(
        F.broadcast(
            cells.filter(F.col("cell").isin(probed)).select("vec_id")
        ),
        "vec_id",
    )
    est = (
        cand.join(F.broadcast(adc_df), ["s", "code"])
        .groupBy("vec_id")
        .agg(_ordered_fold("qd").alias("est_d2"))
    )
    short = est.orderBy("est_d2", "vec_id").limit(_C40_SHORT).select(
        "vec_id"
    )
    return (
        emb.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(cells), "vec_id")
        .select("vec_id", "cell", _q_cosine(q))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(_C40_TOPK)
    )


# ---------------------------------------------------------------------------
# p19 — contamination-safe split (leakage prevention at split time)
# ---------------------------------------------------------------------------


def _p19_oracle() -> str:
    bkt = bucket_sql("doc_id")
    return f"""
    WITH split AS (
      SELECT doc_id, lang, text,
             CASE WHEN {bkt} < 90 THEN 'train' ELSE 'eval' END AS split
      FROM documents),
    esh AS (SELECT doc_id, {_DIGEST_SQL} AS ds
            FROM (SELECT doc_id, {_SH_SQL} AS sh FROM split
                  WHERE split = 'eval')
            WHERE len(sh) > 0),
    emh AS (SELECT doc_id, {_mh_sql()} FROM esh),
    esig AS (SELECT DISTINCT band, sig FROM ({_bands_union_sql('emh')})),
    tsh AS (SELECT doc_id, {_DIGEST_SQL} AS ds
            FROM (SELECT doc_id, {_SH_SQL} AS sh FROM split
                  WHERE split = 'train')
            WHERE len(sh) > 0),
    tmh AS (SELECT doc_id, {_mh_sql()} FROM tsh),
    tsig AS (SELECT DISTINCT doc_id, band, sig
             FROM ({_bands_union_sql('tmh', 'doc_id')})),
    leaky AS (SELECT DISTINCT tsig.doc_id
              FROM tsig JOIN esig USING (band, sig))
    SELECT lang,
           CAST(count(*) FILTER (WHERE split = 'train') AS BIGINT)
             AS n_train,
           CAST(count(*) FILTER (WHERE split = 'eval') AS BIGINT)
             AS n_eval,
           CAST(count(*) FILTER (WHERE split = 'train'
                 AND doc_id IN (SELECT doc_id FROM leaky)) AS BIGINT)
             AS n_leaky_dropped,
           CAST(count(*) FILTER (WHERE split = 'train'
                 AND doc_id NOT IN (SELECT doc_id FROM leaky)) AS BIGINT)
             AS n_train_clean
    FROM split GROUP BY lang
    """


@query("p19_decontaminated_split", oracle=_p19_oracle())
def p19_decontaminated_split(spark: SparkSession, sf: str) -> DataFrame:
    """P19: contamination-SAFE train/eval split — c17's deterministic
    hash split composed with near-dup leakage prevention: any train
    doc sharing an LSH band signature with ANY eval doc is a
    benchmark-leak risk and is DROPPED from train (the standard
    decontamination rule, c22/c26's shape applied at split time —
    evaluation scores are meaningless if eval near-dups remain in
    train). Per language: train size, eval size, leaky docs dropped,
    clean train size.

    Scale shape: split assignment is per-row hash arithmetic (zero
    shuffle, c17's contract); the leak check is the p17 probe with
    the EVAL side as the index — at 100 TB the eval set is tiny by
    construction (the 10% hash slice, in practice a fixed benchmark
    suite), so its distinct signature set BROADCASTS and the train
    side is never shuffled for the probe (pinned in test_plans). The
    corpus is scanned per consumer (eval sigs, train sigs, report) —
    cheap column-pruned scans; the expensive thing a naive
    formulation would do, an all-pairs train×eval comparison, never
    materializes. Short docs (<3 tokens) carry no signature and can
    never leak (both engines agree via NULL semantics)."""
    # explicit-count repartition before the signature passes (the c43
    # lesson: one-file corpus = one split, and a keyed-only
    # repartition would be AQE-coalesced back to one partition)
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "lang", "text")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
    )
    b = hash_bucket(F.col("doc_id"))
    split = d.withColumn(
        "split", F.when(b < 90, "train").otherwise("eval")
    )
    eval_sig = (
        _band_sigs(split.filter(F.col("split") == "eval"))
        .distinct()
    )
    leaky = (
        _band_sigs(split.filter(F.col("split") == "train"), "doc_id")
        .join(F.broadcast(eval_sig), ["band", "sig"], "leftsemi")
        .select("doc_id")
        .distinct()
        .withColumn("leaky", F.lit(1))
    )
    is_train = F.col("split") == "train"
    is_leaky = F.coalesce(F.col("leaky"), F.lit(0)) == 1
    return (
        split.join(leaky, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.sum(is_train.cast("bigint")).alias("n_train"),
            F.sum((~is_train).cast("bigint")).alias("n_eval"),
            F.sum((is_train & is_leaky).cast("bigint")).alias(
                "n_leaky_dropped"
            ),
            F.sum((is_train & ~is_leaky).cast("bigint")).alias(
                "n_train_clean"
            ),
        )
    )


# ---------------------------------------------------------------------------
# p20 — corpus build v2: LSH dedup → decontaminated split → release report
# ---------------------------------------------------------------------------


def _p20_oracle() -> str:
    bkt = bucket_sql("doc_id")
    return f"""
    WITH docs AS (
      SELECT doc_id, lang, text,
             CASE WHEN {bkt} < 90 THEN 'train' ELSE 'eval' END AS split,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      FROM documents),
    sh0 AS (SELECT doc_id, {_DIGEST_SQL} AS ds
            FROM (SELECT doc_id, {_SH_SQL} AS sh FROM docs)
            WHERE len(sh) > 0),
    mh AS (SELECT doc_id, {_mh_sql()} FROM sh0),
    sigs AS ({_bands_union_sql('mh', 'doc_id')}),
    winners AS (
      SELECT band, sig, min(doc_id) AS w FROM sigs GROUP BY band, sig),
    kept_sig AS (
      SELECT w AS doc_id FROM winners
      GROUP BY w HAVING count(*) = {_P17_BANDS}),
    kept AS (  -- signature winners + shingle-less docs (no buckets)
      SELECT doc_id FROM kept_sig
      UNION ALL
      SELECT doc_id FROM docs
      WHERE doc_id NOT IN (SELECT doc_id FROM sh0)),
    esig AS (
      SELECT DISTINCT band, sig FROM sigs
      WHERE doc_id IN (SELECT doc_id FROM kept)
        AND doc_id IN (SELECT doc_id FROM docs WHERE split = 'eval')),
    leaky AS (
      SELECT DISTINCT sigs.doc_id FROM sigs
      JOIN esig USING (band, sig)
      WHERE sigs.doc_id IN (SELECT doc_id FROM kept)
        AND sigs.doc_id IN (SELECT doc_id FROM docs
                            WHERE split = 'train')),
    st AS (
      SELECT docs.*,
             doc_id IN (SELECT doc_id FROM kept) AS is_kept,
             doc_id IN (SELECT doc_id FROM leaky) AS is_leaky
      FROM docs)
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs_in,
           CAST(count(*) FILTER (WHERE NOT is_kept) AS BIGINT)
             AS n_dedup_dropped,
           CAST(count(*) FILTER (WHERE is_kept AND is_leaky) AS BIGINT)
             AS n_decon_dropped,
           CAST(count(*) FILTER (WHERE is_kept AND NOT is_leaky)
                AS BIGINT) AS n_final,
           CAST(COALESCE(sum(tokens) FILTER (WHERE is_kept AND NOT is_leaky),
                         0) AS BIGINT) AS tokens_final
    FROM st GROUP BY split, lang
    """


@query("p20_corpus_build_v2", oracle=_p20_oracle())
def p20_corpus_build_v2(spark: SparkSession, sf: str) -> DataFrame:
    """P20: corpus build v2 — the MODERN release pipeline composed
    end-to-end and hash-graded: LSH near-dedup over the whole corpus
    (c02's win-all-bands one-hop rule, made oracle-portable by the
    affine family — the hash-graded sibling of the rows-only c02) →
    c17's deterministic split → p19's decontamination (kept train
    docs sharing a band signature with any kept EVAL doc are
    dropped) → the release report per (split, lang): docs in, dedup
    drops, decontamination drops, final docs and final token budget.
    c20 is the fingerprint-level build; this is the banded-LSH level
    a production corpus actually ships with.

    Scale shape: the signature lineage (shingle → digest → 16 affine
    permutations → 4 band sigs) computes ONCE (lazy localCheckpoint
    feeds dedup winners, the eval index, and the leak probe — three
    consumers, one pass); the kept set likewise checkpoints once for
    its three consumers; dedup is c02's two-level MIN aggregation
    (map-side partials absorb hot buckets, the shuffle carries
    |corpus| signature rows, never pairs); the eval signature index
    broadcasts for the leak probe exactly as p19; the report is one
    |splits×langs|-bounded aggregate. Shingle-less docs carry no
    buckets: kept by definition, never leaky — both engines agree
    structurally."""
    # explicit-count repartition before the signature lineage: the
    # md5-per-shingle + 16-permutation pass is the CPU of this
    # pipeline, and a one-file demo corpus is ONE input split (a
    # keyed-only repartition would be AQE-coalesced right back — the
    # c43 lesson)
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "lang", "text")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
    )
    b = hash_bucket(F.col("doc_id"))
    docs = d.select(
        "doc_id",
        "lang",
        F.when(b < 90, "train").otherwise("eval").alias("split"),
        F.size(_tokens()).cast("bigint").alias("tokens"),
        "text",
    )
    sigs = _band_sigs(docs, "doc_id").localCheckpoint(eager=False)
    # c02's two-level MIN: each (band, sig) bucket elects its min doc
    # map-side; a doc survives iff it won ALL its 4 buckets
    winners = sigs.groupBy("band", "sig").agg(F.min("doc_id").alias("w"))
    kept_sig = (
        winners.groupBy("w")
        .agg(F.count("*").alias("won"))
        .filter(F.col("won") == _P17_BANDS)
        .select(F.col("w").alias("doc_id"))
    )
    signed = sigs.select("doc_id").distinct()
    kept = (
        kept_sig.unionByName(
            docs.select("doc_id").join(signed, "doc_id", "left_anti")
        )
        .withColumn("is_kept", F.lit(1))
        # three consumers (eval index, leak probe, report join) — the
        # winner election (the pipeline's heaviest aggregate) computes
        # once instead of 3x (round 16; the c62 checkpoint-once rule).
        # |corpus| x 2 narrow columns, never broadcast.
        .localCheckpoint(eager=False)
    )
    # the kept set is ~|corpus|-sized — it must NEVER broadcast; only
    # the eval signature index (benchmark-suite-sized) broadcasts
    eval_ids = docs.filter(F.col("split") == "eval").select("doc_id")
    esig = (
        sigs.join(kept.select("doc_id"), "doc_id", "leftsemi")
        .join(eval_ids, "doc_id", "leftsemi")
        .select("band", "sig")
        .distinct()
    )
    train_ids = docs.filter(F.col("split") == "train").select("doc_id")
    leaky = (
        sigs.join(kept.select("doc_id"), "doc_id", "leftsemi")
        .join(train_ids, "doc_id", "leftsemi")
        .join(F.broadcast(esig), ["band", "sig"], "leftsemi")
        .select("doc_id")
        .distinct()
        .withColumn("is_leaky", F.lit(1))
    )
    st = (
        docs.join(kept, "doc_id", "left")
        .join(leaky, "doc_id", "left")
        .withColumn("is_kept", F.coalesce(F.col("is_kept"), F.lit(0)) == 1)
        .withColumn(
            "is_leaky", F.coalesce(F.col("is_leaky"), F.lit(0)) == 1
        )
    )
    keep_final = F.col("is_kept") & ~F.col("is_leaky")
    return st.groupBy("split", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs_in"),
        F.sum((~F.col("is_kept")).cast("bigint")).alias("n_dedup_dropped"),
        F.sum((F.col("is_kept") & F.col("is_leaky")).cast("bigint")).alias(
            "n_decon_dropped"
        ),
        F.sum(keep_final.cast("bigint")).alias("n_final"),
        F.sum(F.when(keep_final, F.col("tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_final"),
    )


# ---------------------------------------------------------------------------
# c41 / c42 — mergeable sketches: theta set algebra + KLL quantiles
# ---------------------------------------------------------------------------


@query("c41_theta_overlap")  # rows-only: DataSketches estimates are
# engine-native (sketch state depends on internal hashing); the exact
# counts ride alongside and the error contract is pinned in tests.
def c41_theta_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """C41: cross-slice overlap estimation via THETA sketches — the
    mergeable SET-ALGEBRA member of the sketch family (c34 HLL counts
    distincts, c42 KLL ranks values; theta does union/intersection/
    difference): two ingestion slices with a deliberately overlapping
    acquisition window (buckets [0,60) and [40,100) — the re-crawl /
    vendor-refeed shape, ~20% shared docs) are sketched per language
    on their content fingerprints, and |A ∩ B|, |A ∪ B|, |A \\ B| come
    from sketch algebra — NO join ever runs. This answers the
    operational question BEFORE a dedup job is launched ("how much do
    these feeds overlap?") from KB of sketch state; exact counts
    computed alongside grade the estimates.

    Scale shape: one scan, map-side sketch partials per (lang, slice)
    — the exchange carries KB sketch buffers, never fingerprints; the
    set algebra is per-lang row arithmetic on merged sketches. At
    100 TB per-shard sketches persist with the data (c34's pattern)
    and any slice-vs-slice overlap is answerable without rescanning
    either side."""
    d = load(spark, sf, "documents").select("doc_id", "lang", "text")
    b = hash_bucket(F.col("doc_id"))
    t = d.select(
        "lang",
        F.md5("text").alias("fp"),
        (b < 60).alias("in_a"),
        (b >= 40).alias("in_b"),
    )
    sk = t.groupBy("lang").agg(
        F.theta_sketch_agg(F.when(F.col("in_a"), F.col("fp"))).alias(
            "sk_a"
        ),
        F.theta_sketch_agg(F.when(F.col("in_b"), F.col("fp"))).alias(
            "sk_b"
        ),
        F.count_distinct(F.when(F.col("in_a"), F.col("fp"))).alias(
            "exact_a"
        ),
        F.count_distinct(F.when(F.col("in_b"), F.col("fp"))).alias(
            "exact_b"
        ),
        F.count_distinct("fp").alias("exact_union"),
    )
    est = lambda c: F.round(F.theta_sketch_estimate(c), 1)  # noqa: E731
    return sk.select(
        "lang",
        est(F.theta_union("sk_a", "sk_b")).alias("est_union"),
        F.col("exact_union").cast("bigint"),
        est(F.theta_intersection("sk_a", "sk_b")).alias("est_overlap"),
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union"))
        .cast("bigint")
        .alias("exact_overlap"),
        est(F.theta_difference("sk_a", "sk_b")).alias("est_a_only"),
        (F.col("exact_union") - F.col("exact_b"))
        .cast("bigint")
        .alias("exact_a_only"),
    )


@query("c42_kll_quantile_rollup")  # rows-only: KLL sketch state is
# engine-native; exact quantiles ride alongside, error pinned in tests.
def c42_kll_quantile_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """C42: mergeable QUANTILE rollup via KLL sketches — b64 computes
    exact percentiles by sorting, b29's approx_percentile computes one
    estimate and throws its state away; KLL sketches are the 100 TB
    path: per-language sketches of the token-count distribution
    aggregate map-side, and the CORPUS row is produced by MERGING the
    language sketches (kll_merge_agg — no second pass over the data),
    which is exactly how a fleet rolls per-shard distribution state
    into global p50/p90/p99 SLO numbers. Exact quantiles computed
    alongside grade the estimates (rank error ≤ ~1.6% at default k).

    Scale shape: one scan, KB sketch buffers through the exchange,
    |langs|+1 output rows; the corpus-level merge touches sketches
    only. Completes the mergeable-sketch family: c34 HLL (distinct),
    c41 theta (set algebra), c42 KLL (ranks)."""
    d = load(spark, sf, "documents").select(
        "lang", F.size(_tokens()).cast("bigint").alias("n_tokens")
    )
    per_lang = d.groupBy("lang").agg(
        F.kll_sketch_agg_bigint("n_tokens").alias("sk"),
        F.expr(
            "percentile(n_tokens, array(0.5, 0.9, 0.99))"
        ).alias("exact_q"),
        F.count("*").alias("n_docs"),
    )
    corpus = per_lang.select(
        F.lit("__corpus__").alias("lang"),
        # the merge consumes SKETCHES, not rows — the whole point
        F.kll_merge_agg_bigint("sk").alias("sk"),
        F.lit(None).cast("array<double>").alias("exact_q"),
        F.sum("n_docs").alias("n_docs"),
    )
    exact_corpus = d.agg(
        F.expr("percentile(n_tokens, array(0.5, 0.9, 0.99))").alias(
            "exact_q"
        )
    )
    corpus = corpus.drop("exact_q").crossJoin(F.broadcast(exact_corpus))
    out = per_lang.unionByName(corpus.select(per_lang.columns))

    def q(p: float, name: str):
        return F.kll_sketch_get_quantile_bigint("sk", F.lit(p)).alias(name)

    return out.select(
        "lang",
        F.col("n_docs").cast("bigint"),
        q(0.5, "est_p50"),
        F.round(F.element_at("exact_q", 1), 1).alias("exact_p50"),
        q(0.9, "est_p90"),
        F.round(F.element_at("exact_q", 2), 1).alias("exact_p90"),
        q(0.99, "est_p99"),
        F.round(F.element_at("exact_q", 3), 1).alias("exact_p99"),
    )


# ---------------------------------------------------------------------------
# b132 — state-store offline inspection (Spark 4 state data source)
# ---------------------------------------------------------------------------


@query(
    "b132_statestore_read",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def b132_statestore_read(spark: SparkSession, sf: str) -> DataFrame:
    """B132: OFFLINE state-store inspection — Spark 4's state data
    source reads a streaming query's checkpointed state as an
    ordinary DataFrame (``format("statestore")``), the debugging/ops
    surface for every stateful pipeline this repo runs (b51/b52/b68's
    state, the reference's commit-loop position): "what does the job
    currently believe?" answered WITHOUT touching the running query.
    A per-type streaming count drains (availableNow), then the graded
    result is read back FROM THE CHECKPOINT's state files — not from
    the sink — and hash-matched against the batch aggregate, proving
    state contents equal the semantics they encode.

    Scale shape: the state source reads one state file per shuffle
    partition (parallel, no shuffle); state for a keyed aggregate is
    |keys| rows however large the stream history. The collect is
    |event_types|-bounded (b131's literal-result rule) because the
    scratch checkpoint is deleted before returning."""
    import shutil

    from iceberg_playground_spark.queries.streaming import (
        _scratch,
        _stream_events,
    )

    ck = _scratch("ips_stream_ssread_")
    try:
        ev = _stream_events(spark, sf)
        agg = ev.groupBy("event_type").count()
        q = (
            agg.writeStream.outputMode("complete")
            .format("noop")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state = (
            spark.read.format("statestore")
            .load(ck)
            .select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").cast("bigint").alias("n_events"),
            )
        )
        # SIZE GUARD: |event_types| rows — literal result because the
        # checkpoint dir is removed in finally (b131's rule)
        rows = state.collect()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return spark.createDataFrame(rows, "event_type STRING, n_events BIGINT")


# ---------------------------------------------------------------------------
# b133 — Python DataSource WRITER (custom sink, two-phase commit)
# ---------------------------------------------------------------------------


def _register_jsondirsink(spark: SparkSession) -> None:
    """Register the ``jsondirsink`` Python data source once per session
    (the b83 registration guard pattern, meta.py:141)."""
    if getattr(spark, "_jsondirsink_registered", False):
        return
    from iceberg_playground_spark.pysource import build_jsondirsink_source

    try:
        spark.dataSource.register(build_jsondirsink_source())
    except Exception:
        pass  # already registered by a parallel caller: fine
    spark._jsondirsink_registered = True


@query(
    "b133_python_datasource_writer",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def b133_python_datasource_writer(spark: SparkSession, sf: str) -> DataFrame:
    """B133/A6': a custom Python SINK — the WRITE side of the Data
    Source API (b83/b84 cover the read side): executors serialize
    their partitions to JSON-lines files and return commit messages;
    the driver's commit publishes them atomically behind a manifest
    (rename + _MANIFEST.json, temp files of failed attempts never
    visible) — the reference's writer-fleet + single-committer
    protocol (decouple.rs:112-156, 211-299) through the PUBLIC
    Python API instead of engine internals. The graded result reads
    the manifest's files back and hash-matches the input relation —
    a full write→commit→read round trip.

    Scale shape: writes run one task per partition (the fleet);
    commit touches filenames only (KB manifest, like tables.py's
    snapshot commit). The 5-row collect is the b131 literal-result
    rule (the scratch dir is deleted before returning)."""
    import json
    import shutil
    import tempfile

    _register_jsondirsink(spark)
    out = tempfile.mkdtemp(prefix="ips_jsink_")
    try:
        load(spark, sf, "region").select("r_regionkey", "r_name").write.format(
            "jsondirsink"
        ).option("path", out).mode("append").save()
        with open(os.path.join(out, "_MANIFEST.json")) as fh:
            man = json.load(fh)
        paths = [os.path.join(out, f["file"]) for f in man["files"]]
        df = spark.read.schema("r_regionkey INT, r_name STRING").json(paths)
        rows = df.collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, "r_regionkey INT, r_name STRING")


@query(
    "b134_python_streaming_sink",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def b134_python_streaming_sink(spark: SparkSession, sf: str) -> DataFrame:
    """B134/A8': the custom sink under STRUCTURED STREAMING — the
    fourth quadrant of the Python Data Source story (b83 batch read,
    b84 stream read, b133 batch write): the event stream drains
    through ``writeStream.format("jsondirsink")`` and the driver
    publishes one manifest per epoch (the reference committer's
    interval-flushed manifest stream, decouple.rs:224-267); replayed
    epochs overwrite their own manifest idempotently. The graded
    result reads back ONLY manifest-listed files and aggregates —
    hash-matching the batch SQL proves exactly-once publication
    end-to-end.

    Scale shape: executor-parallel epoch writes, KB manifests; the
    read-back aggregate collapses to |event_types| rows before the
    scratch dir is deleted (the b131 literal-result rule)."""
    import glob
    import json
    import shutil
    import tempfile

    from iceberg_playground_spark.queries.streaming import _stream_events

    _register_jsondirsink(spark)
    out = tempfile.mkdtemp(prefix="ips_jstream_")
    try:
        ev = _stream_events(spark, sf).select("event_id", "event_type")
        q = (
            ev.writeStream.format("jsondirsink")
            .option("path", out)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="ips_jsck_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        paths = []
        for man in glob.glob(os.path.join(out, "_MANIFEST-*.json")):
            with open(man) as fh:
                paths += [
                    os.path.join(out, f["file"])
                    for f in json.load(fh)["files"]
                ]
        rows = (
            spark.read.schema("event_id BIGINT, event_type STRING")
            .json(paths)
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"))
            .collect()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, "event_type STRING, n_events BIGINT")


# ---------------------------------------------------------------------------
# b135 — time-partitioned retention delete (metadata-only DROP of old days)
# ---------------------------------------------------------------------------

_RETENTION_CUTOFF = "2024-01-11"  # drop the first 10 of 30 fixture days


@query(
    "b135_retention_delete",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(1 AS INT) AS metadata_only
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') >= '{_RETENTION_CUTOFF}'
    GROUP BY day
    """,
)
def b135_retention_delete(spark: SparkSession, sf: str) -> DataFrame:
    """B135: the #1 operational job on a 100 TB lake — RETENTION: the
    event table lands day-partitioned, and "drop everything before
    the cutoff" aligns exactly with partition boundaries, so
    `delete_range` drops whole files from the snapshot by committed
    bounds alone: ZERO delete files, ZERO data I/O (b114 proves the
    mechanism on a demo predicate; this is the production shape it
    exists for, including the hive-path identity bounds the round-7
    NULL-partition fix hardened). The graded output is the surviving
    per-day aggregate plus the planner's own metadata_only flag —
    hash-matching proves both the data result AND that the plan never
    degraded to a positional-delete scan (a misaligned predicate
    would flip the flag and break the match).

    Scale shape: planning walks KB of manifest bounds; dropped days
    never open; the surviving scan is an ordinary partitioned read.
    At 100 TB this is the difference between a metadata commit and
    rewriting a third of the lake."""

    def build(tmp: str) -> tuple:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "events_ret",
            "event_id BIGINT, day STRING, value_cents BIGINT",
            partition_by=["day"],
            drop_if_exists=True,
        )
        ev = load(spark, sf, "events").select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias(
                "value_cents"
            ),
        )
        t.append(ev)
        _, summary = t.delete_range(
            "day", "0000-00-00", "2024-01-10"  # everything < cutoff
        )
        return t, summary

    t, summary = _built(spark, sf, "b135", build)
    return (
        t.read()
        .groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("value_cents").cast("bigint").alias("value_cents"),
        )
        .withColumn(
            "metadata_only",
            F.lit(int(summary["metadata_only"])).cast("int"),
        )
    )
