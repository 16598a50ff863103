"""Round-4 surface widening: corpus-curation ops + relational extensions.

Three training-data-pipeline operators (the north-star Layer C/P family)
and two relational-surface rows (Layer B continuation):

- ``c26_fuzzy_decontaminate`` — n-gram-Jaccard train→eval decontamination
  (the fuzzy complement of c22's exact-fingerprint check), built on
  c09's inverted-index machinery and c17's deterministic split stamp.
- ``p09_chunk_windows`` — RAG-style overlapping chunking (fixed window,
  fixed stride) — the retrieval-corpus prep step.
- ``p10_corpus_shuffle`` — deterministic global training shuffle:
  seeded-hash order + sharding, zero-skew and retry-stable.
- ``b77_unpivot`` — wide→long melt (Spark ``DataFrame.unpivot``).
- ``b78_correlated_subquery`` — EXISTS + scalar correlated subqueries,
  the Catalyst decorrelation surface (SURVEY §4's
  RewriteCorrelatedScalarSubquery), same SQL text on both engines.

Registered inside the driver's 50-entry grading window (see
registry.load_all); the ops will migrate to their thematic homes
(llm/pipeline/relational) once driver-graded, the same path scale.py's
b73 took.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import (
    bucket_sql as _bucket_sql,
    hash_bucket as _hash_bucket,
    load,
)
from iceberg_playground_spark.queries.llm import _SH_SQL, _shingles, _tokens
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# c26 — fuzzy decontamination (C22 complement: near-match, not exact)
# ---------------------------------------------------------------------------

_DECON_J = 0.5  # same near-dup bar as c09: ≥ half the shingle union shared


@query(
    "c26_fuzzy_decontaminate",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, {_SH_SQL} AS sh,
             {_bucket_sql('doc_id')} AS bucket
      FROM documents),
    tr AS (SELECT doc_id, lang, sh FROM d WHERE bucket < 90),
    ev AS (SELECT doc_id, lang, sh FROM d WHERE bucket >= 90),
    pairs AS (
      SELECT ev.doc_id AS doc_id,
             CAST(len(list_intersect(ev.sh, tr.sh)) AS DOUBLE)
               / (len(ev.sh) + len(tr.sh)
                  - len(list_intersect(ev.sh, tr.sh))) AS j
      FROM ev JOIN tr ON ev.lang = tr.lang
      WHERE len(list_intersect(ev.sh, tr.sh)) > 0),
    agg AS (
      SELECT doc_id,
             CAST(count(*) FILTER (WHERE j >= {_DECON_J}) AS BIGINT)
               AS n_contaminating,
             round(max(j), 6) AS max_jaccard
      FROM pairs GROUP BY doc_id)
    SELECT ev.doc_id, ev.lang,
           COALESCE(agg.n_contaminating, 0) AS n_contaminating,
           COALESCE(agg.max_jaccard, 0.0) AS max_jaccard
    FROM ev LEFT JOIN agg ON ev.doc_id = agg.doc_id
    """,
)
def c26_fuzzy_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """C26: fuzzy train→eval decontamination — for every val/test doc
    (c17's hash split), the count of train docs with 3-gram Jaccard ≥
    {j} and the highest overlap seen, 0 for clean docs. c22 catches
    verbatim leaks by exact fingerprint; this catches the paraphrased /
    lightly-edited leaks that survive it — the check an eval-integrity
    pipeline actually needs before publishing a benchmark number.

    Scale shape = c09's inverted index: postings equi-join on
    (lang, shingle) so candidate volume is Σ_shingle df_train×df_eval,
    never |train|×|eval|; the per-pair intersection size IS the match
    count (no array intersect per pair). The eval side is ~10% of the
    corpus and the train side streams through the join — no broadcast
    of anything corpus-sized. Clean docs ride a left join back onto the
    eval split (map-side after the agg shrinks pairs to ≤|eval| rows).
    """
    # explicit-count repartition so the shingling pass parallelizes
    # off a one-split source (keyed-only would be AQE-coalesced back)
    d = (
        load(spark, sf, "documents")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
        .select(
            "doc_id",
            "lang",
            _shingles(_tokens()).alias("sh"),
            _hash_bucket(F.col("doc_id")).alias("bucket"),
        )
    )
    post = (
        d.select(
            "doc_id",
            "lang",
            "bucket",
            F.size("sh").alias("n_sh"),
            F.explode("sh").alias("s"),
        )
        # shingle computation runs once, not once per join side
        .localCheckpoint(eager=False)
    )
    tr = post.filter(F.col("bucket") < 90).select(
        F.col("lang").alias("tr_lang"),
        F.col("s").alias("tr_s"),
        F.col("doc_id").alias("tr_id"),
        F.col("n_sh").alias("tr_n"),
    )
    ev = post.filter(F.col("bucket") >= 90).select(
        "lang", "s", "doc_id", F.col("n_sh").alias("ev_n")
    )
    pairs = (
        ev.join(
            tr,
            (F.col("lang") == F.col("tr_lang"))
            & (F.col("s") == F.col("tr_s")),
        )
        .groupBy("doc_id", "tr_id", "ev_n", "tr_n")
        .agg(F.count("*").alias("inter"))
        .select(
            "doc_id",
            (
                F.col("inter").cast("double")
                / (F.col("ev_n") + F.col("tr_n") - F.col("inter"))
            ).alias("j"),
        )
    )
    agg = pairs.groupBy("doc_id").agg(
        F.count(F.when(F.col("j") >= _DECON_J, 1)).alias("n_contaminating"),
        F.round(F.max("j"), 6).alias("max_jaccard"),
    )
    evdocs = d.filter(F.col("bucket") >= 90).select("doc_id", "lang")
    return evdocs.join(agg, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce("n_contaminating", F.lit(0)).alias("n_contaminating"),
        F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
    )


c26_fuzzy_decontaminate.__doc__ = c26_fuzzy_decontaminate.__doc__.format(
    j=_DECON_J
)

# ---------------------------------------------------------------------------
# p09 — overlapping chunk windows (RAG corpus prep)
# ---------------------------------------------------------------------------

_CHUNK = 32  # tokens per chunk
_STRIDE = 16  # tokens between chunk starts (50% overlap)


@query(
    "p09_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(range(0,
               CAST(floor((len(toks) - 1) / {_STRIDE}) AS BIGINT) + 1)) AS i
      FROM t)
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           CAST(len(toks[i*{_STRIDE}+1 :
                         least(i*{_STRIDE}+{_CHUNK}, len(toks))])
                AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(
               toks[i*{_STRIDE}+1 :
                    least(i*{_STRIDE}+{_CHUNK}, len(toks))], ' '))
             AS chunk_md5
    FROM s
    """,
)
def p09_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    """P9: overlapping chunk windows — cut every document into
    {chunk}-token chunks every {stride} tokens (50% overlap), the
    standard retrieval-corpus preparation (each chunk later gets its own
    embedding; the overlap keeps answers that straddle a boundary
    findable). Emits (doc_id, chunk_id, token count, content hash); the
    hash stands in for the chunk text in driver-facing output (p03's
    convention — no array/long-text columns across the comparator).

    Scale shape: per-row sequence + explode — a narrow map with ~n/{stride}
    output rows per doc, no shuffle at all; chunking 100 TB is
    embarrassingly parallel and this plan keeps it that way (verified:
    single scan, zero Exchange). The slice/explode runs JVM-side on the
    token array — the text is tokenized exactly once."""
    d = load(spark, sf, "documents")
    t = d.select("doc_id", _tokens().alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n")
    )
    starts = F.sequence(
        F.lit(0), F.floor((F.col("n") - 1) / _STRIDE).cast("int")
    )
    s = t.select("doc_id", "toks", "n", F.explode(starts).alias("chunk_id"))
    chunk = F.slice(
        F.col("toks"), F.col("chunk_id") * _STRIDE + 1, F.lit(_CHUNK)
    )
    return s.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


p09_chunk_windows.__doc__ = p09_chunk_windows.__doc__.format(
    chunk=_CHUNK, stride=_STRIDE
)

# ---------------------------------------------------------------------------
# p10 — deterministic global training shuffle
# ---------------------------------------------------------------------------

_SHUF_SEED = "shuf42:"
_SHUF_SHARDS = 16


@query(
    "p10_corpus_shuffle",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             md5('{_SHUF_SEED}' || CAST(doc_id AS VARCHAR)) AS key
      FROM documents)
    SELECT doc_id,
           CAST(CAST('0x' || substring(key, 1, 8) AS BIGINT)
                % {_SHUF_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST('0x' || substring(key, 1, 8) AS BIGINT)
                          % {_SHUF_SHARDS}
             ORDER BY key, doc_id) AS BIGINT) AS pos
    FROM k
    """,
)
def p10_corpus_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """P10: deterministic global training shuffle — every epoch-0 data
    loader wants the corpus in a random-but-reproducible order. Seeded
    md5 over the doc id gives each doc a shuffle key; the key's leading
    bits pick one of {shards} shards and rank-within-shard gives the
    read position. Shard + position are a total order (read shards
    round-robin) that is identical across re-runs, retries, and engines
    — never ``rand()``, which reshuffles on every task retry.

    Scale shape: the shard stamp is map-side arithmetic; the only
    shuffle is the rank window, partitioned by shard — {shards}-way
    parallel with corpus/{shards} rows per partition (hash keys are
    uniform, so no skew by construction; raise the shard count with the
    corpus, exactly c19's lesson). A global row_number (single-partition
    window) is the anti-pattern this replaces."""
    d = load(spark, sf, "documents")
    key = F.md5(F.concat(F.lit(_SHUF_SEED), F.col("doc_id").cast("string")))
    k = d.select("doc_id", key.alias("key"))
    shard = (
        F.conv(F.col("key").substr(1, 8), 16, 10).cast("bigint")
        % _SHUF_SHARDS
    ).cast("int")
    w = W.partitionBy("shard").orderBy("key", "doc_id")
    return k.select("doc_id", shard.alias("shard"), "key").select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


p10_corpus_shuffle.__doc__ = p10_corpus_shuffle.__doc__.format(
    shards=_SHUF_SHARDS
)

# ---------------------------------------------------------------------------
# b77 — unpivot / melt (Layer B continuation)
# ---------------------------------------------------------------------------


@query(
    "b77_unpivot",
    oracle="""
    SELECT p_partkey, p_brand, 'p_size' AS metric,
           CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, p_brand, 'p_retailprice' AS metric,
           p_retailprice AS value
    FROM part
    """,
)
def b77_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """B77: wide→long melt via ``DataFrame.unpivot`` (SQL UNPIVOT) —
    the inverse of b76's pivot, closing the reshape pair. Each part row
    emits one (metric, value) row per measure column; values share one
    DOUBLE type (the unpivot contract). The oracle is the engine-neutral
    UNION ALL lowering — exactly what Catalyst's Expand node computes,
    one scan feeding both output rows (not two scans like the literal
    UNION ALL would)."""
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        "p_brand",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot(
        ["p_partkey", "p_brand"],
        ["p_size", "p_retailprice"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# b78 — correlated subqueries (Catalyst decorrelation surface)
# ---------------------------------------------------------------------------

# Exact-arithmetic form of "balance above nation average": comparing
# acctbal × count > sum in DECIMAL avoids a float average whose
# accumulation order could flip boundary rows between engines
# (_util.py's determinism rules; DuckDB's AVG always returns DOUBLE).
_B78_SQL = """
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE CAST(c.c_acctbal AS DECIMAL(18,4))
          * (SELECT count(*) FROM customer n
             WHERE n.c_nationkey = c.c_nationkey)
          > (SELECT sum(CAST(n.c_acctbal AS DECIMAL(18,4)))
             FROM customer n
             WHERE n.c_nationkey = c.c_nationkey)
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey)
"""


@query("b78_correlated_subquery", oracle=_B78_SQL)
def b78_correlated_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """B78: correlated subqueries — customers with above-nation-average
    balance (two scalar correlated subqueries) who have placed at least
    one order (EXISTS). Runs the exact oracle text on Spark (b66's
    same-text-two-engines pattern). Catalyst decorrelates both forms
    (SURVEY §4: RewriteCorrelatedScalarSubquery → aggregate + join;
    EXISTS → left-semi join), so the physical plan is joins over one
    customer scan and one orders scan — per-row subquery execution,
    the naive reading, never happens and the plan scales like any join.
    """
    from iceberg_playground_spark.session import register_views

    register_views(spark, sf)
    return spark.sql(_B78_SQL)
