"""Round-8 operators: the two coverage gaps VERDICT r7 named (items
4-5), each closing a "last fabricated step" in an existing family.

- c43: SUBSTRING-level exact dedup — the missing member between c01's
  whole-document hash and p03's fixed-size chunk hash: find maximal
  runs of tokens whose K-gram shingles are repeated anywhere in the
  corpus (the Lee et al. 2022 "Deduplicating Training Data Makes
  Language Models Better" shape — published public work; their
  suffix-array ExactSubstr dedup re-expressed as sorted-shingle-run
  grouping, which is the shuffle-friendly formulation a cluster
  actually runs). The shuffle carries (doc_id, position, md5 digest)
  triples only — document text never moves — and run-merging is a
  per-document window, so the plan is scan → project → one digest
  exchange → one doc_id exchange regardless of corpus size.
- b136: `binaryFile`-source multimodal ingestion — c15's Arrow-batched
  decode kernel fed by REAL files on disk via
  ``spark.read.format("binaryFile")`` instead of fabricated in-plan
  payloads, closing the multimodal story's last synthetic input
  (VERDICT r7 "What's missing" #4). The blob store is materialized
  once per (session, sf) by Spark itself (partitioned text write —
  one object per document, the one-blob-per-key layout of a real
  object store), then scanned back as (path, content) and decoded
  partition-parallel by the same mapInPandas shape as c15. Ref
  anchor: the reference ingests opaque payload bytes from its object
  store the same way (/root/reference/src/main.rs:22-38 wires MinIO
  as the backing blob store for every table read).

Both hash-oracle graded: c43's digests are md5-over-UTF-8 (identical
bytes in Spark and DuckDB); b136's byte stats are deterministic
functions of the UTF-8 payload + the text sink's trailing newline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import (
    bucket_sql,
    hash_bucket,
    load,
)
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.queries.llm import _SH_SQL
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# c43 — substring-level exact dedup (Lee et al. ExactSubstr shape)
# ---------------------------------------------------------------------------

# Token K-gram width. Lee et al. use 50 BPE tokens; the synthetic
# corpus averages ~54 whitespace tokens/doc, so K=10 keeps the same
# "long enough that natural re-use is implausible" intent at demo
# document lengths.
_C43_K = 10

_C43_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
eligible AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS total_tokens, toks
  FROM t WHERE len(toks) >= {_C43_K}),
pos AS (
  SELECT doc_id, total_tokens, i,
         md5(array_to_string(toks[i + 1 : i + {_C43_K}], ' ')) AS dg
  FROM eligible,
       UNNEST(range(0, total_tokens - {_C43_K} + 1)) AS u(i)),
flagged AS (
  SELECT doc_id, total_tokens, i FROM (
    SELECT doc_id, total_tokens, i,
           count(*) OVER (PARTITION BY dg) AS occ
    FROM pos)
  WHERE occ >= 2),
runs0 AS (
  SELECT doc_id, total_tokens, i,
         CASE WHEN lag(i) OVER w IS NULL
                OR i - lag(i) OVER w > {_C43_K}
              THEN 1 ELSE 0 END AS newrun
  FROM flagged
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
runs1 AS (
  SELECT doc_id, total_tokens, i,
         sum(newrun) OVER (PARTITION BY doc_id ORDER BY i) AS run_id
  FROM runs0),
runs AS (
  SELECT doc_id, total_tokens, run_id,
         max(i) - min(i) + {_C43_K} AS run_len
  FROM runs1 GROUP BY doc_id, total_tokens, run_id)
SELECT doc_id, total_tokens,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(run_len) AS BIGINT) AS dup_tokens
FROM runs GROUP BY doc_id, total_tokens
"""


def _flagged_positions(spark: SparkSession, sf: str) -> DataFrame:
    """Shared c43/p24 lineage: every K-gram start position whose
    shingle digest occurs >= 2x anywhere in the corpus, as
    (doc_id, total_tokens, i). The shuffle carries digests only."""
    k = _C43_K
    # repartition on doc_id before the digest projection: a one-file
    # demo corpus is ONE input split, and the md5-per-shingle +
    # explode pass is the CPU of this query — spread it across cores
    # first (the c31/c08/c09 single-split lesson, BASELINE.md r5
    # notes). The partition count is EXPLICIT: the pre-explode input
    # is tiny (~KB/doc), so AQE would coalesce a keyed-only
    # repartition back to one partition and re-serialize the whole
    # pass (measured: 3.2 s -> 2.0 s at sf0.1 with the explicit
    # count). On a real many-file corpus this exchange is ~free
    # relative to the pass it parallelizes.
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
    )
    toks = F.split(F.col("text"), " ")
    # filter BEFORE sequence(): sequence(0, n-K) with n < K would
    # generate a DESCENDING range, not an empty one
    eligible = d.filter(F.size(toks) >= k).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("total_tokens"),
        F.expr(
            f"transform(sequence(0, size(split(text, ' ')) - {k}), "
            f"i -> md5(array_join(slice(split(text, ' '), i + 1, {k}), "
            f"' ')))"
        ).alias("dgs"),
    )
    pos = eligible.select(
        "doc_id", "total_tokens", F.posexplode("dgs").alias("i", "dg")
    )
    # window formulation, not groupBy+self-join: one digest exchange,
    # one pass over the shingle lineage (the c02 lesson — a semi-join
    # back would re-evaluate the whole scan+transform a second time)
    return (
        pos.withColumn(
            "occ", F.count("*").over(W.partitionBy("dg"))
        )
        .filter(F.col("occ") >= 2)
        .select("doc_id", "total_tokens", "i")
    )


@query("c43_substring_dedup", oracle=_C43_ORACLE)
def c43_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """C43: substring-level exact dedup — per document, the maximal
    token spans whose {K}-gram shingles occur at least twice anywhere
    in the corpus (within-document repeats count: a doc that repeats
    its own boilerplate is duplicated text too, exactly as in Lee et
    al.'s suffix-array formulation). Two flagged positions merge into
    one run when their spans overlap or touch (gap <= K). Output per
    affected document: number of duplicated runs and the duplicated
    token budget those runs cover — the "how much would ExactSubstr
    strip" report a corpus owner reads before committing to a rewrite.

    Scale shape: the only data that shuffles is (doc_id, position,
    16-byte digest) — never text. Stage 1 is scan -> project (shingle
    digests computed in one JVM pass via transform/slice/md5, no
    Python); stage 2 is ONE exchange on digest (the occurrence-count
    window; hot digests are absorbed by the count-only aggregation,
    and a digest's bucket holds positions, not pairs — no all-pairs
    path exists); stage 3 is ONE exchange on doc_id (run-merge window
    + final aggregate share the same partitioning, so Catalyst plans
    a single sort per doc partition). At 100 TB the position stream
    is ~|tokens| rows of ~32 bytes — the same order as the suffix
    array Lee et al. materialize, but built with two shuffles and no
    global sort."""
    flagged = _flagged_positions(spark, sf)
    k = _C43_K
    wd = W.partitionBy("doc_id").orderBy("i")
    runs = (
        flagged.withColumn(
            "newrun",
            F.when(
                F.lag("i").over(wd).isNull()
                | (F.col("i") - F.lag("i").over(wd) > k),
                1,
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("newrun").over(wd))
        .groupBy("doc_id", "total_tokens", "run_id")
        .agg((F.max("i") - F.min("i") + k).alias("run_len"))
    )
    return runs.groupBy("doc_id", "total_tokens").agg(
        F.count("*").cast("bigint").alias("n_runs"),
        F.sum("run_len").cast("bigint").alias("dup_tokens"),
    )


# ---------------------------------------------------------------------------
# b136 — binaryFile-source multimodal ingestion
# ---------------------------------------------------------------------------

# Slice of the corpus materialized as one blob per document (bounded:
# ~20% of docs, so the demo blob store stays small at every sf while
# still exercising multi-file listing + partition-parallel decode).
_B136_BUCKET = 20


@query(
    "b136_binaryfile_scan",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) + 1 AS BIGINT) AS n_bytes,
           md5(text || chr(10)) AS digest
    FROM documents
    WHERE {bucket_sql('doc_id')} < {_B136_BUCKET}
    """,
)
def b136_binaryfile_scan(spark: SparkSession, sf: str) -> DataFrame:
    """B136: multimodal ingestion from REAL binary files — the
    ``binaryFile`` source feeding c15's Arrow-batched decode kernel,
    closing the last fabricated input in the multimodal story. The
    demo blob store is written ONCE per (session, sf) by Spark itself:
    a partitioned text write lands one object per document
    (``doc_id=<k>/part-*.txt``, the one-blob-per-key layout of a real
    object store; the text sink appends one ``\\n`` — accounted for in
    the oracle). The query proper is the production read path:
    ``spark.read.format("binaryFile")`` lists the store in parallel,
    yields (path, content) with content as opaque bytes, doc identity
    is recovered from the partition path, and the decode kernel (byte
    length + md5 digest — a real image/audio codec drops in unchanged,
    c15's contract) runs partition-parallel over Arrow batches. At
    100 TB of blobs nothing here changes: listing distributes, each
    executor decodes only the files its split holds, and no payload
    ever reaches the driver."""
    import pandas as pd  # local import: only the executors need it

    def build(tmp: str) -> str:
        out = os.path.join(tmp, "blobs")
        (
            load(spark, sf, "documents")
            .filter(hash_bucket(F.col("doc_id")) < _B136_BUCKET)
            .select(F.col("doc_id"), F.col("text").alias("value"))
            .write.partitionBy("doc_id")
            .format("text")
            .save(out)
        )
        return out

    blobs = _built(spark, sf, "b136", build)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(str(blobs))
    )
    parsed = raw.select(
        F.regexp_extract("path", r"doc_id=(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        "content",
    )

    def _decode_batch(batches):
        import hashlib

        for pdf in batches:
            payload = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.map(len).astype("int64"),
                    "digest": payload.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return parsed.mapInPandas(
        _decode_batch, schema="doc_id long, n_bytes long, digest string"
    )


# ---------------------------------------------------------------------------
# p21 — perplexity bucketing (CCNet head/middle/tail)
# ---------------------------------------------------------------------------

# p21 shares c23's scoring lineage, so its oracle shares c23's
# kernel chain verbatim (round 13: libm left the graded contract)
def _p21_oracle() -> str:
    from iceberg_playground_spark.queries._util import (
        int_ln_micro_cte_sql,
    )

    chain = int_ln_micro_cte_sql(
        "modelin", "lang, token", "microlog", prefix="_p21"
    )
    return _P21_ORACLE_T.format(chain=chain)


_P21_ORACLE_T = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents),
freq AS (
  SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token),
tot AS (SELECT lang, sum(cnt) AS tot FROM freq GROUP BY lang),
modelin AS MATERIALIZED (
  SELECT f.lang, f.token, CAST(tt.tot AS BIGINT) AS num,
         CAST(f.cnt AS BIGINT) AS den
  FROM freq f JOIN tot tt ON f.lang = tt.lang),
{chain},
scored AS (
  SELECT t.doc_id, t.lang, m.microlog
  FROM tok t
  JOIN _p21_fin m ON t.lang = m.lang AND t.token = m.token),
doc AS (
  SELECT doc_id, lang,
         round(CAST(sum(microlog) AS DOUBLE)
               / (count(*) * 1000000.0), 4) AS avg_logprob
  FROM scored GROUP BY doc_id, lang)
SELECT doc_id, lang, avg_logprob,
       CASE ntile(3) OVER (PARTITION BY lang
                           ORDER BY avg_logprob DESC, doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS ppl_bucket
FROM doc
"""


@query("p21_perplexity_buckets", oracle=_p21_oracle())
def p21_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """P21: perplexity bucketing — CCNet's head/middle/tail corpus
    partitioning (Wenzek et al. 2020, public work): score every
    document with the per-language unigram LM (c23's lineage, integer
    micrologs so both engines agree bit-for-bit), then split each
    language into terciles of the score distribution. "head" is the
    most-probable (lowest-perplexity) third — the slice quality
    pipelines keep outright; "tail" is what they drop or re-filter.
    The tie-break (score DESC, doc_id) makes ntile deterministic
    across engines and runs.

    Scale shape: the LM is vocab-sized → broadcast (c23's contract);
    bucketing adds ONE exchange on lang over doc-count-sized score
    rows (never token rows). ntile needs each language's scores
    sorted in one place — at 100 TB that per-lang sort is the
    classic quantile step, and the production swap is
    approx_percentile cutoffs (two map-side passes, no global sort)
    traded against exact tercile boundaries; the tercile SEMANTICS
    are identical."""
    from iceberg_playground_spark.queries.llm import c23_lm_quality_score

    scored = c23_lm_quality_score(spark, sf)
    w = W.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col("doc_id")
    )
    tile = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "avg_logprob",
        F.when(tile == 1, "head")
        .when(tile == 2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


# ---------------------------------------------------------------------------
# p22 — data-recipe epoch upsampling
# ---------------------------------------------------------------------------

_P22_ORACLE = """
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents),
src AS (SELECT source, sum(tokens) AS tot FROM d GROUP BY source),
budget AS (SELECT max(tot) AS b FROM src),
plan AS (
  SELECT s.source, b.b // s.tot AS full_epochs, b.b % s.tot AS rem
  FROM src s CROSS JOIN budget b),
cum AS (
  SELECT d.doc_id, d.source, d.tokens, p.full_epochs, p.rem,
         coalesce(sum(d.tokens) OVER (
             PARTITION BY d.source ORDER BY d.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prior
  FROM d JOIN plan p ON d.source = p.source),
exploded AS (
  SELECT doc_id, source, tokens,
         unnest(generate_series(
             CAST(1 AS BIGINT),
             CAST(full_epochs
                  + CASE WHEN prior < rem THEN 1 ELSE 0 END
                  AS BIGINT))) AS epoch
  FROM cum)
SELECT source, CAST(epoch AS BIGINT) AS epoch,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS n_tokens
FROM exploded GROUP BY source, epoch
"""


@query("p22_epoch_upsample", oracle=_P22_ORACLE)
def p22_epoch_upsample(spark: SparkSession, sf: str) -> DataFrame:
    """P22: data-recipe epoch upsampling — materialize a training
    mixture that balances every source up to the largest source's
    token budget by REPEATING small sources across epochs (the
    published recipe shape: GPT-3/Llama corpora sample high-quality
    sources >1 epoch). Whole epochs repeat every document; the
    fractional last epoch takes the greedy doc_id-ordered prefix
    whose prior running token sum is under the remainder — integer
    arithmetic end-to-end, so the materialization is reproducible
    bit-for-bit (re-running the corpus build must not reshuffle what
    epoch 3 of src7 contains). Returns the per-(source, epoch)
    manifest a trainer consumes.

    Scale shape: recipe planning collapses to one |sources|-row
    aggregate (broadcast back); the epoch fan-out is a map-side
    explode of an in-row sequence — the corpus never shuffles for
    replication. The only data exchange is the per-source running
    sum (same key as the final aggregate → one exchange reused). At
    100 TB the greedy prefix would pre-aggregate per hash-bucket
    (two-level running sum) instead of ordering every doc in one
    partition per source; semantics unchanged."""
    d = load(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tokens"),
    )
    # |sources|-row aggregate; checkpointed so the budget + plan
    # branches don't each re-evaluate the corpus scan (the
    # multi-consumer-lineage rule — no AQE exchange reuse across
    # branches with different downstream partitionings)
    src = (
        d.groupBy("source")
        .agg(F.sum("tokens").alias("tot"))
        .localCheckpoint(eager=False)
    )
    budget = src.agg(F.max("tot").alias("b"))
    plan = src.crossJoin(F.broadcast(budget)).select(
        "source",
        F.expr("b DIV tot").alias("full_epochs"),  # exact integer div
        (F.col("b") % F.col("tot")).alias("rem"),
    )
    wp = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = d.join(F.broadcast(plan), "source").withColumn(
        "prior", F.coalesce(F.sum("tokens").over(wp), F.lit(0))
    )
    exploded = cum.select(
        "source",
        "tokens",
        F.explode(
            F.sequence(
                F.lit(1).cast("bigint"),
                F.col("full_epochs")
                + F.when(F.col("prior") < F.col("rem"), 1).otherwise(0),
            )
        ).alias("epoch"),
    )
    return exploded.groupBy("source", "epoch").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# p23 — broadcast-applied quality regression (train on split, score all)
# ---------------------------------------------------------------------------

_P23_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS y,
         CASE WHEN {bucket_sql('doc_id')} < 90
              THEN 'train' ELSE 'holdout' END AS split
  FROM documents),
m AS (
  SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM d WHERE split = 'train' GROUP BY lang),
model AS (
  SELECT lang, n, sx, sy,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
  FROM m),
model2 AS (
  SELECT lang, slope,
         (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS icept
  FROM model)
SELECT d.doc_id, d.lang, d.split, d.y AS y_distinct,
       round(m.icept + m.slope * CAST(d.x AS DOUBLE), 4) AS y_pred,
       round(CAST(d.y AS DOUBLE)
             - (m.icept + m.slope * CAST(d.x AS DOUBLE)), 4)
         AS residual
FROM d JOIN model2 m ON d.lang = m.lang
"""


@query("p23_quality_regression", oracle=_P23_ORACLE)
def p23_quality_regression(spark: SparkSession, sf: str) -> DataFrame:
    """P23: train-on-split, broadcast-apply quality model — the
    fit/score shape every learned corpus filter uses (fastText
    quality classifiers, contamination regressors): fit a per-language
    least-squares model of lexical diversity (distinct tokens) on
    document length over the TRAIN split only, then score EVERY
    document with the broadcast coefficients; the residual is the
    quality signal (docs far below predicted diversity are
    boilerplate/spam — the c07 intuition, now calibrated per
    language). Determinism: b121's integer-moment formulation — the
    fit reduces to five exact BIGINT sums per language, and
    slope/intercept/prediction are a fixed sequence of
    exactly-representable double ops both engines evaluate
    identically.

    Scale shape: PASS 1 (fit) is one partial+final integer aggregate
    → |langs| rows; PASS 2 (score) is a broadcast join + map-side
    arithmetic — the corpus is scanned twice and shuffled NEVER. At
    100 TB this is the cheapest possible supervised filter: model
    size is |langs| × 2 doubles regardless of corpus size, and
    scoring parallelism is scan parallelism."""
    toks = F.split(F.col("text"), " ")
    d = load(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("x"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("y"),
        F.when(hash_bucket(F.col("doc_id")) < 90, "train")
        .otherwise("holdout")
        .alias("split"),
    )
    m = (
        d.filter(F.col("split") == "train")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    slope = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    model = m.select("lang", "n", "sx", "sy", slope.alias("slope"))
    model = model.select(
        "lang",
        "slope",
        (
            (F.col("sy").cast("double")
             - F.col("slope") * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("icept"),
    )
    pred = F.col("icept") + F.col("slope") * F.col("x").cast("double")
    return d.join(F.broadcast(model), "lang").select(
        "doc_id",
        "lang",
        "split",
        F.col("y").alias("y_distinct"),
        F.round(pred, 4).alias("y_pred"),
        F.round(F.col("y").cast("double") - pred, 4).alias("residual"),
    )


# ---------------------------------------------------------------------------
# b137 — ordered LISTAGG (SQL:2023 string aggregation surface)
# ---------------------------------------------------------------------------

_B137_SQL = """
    SELECT o_orderstatus,
           listagg(DISTINCT o_orderpriority, ',')
             WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
"""


@query(
    "b137_listagg",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(
             list_sort(list_distinct(list(o_orderpriority))), ',')
             AS priorities,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def b137_listagg(spark: SparkSession, sf: str) -> DataFrame:
    """B137: ordered LISTAGG — the SQL:2023 string-aggregation
    surface Spark 4 added (``listagg(DISTINCT ...) WITHIN GROUP
    (ORDER BY ...)``), the one string-agg form whose output is
    deterministic under shuffle (DISTINCT collapses duplicates, the
    WITHIN GROUP sort fixes order). DuckDB spells it
    list_sort(list_distinct(list(...))) — same semantics, so the
    concatenated string hash-matches.

    Scale note: safe ONLY because the aggregated domain is bounded
    (5 order priorities) — the per-group state is capped regardless of
    group size, and partial aggregation still combines map-side. An
    unbounded listagg (e.g. over doc text) would be the b30
    collect_list anti-pattern; the bounded-domain contract is the
    operator's scale story."""
    from iceberg_playground_spark.session import register_views

    register_views(spark, sf)
    return spark.sql(_B137_SQL)


# ---------------------------------------------------------------------------
# p24 — ExactSubstr strip (the rewrite c43 reports on)
# ---------------------------------------------------------------------------

_P24_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
base AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM t),
eligible AS (SELECT * FROM base WHERE n_tokens >= {_C43_K}),
pos AS (
  SELECT doc_id, i,
         md5(array_to_string(toks[i + 1 : i + {_C43_K}], ' ')) AS dg
  FROM eligible,
       UNNEST(range(0, n_tokens - {_C43_K} + 1)) AS u(i)),
flagged AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i, count(*) OVER (PARTITION BY dg) AS occ
    FROM pos)
  WHERE occ >= 2),
runs0 AS (
  SELECT doc_id, i,
         CASE WHEN lag(i) OVER w IS NULL
                OR i - lag(i) OVER w > {_C43_K}
              THEN 1 ELSE 0 END AS newrun
  FROM flagged
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
runs1 AS (
  SELECT doc_id, i,
         sum(newrun) OVER (PARTITION BY doc_id ORDER BY i) AS run_id
  FROM runs0),
runs AS (
  SELECT doc_id, min(i) AS s, max(i) + {_C43_K} AS e
  FROM runs1 GROUP BY doc_id, run_id),
tokpos AS (
  SELECT b.doc_id, b.n_tokens, u.p, b.toks[u.p + 1] AS tok
  FROM base b, UNNEST(range(0, b.n_tokens)) AS u(p)),
marked AS (
  SELECT tp.doc_id, tp.n_tokens, tp.p, tp.tok,
         EXISTS (SELECT 1 FROM runs r
                 WHERE r.doc_id = tp.doc_id
                   AND tp.p >= r.s AND tp.p < r.e) AS covered
  FROM tokpos tp)
SELECT doc_id, n_tokens,
       CAST(count(*) FILTER (WHERE NOT covered) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE covered) AS BIGINT) AS n_stripped,
       md5(coalesce(
         string_agg(tok, ' ' ORDER BY p) FILTER (WHERE NOT covered),
         '')) AS cleaned_digest
FROM marked GROUP BY doc_id, n_tokens
"""


@query("p24_substring_strip", oracle=_P24_ORACLE)
def p24_substring_strip(spark: SparkSession, sf: str) -> DataFrame:
    """P24: ExactSubstr STRIP — the rewrite c43 only reports on:
    remove every duplicated run (Lee et al. 2022 drop the repeated
    span from all but one occurrence; this strips every occurrence —
    the conservative variant that needs no global occurrence
    ordering, appropriate when the spans are boilerplate) and emit
    the cleaned corpus accounting per document: kept/stripped token
    counts and the md5 digest of the cleaned text (the digest IS the
    graded payload — proving both engines reconstruct the identical
    cleaned string, order and all).

    Scale shape: the flagged-position lineage is c43's (digest-only
    shuffles); runs collapse to a per-doc interval list BOUNDED by
    n_tokens/K entries, which joins back to the corpus on doc_id —
    at 100 TB that join is corpus ⋈ tiny (affected docs only) and
    co-partitions with the corpus's doc_id layout; the strip itself
    is a per-row JVM array filter (transform + exists over the
    interval array), no Python, no extra exchange."""
    k = _C43_K
    flagged = _flagged_positions(spark, sf)
    wd = W.partitionBy("doc_id").orderBy("i")
    runs = (
        flagged.withColumn(
            "newrun",
            F.when(
                F.lag("i").over(wd).isNull()
                | (F.col("i") - F.lag("i").over(wd) > k),
                1,
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("newrun").over(wd))
        .groupBy("doc_id", "run_id")
        .agg(F.min("i").alias("s"), (F.max("i") + k).alias("e"))
    )
    intervals = runs.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("ivs")
    )
    # explicit-count repartition: the strip (struct-zip + exists per
    # token, x3 consumers of kept_arr after CollapseProject) is this
    # query's CPU and the demo corpus is one split; the exchange also
    # co-partitions the interval join on doc_id
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
    )
    out = d.join(intervals, "doc_id", "left")
    kept_arr = F.expr(
        "transform(filter(transform(split(text, ' '), "
        "(t, p) -> struct(t AS t, p AS p)), "
        "x -> ivs IS NULL OR NOT exists(ivs, "
        "iv -> x.p >= iv.s AND x.p < iv.e)), x -> x.t)"
    )
    return out.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias(
            "n_tokens"
        ),
        F.size(kept_arr).cast("bigint").alias("n_kept"),
        (
            F.size(F.split(F.col("text"), " ")) - F.size(kept_arr)
        ).cast("bigint").alias("n_stripped"),
        F.md5(F.array_join(kept_arr, " ")).alias("cleaned_digest"),
    )


# ---------------------------------------------------------------------------
# c44 — cross-source duplication matrix
# ---------------------------------------------------------------------------

_C44_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, source, {_SH_SQL} AS sh FROM documents),
fp AS (
  SELECT DISTINCT source,
         list_aggregate(list_transform(sh, x -> md5(x)), 'min') AS fp
  FROM sh WHERE len(sh) > 0)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(count(*) AS BIGINT) AS n_shared_fp
FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
"""


@query("c44_cross_source_dup_matrix", oracle=_C44_ORACLE)
def c44_cross_source_dup_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """C44: cross-source duplication matrix — which ingestion feeds
    duplicate each other: per unordered source pair, how many content
    fingerprints (c14's min-shingle-digest winnowing representative)
    appear in BOTH. The matrix a corpus owner reads before choosing
    dedup priority ("CommonCrawl duplicates most of src12 — dedup
    those two jointly, the rest independently") and the provenance
    complement of c20's within-corpus dedup.

    Scale shape: fingerprints are map-side per-row array math (no
    shuffle); (source, fp) pairs dedup in one exchange on the digest;
    the self-join groups by fingerprint where each group holds at
    most |sources| rows — the pair blow-up is bounded by
    |fp| x |sources|^2 worst-case and the output by |sources|^2,
    independent of corpus size. No text ever shuffles."""
    from iceberg_playground_spark.queries.llm import _shingles, _tokens

    d = load(spark, sf, "documents")
    fs = (
        d.select(
            "source",
            F.array_min(F.transform(_shingles(_tokens()), F.md5)).alias(
                "fp"
            ),
        )
        .filter(F.col("fp").isNotNull())
        .distinct()
    )
    a = fs.select(F.col("source").alias("src_a"), "fp")
    b = fs.select(F.col("source").alias("src_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_fp"))
    )


# ---------------------------------------------------------------------------
# b138 — schema-drift UNION BY NAME
# ---------------------------------------------------------------------------

_B138_ORACLE = f"""
WITH u AS (
  SELECT 'v1' AS gen, event_id, user_id, value
  FROM events WHERE {bucket_sql('event_id')} < 50
  UNION ALL BY NAME
  SELECT 'v2' AS gen, user_id, event_type, event_id
  FROM events WHERE {bucket_sql('event_id')} >= 50)
SELECT gen,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT)
         AS n_null_value,
       CAST(count(*) FILTER (WHERE event_type IS NULL) AS BIGINT)
         AS n_null_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       min(value) AS min_value,
       max(value) AS max_value
FROM u GROUP BY gen
"""


@query("b138_union_by_name", oracle=_B138_ORACLE)
def b138_union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    """B138: schema-drift union — ``unionByName(allowMissingColumns)``,
    the API that stitches two producer generations into one relation
    when columns were added, dropped, and REORDERED between them (a
    positional UNION would silently pair user_id with event_id; the
    by-name form aligns on names and NULL-fills the gaps — B116's
    write-side merge-schema contract on the read side). The graded
    aggregate proves alignment: v2 rows carry NULL value, v1 rows
    NULL event_type, and per-generation user counts survive the
    column reorder intact.

    Scale shape: the union is plan-level concatenation — zero
    shuffle; both branches scan the same source with their own pushed
    filters and the NULL fill is a map-side projection. The only
    exchange is the final |generations|-row aggregate."""
    ev = load(spark, sf, "events")
    b = hash_bucket(F.col("event_id"))
    v1 = ev.filter(b < 50).select(
        F.lit("v1").alias("gen"), "event_id", "user_id", "value"
    )
    v2 = ev.filter(b >= 50).select(
        F.lit("v2").alias("gen"), "user_id", "event_type", "event_id"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy("gen").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1))
        .cast("bigint")
        .alias("n_null_value"),
        F.count(F.when(F.col("event_type").isNull(), 1))
        .cast("bigint")
        .alias("n_null_type"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# b139 — DataFrame transpose (Spark 4 surface)
# ---------------------------------------------------------------------------

_B139_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_base_price
  FROM lineitem GROUP BY l_returnflag)
SELECT 'sum_qty' AS key,
       max(CASE WHEN l_returnflag = 'A' THEN sum_qty END) AS A,
       max(CASE WHEN l_returnflag = 'N' THEN sum_qty END) AS N,
       max(CASE WHEN l_returnflag = 'R' THEN sum_qty END) AS R
FROM m
UNION ALL
SELECT 'sum_base_price',
       max(CASE WHEN l_returnflag = 'A' THEN sum_base_price END),
       max(CASE WHEN l_returnflag = 'N' THEN sum_base_price END),
       max(CASE WHEN l_returnflag = 'R' THEN sum_base_price END)
FROM m
"""


@query("b139_transpose", oracle=_B139_ORACLE)
def b139_transpose(spark: SparkSession, sf: str) -> DataFrame:
    """B139: DataFrame.transpose — Spark 4's matrix flip (rows <->
    columns, first column becomes the header), the report-shaping
    surface analysts reach for after a grouped aggregate ("metrics as
    rows, groups as columns"). Applied to the flagship aggregate's
    decimal-exact sums, so the transposed cells hash-match the
    oracle's conditional-aggregate emulation of the same flip.

    Scale note: transpose is legal ONLY on a frame whose row count is
    a column-budget (it collects the index values to NAME the output
    columns — here 3 returnflags); the input aggregate is the
    scalable part, the flip is a driver-side reshape of a
    |groups|-row result by construction."""
    from iceberg_playground_spark.queries._util import dsum

    m = (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
        )
    )
    return m.transpose()


# ---------------------------------------------------------------------------
# p25 — incremental dataset-card refresh (p16 maintained by deltas)
# ---------------------------------------------------------------------------

from iceberg_playground_spark.queries.round6 import (  # noqa: E402
    _CARD_ORACLE as _P25_ORACLE,
)


@query("p25_incremental_card_refresh", oracle=_P25_ORACLE)
def p25_incremental_card_refresh(spark: SparkSession, sf: str) -> DataFrame:
    """P25: incremental dataset-card refresh — p16's shipped-corpus
    card kept current by DELTAS instead of recomputation (the b126
    maintenance move applied to the card's whole metric set): the
    base corpus (80% bucket) materializes per-split/per-lang counters
    and per-digest count STATE; an ingest batch (the 20% bucket —
    p17's delta convention) then refreshes every metric touching only
    |batch| rows — additive counters outer-merge, and the duplicate
    masses (exact + fingerprint, the card's non-additive metrics)
    update by joining the batch's digest counts against the state:
    delta = max(n_old + m - 1, 0) - max(n_old - 1, 0) per touched
    digest. Graded by the FULL-recompute oracle (p16's own SQL over
    base ∪ batch): the hash-match IS the proof that incremental
    maintenance ≡ rebuild, duplicate tails included.

    Scale shape: the base pass is one scan (state checkpointed — at
    100 TB it is a lake table c39-style, not recomputed); the refresh
    scans ONLY the batch, every join is digest-keyed against
    KB-bounded batch aggregates, and no full-corpus digest histogram
    is ever rebuilt. NULL digests ride a sentinel so both engines'
    null-grouping semantics agree."""
    from iceberg_playground_spark.queries.llm import _shingles

    d = load(spark, sf, "documents")
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
        F.coalesce(
            F.array_min(
                F.transform(_shingles(F.split("text", " ")), F.md5)
            ),
            F.lit(""),  # null-digest sentinel: one group, both engines
        ).alias("fp"),
        (bucket >= 80).alias("is_batch"),
    ).localCheckpoint(eager=False)
    base = enriched.filter(~F.col("is_batch"))
    batch = enriched.filter(F.col("is_batch"))

    # ---- base-side STATE (at scale: lake tables, built once) ----
    st_split = (
        base.groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").alias("chars"),
        )
        .localCheckpoint(eager=False)
    )
    st_lang = (
        base.groupBy("lang")
        .agg(F.count("*").alias("docs"))
        .localCheckpoint(eager=False)
    )
    st_exact = (
        base.groupBy("exact_key").agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    st_fp = (
        base.groupBy("fp").agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )

    def dup_mass(state):
        return state.agg(
            F.coalesce(
                F.sum(F.greatest(F.col("n") - 1, F.lit(0))), F.lit(0)
            ).alias("v")
        )

    # ---- batch deltas (|batch|-row lineage only) ----
    b_split = batch.groupBy("split").agg(
        F.count("*").alias("d_docs"), F.sum("n_chars").alias("d_chars")
    )
    b_lang = batch.groupBy("lang").agg(F.count("*").alias("d_docs"))

    def dup_delta(state, key):
        m = batch.groupBy(key).agg(F.count("*").alias("m"))
        j = m.join(state, key, "left").select(
            (
                F.greatest(
                    F.coalesce(F.col("n"), F.lit(0)) + F.col("m") - 1,
                    F.lit(0),
                )
                - F.greatest(
                    F.coalesce(F.col("n"), F.lit(0)) - 1, F.lit(0)
                )
            ).alias("delta")
        )
        return j.agg(F.coalesce(F.sum("delta"), F.lit(0)).alias("v"))

    # ---- refreshed counters: state ⟗ delta (b126's outer-merge) ----
    split_now = (
        st_split.join(b_split, "split", "full_outer")
        .select(
            "split",
            (
                F.coalesce(F.col("docs"), F.lit(0))
                + F.coalesce(F.col("d_docs"), F.lit(0))
            ).alias("docs"),
            (
                F.coalesce(F.col("chars"), F.lit(0))
                + F.coalesce(F.col("d_chars"), F.lit(0))
            ).alias("chars"),
        )
        .localCheckpoint(eager=False)
    )
    lang_now = (
        st_lang.join(b_lang, "lang", "full_outer")
        .select(
            "lang",
            (
                F.coalesce(F.col("docs"), F.lit(0))
                + F.coalesce(F.col("d_docs"), F.lit(0))
            ).alias("docs"),
        )
        .localCheckpoint(eager=False)
    )
    # assemble the long-format card (p16's exact shape)
    def lit_row(metric, scope, df_val):
        return df_val.select(
            F.lit(metric).alias("metric"),
            F.lit(scope).alias("scope"),
            F.col("v").cast("bigint").alias("value"),
        )

    docs_total = split_now.agg(F.sum("docs").alias("v"))
    langs_total = lang_now.filter(F.col("docs") > 0).agg(
        F.count("*").alias("v")
    )
    exact_total = (
        dup_mass(st_exact)
        .withColumnRenamed("v", "b")
        .crossJoin(dup_delta(st_exact, "exact_key"))
        .select((F.col("b") + F.col("v")).alias("v"))
    )
    fp_total = (
        dup_mass(st_fp)
        .withColumnRenamed("v", "b")
        .crossJoin(dup_delta(st_fp, "fp"))
        .select((F.col("b") + F.col("v")).alias("v"))
    )
    parts = [
        lit_row("docs", "__corpus__", docs_total),
        lit_row("langs", "__corpus__", langs_total),
        lit_row("exact_dup_docs", "__corpus__", exact_total),
        lit_row("fingerprint_dup_docs", "__corpus__", fp_total),
        split_now.select(
            F.lit("docs").alias("metric"),
            F.col("split").alias("scope"),
            F.col("docs").cast("bigint").alias("value"),
        ),
        split_now.select(
            F.lit("chars").alias("metric"),
            F.col("split").alias("scope"),
            F.col("chars").cast("bigint").alias("value"),
        ),
        lang_now.select(
            F.lit("docs").alias("metric"),
            F.col("lang").alias("scope"),
            F.col("docs").cast("bigint").alias("value"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("metric", "scope")


# ---------------------------------------------------------------------------
# p26 — T5-style span corruption (denoising-objective data op)
# ---------------------------------------------------------------------------

_P26_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
p1 AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t),
p2 AS (
  SELECT *, greatest(1, CAST(floor(n * 0.15 / 3) AS BIGINT)) AS s
  FROM p1),
p3 AS (SELECT *, n // s AS seg FROM p2),
p4 AS (SELECT *, least(3, seg) AS spanlen FROM p3),
spans AS (
  SELECT doc_id, u.k,
         u.k * seg
         + CASE WHEN seg - spanlen = 0 THEN 0
                ELSE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                         || ':' || CAST(u.k AS VARCHAR)), 1, 8)
                     AS BIGINT) % (seg - spanlen + 1)
           END AS st,
         spanlen
  FROM p4, UNNEST(range(0, s)) AS u(k)),
spans2 AS (SELECT doc_id, k, st, st + spanlen AS en FROM spans),
pieces AS (
  SELECT p4.doc_id, u.p,
         CASE WHEN EXISTS (SELECT 1 FROM spans2 sp
                           WHERE sp.doc_id = p4.doc_id AND sp.st = u.p)
              THEN '<extra_id_' || CAST((SELECT sp.k FROM spans2 sp
                    WHERE sp.doc_id = p4.doc_id AND sp.st = u.p)
                    AS VARCHAR) || '>'
              WHEN EXISTS (SELECT 1 FROM spans2 sp
                           WHERE sp.doc_id = p4.doc_id
                             AND u.p >= sp.st AND u.p < sp.en)
              THEN NULL
              ELSE p4.toks[u.p + 1] END AS piece
  FROM p4, UNNEST(range(0, n)) AS u(p)),
masked AS (
  SELECT doc_id,
         md5(coalesce(string_agg(piece, ' ' ORDER BY p)
                      FILTER (WHERE piece IS NOT NULL), ''))
           AS masked_digest
  FROM pieces GROUP BY doc_id),
tgt AS (
  SELECT s2.doc_id,
         md5(string_agg('<extra_id_' || CAST(s2.k AS VARCHAR) || '> '
             || array_to_string(p4.toks[s2.st + 1 : s2.en], ' '),
             ' ' ORDER BY s2.k)) AS target_digest,
         CAST(sum(s2.en - s2.st) AS BIGINT) AS n_masked,
         CAST(count(*) AS BIGINT) AS n_spans
  FROM spans2 s2 JOIN p4 ON s2.doc_id = p4.doc_id
  GROUP BY s2.doc_id)
SELECT p4.doc_id, p4.n AS n_tokens, tgt.n_spans, tgt.n_masked,
       masked.masked_digest, tgt.target_digest
FROM p4
JOIN masked ON p4.doc_id = masked.doc_id
JOIN tgt ON p4.doc_id = tgt.doc_id
"""


@query("p26_span_corruption", oracle=_P26_ORACLE)
def p26_span_corruption(spark: SparkSession, sf: str) -> DataFrame:
    """P26: T5-style span corruption (Raffel et al. 2020, public
    work) — the denoising-objective data op: per document, ~15% of
    tokens masked in mean-length-3 spans, each span replaced by a
    numbered sentinel in the INPUT and emitted after its sentinel in
    the TARGET. Spans are placed DETERMINISTICALLY (one per equal
    segment, offset from md5(doc_id:k) — the repo's engine-neutral
    hash-randomness stamp), so the same doc always corrupts the same
    way: reproducible pretraining batches, and both engines rebuild
    the identical masked/target strings (the graded digests prove
    it).

    Scale shape: the entire op is ONE scan + map-side JVM array math
    — zero exchanges of any kind; spans per doc is ~n/20 so the
    per-row CASE-over-spans work is O(n·s) with tiny s. The
    index-lambda transform keeps split() evaluated once per
    expression tree (the _shingles O(n²) trap avoided)."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    step = (
        d.withColumn("toks", F.split("text", " "))
        .withColumn("n", F.size("toks").cast("bigint"))
        .withColumn(
            "s",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.floor(F.col("n") * 0.15 / 3).cast("bigint"),
            ),
        )
        .withColumn("seg", F.expr("n DIV s"))
        .withColumn("spanlen", F.least(F.lit(3).cast("bigint"), F.col("seg")))
    )
    spans = F.expr(
        "transform(sequence(0, s - 1), k -> named_struct("
        "'k', k, "
        "'st', k * seg + (CASE WHEN seg - spanlen = 0 THEN CAST(0 AS BIGINT) "
        "ELSE conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
        "CAST(k AS STRING))), 1, 8), 16, 10) % (seg - spanlen + 1) END), "
        "'en', k * seg + (CASE WHEN seg - spanlen = 0 THEN CAST(0 AS BIGINT) "
        "ELSE conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
        "CAST(k AS STRING))), 1, 8), 16, 10) % (seg - spanlen + 1) END) "
        "+ spanlen))"
    )
    w = step.withColumn("spans", spans)
    masked = F.expr(
        "array_join(filter(transform(toks, (t, p) -> "
        "CASE WHEN exists(spans, sp -> sp.st = p) "
        "THEN concat('<extra_id_', CAST(filter(spans, sp -> sp.st = p)[0].k"
        " AS STRING), '>') "
        "WHEN exists(spans, sp -> p >= sp.st AND p < sp.en) THEN NULL "
        "ELSE t END), x -> x IS NOT NULL), ' ')"
    )
    target = F.expr(
        "array_join(transform(spans, sp -> concat('<extra_id_', "
        "CAST(sp.k AS STRING), '> ', "
        "array_join(slice(toks, CAST(sp.st + 1 AS INT), "
        "CAST(sp.en - sp.st AS INT)), ' '))), ' ')"
    )
    return w.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.size("spans").cast("bigint").alias("n_spans"),
        F.expr(
            "aggregate(spans, CAST(0 AS BIGINT), "
            "(acc, sp) -> acc + (sp.en - sp.st))"
        ).alias("n_masked"),
        F.md5(masked).alias("masked_digest"),
        F.md5(target).alias("target_digest"),
    )


# ---------------------------------------------------------------------------
# c45 — ANN recall evaluation (LSH index vs exact brute force)
# ---------------------------------------------------------------------------

_C45_PROBES = 20
_C45_K = 10
_C45_BANDS = 4
_C45_BITS = 4


def _c45_oracle() -> str:
    from iceberg_playground_spark.queries.round5 import _c29_dot_sql

    nb = _C45_BANDS * _C45_BITS
    bit_cols = ", ".join(
        f"CASE WHEN {_c29_dot_sql(j)} >= 0 THEN 1 ELSE 0 END AS bit{j}"
        for j in range(nb)
    )
    band_selects = " UNION ALL ".join(
        "SELECT vec_id, {b} AS band, {val} AS bval FROM s".format(
            b=b,
            val=" + ".join(
                f"bit{b * _C45_BITS + r} * {1 << (_C45_BITS - 1 - r)}"
                for r in range(_C45_BITS)
            ),
        )
        for b in range(_C45_BANDS)
    )
    from iceberg_playground_spark.queries.llm import _dot_sql, _norm_sql

    cos = (
        f"round({_dot_sql('be', 'pe')} "
        f"/ ({_norm_sql('be')} * {_norm_sql('pe')}), 6)"
    )
    return f"""
    WITH s AS (SELECT vec_id, {bit_cols} FROM embeddings),
    sig AS ({band_selects}),
    cand AS (
      SELECT DISTINCT p.vec_id AS probe_id, b.vec_id AS base_id
      FROM sig p JOIN sig b ON p.band = b.band AND p.bval = b.bval
      WHERE p.vec_id < {_C45_PROBES} AND b.vec_id >= {_C45_PROBES}),
    candn AS (
      SELECT probe_id, CAST(count(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY probe_id),
    ann AS (
      SELECT probe_id, base_id FROM (
        SELECT c.probe_id, c.base_id,
               {cos} AS cosine
        FROM cand c
        JOIN (SELECT vec_id, embedding AS pe FROM embeddings) p
          ON p.vec_id = c.probe_id
        JOIN (SELECT vec_id, embedding AS be FROM embeddings) b
          ON b.vec_id = c.base_id)
      QUALIFY row_number() OVER (PARTITION BY probe_id
                                 ORDER BY cosine DESC, base_id)
              <= {_C45_K}),
    truth AS (
      SELECT probe_id, base_id FROM (
        SELECT p.vec_id AS probe_id, b.vec_id AS base_id,
               {cos} AS cosine
        FROM (SELECT vec_id, embedding AS pe FROM embeddings
              WHERE vec_id < {_C45_PROBES}) p,
             (SELECT vec_id, embedding AS be FROM embeddings
              WHERE vec_id >= {_C45_PROBES}) b)
      QUALIFY row_number() OVER (PARTITION BY probe_id
                                 ORDER BY cosine DESC, base_id)
              <= {_C45_K})
    SELECT t.probe_id,
           coalesce(any_value(cn.n_candidates), 0) AS n_candidates,
           CAST(count(a.base_id) AS BIGINT) AS n_hits,
           CAST(count(*) AS BIGINT) AS n_true
    FROM truth t
    LEFT JOIN ann a ON a.probe_id = t.probe_id AND a.base_id = t.base_id
    LEFT JOIN candn cn ON cn.probe_id = t.probe_id
    GROUP BY t.probe_id
    """


@query("c45_ann_recall", oracle=_c45_oracle())
def c45_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """C45: ANN recall evaluation — the measurement every approximate
    index must pass before it replaces brute force in a pipeline:
    for a probe set, compare the hyperplane-LSH index's top-k (c29's
    16-bit banded signatures → candidate buckets → exact re-rank of
    candidates only) against the exact brute-force top-k (c03's
    baseline arm), and report per probe the candidate-set size and
    recall numerator (true top-k members the index found). Answers
    "is 4x4-bit banding enough for this corpus, and at what candidate
    cost" — the engineering tradeoff c29 only describes.

    Scale shape: signatures are map-side (16 fixed-literal dot
    products per row); candidates form by (band, bval) equi-join —
    never all-pairs; the exact-truth arm IS probe x corpus by
    definition (broadcast probes against one base scan — the
    eval-only arm: at 100 TB you run it over a sampled probe set
    exactly like this, never over the full corpus); both top-k
    windows group-limit below their exchange."""
    from iceberg_playground_spark.queries.llm import _dot, _norm
    from iceberg_playground_spark.queries.round5 import _c29_bit_sql

    e = load(spark, sf, "embeddings")
    # the 16 sign bits + 4 band structs as ONE parsed expression
    # (c29's round-16 rule; same _RP_SIGNS geometry — the leading
    # "0 +" mirrors the old sum(..., F.lit(0)) seed term)
    bands = F.expr(
        "array(" + ", ".join(
            "named_struct('band', {b}, 'bval', 0 + {val})".format(
                b=b,
                val=" + ".join(
                    f"({_c29_bit_sql(b * _C45_BITS + r)})"
                    f" * {1 << (_C45_BITS - 1 - r)}"
                    for r in range(_C45_BITS)
                ),
            )
            for b in range(_C45_BANDS)
        ) + ")"
    )
    sig = e.select("vec_id", F.explode(bands).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval")
    ).localCheckpoint(eager=False)  # one signature pass, two consumers
    psig = sig.filter(F.col("vec_id") < _C45_PROBES).select(
        F.col("vec_id").alias("probe_id"), "band", "bval"
    )
    bsig = sig.filter(F.col("vec_id") >= _C45_PROBES).select(
        F.col("vec_id").alias("base_id"), "band", "bval"
    )
    cand = (
        psig.join(bsig, ["band", "bval"])
        .select("probe_id", "base_id")
        .distinct()
        .localCheckpoint(eager=False)  # feeds count + re-rank once
    )
    candn = cand.groupBy("probe_id").agg(
        F.count("*").cast("bigint").alias("n_candidates")
    )
    pe = e.filter(F.col("vec_id") < _C45_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    be = e.filter(F.col("vec_id") >= _C45_PROBES).select(
        F.col("vec_id").alias("base_id"), F.col("embedding").alias("be")
    )
    cos = F.round(
        _dot(F.col("be"), F.col("pe"))
        / (_norm(F.col("be")) * _norm(F.col("pe"))),
        6,
    ).alias("cosine")
    wk = W.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("base_id")
    )
    ann = (
        cand.join(F.broadcast(pe), "probe_id")
        .join(be, "base_id")
        .select("probe_id", "base_id", cos)
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _C45_K)
        .select("probe_id", "base_id")
    )
    truth = (
        be.crossJoin(F.broadcast(pe))
        .select("probe_id", "base_id", cos)
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _C45_K)
        .select("probe_id", "base_id")
    )
    return (
        truth.join(
            ann.withColumn("hit", F.lit(1)), ["probe_id", "base_id"], "left"
        )
        .groupBy("probe_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits"),
            F.count("*").cast("bigint").alias("n_true"),
        )
        .join(candn, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("bigint")
            .alias("n_candidates"),
            "n_hits",
            "n_true",
        )
    )


# ---------------------------------------------------------------------------
# b140 — SQL scripting (compound statements, Spark 4 procedural surface)
# ---------------------------------------------------------------------------

_B140_SCRIPT = """
BEGIN
  DECLARE cutoff DOUBLE DEFAULT 512000.0;
  WHILE 2 * (SELECT count(*) FROM orders WHERE o_totalprice >= cutoff)
        < (SELECT count(*) FROM orders) DO
    SET cutoff = cutoff / 2;
  END WHILE;
  SELECT CAST(cutoff AS DOUBLE) AS cutoff,
         CAST(count(*) AS BIGINT) AS n_above
  FROM orders WHERE o_totalprice >= cutoff;
END
"""

_B140_ORACLE = """
WITH ks AS (SELECT unnest(range(0, 40)) AS k),
tot AS (SELECT count(*) AS t FROM orders),
cnt AS (
  SELECT ks.k, 512000.0 / power(2.0, ks.k) AS cutoff,
         (SELECT count(*) FROM orders
          WHERE o_totalprice >= 512000.0 / power(2.0, ks.k)) AS n
  FROM ks),
sel AS (
  SELECT min(k) AS k FROM cnt, tot WHERE 2 * cnt.n >= tot.t)
SELECT CAST(c.cutoff AS DOUBLE) AS cutoff,
       CAST(c.n AS BIGINT) AS n_above
FROM cnt c JOIN sel ON c.k = sel.k
"""


@query("b140_sql_scripting", oracle=_B140_ORACLE)
def b140_sql_scripting(spark: SparkSession, sf: str) -> DataFrame:
    """B140: SQL scripting — Spark 4's compound-statement surface
    (BEGIN/DECLARE/SET/WHILE), the procedural layer the reference's
    bundled SQL service exposes to operators who write control flow
    in SQL instead of a driver program. The block binary-searches a
    price cutoff downward (halving — every cutoff is an exact
    double) until at least half the orders qualify, then returns the
    cutoff and its population. The oracle replays the loop
    declaratively (min k over a candidate ladder) — hash-matching
    proves the procedural and declarative forms agree.

    Scale note: each loop iteration is one full aggregate (here
    ~log2(price range) = <= 10 passes); the production form caches
    the scan or pre-aggregates a histogram — the point of the
    surface item is the CONTROL FLOW contract, not the search
    algorithm."""
    from iceberg_playground_spark.session import register_views

    register_views(spark, sf)
    return spark.sql(_B140_SCRIPT)


# ---------------------------------------------------------------------------
# c46 — classifier evaluation (precision/recall over c12's lang-ID)
# ---------------------------------------------------------------------------

_C46_ORACLE = """
WITH t AS (
  SELECT lang = 'en' AS actual_en,
         (CAST(len(list_filter(string_split(text, ' '),
                               x -> x IN ('the', 'a', 'of')))
               AS DOUBLE)
          / len(string_split(text, ' '))) >= 0.05 AS pred_en
  FROM documents),
m AS (
  SELECT CAST(count(*) FILTER (WHERE actual_en AND pred_en) AS BIGINT)
           AS tp,
         CAST(count(*) FILTER (WHERE NOT actual_en AND pred_en)
              AS BIGINT) AS fp,
         CAST(count(*) FILTER (WHERE actual_en AND NOT pred_en)
              AS BIGINT) AS fn,
         CAST(count(*) FILTER (WHERE NOT actual_en AND NOT pred_en)
              AS BIGINT) AS tn
  FROM t)
SELECT 'tp' AS metric, tp AS value FROM m
UNION ALL SELECT 'fp', fp FROM m
UNION ALL SELECT 'fn', fn FROM m
UNION ALL SELECT 'tn', tn FROM m
UNION ALL
SELECT 'precision_ppm',
       CAST(round(CAST(tp AS DOUBLE) / (tp + fp) * 1000000) AS BIGINT)
FROM m
UNION ALL
SELECT 'recall_ppm',
       CAST(round(CAST(tp AS DOUBLE) / (tp + fn) * 1000000) AS BIGINT)
FROM m
UNION ALL
SELECT 'f1_ppm',
       CAST(round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1000000)
            AS BIGINT)
FROM m
"""


@query("c46_classifier_eval", oracle=_C46_ORACLE)
def c46_classifier_eval(spark: SparkSession, sf: str) -> DataFrame:
    """C46: classifier evaluation — the metric harness a corpus
    pipeline runs before trusting any learned/heuristic filter (c12's
    lang-ID here; the same relation evaluates a quality classifier or
    a contamination detector): confusion counts plus
    precision/recall/F1 as parts-per-million INTEGERS (one rounded
    division from exact BIGINT counts — engine-identical, the
    micro-unit discipline of c23/c35). Long-format (metric, value) so
    downstream dashboards ingest it like p16's card.

    Scale shape: one scan, one global aggregate of four conditional
    counts — map-side partials collapse everything before the single
    exchange; the metric fan-out is arithmetic over one row."""
    d = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    pred_en = (
        F.size(F.filter(toks, lambda x: x.isin("the", "a", "of"))).cast(
            "double"
        )
        / F.size(toks)
    ) >= 0.05
    actual_en = F.col("lang") == "en"
    m = d.select(
        actual_en.alias("a"), pred_en.alias("p")
    ).agg(
        F.count(F.when(F.col("a") & F.col("p"), 1))
        .cast("bigint")
        .alias("tp"),
        F.count(F.when(~F.col("a") & F.col("p"), 1))
        .cast("bigint")
        .alias("fp"),
        F.count(F.when(F.col("a") & ~F.col("p"), 1))
        .cast("bigint")
        .alias("fn"),
        F.count(F.when(~F.col("a") & ~F.col("p"), 1))
        .cast("bigint")
        .alias("tn"),
    ).localCheckpoint(eager=False)  # one scan feeds seven metric rows
    ppm = lambda num, den: (  # noqa: E731
        F.round(num.cast("double") / den * 1000000).cast("bigint")
    )
    rows = [
        ("tp", F.col("tp")),
        ("fp", F.col("fp")),
        ("fn", F.col("fn")),
        ("tn", F.col("tn")),
        ("precision_ppm", ppm(F.col("tp"), F.col("tp") + F.col("fp"))),
        ("recall_ppm", ppm(F.col("tp"), F.col("tp") + F.col("fn"))),
        (
            "f1_ppm",
            ppm(
                2 * F.col("tp"),
                2 * F.col("tp") + F.col("fp") + F.col("fn"),
            ),
        ),
    ]
    out = None
    for name, expr in rows:
        part = m.select(
            F.lit(name).alias("metric"), expr.alias("value")
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# c47 — Matryoshka truncation fidelity (store fewer dims?)
# ---------------------------------------------------------------------------

_C47_DIMS = [8, 16, 32]
_C47_PROBES = 20
_C47_K = 10


def _c47_oracle() -> str:
    from iceberg_playground_spark.queries.llm import _dot_sql, _norm_sql

    def cos_d(d):
        a, b = f"list_slice(be, 1, {d})", f"list_slice(pe, 1, {d})"
        return (
            f"round({_dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)}), 6)"
        )

    cos_full = (
        f"round({_dot_sql('be', 'pe')} "
        f"/ ({_norm_sql('be')} * {_norm_sql('pe')}), 6)"
    )
    trunc_arms = " UNION ALL ".join(
        f"""SELECT {d} AS dim, probe_id, base_id FROM (
          SELECT p.vec_id AS probe_id, b.vec_id AS base_id,
                 {cos_d(d)} AS cosine
          FROM (SELECT vec_id, embedding AS pe FROM embeddings
                WHERE vec_id < {_C47_PROBES}) p,
               (SELECT vec_id, embedding AS be FROM embeddings
                WHERE vec_id >= {_C47_PROBES}) b)
        QUALIFY row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cosine DESC, base_id)
                <= {_C47_K}"""
        for d in _C47_DIMS
    )
    return f"""
    WITH truth AS (
      SELECT probe_id, base_id FROM (
        SELECT p.vec_id AS probe_id, b.vec_id AS base_id,
               {cos_full} AS cosine
        FROM (SELECT vec_id, embedding AS pe FROM embeddings
              WHERE vec_id < {_C47_PROBES}) p,
             (SELECT vec_id, embedding AS be FROM embeddings
              WHERE vec_id >= {_C47_PROBES}) b)
      QUALIFY row_number() OVER (PARTITION BY probe_id
                                 ORDER BY cosine DESC, base_id)
              <= {_C47_K}),
    trunc AS ({trunc_arms})
    SELECT dims.dim, t.probe_id,
           CAST(count(tr.base_id) AS BIGINT) AS n_hits,
           CAST(count(*) AS BIGINT) AS n_true
    FROM truth t
    CROSS JOIN (SELECT DISTINCT dim FROM trunc) dims
    LEFT JOIN trunc tr ON tr.dim = dims.dim
                      AND tr.probe_id = t.probe_id
                      AND tr.base_id = t.base_id
    GROUP BY dims.dim, t.probe_id
    """


@query("c47_matryoshka_recall", oracle=_c47_oracle())
def c47_matryoshka_recall(spark: SparkSession, sf: str) -> DataFrame:
    """C47: Matryoshka truncation fidelity (Kusupati et al. 2022,
    public work) — "can we store 16 dims instead of 64?": for each
    truncation width, rank the corpus by cosine over the PREFIX of
    the embedding and report how much of the full-dimension top-k
    survives, per probe. The answer decides the storage/recall
    tradeoff a 100 TB embedding table actually pays (a 4x dim cut is
    a 4x scan cut for every downstream ANN pass). Integer hits from
    rounded-cosine rankings with base_id tie-breaks — deterministic
    both engines.

    Scale shape: one probe-broadcast scan per width plus the
    full-width truth arm (all the c03 eval-arm shape: broadcast
    probes, TakeOrdered-style group-limit per probe, never a base
    self-join); hits reduce by (dim, probe) — output is
    |dims| x |probes| rows at any corpus size."""
    from iceberg_playground_spark.queries.llm import _dot, _norm

    e = load(spark, sf, "embeddings")
    pe = e.filter(F.col("vec_id") < _C47_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    be = e.filter(F.col("vec_id") >= _C47_PROBES).select(
        F.col("vec_id").alias("base_id"), F.col("embedding").alias("be")
    )
    pairs = be.crossJoin(F.broadcast(pe)).localCheckpoint(
        eager=False
    )  # one scan feeds the truth arm + every truncation arm

    def topk(cos_col):
        wk = W.partitionBy("probe_id").orderBy(
            F.col("cosine").desc(), F.col("base_id")
        )
        return (
            pairs.select("probe_id", "base_id", cos_col.alias("cosine"))
            .withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") <= _C47_K)
            .select("probe_id", "base_id")
        )

    def cos_prefix(d):
        a = F.slice(F.col("be"), 1, d) if d else F.col("be")
        b = F.slice(F.col("pe"), 1, d) if d else F.col("pe")
        return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)

    truth = topk(cos_prefix(None))
    out = None
    for d in _C47_DIMS:
        arm = (
            truth.join(
                topk(cos_prefix(d)).withColumn("hit", F.lit(1)),
                ["probe_id", "base_id"],
                "left",
            )
            .groupBy("probe_id")
            .agg(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .cast("bigint")
                .alias("n_hits"),
                F.count("*").cast("bigint").alias("n_true"),
            )
            .select(
                F.lit(d).alias("dim"), "probe_id", "n_hits", "n_true"
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# ---------------------------------------------------------------------------
# p27 — dedup audit sample (eyeball the near-dups before deleting them)
# ---------------------------------------------------------------------------


def _p27_oracle() -> str:
    from iceberg_playground_spark.queries.round7 import (
        _DIGEST_SQL,
        _bands_union_sql,
        _mh_sql,
    )

    return f"""
    WITH sh0 AS (SELECT doc_id, {_SH_SQL} AS sh FROM documents),
    sh AS (SELECT doc_id, sh, len(sh) AS n_sh FROM sh0 WHERE len(sh) > 0),
    ds AS (SELECT doc_id, {_DIGEST_SQL} AS ds FROM sh),
    mh AS (SELECT doc_id, {_mh_sql()} FROM ds),
    sig AS (SELECT DISTINCT doc_id, band, sig
            FROM ({_bands_union_sql('mh', 'doc_id')})),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(count(DISTINCT a.band) AS BIGINT) AS n_shared_bands
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    aud AS (
      SELECT p.a_id, p.b_id, p.n_shared_bands,
             round(CAST(len(list_intersect(A.sh, B.sh)) AS DOUBLE)
                   / (A.n_sh + B.n_sh
                      - len(list_intersect(A.sh, B.sh))), 6) AS jaccard
      FROM pairs p
      JOIN sh A ON A.doc_id = p.a_id
      JOIN sh B ON B.doc_id = p.b_id)
    SELECT a_id, b_id, n_shared_bands, jaccard
    FROM aud ORDER BY jaccard DESC, a_id, b_id LIMIT 20
    """


@query("p27_dedup_audit_sample", oracle=_p27_oracle())
def p27_dedup_audit_sample(spark: SparkSession, sf: str) -> DataFrame:
    """P27: dedup audit sample — the QA table a corpus owner reads
    BEFORE letting an LSH dedup job delete anything: the top-20
    candidate pairs the banding scheme (p17's portable affine family)
    actually proposes, each with its band-collision provenance (how
    many of the 4 bands agreed) and its EXACT 3-gram Jaccard — so a
    human can spot a banding scheme that fires on non-duplicates (low
    Jaccard with band hits = tune bands/rows before deleting data).
    The audit bridges c02/p17 (candidates) and c09 (exact pairs) in
    one graded relation.

    Scale shape: ONE checkpointed signature pass self-joins on
    (band, sig) — candidate volume is Σ|bucket|², never all-pairs;
    the exact-Jaccard verification touches ONLY candidate pairs
    (joined back to the shingle sets, pair-bounded); top-20 is a
    group-limit sort of an audit-sized relation."""
    from iceberg_playground_spark.queries.llm import _shingles, _tokens
    from iceberg_playground_spark.queries.round7 import _band_sigs

    d = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
    )
    sigs = _band_sigs(d, "doc_id").localCheckpoint(eager=False)
    a = sigs.select(
        F.col("doc_id").alias("a_id"), "band", "sig"
    )
    b = sigs.select(
        F.col("doc_id").alias("b_id"), "band", "sig"
    )
    pairs = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.countDistinct("band").cast("bigint").alias("n_shared_bands")
        )
    )
    sh = d.select(
        "doc_id", _shingles(_tokens()).alias("sh")
    ).filter(F.size("sh") > 0).select(
        "doc_id", "sh", F.size("sh").alias("n_sh")
    )
    A = sh.select(
        F.col("doc_id").alias("a_id"),
        F.col("sh").alias("a_sh"),
        F.col("n_sh").alias("a_n"),
    )
    B = sh.select(
        F.col("doc_id").alias("b_id"),
        F.col("sh").alias("b_sh"),
        F.col("n_sh").alias("b_n"),
    )
    inter = F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh")))
    return (
        pairs.join(A, "a_id")
        .join(B, "b_id")
        .select(
            "a_id",
            "b_id",
            "n_shared_bands",
            F.round(
                inter.cast("double")
                / (F.col("a_n") + F.col("b_n") - inter),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "a_id", "b_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# c48 — SemDeDup (cluster-then-dedup over embeddings)
# ---------------------------------------------------------------------------

_C48_CELLS = 16
_C48_TAU = 0.4


def _c48_oracle() -> str:
    from iceberg_playground_spark.queries.llm import _dot_sql, _norm_sql

    fold = (
        "list_reduce(list_transform(range(1, len(embedding) + 1), "
        "i -> (CAST(embedding[i] AS DOUBLE) - CAST(seed[i] AS DOUBLE)) * "
        "(CAST(embedding[i] AS DOUBLE) - CAST(seed[i] AS DOUBLE))), "
        "(x, y) -> x + y)"
    )
    cos = (
        f"round({_dot_sql('a.embedding', 'b.embedding')} "
        f"/ ({_norm_sql('a.embedding')} * {_norm_sql('b.embedding')}), 6)"
    )
    return f"""
    WITH seeds AS (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j,
             embedding AS seed
      FROM embeddings QUALIFY j < {_C48_CELLS}),
    asg AS (
      SELECT vec_id, (min({{'d2': d2, 'j': j}})).j AS cell
      FROM (
        SELECT e.vec_id, s.j, {fold} AS d2
        FROM embeddings e CROSS JOIN seeds s)
      GROUP BY vec_id),
    mem AS (
      SELECT e.vec_id, e.embedding, asg.cell
      FROM embeddings e JOIN asg USING (vec_id)),
    dropped AS (
      SELECT DISTINCT b.vec_id, b.cell
      FROM mem a JOIN mem b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {cos} >= {_C48_TAU})
    SELECT m.cell,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(d.vec_id) AS BIGINT) AS n_dropped
    FROM mem m LEFT JOIN dropped d
      ON d.vec_id = m.vec_id AND d.cell = m.cell
    GROUP BY m.cell
    """


@query("c48_semdedup", oracle=_c48_oracle())
def c48_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """C48: SemDeDup (Abbas et al. 2023, public work) — semantic
    dedup at corpus scale: cluster the embedding space, then remove
    near-identical pairs ONLY within each cluster, so the quadratic
    pair work is Σ|cell|² instead of |corpus|² (the insight that made
    semantic dedup tractable for LAION/web corpora). Cells are
    md5-seeded existing vectors (c38/c40's no-Lloyd determinism rule
    — skipping the float-averaging train step keeps both engines
    bit-identical); a vector is dropped when a lower-id cellmate sits
    above the cosine threshold (0.4 here — calibrated to this
    synthetic corpus, whose max pairwise cosine is ~0.46; production
    SemDeDup uses ~0.9+ on real embeddings where duplicates exist).
    Per cell: members and dropped — the dedup-rate report per region
    of embedding space.

    Scale shape: assignment is a broadcast of {_C48_CELLS} seed rows
    against one scan (map-side fold per pair, min-struct tie-break);
    the pair stage self-joins WITHIN cells only (the exchange is on
    cell; a hot cell is the SemDeDup paper's known skew case — their
    answer and ours is more cells); output is |cells| rows."""
    from iceberg_playground_spark.queries.llm import _dbl, _dot, _norm

    e = load(spark, sf, "embeddings")
    wseed = W.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
    # j is BIGINT, not the row_number() default int: the cell id rides
    # through to the graded output, and DuckDB's row_number() is BIGINT
    # — the repo-wide CAST-to-BIGINT schema contract (ADVICE r8).
    seeds = (
        e.select("vec_id", "embedding")
        .withColumn("j", (F.row_number().over(wseed) - 1).cast("bigint"))
        .filter(F.col("j") < _C48_CELLS)
        .select("j", F.col("embedding").alias("seed"))
    )
    d2 = F.aggregate(
        F.zip_with(
            _dbl(F.col("embedding")),
            _dbl(F.col("seed")),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    asg = (
        e.crossJoin(F.broadcast(seeds))
        .select("vec_id", F.struct(d2.alias("d2"), F.col("j").alias("j")).alias("dj"))
        .groupBy("vec_id")
        .agg(F.min("dj").getField("j").alias("cell"))
    )
    mem = e.join(asg, "vec_id").select(
        "vec_id", "embedding", "cell"
    ).localCheckpoint(eager=False)  # one assignment feeds both join sides
    a = mem.select(
        F.col("cell"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("ae"),
    )
    b = mem.select(
        F.col("cell"),
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("be"),
    )
    cos = F.round(
        _dot(F.col("ae"), F.col("be"))
        / (_norm(F.col("ae")) * _norm(F.col("be"))),
        6,
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cos >= _C48_TAU)
        .select("cell", F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return (
        mem.join(
            dropped.withColumn("dr", F.lit(1)), ["cell", "vec_id"], "left"
        )
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum(F.coalesce(F.col("dr"), F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# c49 — dedup cluster-size histogram (iterative CC, hash-graded)
# ---------------------------------------------------------------------------


def _c49_chain() -> str:
    """The recursive closure chain through ``rep`` (v → component min
    over the LSH band-collision graph). Shared by c49's histogram and
    p43's epoch plan (the compose-never-slice rule); callers prepend
    ``WITH RECURSIVE``."""
    from iceberg_playground_spark.queries.round7 import (
        _DIGEST_SQL,
        _bands_union_sql,
        _mh_sql,
    )

    return f"""sh0 AS (SELECT doc_id, {_SH_SQL} AS sh FROM documents),
    sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
    ds AS (SELECT doc_id, {_DIGEST_SQL} AS ds FROM sh),
    mh AS (SELECT doc_id, {_mh_sql()} FROM ds),
    sig AS (SELECT DISTINCT doc_id, band, sig
            FROM ({_bands_union_sql('mh', 'doc_id')})),
    pairs AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id <> b.doc_id),
    nodes AS (SELECT DISTINCT doc_id AS v FROM sig),
    reach(v, u) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT r.v, p.b FROM reach r JOIN pairs p ON r.u = p.a),
    rep AS (SELECT v, min(u) AS rep FROM reach GROUP BY v)"""


def _c49_oracle() -> str:
    return f"""
    WITH RECURSIVE {_c49_chain()},
    sizes AS (SELECT rep, count(*) AS csize FROM rep GROUP BY rep)
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY csize
    """


def _c49_rep(spark: SparkSession, sf: str) -> DataFrame:
    """The (v, rep) connected-components fixpoint over the LSH
    band-collision graph — Pregel-style pointer jumping, 8 rounds
    (closing chains up to 2^8), over p17's portable affine signature
    family. Shared by c49 (histogram) and p43 (epoch plan); the
    declarative twin is _c49_chain()'s recursive CTE. Only docs with
    ≥1 shingle appear (shingle-less docs cannot collide — callers
    treat them as singletons via a left join)."""
    from iceberg_playground_spark.queries.round7 import _band_sigs

    d = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
    )
    sigs = _band_sigs(d, "doc_id").localCheckpoint(eager=False)
    a = sigs.select(F.col("doc_id").alias("a"), "band", "sig")
    b = sigs.select(F.col("doc_id").alias("b"), "band", "sig")
    pairs = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    rep = (
        sigs.select(F.col("doc_id").alias("v"))
        .distinct()
        .withColumn("rep", F.col("v"))
        .localCheckpoint(eager=False)
    )
    for _ in range(8):  # closes chains up to length 2^8
        # neighbor pass: rep(v) <- min(rep(v), min over edges rep(u))
        nb = (
            pairs.join(
                rep.select(F.col("v").alias("b"), F.col("rep").alias("nrep")),
                "b",
            )
            .groupBy(F.col("a").alias("v"))
            .agg(F.min("nrep").alias("nmin"))
        )
        stepped = rep.join(nb, "v", "left").select(
            "v",
            F.least(
                F.col("rep"), F.coalesce(F.col("nmin"), F.col("rep"))
            ).alias("rep"),
        )
        # pointer jump: rep(v) <- rep(rep(v)). One checkpoint per
        # ROUND, not per pass (round 16): the jump's self-join reads
        # `stepped` twice, but its two sides are the identical plan
        # subtree, so the exchange is computed once and reused —
        # halving the superstep job count for the same fixpoint.
        jumped = (
            stepped.join(
                stepped.select(
                    F.col("v").alias("rep"), F.col("rep").alias("rep2")
                ),
                "rep",
            )
            .select("v", F.col("rep2").alias("rep"))
            .localCheckpoint(eager=False)
        )
        # convergence exit (round 16): a round that changes no rep is
        # the fixpoint — every later round is the identity, so
        # stopping early returns bit-identical results while skipping
        # the remaining supersteps (chains at the shipped SFs close in
        # 2-3 rounds; the 8-round ceiling still guarantees 2^8).
        changed = (
            jumped.join(
                rep.select("v", F.col("rep").alias("prev")), "v"
            )
            .filter(F.col("rep") != F.col("prev"))
        )
        rep = jumped
        if changed.isEmpty():
            break
    return rep


@query("c49_dedup_cluster_histogram", oracle=_c49_oracle())
def c49_dedup_cluster_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """C49: dedup cluster-size histogram — connected components over
    the LSH band-collision graph, GRADED: c24 computes the same
    transitive closure over engine-native xxhash64 (rows-only by
    necessity); this sibling runs it over p17's portable affine
    family, and the oracle computes the identical fixpoint
    DECLARATIVELY (a recursive-CTE closure + min-per-node) — the
    hash-match proves the distributed iterative algorithm (Pregel-
    style pointer jumping, rounds double the closed hop distance)
    reaches exactly the fixpoint the declarative form defines. The
    histogram (how many dup-clusters of each size) is the number a
    corpus owner quotes ("duplicate mass lives in k-sized families").

    Scale shape: the collision graph is bucket-bounded (Σ|bucket|²
    candidate edges, digest-only); each superstep is one self-join of
    the |docs|-row rep relation; log2(longest chain) rounds. The
    driver loop controls ROUNDS only (a fixed 8, closing chains to
    2^8) — no data ever reaches the driver."""
    rep = _c49_rep(spark, sf)
    sizes = rep.groupBy("rep").agg(F.count("*").alias("csize"))
    return sizes.groupBy("csize").agg(
        F.count("*").cast("bigint").alias("n_clusters")
    ).select(
        F.col("csize").cast("bigint").alias("cluster_size"), "n_clusters"
    )


# ---------------------------------------------------------------------------
# p28 — SFT pair construction (prompt/completion split + loss mask)
# ---------------------------------------------------------------------------

_P28_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
base AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t
  WHERE len(toks) >= 2),
cut AS (
  SELECT doc_id, toks, n,
         1 + ({bucket_sql('doc_id')} * 37) % (n - 1) AS cutpos
  FROM base)
SELECT doc_id, n AS n_tokens,
       CAST(cutpos AS BIGINT) AS n_prompt,
       CAST(n - cutpos AS BIGINT) AS n_completion,
       md5(array_to_string(toks[1 : cutpos], ' ')) AS prompt_digest,
       md5(array_to_string(toks[cutpos + 1 : n], ' '))
         AS completion_digest
FROM cut
"""


@query("p28_sft_pairs", oracle=_P28_ORACLE)
def p28_sft_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """P28: SFT pair construction — the instruction-tuning data shape:
    each document splits into a (prompt, completion) pair at a
    DETERMINISTIC pivot (md5-derived, so re-running the dataset build
    reproduces identical pairs — the c17 stamp discipline), with the
    loss-mask accounting a trainer consumes (prompt tokens are
    context-only, completion tokens carry loss). Both side digests
    are graded, proving the exact split reconstructs identically in
    both engines; docs under 2 tokens cannot form a pair and are
    excluded on both sides.

    Scale shape: pure map — one scan, zero exchanges; the pivot is
    per-row hash arithmetic, the slices and digests are JVM array
    ops. At 100 TB this is a free pass over the corpus scan, exactly
    like c17's split stamping."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks).cast("bigint")
    base = d.filter(F.size(toks) >= 2).select(
        "doc_id", toks.alias("toks"), n.alias("n")
    )
    pivot = 1 + (hash_bucket(F.col("doc_id")) * 37) % (F.col("n") - 1)
    cut = base.withColumn("pivot", pivot)
    return cut.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.col("pivot").cast("bigint").alias("n_prompt"),
        (F.col("n") - F.col("pivot")).cast("bigint").alias("n_completion"),
        F.md5(
            F.array_join(F.slice(F.col("toks"), 1, F.col("pivot").cast("int")), " ")
        ).alias("prompt_digest"),
        F.md5(
            F.array_join(
                F.expr("slice(toks, CAST(pivot + 1 AS INT), CAST(n - pivot AS INT))"),
                " ",
            )
        ).alias("completion_digest"),
    )


# ---------------------------------------------------------------------------
# c50 — Zipf audit (corpus token statistics + fitted exponent)
# ---------------------------------------------------------------------------

# c50's rank/count logs are ln(k/1) integer ratios — round-14
# migration to the shared integer-ln kernel (the c65/c84 latent
# cross-libm hazard class; the micrologs become the kernel's
# deterministic values on both sides)
_C50_ORACLE_T = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
ranked AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token) AS rnk
  FROM freq),
lx_in AS (SELECT cnt, CAST(1 AS BIGINT) AS num, rnk AS den FROM ranked),
{chain_x},
ly_in AS (SELECT x, CAST(1 AS BIGINT) AS num,
                 CAST(cnt AS BIGINT) AS den FROM _lx_fin),
{chain_y},
logs AS (SELECT x, y FROM _ly_fin),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM logs)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM freq) AS vocab_size,
       (SELECT CAST(sum(cnt) AS BIGINT) FROM freq) AS total_tokens,
       CAST(round(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000)
         AS BIGINT) AS zipf_slope_ppm
FROM m
"""


def _c50_oracle() -> str:
    from iceberg_playground_spark.queries._util import (
        int_ln_micro_cte_sql,
    )

    return _C50_ORACLE_T.format(
        chain_x=int_ln_micro_cte_sql("lx_in", "cnt", "x", prefix="_lx"),
        chain_y=int_ln_micro_cte_sql("ly_in", "x", "y", prefix="_ly"),
    )


@query("c50_zipf_audit", oracle=_c50_oracle())
def c50_zipf_audit(spark: SparkSession, sf: str) -> DataFrame:
    """C50: Zipf audit — the corpus-statistics sanity check run on
    every new data source: vocabulary size, token mass, and the
    fitted log-log rank/frequency slope (natural text sits near -1;
    a synthetic or templated source — like this corpus, drawn from a
    ~31-word vocabulary — shows a shallow slope, which is exactly the
    anomaly the audit exists to flag). Determinism discipline: ranks
    are row_number with a token tie-break, both logs are rounded to
    integer MICROLOGS (c23's rule), and the slope comes from exact
    integer moments via b121's fixed double formula — bit-identical
    engines end to end.

    Scale shape: one token explode + vocab-sized aggregate; the
    regression runs over |vocab| microlog rows (the rank window is a
    one-exchange sort of vocab-sized data, not corpus-sized); output
    is ONE row."""
    d = load(spark, sf, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    freq = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)  # feeds ranks + totals once
    )
    wr = W.orderBy(F.col("cnt").desc(), F.col("token"))
    # both micrologs evaluate through the integer-ln kernel (round 14:
    # ln(rnk) = ln(rnk/1), ln(cnt) = ln(cnt/1) — exact integer ratios)
    from iceberg_playground_spark.queries._util import int_ln_micro_col

    ranked = freq.select(
        F.row_number().over(wr).cast("bigint").alias("rnk"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )
    logs = int_ln_micro_col(ranked, "1", "rnk", "x", prefix="_lx")
    logs = int_ln_micro_col(logs, "1", "cnt", "y", prefix="_ly").select(
        "x", "y"
    )
    m = logs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double")) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    totals = freq.agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
    )
    return totals.crossJoin(
        m.select(
            F.round(slope * 1e6).cast("bigint").alias("zipf_slope_ppm")
        )
    )
