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
    flagged = (
        pos.withColumn(
            "occ", F.count("*").over(W.partitionBy("dg"))
        )
        .filter(F.col("occ") >= 2)
        .select("doc_id", "total_tokens", "i")
    )
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
