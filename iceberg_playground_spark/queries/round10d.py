"""Round-10 operators, fourth batch (registered in _R10_NEW_TAIL).

- c68: PERCEPTRON TRAINING — the classifier family's missing middle
  (c57 APPLIES a fixed hashed linear model, c46 EVALUATES one; c68
  TRAINS one — the same train→apply→eval completion c63 gave the
  tokenizer family). Batch perceptron (Rosenblatt 1958, the batch
  update variant: one weight update per epoch from the SUM of
  misclassified feature vectors) over hashed unigram counts,
  separating the c53 target source from the rest. Every quantity is
  an integer — counts, weights, scores, updates — so the entire
  training trajectory (per-epoch error counts AND the exact weight
  vectors, checksummed) hash-matches an unrolled declarative oracle:
  the fixed-point trick that made c54's Lloyd and c63's BPE trainer
  gradeable, now for a learning loop with data-dependent updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# c68 — batch perceptron training (hashed features, integer trajectory)
# ---------------------------------------------------------------------------

_C68_D = 64  # hashed feature buckets (the c65 geometry)
_C68_EPOCHS = 3
_C68_TARGET = "src0"  # +1 class (c53's target-source convention)
_C68_SALT = 1001  # weight-checksum mixing constant


def _c68_oracle() -> str:
    """The same training loop unrolled as MATERIALIZED CTEs (the c63
    convention): epoch e scores every doc under w_{e-1}, counts the
    misclassified (y·score ≤ 0), and w_e = w_{e-1} + Σ_mis y·cnt on a
    completed {D}-bucket grid (c59's trick — total joins, no NULL
    holes). w_0 = 0, so epoch 1's error count is the corpus size."""
    parts = [
        f"WITH f AS MATERIALIZED ("
        f"  SELECT doc_id, CASE WHEN source = '{_C68_TARGET}'"
        f"           THEN 1 ELSE -1 END AS y,"
        f"         CAST('0x' || substring(md5(token), 1, 8) AS BIGINT)"
        f"           % {_C68_D} AS bucket,"
        f"         count(*) AS cnt"
        f"  FROM (SELECT doc_id, source,"
        f"               unnest(string_split(text, ' ')) AS token"
        f"        FROM documents)"
        f"  GROUP BY doc_id, source, bucket)",
        f"grid AS (SELECT unnest(range(0, {_C68_D})) AS bucket)",
        f"w0 AS (SELECT bucket, CAST(0 AS BIGINT) AS w FROM grid)",
    ]
    for e in range(1, _C68_EPOCHS + 1):
        p = e - 1
        parts.append(
            f"s{e} AS MATERIALIZED ("
            f"  SELECT f.doc_id, f.y, sum(w.w * f.cnt) AS score"
            f"  FROM f JOIN w{p} w ON f.bucket = w.bucket"
            f"  GROUP BY f.doc_id, f.y)"
        )
        parts.append(
            f"m{e} AS MATERIALIZED ("
            f"  SELECT doc_id, y FROM s{e} WHERE y * score <= 0)"
        )
        parts.append(
            f"u{e} AS MATERIALIZED ("
            f"  SELECT f.bucket, sum(f.y * f.cnt) AS u"
            f"  FROM f JOIN m{e} m ON f.doc_id = m.doc_id"
            f"  GROUP BY f.bucket)"
        )
        parts.append(
            f"w{e} AS MATERIALIZED ("
            f"  SELECT g.bucket,"
            f"         CAST(coalesce(w.w, 0) + coalesce(u.u, 0) AS BIGINT)"
            f"           AS w"
            f"  FROM grid g LEFT JOIN w{p} w ON g.bucket = w.bucket"
            f"  LEFT JOIN u{e} u ON g.bucket = u.bucket)"
        )
        parts.append(
            f"r{e} AS ("
            f"  SELECT {e} AS epoch,"
            f"    (SELECT CAST(count(*) AS BIGINT) FROM m{e}) AS n_errors,"
            f"    (SELECT CAST(sum((bucket + {_C68_SALT}) * w) AS BIGINT)"
            f"     FROM w{e}) AS w_checksum,"
            f"    (SELECT CAST(sum(abs(w)) AS BIGINT) FROM w{e}) AS w_abs,"
            f"    (SELECT CAST(count(*) AS BIGINT) FROM w{e} WHERE w <> 0)"
            f"      AS w_nnz)"
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM r{e}" for e in range(1, _C68_EPOCHS + 1)
    )
    return ",\n".join(parts) + f"\n{union} ORDER BY epoch"


@query("c68_perceptron_train", oracle=_c68_oracle())
def c68_perceptron_train(spark: SparkSession, sf: str) -> DataFrame:
    """C68: train a hashed linear classifier — see module docstring.
    Graded per epoch on the misclassified count under the incoming
    weights AND three exact functionals of the outgoing weight vector
    (salted checksum, L1 mass, nonzero count) — a single flipped
    update anywhere in any epoch changes the checksum.

    Scale shape (c63's superstep discipline): the corpus collapses
    ONCE to its (doc, bucket, cnt) hashed-feature table — the only
    corpus-sized operation, lazily checkpointed so epochs never
    re-tokenize. Each epoch is: one joinless scoring aggregate (the
    incoming weights enter as a 64-slot LITERAL array indexed by
    bucket — no weight join exists), one doc-keyed semi-join of the
    feature table against the misclassified doc set (both sides
    already partitioned by doc_id), and ONE 64-row update collect —
    driver state is O(D) per epoch, never doc- or corpus-sized."""
    d = load(spark, sf, "documents")
    feats = (
        d.select(
            "doc_id",
            F.when(F.col("source") == _C68_TARGET, 1)
            .otherwise(-1).alias("y"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .select(
            "doc_id",
            "y",
            (
                F.conv(F.md5("token").substr(1, 8), 16, 10)
                .cast("bigint") % _C68_D
            ).alias("bucket"),
        )
        .groupBy("doc_id", "y", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .repartition("doc_id")
        .localCheckpoint(eager=False)
    )
    w = [0] * _C68_D
    rows: list[tuple] = []
    for epoch in range(1, _C68_EPOCHS + 1):
        warr = F.array(*[F.lit(int(v)).cast("bigint") for v in w])
        contrib = F.element_at(warr, (F.col("bucket") + 1).cast("int"))
        scored = feats.groupBy("doc_id", "y").agg(
            F.sum(contrib * F.col("cnt")).alias("score")
        )
        mis = scored.filter(F.col("y") * F.col("score") <= 0).select(
            "doc_id"
        )
        upd = (
            feats.join(mis, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("u"))
            .collect()
        )
        n_errors = mis.count()
        for r in upd:
            w[int(r["bucket"])] += int(r["u"])
        rows.append(
            (
                epoch,
                int(n_errors),
                sum((b + _C68_SALT) * v for b, v in enumerate(w)),
                sum(abs(v) for v in w),
                sum(1 for v in w if v != 0),
            )
        )
    return spark.createDataFrame(
        rows,
        "epoch INT, n_errors BIGINT, w_checksum BIGINT, w_abs BIGINT, "
        "w_nnz BIGINT",
    ).orderBy("epoch")
