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
- c69: PMI COLLOCATIONS — the phrase-mining pass (Mikolov et al.
  2013's phrase rule; the classic collocation measure): adjacent
  bigrams above a count floor scored by pointwise mutual
  information in integer micro-nats, top-20 with marginal counts.
  One fixed float sequence per bigram-model row; corpus totals are
  driver scalars from the model tables (no extra corpus scan).
- p35: BUDGET REBALANCE — the fix a mixture owner applies after
  p33's >4-epoch flags: epoch-capped water-filling (capped cells
  keep exactly 4x their mass; freed budget re-spreads over uncapped
  cells by weight, three fixed rounds). All allocations are EXACT
  BIGINT division — the R·w products pass 2^53, where a double
  divide can differ by 1 ulp between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import (
    lit_bigint_array,
    load,
)
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
        warr = lit_bigint_array(w)
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


# ---------------------------------------------------------------------------
# c69 — PMI collocations (phrase mining over adjacent bigrams)
# ---------------------------------------------------------------------------

_C69_MIN_CNT = 5  # count floor (Mikolov et al. 2013's phrase rule)
_C69_TOPK = 20

_C69_ORACLE = f"""
WITH tok AS (
  SELECT string_split(text, ' ') AS toks FROM documents),
uni AS (
  SELECT token, count(*) AS c1 FROM (
    SELECT unnest(toks) AS token FROM tok) GROUP BY token),
bg AS (
  SELECT a, b, count(*) AS c2 FROM (
    SELECT toks[i] AS a, toks[i+1] AS b
    FROM tok, UNNEST(range(1, len(toks))) AS u(i)) GROUP BY a, b),
n AS (
  SELECT (SELECT sum(c1) FROM uni) AS n_tok,
         (SELECT sum(c2) FROM bg) AS n_pair),
scored AS (
  SELECT g.a || ' ' || g.b AS pair, g.c2,
         ua.c1 AS c_a, ub.c1 AS c_b,
         CAST(round(1000000.0 * ln(
             (CAST(g.c2 AS DOUBLE) * n.n_tok * n.n_tok)
             / (CAST(n.n_pair AS DOUBLE) * ua.c1 * ub.c1)))
           AS BIGINT) AS pmi_micro
  FROM bg g
  JOIN uni ua ON g.a = ua.token
  JOIN uni ub ON g.b = ub.token
  CROSS JOIN n
  WHERE g.c2 >= {_C69_MIN_CNT})
SELECT pair, CAST(c2 AS BIGINT) AS pair_count,
       CAST(c_a AS BIGINT) AS left_count,
       CAST(c_b AS BIGINT) AS right_count, pmi_micro,
       CAST(row_number() OVER (ORDER BY pmi_micro DESC, pair) AS INT)
         AS pmi_rank
FROM scored ORDER BY pmi_micro DESC, pair LIMIT {_C69_TOPK}
"""


@query("c69_pmi_collocations", oracle=_C69_ORACLE)
def c69_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """C69: pointwise-mutual-information collocations — the phrase
    detector every word2vec-era pipeline runs before tokenizer
    training (Mikolov et al. 2013's phrase pass; also the classic
    corpus-linguistics collocation measure): for adjacent bigrams
    above a count floor, PMI = ln(P(a,b) / (P(a)·P(b))), top-20.
    High PMI = the words co-occur far above chance — a phrase worth a
    single token (and exactly what c63's merge learner tends to merge
    first, from statistics rather than a significance measure).

    Determinism: ONE float expression per surviving bigram-MODEL row
    (fixed multiply/divide/ln/round sequence, identical operand order
    in both engines — the c53 rule), everything else integer. The
    corpus totals (token mass, pair mass) are two driver-side scalars
    aggregated from the MODEL tables (the c55 bounded-collect rule —
    no extra corpus scan, no 1-row broadcast frame replicating a
    nested loop into every branch).

    Scale shape: 2 corpus scans (unigram aggregate, bigram aggregate
    — both with map-side partials); the PMI joins run on MODEL rows
    only (bigram vocab keyed by token — AQE broadcasts the unigram
    side when it fits, shuffles model rows when it does not; never
    corpus rows); the count floor prunes before the joins; the top-20
    lowers to TakeOrderedAndProject (plan-pinned)."""
    d = load(spark, sf, "documents")
    toks = F.split("text", " ")
    # vocab-sized model table, consumed three times (total, left join
    # arm, right join arm) — checkpoint so the corpus scans once for it
    uni = (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=False)
    )
    n = F.size(toks)
    z = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("a"),
        F.slice(toks, 2, n - 1).alias("b"),
    )
    bg_all = (
        d.select(
            F.explode(
                F.when(n >= 2, z).otherwise(
                    F.array().cast(
                        "array<struct<a:string,b:string>>"
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c2"))
        .localCheckpoint(eager=False)
    )
    # both corpus totals come from the MODEL tables (no third scan)
    n_tok = uni.agg(F.sum("c1")).collect()[0][0]
    n_pair = bg_all.agg(F.sum("c2")).collect()[0][0]
    bg = bg_all.filter(F.col("c2") >= _C69_MIN_CNT)
    ua = uni.select(F.col("token").alias("a"), F.col("c1").alias("c_a"))
    ub = uni.select(F.col("token").alias("b"), F.col("c1").alias("c_b"))
    pmi = F.round(
        1000000.0
        * F.log(
            (F.col("c2").cast("double") * float(n_tok) * float(n_tok))
            / (
                float(n_pair)
                * F.col("c_a").cast("double")
                * F.col("c_b").cast("double")
            )
        )
    ).cast("bigint")
    scored = (
        bg.join(ua, "a")
        .join(ub, "b")
        .select(
            F.concat_ws(" ", "a", "b").alias("pair"),
            F.col("c2").cast("bigint").alias("pair_count"),
            F.col("c_a").cast("bigint").alias("left_count"),
            F.col("c_b").cast("bigint").alias("right_count"),
            pmi.alias("pmi_micro"),
        )
        .orderBy(F.col("pmi_micro").desc(), "pair")
        .limit(_C69_TOPK)
    )
    w = W.orderBy(F.col("pmi_micro").desc(), "pair")
    return scored.withColumn(
        "pmi_rank", F.row_number().over(w).cast("int")
    )


# ---------------------------------------------------------------------------
# p35 — budget rebalance (epoch-capped water-filling over mixture cells)
# ---------------------------------------------------------------------------

_P35_MULT = 2  # total budget = 2x corpus (p33's plan)
_P35_CAP_EPOCHS = 4  # the Muennighoff et al. 2023 replay bound
_P35_ROUNDS = 3  # fixed water-filling rounds (both engines unroll 3)


def _p35_round_sql(k: int) -> str:
    """One water-filling round: capped cells keep their cap; the
    remaining budget spreads over uncapped cells by weight with EXACT
    integer division (R·w may exceed 2^53 — a double divide here can
    land 1 ulp apart across engines, so no float touches it)."""
    p = k - 1
    return (
        f"r{k} AS ("
        f"  SELECT source, lang, cell_tok, w_micro, cap_tok, naive_tok,"
        f"    capped{p} OR (CASE WHEN sum(CASE WHEN capped{p} THEN 0"
        f"            ELSE w_micro END) OVER () > 0"
        f"        THEN ((t_budget - sum(CASE WHEN capped{p} THEN cap_tok"
        f"                ELSE 0 END) OVER ()) * w_micro)"
        f"             // (sum(CASE WHEN capped{p} THEN 0 ELSE w_micro END)"
        f"                OVER ())"
        f"        ELSE cap_tok END) > cap_tok AS capped{k},"
        f"    CASE WHEN capped{p} THEN alloc{p}"
        f"         WHEN sum(CASE WHEN capped{p} THEN 0 ELSE w_micro END)"
        f"              OVER () > 0"
        f"         THEN least(cap_tok,"
        f"           ((t_budget - sum(CASE WHEN capped{p} THEN cap_tok"
        f"               ELSE 0 END) OVER ()) * w_micro)"
        f"           // (sum(CASE WHEN capped{p} THEN 0 ELSE w_micro END)"
        f"              OVER ()))"
        f"         ELSE cap_tok END AS alloc{k},"
        f"    t_budget"
        f"  FROM r{p})"
    )


def _p35_chain() -> str:
    """p35's WITH-clause list (cell → r0 → r1..rN), WITHOUT the final
    SELECT, so downstream oracles (p37's schedule) can append their
    own clauses instead of string-slicing the assembled query (the
    _c70_chain pattern; ADVICE r11 item 2)."""
    rounds = ",\n".join(
        _p35_round_sql(k) for k in range(1, _P35_ROUNDS + 1)
    )
    return f"""cell AS (
  SELECT source, lang, sum(len(string_split(text, ' '))) AS cell_tok
  FROM documents GROUP BY source, lang),
r0 AS (
  SELECT source, lang, CAST(cell_tok AS BIGINT) AS cell_tok,
         CAST(floor(sqrt(CAST(cell_tok AS DOUBLE)) * 1000000) AS BIGINT)
           AS w_micro,
         CAST({_P35_CAP_EPOCHS} * cell_tok AS BIGINT) AS cap_tok,
         CAST(((CAST({_P35_MULT} AS BIGINT) * sum(cell_tok) OVER ())
               * CAST(floor(sqrt(CAST(cell_tok AS DOUBLE)) * 1000000)
                      AS BIGINT))
              // sum(CAST(floor(sqrt(CAST(cell_tok AS DOUBLE)) * 1000000)
                          AS BIGINT)) OVER () AS BIGINT) AS naive_tok,
         FALSE AS capped0, CAST(0 AS BIGINT) AS alloc0,
         CAST({_P35_MULT} AS BIGINT) * sum(cell_tok) OVER () AS t_budget
  FROM cell),
{rounds}"""


def _p35_oracle() -> str:
    n = _P35_ROUNDS
    return f"""
WITH {_p35_chain()}
SELECT source, lang, cell_tok, w_micro, cap_tok, naive_tok,
       CAST(alloc{n} AS BIGINT) AS final_tok,
       capped{n} AS capped,
       CAST((1000000 * alloc{n}) // cell_tok AS BIGINT)
         AS final_epochs_micro
FROM r{n} ORDER BY source, lang
"""


@query("p35_budget_rebalance", oracle=_p35_oracle())
def p35_budget_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    """P35: epoch-capped water-filling — the FIX a mixture owner
    applies after reading p33's >4-epoch flags: cells whose
    temperature-weighted allocation would replay past the cap keep
    exactly cap_tok = 4x their natural mass, and the freed budget
    re-spreads over the uncapped cells by weight; three fixed rounds
    (re-spreading can push new cells over the cap — classic
    water-filling). p33 DIAGNOSES over-replay; p35 produces the
    allocation a training run can actually use.

    Determinism: the weight sqrt is the only float op; every
    allocation is EXACT BIGINT arithmetic — R·w products reach ~1e16
    (past 2^53, where a double divide can differ by 1 ulp between
    engines), so the division is integer DIV on both sides, guarded
    against an all-capped round. Both engines unroll the same 3
    rounds.

    Scale shape: ONE corpus aggregate to |cells| rows; each round is
    pure window arithmetic over the cell table (global windows on a
    |sources·langs|-row frame — KB at any corpus size)."""
    wall = W.partitionBy()
    cells = (
        load(spark, sf, "documents")
        .groupBy("source", "lang")
        .agg(
            F.sum(F.size(F.split("text", " ")))
            .cast("bigint").alias("cell_tok")
        )
        .withColumn(
            "w_micro",
            F.floor(
                F.sqrt(F.col("cell_tok").cast("double")) * 1000000
            ).cast("bigint"),
        )
        .withColumn(
            "cap_tok", (F.lit(_P35_CAP_EPOCHS) * F.col("cell_tok"))
            .cast("bigint"),
        )
        .withColumn(
            "t_budget",
            (F.lit(_P35_MULT).cast("bigint")
             * F.sum("cell_tok").over(wall)).cast("bigint"),
        )
        .withColumn(
            "naive_tok",
            F.expr(
                "CAST((t_budget * w_micro) DIV "
                "(sum(w_micro) OVER ()) AS BIGINT)"
            ),
        )
        .withColumn("capped", F.lit(False))
        .withColumn("alloc", F.lit(0).cast("bigint"))
    )
    cur = cells
    for _ in range(_P35_ROUNDS):
        free_w = F.sum(
            F.when(F.col("capped"), F.lit(0)).otherwise(F.col("w_micro"))
        ).over(wall)
        used = F.sum(
            F.when(F.col("capped"), F.col("cap_tok")).otherwise(F.lit(0))
        ).over(wall)
        cur = (
            cur.withColumn("_free_w", free_w)
            .withColumn("_rem", F.col("t_budget") - used)
            .withColumn(
                "_share",
                F.when(
                    F.col("_free_w") > 0,
                    F.expr(
                        "CAST((_rem * w_micro) DIV _free_w AS BIGINT)"
                    ),
                ).otherwise(F.col("cap_tok")),
            )
            .withColumn(
                "alloc",
                F.when(F.col("capped"), F.col("alloc")).otherwise(
                    F.least("cap_tok", "_share")
                ),
            )
            .withColumn(
                "capped",
                F.col("capped") | (F.col("_share") > F.col("cap_tok")),
            )
            .drop("_free_w", "_rem", "_share")
        )
    return cur.select(
        "source",
        "lang",
        "cell_tok",
        "w_micro",
        "cap_tok",
        "naive_tok",
        F.col("alloc").cast("bigint").alias("final_tok"),
        "capped",
        F.expr("CAST((1000000 * alloc) DIV cell_tok AS BIGINT)").alias(
            "final_epochs_micro"
        ),
    ).orderBy("source", "lang")
