"""Round-12 operators: the trained PQ codebook (VERDICT r11 item 2)
and the unigram-LM tokenizer trainer (VERDICT r11 item 3).

- c74: TRAINED PQ CODEBOOK + ADC RE-RANK — closes the ANN arc's last
  md5-seeded stand-in: c36/c38/c40 quantize against DETERMINISTIC
  (untrained) codebooks because float centroid averaging wasn't
  hash-gradeable; c70 proved trained centroids ARE gradeable under
  c54's fixed-point contract. c74 runs per-subspace k-means (Jégou,
  Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  TPAMI 2011): the 64-dim corpus splits into 8 subspaces of 8 dims,
  each trained to 16 centroids by Lloyd iterations on the integer
  grid (v = floor(x·1000); assignment = exact BIGINT argmin; update =
  floor'd per-dim integer mean, empty cells keep their centroid),
  seeded by md5 order (c38's seeding rule — the TRAINING is what's
  new). The graded deliverable is c38's end-to-end shape re-run
  through the LEARNED codebook: encode every vector to 8 four-bit
  codes, scan codes only with a literal 8×16 ADC table for the
  query's top-{short} shortlist, exact-re-rank the shortlist, return
  top-{k} — every distance an exact BIGINT, so one centroid trained
  differently anywhere changes the hash.

  Scale shape (the c63/c68/c70 bounded-superstep discipline): each
  Lloyd iteration is ONE corpus scan — all 8 subspaces assign in a
  single pure-map pass against literal centroid matrices (zero
  joins), and the update is one 128-key hash aggregate whose
  map-side partials reduce sub-vectors to per-(subspace, code, dim)
  integer sums BEFORE the exchange, so no vector ever shuffles;
  driver state is the codebook itself, 8·16·8 ints. The ADC scan
  touches 8 B/vector codes + a KB literal table; the exact re-rank
  reads {short} vectors through a broadcast semi-join — at 100 TB
  the corpus is scanned iters+2 times and shuffled never. (Ref
  anchor: ANN is the north-star mandate, BASELINE.json:north_star;
  c38/c40 in round7.py are the untrained siblings this completes.)

- c75: UNIGRAM-LM TOKENIZER TRAINER — the other dominant public
  subword algorithm family beside BPE (Kudo, "Subword
  Regularization", ACL 2018; the SentencePiece default), completing
  the tokenizer arc c32 (pair stats) → c63 (BPE train) → c51 (apply)
  → c64 (fertility audit) with the EM-trained alternative: seed the
  vocabulary from the most frequent substrings (all single chars +
  top multi-char by corpus weight), then alternate E-steps (Viterbi
  segmentation of every word under the current piece log-probs) and
  M-steps (re-estimate scores from usage counts, add-one smoothed)
  with a prune between rounds that keeps only the top multi-char
  pieces by usage — Kudo's keep-the-high-loss-pieces rule in its
  count form, single chars always kept for coverage. Graded on the
  full final vocabulary (piece, E-step count, micro-nat score): one
  Viterbi path or one prune decision different anywhere changes the
  hash.

  Determinism: piece scores are INTEGER micro-nats (the c65/c70
  idiom: one ln per MODEL row, rounded once), so the Viterbi DP sums
  and compares exact BIGINTs; both engines run structurally
  identical left-to-right folds (forward best-score table, backward
  smallest-piece-first path extraction), so every tie resolves
  identically; prune order is (count DESC, piece) — no float ever
  crosses an engine boundary mid-corpus. The DuckDB oracle unrolls
  both EM rounds; its DP state is STRING-encoded inside list_reduce
  (DuckDB 1.0 drops LIST-typed struct fields across fold steps —
  probed, VARCHAR carries; c63's accumulator idiom).

  Scale shape: the corpus collapses to its word-frequency table
  ONCE (c63's compression — the only corpus-sized operation); every
  E-step is a pure-map Viterbi fold over that table against a
  LITERAL score map (model-sized, broadcast as literals) + one
  |vocab|-key aggregate with map-side partials; driver state is the
  vocabulary itself. Training cost scales with |distinct words| ·
  max_piece_len², independent of corpus size — the same contract as
  c63, for the EM family.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import int_ln_micro_cte_sql
from iceberg_playground_spark.registry import query

_C74_SUB = 8  # subspaces (64 dims -> 8 x 8, c36's geometry)
_C74_SDIM = 8
_C74_K = 16  # centroids per subspace -> 4-bit codes, 8 B/vector
_C74_ITERS = 2  # Lloyd iterations (c36's _PQ_ITERS)
_C74_SHORT = 50
_C74_TOPK = 10


def _c74_sub_sql(s: int) -> str:
    """Subspace ``s`` slice of the quantized vector column ``q``."""
    return f"slice(q, {s * _C74_SDIM + 1}, {_C74_SDIM})"


def _c74_sub_col(s: int):
    return F.expr(_c74_sub_sql(s))


def _c74_code_sql(cb: list[list[list[int]]], s: int) -> str:
    """SQL text of the exact BIGINT argmin code for subspace ``s``
    against a literal 16×8 centroid matrix — ONE JVM expression, zero
    joins (the c54 literal-matrix rule). array_position's first
    minimum IS the lowest-j tie-break the oracle's min-struct encodes.
    Rendered as SQL text (round 16): the nested-lambda DSL form cost
    a py4j round-trip per literal/lambda at every train superstep —
    the parsed tree is identical. Text form so callers can embed it
    in a larger one-parse expression."""
    cmat = (
        "array("
        + ",".join(
            "array(" + ",".join(str(int(v)) for v in cb[s][j]) + ")"
            for j in range(_C74_K)
        )
        + ")"
    )
    dists = (
        f"transform({cmat}, c -> aggregate(zip_with({_c74_sub_sql(s)}, c, "
        f"(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), "
        f"(acc, x) -> acc + x))"
    )
    return f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"


def _c74_code_col(cb: list[list[list[int]]], s: int):
    return F.expr(_c74_code_sql(cb, s))


def _c74_seed(qdf: DataFrame) -> list[list[list[int]]]:
    """cb[s][j][d]: the 16 md5-ordered seed vectors, subspace-sliced
    (c38's seeding rule; TakeOrderedAndProject, 16-row collect)."""
    rows = (
        qdf.select(
            "q", F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id"
        )
        .orderBy("h", "vec_id")
        .limit(_C74_K)
        .collect()
    )
    return [
        [
            [int(r["q"][s * _C74_SDIM + d]) for d in range(_C74_SDIM)]
            for r in rows
        ]
        for s in range(_C74_SUB)
    ]


def _c74_train_on(
    qdf: DataFrame, cb: list[list[list[int]]]
) -> list[list[list[int]]]:
    """Per-subspace Lloyd on the integer grid over frame ``qdf``
    (vec_id, q) from seed codebook ``cb``: each iteration = one scan
    (joinless assignment for ALL subspaces at once) + one 128-key
    aggregate collected to the driver; the floor'd integer mean is
    Python's ``//`` (mirrored exactly by the oracle's sign-safe-mod
    construction); empty cells keep their centroid. Shared by c74
    (raw vectors) and c77 (coarse residuals)."""
    for _ in range(_C74_ITERS):
        # per-superstep assignment array as ONE parsed expression
        # (round-16 rule; identical struct trees)
        pairs = F.expr(
            "array(" + ",".join(
                f"named_struct('s', {s}, 'j', {_c74_code_sql(cb, s)},"
                f" 'sub', {_c74_sub_sql(s)})"
                for s in range(_C74_SUB)
            ) + ")"
        )
        agg = (
            qdf.select(F.explode(pairs).alias("e"))
            .select("e.s", "e.j", "e.sub")
            .groupBy("s", "j")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.expr(f"sum(sub[{d}]) as d{d}")
                    for d in range(_C74_SDIM)
                ],
            )
            .collect()
        )
        got = {(int(r["s"]), int(r["j"])): r for r in agg}
        cb = [
            [
                (
                    [
                        int(got[(s, j)][f"d{d}"]) // int(got[(s, j)]["n"])
                        for d in range(_C74_SDIM)
                    ]
                    if (s, j) in got
                    else cb[s][j]
                )
                for j in range(_C74_K)
            ]
            for s in range(_C74_SUB)
        ]
    return cb


def _c74_train(
    spark: SparkSession, sf: str
) -> tuple[DataFrame, list[list[list[int]]]]:
    """c74's trainer: md5-seed then Lloyd over the raw quantized
    corpus (see _c74_train_on)."""
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    qdf = _c54_quantized(spark, sf, cache=True)  # seed + 2 Lloyd supersteps
    return qdf, _c74_train_on(qdf, _c74_seed(qdf))


def _c74_cent_sql(t: int, src: str = "q", pfx: str = "") -> str:
    """One unrolled Lloyd iteration (assignment + floor'd-mean update)
    as materialized CTEs over source table ``src`` (vec_id, s, d, v);
    ``pfx`` namespaces the CTEs so c77 can train a second codebook in
    the same WITH-chain. The update's floor division is the
    sign-safe-mod form ``(sv - ((sv % n + n) % n)) // n`` — the
    numerator is exactly divisible, so DuckDB's integer division
    equals Python's ``//`` even on negative sums."""
    p = t - 1
    return f"""
{pfx}asg{t} AS MATERIALIZED (
  SELECT vec_id, s, (min({{'d2': d2, 'j': j}})).j AS code
  FROM (SELECT q.vec_id, q.s, c.j, sum((q.v - c.v) * (q.v - c.v)) AS d2
        FROM {src} q JOIN {pfx}cent{p} c ON q.s = c.s AND q.d = c.d
        GROUP BY q.vec_id, q.s, c.j)
  GROUP BY vec_id, s),
{pfx}sums{t} AS MATERIALIZED (
  SELECT a.s, a.code AS j, q.d, sum(q.v) AS sv, count(*) AS n
  FROM {pfx}asg{t} a JOIN {src} q ON q.vec_id = a.vec_id AND q.s = a.s
  GROUP BY a.s, a.code, q.d),
{pfx}cent{t} AS MATERIALIZED (
  SELECT c.s, c.j, c.d,
         CASE WHEN m.n IS NULL THEN c.v
              ELSE (m.sv - ((m.sv % m.n + m.n) % m.n)) // m.n END AS v
  FROM {pfx}cent{p} c LEFT JOIN {pfx}sums{t} m
    ON m.s = c.s AND m.j = c.j AND m.d = c.d)"""


def _c74_oracle() -> str:
    """The whole train → encode → ADC shortlist → exact re-rank,
    unrolled as materialized CTEs (c63's rule; c70's chain idiom)."""
    iters = ",".join(_c74_cent_sql(t) for t in range(1, _C74_ITERS + 1))
    n = _C74_ITERS
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST((i - 1) // {_C74_SDIM} AS INT) AS s,
         CAST((i - 1) % {_C74_SDIM} AS INT) AS d,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS v
  FROM embeddings, range(1, {_C74_SUB * _C74_SDIM + 1}) t(i)),
seedids AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
  FROM embeddings QUALIFY j < {_C74_K}),
cent0 AS MATERIALIZED (
  SELECT q.s, seedids.j, q.d, q.v FROM seedids JOIN q USING (vec_id)),
{iters},
fcode AS MATERIALIZED (
  SELECT vec_id, s, (min({{'d2': d2, 'j': j}})).j AS code
  FROM (SELECT q.vec_id, q.s, c.j, sum((q.v - c.v) * (q.v - c.v)) AS d2
        FROM q JOIN cent{n} c ON q.s = c.s AND q.d = c.d
        GROUP BY q.vec_id, q.s, c.j)
  GROUP BY vec_id, s),
qv AS MATERIALIZED (SELECT s, d, v FROM q WHERE vec_id = 0),
adc AS MATERIALIZED (
  SELECT c.s, c.j, sum((qv.v - c.v) * (qv.v - c.v)) AS qd
  FROM cent{n} c JOIN qv ON qv.s = c.s AND qv.d = c.d
  GROUP BY c.s, c.j),
est AS MATERIALIZED (
  SELECT f.vec_id, sum(adc.qd) AS est_d2
  FROM fcode f JOIN adc ON adc.s = f.s AND adc.j = f.code
  GROUP BY f.vec_id),
short AS MATERIALIZED (
  SELECT vec_id, est_d2 FROM est ORDER BY est_d2, vec_id
  LIMIT {_C74_SHORT}),
ex AS MATERIALIZED (
  SELECT q.vec_id, sum((q.v - qv.v) * (q.v - qv.v)) AS exact_d2
  FROM q JOIN qv ON qv.s = q.s AND qv.d = q.d
  WHERE q.vec_id IN (SELECT vec_id FROM short)
  GROUP BY q.vec_id)
SELECT s.vec_id, CAST(s.est_d2 AS BIGINT) AS est_d2,
       CAST(ex.exact_d2 AS BIGINT) AS exact_d2
FROM short s JOIN ex USING (vec_id)
ORDER BY exact_d2, s.vec_id LIMIT {_C74_TOPK}
"""


@query("c74_pq_train", oracle=_c74_oracle())
def c74_pq_train(spark: SparkSession, sf: str) -> DataFrame:
    """C74: trained PQ codebook + ADC re-rank — see module docstring.
    Graded on the top-{k} (vec_id, est_d2, exact_d2) through the
    LEARNED codebook; one differently-trained centroid changes the
    ADC estimates and the hash."""
    qdf, cb = _c74_train(spark, sf)
    qv = [
        int(v)
        for v in qdf.filter(F.col("vec_id") == 0).collect()[0]["q"]
    ]
    # literal 8x16 ADC table: exact BIGINT query-to-centroid distances
    adc = [
        [
            sum(
                (qv[s * _C74_SDIM + d] - cb[s][j][d]) ** 2
                for d in range(_C74_SDIM)
            )
            for j in range(_C74_K)
        ]
        for s in range(_C74_SUB)
    ]
    from iceberg_playground_spark.queries._util import lit_int_array

    # the 8 ADC table lookups sum as ONE parsed expression
    # (round-16 rule; identical element_at trees, left-assoc +)
    est = F.expr(
        " + ".join(
            "element_at(array({vals}), ({code}) + 1)".format(
                vals=",".join(str(int(v)) for v in adc[s]),
                code=_c74_code_sql(cb, s),
            )
            for s in range(_C74_SUB)
        )
    )
    short = (
        qdf.select("vec_id", est.cast("bigint").alias("est_d2"))
        .orderBy("est_d2", "vec_id")
        .limit(_C74_SHORT)
    )
    qlit = lit_int_array(qv)
    exact = F.aggregate(
        F.zip_with("q", qlit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        qdf.join(F.broadcast(short), "vec_id")
        .select("vec_id", "est_d2", exact.alias("exact_d2"))
        .orderBy("exact_d2", "vec_id")
        .limit(_C74_TOPK)
    )


# ---------------------------------------------------------------------------
# c75 — unigram-LM tokenizer trainer (SentencePiece-style EM + prune)
# ---------------------------------------------------------------------------

_C75_LMAX = 4  # max piece length
_C75_SEED_MULTI = 48  # multi-char seed pieces (top by corpus weight)
_C75_KEEP = (32, 24)  # multi-char pieces kept after each EM round
_C75_NEG = -(10**15)  # unreachable DP cell


def _c75_score_micro(c: int, t: int) -> int:
    """Integer micro-nat piece score ≈ round(1e6·ln(c/t)), half away
    from zero — the integer-ln kernel's deterministic value (round
    14: Python math.log left this graded contract too; the Spark side
    embeds these as driver-computed literals, so the kernel costs
    ZERO plan change here)."""
    from iceberg_playground_spark.queries._util import int_ln_micro_py

    return int_ln_micro_py(t, c)


def _c75_fw_sql(m: str) -> str:
    """Forward Viterbi DP as a string-encoded fold: the accumulator is
    the space-joined best-score table best[0..i] (exact BIGINTs in
    text), seeded by the prepended '0' = best[0]."""
    cands = []
    for L in range(1, _C75_LMAX + 1):
        cands.append(
            f"CASE WHEN CAST(x AS INT) >= {L} THEN "
            f"CAST(string_split(acc, ' ')[CAST(x AS INT) - {L - 1}] "
            f"AS BIGINT) + "
            f"{m}[substr(word, CAST(x AS INT) - {L - 1}, {L})][1] END"
        )
    glist = ", ".join(cands)
    return (
        "list_reduce("
        "list_prepend('0', list_transform(range(1, len(word) + 1), "
        "k -> CAST(k AS VARCHAR))), "
        f"(acc, x) -> acc || ' ' || CAST(greatest({glist}, "
        f"{_C75_NEG}) AS VARCHAR))"
    )


def _c75_bw_sql(m: str) -> str:
    """Backward path extraction: fold positions n..1 with a
    'pos|seg'-encoded accumulator; at the frontier position take the
    SMALLEST piece length whose score reproduces best[i] (both
    engines test L ascending, so ties resolve identically)."""
    arms = []
    for L in range(1, _C75_LMAX + 1):
        piece = f"substr(word, CAST(x AS INT) - {L - 1}, {L})"
        arms.append(
            f"WHEN CAST(x AS INT) >= {L} AND "
            f"CAST(string_split(fw, ' ')[CAST(x AS INT) - {L - 1}] "
            f"AS BIGINT) + {m}[{piece}][1] = "
            f"CAST(string_split(fw, ' ')[CAST(x AS INT) + 1] AS BIGINT) "
            f"THEN CAST(CAST(x AS INT) - {L} AS VARCHAR) || '|' || "
            f"{piece} || CASE WHEN string_split(acc, '|')[2] = '' "
            f"THEN '' ELSE ' ' || string_split(acc, '|')[2] END"
        )
    inner = " ".join(arms)
    return (
        "string_split(list_reduce("
        "list_prepend(CAST(len(word) AS VARCHAR) || '|', "
        "list_transform(range(len(word), 0, -1), "
        "k -> CAST(k AS VARCHAR))), "
        "(acc, x) -> CASE WHEN CAST(string_split(acc, '|')[1] AS INT) "
        f"= CAST(x AS INT) THEN CASE {inner} ELSE acc END "
        "ELSE acc END), '|')[2]"
    )


def _c75_map_ctes(v: str, name: str) -> str:
    """Kernel-scored one-row map over vocab CTE ``v`` (piece, c
    columns): a CTE-list fragment ending in CTE ``{name}`` holding
    the MAP. Round 14: the piece score 1e6·ln(c/t) is an integer
    ratio, so it evaluates through the shared integer-ln kernel
    (num = t, den = c) instead of cross-engine libm ln — matching
    _c75_score_micro's int_ln_micro_py bit for bit."""
    pre = f"_{name}"
    chain = int_ln_micro_cte_sql(f"{v}k", "piece", "sc", prefix=pre)
    return (
        f"{v}k AS (SELECT piece, CAST(tt.t AS BIGINT) AS num, "
        f"CAST(c AS BIGINT) AS den "
        f"FROM {v}, (SELECT sum(c) AS t FROM {v}) tt),\n"
        f"{chain},\n"
        f"{name} AS MATERIALIZED (SELECT MAP(list(piece ORDER BY piece), "
        f"list(sc ORDER BY piece)) AS m FROM {pre}_fin)"
    )


def _c75_estep_sql(i: int, msrc: str) -> str:
    """One unrolled E-step: Viterbi fold per word against map CTE
    ``msrc``, then the |vocab|-key usage aggregate."""
    return f"""
f{i} AS MATERIALIZED (
  SELECT word, cnt, m, {_c75_fw_sql('m')} AS fw FROM w, {msrc}),
g{i} AS MATERIALIZED (
  SELECT cnt, {_c75_bw_sql('m')} AS seg FROM f{i}),
e{i} AS MATERIALIZED (
  SELECT piece, sum(cnt) AS c
  FROM (SELECT cnt, unnest(string_split(seg, ' ')) AS piece FROM g{i})
  GROUP BY piece)"""


def _c75_chain() -> str:
    """c75's WITH-clause list through the final vocabulary ``vf``
    (piece, rawc) — shared by c75's grade and c76's apply oracle
    (the _c70_chain/_p35_chain discipline: compose, never slice)."""
    k1, k2 = _C75_KEEP
    return f"""w AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word),
subs AS MATERIALIZED (
  SELECT piece, sum(cnt) AS c
  FROM (SELECT w.cnt,
               substr(w.word, CAST(t.k AS INT), CAST(u.l AS INT)) AS piece
        FROM w,
             UNNEST(range(1, len(word) + 1)) AS t(k),
             UNNEST(range(1, {_C75_LMAX + 1})) AS u(l)
        WHERE CAST(t.k AS INT) + CAST(u.l AS INT) - 1 <= len(word))
  GROUP BY piece),
v0 AS MATERIALIZED (
  SELECT piece, c FROM subs WHERE len(piece) = 1
  UNION ALL
  SELECT piece, c FROM (
    SELECT piece, c FROM subs WHERE len(piece) > 1
    ORDER BY c DESC, piece LIMIT {_C75_SEED_MULTI})),
{_c75_map_ctes('v0', 'm0')},
{_c75_estep_sql(1, 'm0')},
v1 AS MATERIALIZED (
  SELECT s.piece, COALESCE(e1.c, 0) + 1 AS c
  FROM (SELECT piece FROM v0 WHERE len(piece) = 1) s
  LEFT JOIN e1 USING (piece)
  UNION ALL
  SELECT piece, c + 1 AS c FROM (
    SELECT piece, c FROM e1 WHERE len(piece) > 1
    ORDER BY c DESC, piece LIMIT {k1})),
{_c75_map_ctes('v1', 'm1')},
{_c75_estep_sql(2, 'm1')},
vf AS MATERIALIZED (
  SELECT s.piece, COALESCE(e2.c, 0) AS rawc
  FROM (SELECT piece FROM v0 WHERE len(piece) = 1) s
  LEFT JOIN e2 USING (piece)
  UNION ALL
  SELECT piece, c AS rawc FROM (
    SELECT piece, c FROM e2 WHERE len(piece) > 1
    ORDER BY c DESC, piece LIMIT {k2}))"""


def _c75_oracle() -> str:
    chain = int_ln_micro_cte_sql(
        "vfk", "piece, rawc", "score_micro", prefix="_mx"
    )
    return f"""
WITH {_c75_chain()},
vfk AS (SELECT piece, rawc, CAST(tt.t AS BIGINT) AS num,
               CAST(rawc + 1 AS BIGINT) AS den
        FROM vf, (SELECT sum(rawc + 1) AS t FROM vf) tt),
{chain}
SELECT piece, CAST(rawc AS BIGINT) AS cnt, score_micro
FROM _mx_fin ORDER BY piece
"""


def _c75_fw_col(m):
    """Spark twin of _c75_fw_sql: native array accumulator (Spark's
    aggregate takes a real initial value; the DuckDB string encoding
    exists only to dodge its list_reduce struct-list bug)."""
    def step(acc, i):
        cands = []
        for L in range(1, _C75_LMAX + 1):
            cands.append(
                F.when(
                    i >= L,
                    F.element_at(acc, (i - L + 1).cast("int"))
                    + F.element_at(
                        m,
                        F.col("word").substr(
                            (i - L + 1).cast("int"), F.lit(L)
                        ),
                    ),
                ).otherwise(F.lit(None).cast("bigint"))
            )
        best = F.greatest(*cands, F.lit(_C75_NEG).cast("bigint"))
        return F.concat(acc, F.array(best))

    return F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(F.lit(0).cast("bigint")),
        step,
    )


def _c75_seg_col(m):
    """Spark twin of _c75_bw_sql (reads the stored ``fw`` column)."""
    fw = F.col("fw")

    def step(acc, x):
        i = x.cast("int")
        pick = None
        for L in range(1, _C75_LMAX + 1):
            piece = F.col("word").substr(i - L + 1, F.lit(L))
            cond = (i >= L) & (
                F.element_at(fw, i - L + 1) + F.element_at(m, piece)
                == F.element_at(fw, i + 1)
            )
            val = F.struct(
                (i - L).alias("pos"),
                F.concat(
                    piece,
                    F.when(acc["seg"] == "", F.lit("")).otherwise(
                        F.concat(F.lit(" "), acc["seg"])
                    ),
                ).alias("seg"),
            )
            pick = F.when(cond, val) if pick is None else pick.when(cond, val)
        return F.when(acc["pos"] == i, pick.otherwise(acc)).otherwise(acc)

    return F.aggregate(
        F.sequence(F.length("word").cast("int"), F.lit(1), F.lit(-1)),
        F.struct(
            F.length("word").cast("int").alias("pos"),
            F.lit("").alias("seg"),
        ),
        step,
        lambda acc: acc["seg"],
    )


def _c75_estep(words: DataFrame, scores: dict[str, int]) -> dict[str, int]:
    """One E-step: Viterbi-segment every word against the LITERAL
    score map, aggregate piece usage (map-side partials; the result
    is vocab-sized, so the collect is model-sized by construction)."""
    from iceberg_playground_spark.queries._util import lit_str_int_map

    m = lit_str_int_map((p, scores[p]) for p in sorted(scores))
    rows = (
        words.withColumn("fw", _c75_fw_col(m))
        .withColumn("seg", _c75_seg_col(m))
        .select("cnt", F.explode(F.split("seg", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    )
    return {r["piece"]: int(r["c"]) for r in rows}


def _c75_trained(
    spark: SparkSession, sf: str
) -> tuple[dict[str, int], dict[str, int]]:
    """The full c75 EM train loop: returns (final E-step usage
    counts, final micro-nat score map) — shared by c75's grade and
    c76's apply (the _c70_chain sharing discipline on the Spark
    side)."""
    from iceberg_playground_spark.queries._util import load

    d = load(spark, sf, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # seed vocabulary: every substring up to LMAX, weighted by corpus
    # frequency; all single chars + the top multi-char pieces
    pos = F.sequence(F.lit(1), F.length("word"))
    pieces = F.flatten(
        F.transform(
            pos,
            lambda k: F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(_C75_LMAX)),
                    lambda L: F.when(
                        k + L - 1 <= F.length("word"),
                        F.col("word").substr(k.cast("int"), L.cast("int")),
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    subs = (
        words.select("cnt", F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
        .localCheckpoint(eager=False)
    )
    singles = [
        (r["piece"], int(r["c"]))
        for r in subs.filter(F.length("piece") == 1).collect()
    ]
    multi = [
        (r["piece"], int(r["c"]))
        for r in subs.filter(F.length("piece") > 1)
        .orderBy(F.col("c").desc(), "piece")
        .limit(_C75_SEED_MULTI)
        .collect()
    ]
    vocab = dict(singles) | dict(multi)
    tot = sum(vocab.values())
    scores = {p: _c75_score_micro(c, tot) for p, c in vocab.items()}
    single_set = {p for p, _ in singles}

    counts: dict[str, int] = {}
    for keep in _C75_KEEP:
        counts = _c75_estep(words, scores)
        kept_multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:keep]
        smoothed = {p: counts.get(p, 0) + 1 for p in single_set}
        smoothed |= {p: c + 1 for p, c in kept_multi}
        t = sum(smoothed.values())
        scores = {p: _c75_score_micro(c, t) for p, c in smoothed.items()}
    return counts, scores


@query("c75_unigram_lm_train", oracle=_c75_oracle())
def c75_unigram_lm_train(spark: SparkSession, sf: str) -> DataFrame:
    """C75: unigram-LM tokenizer training (Kudo 2018) — see module
    docstring. Graded on the final vocabulary (piece, count,
    micro-nat score), ordered by piece."""
    counts, scores = _c75_trained(spark, sf)
    final = sorted(
        [(p, counts.get(p, 0), scores[p]) for p in scores],
        key=lambda r: r[0],
    )
    return spark.createDataFrame(
        final, "piece STRING, cnt BIGINT, score_micro BIGINT"
    ).orderBy("piece")


# ---------------------------------------------------------------------------
# b161 — entries metadata table (Iceberg's t.entries)
# ---------------------------------------------------------------------------

_B161_ORACLE = """
WITH n1 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 3 = 0),
n2 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 3 <> 0)
SELECT CAST(2 AS INT) AS at_version, CAST(0 AS INT) AS status,
       CAST(2 AS BIGINT) AS n_entries,
       CAST((SELECT n FROM n1) AS BIGINT) AS n_rows
UNION ALL
SELECT 2, 1, 2, (SELECT n FROM n2)
UNION ALL
SELECT 3, 1, 1, (SELECT n FROM n1) + (SELECT n FROM n2)
UNION ALL
SELECT 3, 2, 4, (SELECT n FROM n1) + (SELECT n FROM n2)
ORDER BY at_version, status
"""


@query("b161_entries_metadata", oracle=_B161_ORACLE)
def b161_entries_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """B161: the ``entries`` metadata table (Iceberg's ``t.entries``)
    as a queryable relation — per manifest entry: status
    (ADDED/EXISTING/DELETED), writing snapshot, record count (see
    tables.py::entries). Completes the metadata-table family one
    level below b92's files view: b79 snapshots → b160 history →
    b159 refs → b158 partitions → b92 files → b161 ENTRIES, the
    per-entry relation Iceberg's manifest-Avro layer stores and the
    reference serializes in its DataFile-meta layer
    (decouple.rs:82-96).

    The demo lineage exercises all three statuses: two 2-file appends
    (v1, v2 — at v2 the v1 files read EXISTING, the v2 files ADDED),
    then a single-file compaction (v3 — the rewrite's output reads
    ADDED while all four input files read DELETED, recorded by v3's
    own manifests exactly as Iceberg's rewrite_data_files does).
    Graded on the per-(version, status) rollup — counts and record
    sums, parallelism-invariant via hash repartitioning (the b61/b92
    rule).

    Scale shape: answered from two snapshot JSON headers per asked
    version — ZERO data files opened however large the table (the
    b92 rule; the plan is a local scan of metadata rows, pinned)."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.tables import LakeCatalog, LakeTable

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo",
            "orders_entries",
            "o_orderkey BIGINT, o_custkey BIGINT",
            drop_if_exists=True,
        )
        o = load(spark, sf, "orders").select(
            F.col("o_orderkey").cast("bigint"),
            F.col("o_custkey").cast("bigint"),
        )
        t.append(
            o.filter(F.col("o_orderkey") % 3 == 0).repartition(
                2, "o_orderkey"
            )
        )
        t.append(
            o.filter(F.col("o_orderkey") % 3 != 0).repartition(
                2, "o_orderkey"
            )
        )
        t.compact(target_files=1)
        return t

    t = _built(spark, sf, "b161", build)

    def rollup(v: int) -> DataFrame:
        return (
            t.entries(v)
            .groupBy("status")
            .agg(
                F.count("*").cast("bigint").alias("n_entries"),
                F.sum("n_rows").cast("bigint").alias("n_rows"),
            )
            .select(
                F.lit(v).cast("int").alias("at_version"),
                "status",
                "n_entries",
                "n_rows",
            )
        )

    return rollup(2).unionByName(rollup(3)).orderBy(
        "at_version", "status"
    )


# ---------------------------------------------------------------------------
# p40 — DoReMi-lite mixture-weight learning (group-robust MWU)
# ---------------------------------------------------------------------------

_P40_E = 3  # epochs (md5-stamped corpus thirds, the c17 idiom)
_P40_B = 64  # c65's token hash buckets — model stays B² rows
_P40_ETA_DIV = 10  # eta = excess/10 per update
_P40_CAP = 1_000_000  # per-step factor cap (at most doubles)


def _p40_nll0() -> int:
    """The empty-model (uniform add-one) per-bigram NLL in micro-nats
    ≈ round(1e6·ln(B)) — the integer-ln kernel's value (round 14),
    computed ONCE here and inlined as the same literal into BOTH
    engines, consistent with the kernel-evaluated grid columns."""
    from iceberg_playground_spark.queries._util import int_ln_micro_py

    return int_ln_micro_py(1, _P40_B)


def _p40_bigrams(d: DataFrame) -> DataFrame:
    """(source, ep, p, c) hashed-bucket bigrams with the md5 epoch
    stamp — p40's corpus lineage, shared with the streaming variant
    (p42): the SAME expression tree guarantees the streamed partials
    sum to exactly what the batch pass aggregates."""
    from iceberg_playground_spark.queries._util import hash_bucket

    bucket = lambda t: (  # noqa: E731
        F.conv(F.md5(t).substr(1, 8), 16, 10).cast("bigint") % _P40_B
    )
    toks = F.split("text", " ")
    bb = F.transform(toks, bucket)
    n = F.size(bb)
    z = F.arrays_zip(
        F.slice(bb, 1, n - 1).alias("p"),
        F.slice(bb, 2, n - 1).alias("c"),
    )
    return d.select(
        "source",
        (hash_bucket(F.col("doc_id")) % _P40_E + 1).alias("ep"),
        F.explode(z).alias("pc"),
    ).select(
        "source", "ep", F.col("pc.p").alias("p"), F.col("pc.c").alias("c")
    )


def _p40_nll_fold(df: DataFrame, cnt: str, tot: str, out: str) -> DataFrame:
    """Micro-nat add-one NLL from integer count columns — the shared
    kernel fold both p40's batch grid and p42's per-epoch state grids
    evaluate (identical inputs => identical integers; round 14: the
    former F.log relied on JVM/libm ulp agreement). -1e6·ln((n+1)/
    (tot+B)) = kernel(num = n+1, den = tot+B), positive."""
    from iceberg_playground_spark.queries._util import int_ln_micro_col

    df = df.withColumn(
        "_nl_num", (F.col(cnt) + 1).cast("bigint")
    ).withColumn("_nl_den", (F.col(tot) + _P40_B).cast("bigint"))
    return int_ln_micro_col(df, "_nl_num", "_nl_den", out, prefix="_nl").drop(
        "_nl_num", "_nl_den"
    )


def _p40_chain() -> str:
    """p40's WITH-clause list through the learned-weight table ``wt``
    (source, exc1..3, w) — shared by p40's grade and p41's schedule
    oracle (the compose-never-slice rule)."""
    b = _P40_B
    f = (
        "(1000000 + least(COALESCE(exc{e}, 0) // "
        f"{_P40_ETA_DIV}, {_P40_CAP}))"
    )
    f1, f2, f3 = f.format(e=1), f.format(e=2), f.format(e=3)
    return f"""bg AS MATERIALIZED (
  SELECT source, ep, b[i] AS p, b[i + 1] AS c
  FROM (SELECT source,
               ((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                      1, 8) AS BIGINT) % 100) % {_P40_E}) + 1 AS ep,
               list_transform(string_split(text, ' '), t ->
                 CAST('0x' || substring(md5(t), 1, 8) AS BIGINT) % {b})
                 AS b
        FROM documents),
       UNNEST(range(1, len(b))) AS u(i)),
model AS MATERIALIZED (
  SELECT p, c,
         sum(CASE WHEN ep < 2 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN ep < 3 THEN 1 ELSE 0 END) AS n2,
         count(*) AS nf
  FROM bg GROUP BY p, c),
grid AS MATERIALIZED (
  SELECT gp.p, gc.c, COALESCE(m.n1, 0) AS n1,
         COALESCE(m.n2, 0) AS n2, COALESCE(m.nf, 0) AS nf
  FROM (SELECT unnest(range(0, {b})) AS p) gp
  CROSS JOIN (SELECT unnest(range(0, {b})) AS c) gc
  LEFT JOIN model m ON m.p = gp.p AND m.c = gc.c),
gstk AS MATERIALIZED (
  SELECT p, c, k, cnt, sum(cnt) OVER (PARTITION BY p, k) AS tot
  FROM (SELECT p, c, 1 AS k, n1 AS cnt FROM grid
        UNION ALL SELECT p, c, 2, n2 FROM grid
        UNION ALL SELECT p, c, 3, nf FROM grid)),
gk AS (SELECT p, c, k, CAST(cnt + 1 AS BIGINT) AS num,
              CAST(tot + {b} AS BIGINT) AS den
       FROM gstk),
{int_ln_micro_cte_sql('gk', 'p, c, k', 'nllv', prefix='_pn')},
nll AS MATERIALIZED (
  SELECT p, c,
         max(CASE WHEN k = 1 THEN nllv END) AS nll1,
         max(CASE WHEN k = 2 THEN nllv END) AS nll2,
         max(CASE WHEN k = 3 THEN nllv END) AS nllf
  FROM _pn_fin GROUP BY p, c),
sc AS MATERIALIZED (
  SELECT g.source, g.ep,
         sum(CASE g.ep WHEN 1 THEN {_p40_nll0()}
                       WHEN 2 THEN n.nll1 ELSE n.nll2 END) AS prox,
         sum(n.nllf) AS ref, count(*) AS m
  FROM bg g JOIN nll n ON g.p = n.p AND g.c = n.c
  GROUP BY g.source, g.ep),
pv AS MATERIALIZED (
  SELECT source,
         max(CASE WHEN ep = 1 THEN greatest(0, prox - ref) // m END)
           AS exc1,
         max(CASE WHEN ep = 2 THEN greatest(0, prox - ref) // m END)
           AS exc2,
         max(CASE WHEN ep = 3 THEN greatest(0, prox - ref) // m END)
           AS exc3
  FROM sc GROUP BY source),
wt AS MATERIALIZED (
  SELECT source, COALESCE(exc1, 0) AS exc1, COALESCE(exc2, 0) AS exc2,
         COALESCE(exc3, 0) AS exc3,
         (((({f1}) * ({f2})) // 1000000) * ({f3})) // 1000000 AS w
  FROM pv)"""


def _p40_oracle() -> str:
    return f"""
WITH {_p40_chain()}
SELECT source, CAST(exc1 AS BIGINT) AS exc1_micro,
       CAST(exc2 AS BIGINT) AS exc2_micro,
       CAST(exc3 AS BIGINT) AS exc3_micro,
       CAST(w AS BIGINT) AS w_final,
       CAST((w * 1000000) // (sum(w) OVER ()) AS BIGINT) AS weight_micro
FROM wt ORDER BY source
"""


@query("p40_mixture_weight_learn", oracle=_p40_oracle())
def p40_mixture_weight_learn(spark: SparkSession, sf: str) -> DataFrame:
    """P40: DoReMi-lite mixture-weight LEARNING — completes the
    budgeting arc's last verb (p33 diagnoses over-replay, p35
    rebalances, p37 schedules; p40 LEARNS the weights those take as
    given): group-robust multiplicative-weights over sources (Xie et
    al., "DoReMi", NeurIPS 2023, in its Arora-Hazan-Kale linear-MWU
    form so every update stays integer-exact). The corpus is
    md5-stamped into 3 epochs; at epoch e the PROXY is the bigram LM
    trained on epochs < e (c65's hashed-bucket model; epoch 1 sees
    the empty model = uniform add-one) and the REFERENCE is the
    full-corpus model. Each source's per-epoch excess loss (proxy −
    reference average NLL in micro-nats, clamped at 0 — how much the
    proxy hasn't learned that domain yet) drives w ← w·(1 + η·excess)
    under exact BIGINT arithmetic; the output is each source's excess
    trajectory, final weight, and normalized mixture share.

    Determinism: ZERO floats (round 14) — the per-model-row NLL
    evaluates through the integer-ln kernel over the stacked 3·B²
    grid (one fold, never a per-corpus-row ln); the empty-model NLL
    is the kernel's own Python-computed literal inlined into both
    engines; every division is exact integer DIV on non-negative
    operands.

    Scale shape: TWO corpus passes over one checkpointed bigram
    lineage (the c65 budget) — all three cumulative proxy models AND
    the reference are conditional sums in ONE |B²|-key aggregate, the
    scoring join BROADCASTS the 4096-row grid, and everything after
    the |sources·epochs|-key rollup is arithmetic on |sources| rows.
    No driver supersteps at all: unlike c63/c70, the weight fold is a
    closed-form 3-factor product, so the whole learner is one
    declarative DAG Catalyst can pipeline."""
    from iceberg_playground_spark.queries._util import load

    b = _P40_B
    # hash-repartition before the bigram pass (the c31/c65 rule,
    # round 17): the per-token md5 bucketing otherwise inherits the
    # scan's one-split partitioning, and the checkpointed bigram RDD
    # inherits that single partition for both downstream passes (cell
    # measured 3.0 -> 2.1 s at sf0.1 on 32 cores). The streaming twin
    # (p42) keeps its per-batch frames un-repartitioned.
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "source", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    bg = _p40_bigrams(d).localCheckpoint(
        eager=False
    )  # model + score both consume it
    model = bg.groupBy("p", "c").agg(
        F.sum(F.when(F.col("ep") < 2, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("ep") < 3, 1).otherwise(0)).alias("n2"),
        F.count("*").alias("nf"),
    )
    grid = (
        spark.range(b * b)
        .select(
            F.expr(f"id DIV {b}").cast("bigint").alias("p"),
            (F.col("id") % b).cast("bigint").alias("c"),
        )
        .join(model, ["p", "c"], "left")
        .fillna(0, ["n1", "n2", "nf"])
    )

    # ONE kernel fold over the stacked (k, cnt) grid — 3·B² = 12288
    # rows — instead of three folds (or three libm lns) on the wide
    # grid; the pivot back is a 4096-key aggregate (round 14)
    stacked = grid.selectExpr(
        "p", "c", "stack(3, 1, n1, 2, n2, 3, nf) AS (k, cnt)"
    ).withColumn("tot", F.sum("cnt").over(W.partitionBy("p", "k")))
    stacked = _p40_nll_fold(stacked, "cnt", "tot", "nllv")
    grid = stacked.groupBy("p", "c").agg(
        F.max(F.when(F.col("k") == 1, F.col("nllv"))).alias("nll1"),
        F.max(F.when(F.col("k") == 2, F.col("nllv"))).alias("nll2"),
        F.max(F.when(F.col("k") == 3, F.col("nllv"))).alias("nllf"),
    )
    prox = (
        F.when(F.col("ep") == 1, F.lit(_p40_nll0()))
        .when(F.col("ep") == 2, F.col("nll1"))
        .otherwise(F.col("nll2"))
    )
    sc = (
        bg.join(F.broadcast(grid), ["p", "c"])
        .groupBy("source", "ep")
        .agg(
            F.sum(prox).alias("prox"),
            F.sum("nllf").alias("ref"),
            F.count("*").alias("m"),
        )
    )
    return _p40_weights(sc)


def _p40_weights(sc: DataFrame) -> DataFrame:
    """The MWU tail from the per-(source, epoch) score table
    (prox, ref, m): excess → pivot → 3-factor integer weight fold →
    normalized mixture shares. Shared by p40 (batch scores) and p42
    (streamed prox partials + post-drain ref pass): identical
    integer arithmetic on identical inputs IS the parity proof."""
    exc = F.expr("greatest(0, prox - ref) DIV m")
    pv = sc.groupBy("source").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("ep") == e, exc)), F.lit(0)
            ).alias(f"exc{e}")
            for e in range(1, _P40_E + 1)
        ]
    )
    fac = (
        f"(1000000 + least(exc{{e}} DIV {_P40_ETA_DIV}, {_P40_CAP}))"
    )
    w = F.expr(
        f"(((({fac.format(e=1)}) * ({fac.format(e=2)})) DIV 1000000) "
        f"* ({fac.format(e=3)})) DIV 1000000"
    )
    wt = pv.select("source", "exc1", "exc2", "exc3", w.alias("w"))
    return wt.select(
        "source",
        F.col("exc1").cast("bigint").alias("exc1_micro"),
        F.col("exc2").cast("bigint").alias("exc2_micro"),
        F.col("exc3").cast("bigint").alias("exc3_micro"),
        F.col("w").cast("bigint").alias("w_final"),
        F.expr("w * 1000000 DIV sum(w) OVER ()")
        .cast("bigint")
        .alias("weight_micro"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# b162 — all_manifests metadata table (Iceberg's t.all_manifests)
# ---------------------------------------------------------------------------

_B162_ORACLE = """
WITH na AS (SELECT count(*) AS n FROM customer WHERE c_custkey % 2 = 0),
nb AS (SELECT count(*) AS n FROM customer WHERE c_custkey % 2 = 1),
nk AS (SELECT count(*) AS n FROM customer WHERE c_nationkey <> 5)
SELECT CAST(1 AS INT) AS ref_version, 'data' AS content,
       CAST(1 AS BIGINT) AS n_manifests, CAST(1 AS BIGINT) AS n_added,
       CAST(2 AS BIGINT) AS n_files,
       CAST((SELECT n FROM na) AS BIGINT) AS n_rows
UNION ALL
SELECT 2, 'data', 2, 1, 4, (SELECT n FROM na) + (SELECT n FROM nb)
UNION ALL
SELECT 3, 'data', 2, 0, 4, (SELECT n FROM na) + (SELECT n FROM nb)
UNION ALL
SELECT 3, 'delete', 1, 1, 1, NULL
UNION ALL
SELECT 4, 'data', 1, 1, 1, (SELECT n FROM nk)
ORDER BY ref_version, content
"""


@query("b162_all_manifests", oracle=_B162_ORACLE)
def b162_all_manifests(spark: SparkSession, sf: str) -> DataFrame:
    """B162: the ``all_manifests`` metadata table (Iceberg's
    ``t.all_manifests``) as a queryable relation — the whole-lineage
    manifest inventory b161's per-snapshot entries view rolls along:
    one row per (manifest, referencing snapshot) across EVERY
    snapshot, with content kind, adding snapshot, file count, and
    record sum (see tables.py::all_manifests). Together with b161
    this closes VERDICT r11 item 6's entries/all_manifests pair; it
    is the relation expire_snapshots and orphan-file cleanup plan
    from (which manifests does each historical snapshot still pin?).

    The demo lineage exercises every row shape: two 2-file appends,
    an equality DELETE (v3 — the data manifests carry forward
    unchanged while a delete manifest appears, added by v3 itself),
    then compaction (v4 — one rewritten data manifest, the delete
    manifest retired because the rewrite materialized it). Graded on
    the per-(referencing version, content) rollup: manifest count,
    added-here count, file count, record sum (NULL for delete
    manifests — unknown, never 0).

    Scale shape: one JSON header per snapshot, ZERO data files opened
    however large the table (the b92 rule; plan-pinned no parquet
    scan)."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.tables import LakeCatalog, LakeTable

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo",
            "customer_manifests",
            "c_custkey BIGINT, c_nationkey BIGINT",
            drop_if_exists=True,
        )
        c = load(spark, sf, "customer").select(
            F.col("c_custkey").cast("bigint"),
            F.col("c_nationkey").cast("bigint"),
        )
        t.append(
            c.filter(F.col("c_custkey") % 2 == 0).repartition(
                2, "c_custkey"
            )
        )
        t.append(
            c.filter(F.col("c_custkey") % 2 == 1).repartition(
                2, "c_custkey"
            )
        )
        t.delete_where("c_nationkey = 5", ["c_custkey"])
        t.compact(target_files=1)
        return t

    t = _built(spark, sf, "b162", build)
    return (
        t.all_manifests()
        .groupBy("ref_version", "content")
        .agg(
            F.count("*").cast("bigint").alias("n_manifests"),
            F.sum(F.col("added_here").cast("bigint"))
            .cast("bigint")
            .alias("n_added"),
            F.sum("n_files").cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .orderBy("ref_version", "content")
    )


# ---------------------------------------------------------------------------
# c76 — unigram tokenizer APPLY (per-language fertility, c64's twin)
# ---------------------------------------------------------------------------


def _c76_oracle() -> str:
    """c75's shared train chain, then the apply: Viterbi-segment every
    corpus word occurrence under the FINAL score map and roll up
    per-language fertility (c64's audit shape for the EM family)."""
    return f"""
WITH {_c75_chain()},
vs AS MATERIALIZED (SELECT piece, rawc + 1 AS c FROM vf),
{_c75_map_ctes('vs', 'mf')},
wd AS MATERIALIZED (
  SELECT lang, word FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS word
    FROM documents)
  WHERE word <> ''),
fwt AS MATERIALIZED (
  SELECT lang, word, m, {_c75_fw_sql('m')} AS fw FROM wd, mf),
sg AS MATERIALIZED (
  SELECT lang, len(word) AS n_chars,
         len(string_split({_c75_bw_sql('m')}, ' ')) AS n_pieces
  FROM fwt),
wl AS MATERIALIZED (
  SELECT lang, count(*) AS n_words, sum(n_chars) AS n_chars,
         sum(n_pieces) AS n_pieces
  FROM sg GROUP BY lang),
dc AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
SELECT d.lang, CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(w.n_words AS BIGINT) AS n_words,
       CAST(w.n_pieces AS BIGINT) AS n_pieces,
       CAST(floor(1000000.0 * w.n_pieces / w.n_words) AS BIGINT)
         AS fertility_micro,
       CAST(floor(1000000.0 * w.n_chars / w.n_pieces) AS BIGINT)
         AS chars_per_piece_micro
FROM dc d JOIN wl w ON d.lang = w.lang
ORDER BY d.lang
"""


@query("c76_unigram_apply_fertility", oracle=_c76_oracle())
def c76_unigram_apply_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """C76: unigram tokenizer APPLY + per-language fertility — c64's
    audit re-run through the TRAINED c75 vocabulary, closing the
    unigram arc train (c75) → apply/audit (c76) exactly as c51→c64
    closes the BPE arc: every corpus word occurrence is
    Viterbi-segmented under the final EM score map (the same exact
    integer DP as training — apply IS the E-step run at corpus
    grain), rolled up per language to fertility (pieces per word) and
    compression (chars per piece). Together with c64 this answers the
    deployment question the two trainers pose: WHICH tokenizer
    compresses this corpus better.

    Scale shape: the apply is a PURE MAP — explode is a narrow
    generator and the score map rides along as literals, so
    tokenization never shuffles (c64's contract); the only exchanges
    are the two |langs|-key aggregates and their |langs|-row join.
    Both micro ratios floor a single double divide (the p30
    discipline)."""
    from iceberg_playground_spark.queries._util import load

    _, scores = _c75_trained(spark, sf)
    from iceberg_playground_spark.queries._util import lit_str_int_map

    m = lit_str_int_map((p, scores[p]) for p in sorted(scores))
    d = load(spark, sf, "documents")
    # The Viterbi DP depends only on the word, so segment each DISTINCT
    # (lang, word) once and weight the rollup by its occurrence count
    # (guide: aggregate before the expensive per-row work) — exact
    # integer sums, so the per-language totals are unchanged while the
    # DP runs |distinct words| times instead of |occurrences| times
    # (sf0.1: 155 vs 270,704 evaluations; the apply stays a pure map).
    wd = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count("*").cast("bigint").alias("occ"))
    )
    sg = wd.withColumn("fw", _c75_fw_col(m)).select(
        "lang",
        "occ",
        F.length("word").cast("bigint").alias("n_chars"),
        F.size(F.split(_c75_seg_col(m), " ")).cast("bigint").alias(
            "n_pieces"
        ),
    )
    wl = sg.groupBy("lang").agg(
        F.sum("occ").cast("bigint").alias("n_words"),
        F.sum(F.col("occ") * F.col("n_chars")).cast("bigint").alias(
            "n_chars"
        ),
        F.sum(F.col("occ") * F.col("n_pieces")).cast("bigint").alias(
            "n_pieces"
        ),
    )
    dc = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return (
        dc.join(wl, "lang")
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_pieces",
            F.floor(1000000.0 * F.col("n_pieces") / F.col("n_words"))
            .cast("bigint")
            .alias("fertility_micro"),
            F.floor(1000000.0 * F.col("n_chars") / F.col("n_pieces"))
            .cast("bigint")
            .alias("chars_per_piece_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# c77 — fully-trained IVFADC (c70 coarse quantizer + residual PQ)
# ---------------------------------------------------------------------------

_C77_NPROBE = 2
_C77_SHORT = 50
_C77_TOPK = 10


def _c77_oracle() -> str:
    """c70's shared chain (the learned coarse quantizer), residual
    projection, c74's unrolled Lloyd (namespaced ``p*``) on the
    residuals, then the IVFADC search: coarse-probe → per-cell ADC
    on residual codes → shortlist → exact re-rank."""
    from iceberg_playground_spark.queries.round11 import _c70_chain

    iters = ",".join(
        _c74_cent_sql(t, src="rq", pfx="p")
        for t in range(1, _C74_ITERS + 1)
    )
    return f"""{_c70_chain()},
asgc AS MATERIALIZED (
  SELECT vec_id, cluster AS cell FROM ranked WHERE rn = 1),
rq AS MATERIALIZED (
  SELECT q.vec_id, a.cell,
         CAST((q.dim - 1) // {_C74_SDIM} AS INT) AS s,
         CAST((q.dim - 1) % {_C74_SDIM} AS INT) AS d,
         q.v - c.v AS v
  FROM q JOIN asgc a USING (vec_id)
  JOIN cent c ON c.cluster = a.cell AND c.dim = q.dim),
pseeds AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j
  FROM embeddings QUALIFY j < {_C74_K}),
pcent0 AS MATERIALIZED (
  SELECT rq.s, pseeds.j, rq.d, rq.v FROM pseeds JOIN rq USING (vec_id)),
{iters},
fcode AS MATERIALIZED (
  SELECT vec_id, s, (min({{'d2': d2, 'j': j}})).j AS code
  FROM (SELECT rq.vec_id, rq.s, c.j,
               sum((rq.v - c.v) * (rq.v - c.v)) AS d2
        FROM rq JOIN pcent{_C74_ITERS} c ON rq.s = c.s AND rq.d = c.d
        GROUP BY rq.vec_id, rq.s, c.j)
  GROUP BY vec_id, s),
q0 AS MATERIALIZED (SELECT dim, v FROM q WHERE vec_id = 0),
pc AS MATERIALIZED (
  SELECT cluster FROM (
    SELECT c.cluster,
           row_number() OVER (
             ORDER BY sum((q0.v - c.v) * (q0.v - c.v)), c.cluster) AS rn
    FROM cent c JOIN q0 ON q0.dim = c.dim
    GROUP BY c.cluster) WHERE rn <= {_C77_NPROBE}),
qres AS MATERIALIZED (
  SELECT pc.cluster AS cell,
         CAST((q0.dim - 1) // {_C74_SDIM} AS INT) AS s,
         CAST((q0.dim - 1) % {_C74_SDIM} AS INT) AS d,
         q0.v - c.v AS v
  FROM pc JOIN cent c ON c.cluster = pc.cluster
  JOIN q0 ON q0.dim = c.dim),
adc AS MATERIALIZED (
  SELECT qres.cell, cb.s, cb.j, sum((qres.v - cb.v) * (qres.v - cb.v))
           AS qd
  FROM pcent{_C74_ITERS} cb JOIN qres ON qres.s = cb.s AND qres.d = cb.d
  GROUP BY qres.cell, cb.s, cb.j),
est AS MATERIALIZED (
  SELECT f.vec_id, sum(adc.qd) AS est_d2
  FROM fcode f JOIN asgc a ON a.vec_id = f.vec_id
  JOIN adc ON adc.cell = a.cell AND adc.s = f.s AND adc.j = f.code
  GROUP BY f.vec_id),
short AS MATERIALIZED (
  SELECT vec_id, est_d2 FROM est ORDER BY est_d2, vec_id
  LIMIT {_C77_SHORT}),
ex AS MATERIALIZED (
  SELECT q.vec_id, sum((q.v - q0.v) * (q.v - q0.v)) AS exact_d2
  FROM q JOIN q0 ON q0.dim = q.dim
  WHERE q.vec_id IN (SELECT vec_id FROM short)
  GROUP BY q.vec_id)
SELECT s.vec_id, CAST(s.est_d2 AS BIGINT) AS est_d2,
       CAST(ex.exact_d2 AS BIGINT) AS exact_d2
FROM short s JOIN ex USING (vec_id)
ORDER BY exact_d2, s.vec_id LIMIT {_C77_TOPK}
"""


@query("c77_trained_ivfadc", oracle=_c77_oracle())
def c77_trained_ivfadc(spark: SparkSession, sf: str) -> DataFrame:
    """C77: FULLY-TRAINED IVFADC — the end-to-end compressed index a
    production ANN deployment actually runs (Jégou et al., TPAMI
    2011: IVF coarse quantizer + product-quantized RESIDUALS + ADC),
    with BOTH stages learned: c70's k-means++ coarse quantizer
    assigns every vector to a cell, each vector's residual against
    its cell centroid (exact integer subtraction on the c54 grid) is
    PQ-encoded through a c74-trained residual codebook, and search
    probes the nprobe=2 nearest cells, scans CODES ONLY
    with per-cell ADC tables built from the query's own residuals,
    shortlists, then exact-re-ranks. c40 is this exact shape with
    both stages untrained (md5 codebooks); c74 trained the PQ but on
    raw vectors with no IVF; c77 composes the arc's two trained
    stages — residual encoding is what makes trained PQ and trained
    IVF compound (residual energy is what the coarse stage already
    explained, so the codebook spends its 4 bits on what remains).

    Scale shape: training inherits c70's (k-1 joinless map
    supersteps) and c74's (2 scans, 128-key integer aggregates, no
    vector shuffles) contracts — the residual frame is one pure-map
    projection against the literal cell-centroid matrix off the
    checkpointed assignment; search touches 8 B/vector codes
    restricted to the probed cells (a literal IN filter the scan
    prunes on), the per-cell ADC tables are driver-built KB literals,
    and the exact re-rank reads 50 vectors via broadcast
    semi-join. At 100 TB: the only full-corpus work after training is
    one code scan over nprobe/nlist of the data."""
    from iceberg_playground_spark.queries.round9b import _c54_assign
    from iceberg_playground_spark.queries.round11 import _c70_train

    from iceberg_playground_spark.queries._util import (
        lit_int_array,
        lit_int_matrix,
    )

    qdf, seeds = _c70_train(spark, sf)
    asg = _c54_assign(qdf, seeds)
    ids = lit_int_array([cid for cid, _ in seeds])
    cmat = lit_int_matrix([vec for _, vec in seeds])
    pos = F.array_position(ids, F.col("cluster_id")).cast("int")
    res = asg.select(
        "vec_id",
        "cluster_id",
        F.zip_with("q", F.element_at(cmat, pos), lambda x, y: x - y).alias(
            "q"
        ),
    ).localCheckpoint(eager=False)  # seed collect + 2 train scans + codes
    pcb = _c74_train_on(res, _c74_seed(res))

    # the query vector is vec_id 0 — which is ALWAYS seed 0 of the
    # k-means++ chain (_c70_train's deterministic-seed rule), already
    # on the driver: re-collecting it was one whole redundant job
    # (round 16)
    cent_by_id = {cid: vec for cid, vec in seeds}
    q0 = [int(v) for v in cent_by_id[0]]
    by_dist = sorted(
        (
            (sum((q0[i] - vec[i]) ** 2 for i in range(len(q0))), cid)
            for cid, vec in seeds
        )
    )
    probed = [cid for _, cid in by_dist[:_C77_NPROBE]]
    adc = {
        cid: [
            [
                sum(
                    (
                        (q0[s * _C74_SDIM + d] - cent_by_id[cid][s * _C74_SDIM + d])
                        - pcb[s][j][d]
                    )
                    ** 2
                    for d in range(_C74_SDIM)
                )
                for j in range(_C74_K)
            ]
            for s in range(_C74_SUB)
        ]
        for cid in probed
    }
    cand = res.filter(
        F.col("cluster_id").isin([int(c) for c in probed])
    )
    # the 8 per-subspace CASE-over-probed-cells lookups sum as ONE
    # parsed expression (round-16 rule; identical trees — CASE with
    # no ELSE, left-assoc +)
    def _case(s: int) -> str:
        code = _c74_code_sql(pcb, s)
        whens = " ".join(
            "when (cluster_id = {cid}) then element_at(array({vals}),"
            " ({code}) + 1)".format(
                cid=int(cid),
                vals=",".join(str(int(v)) for v in adc[cid][s]),
                code=code,
            )
            for cid in probed
        )
        return f"case {whens} end"

    est = F.expr(" + ".join(f"({_case(s)})" for s in range(_C74_SUB)))
    short = (
        cand.select("vec_id", est.cast("bigint").alias("est_d2"))
        .orderBy("est_d2", "vec_id")
        .limit(_C77_SHORT)
    )
    qlit = lit_int_array(q0)
    exact = F.aggregate(
        F.zip_with("q", qlit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        qdf.join(F.broadcast(short), "vec_id")
        .select("vec_id", "est_d2", exact.alias("exact_d2"))
        .orderBy("exact_d2", "vec_id")
        .limit(_C77_TOPK)
    )


# ---------------------------------------------------------------------------
# p41 — learned-weight training schedule (p40 → p37 composition)
# ---------------------------------------------------------------------------

_P41_BATCH_TOK = 128  # p37's batch size


def _p41_oracle() -> str:
    """p40's shared learned-weight chain, then p37's stride
    interleave driven by those weights: per-source token allocation =
    corpus budget × normalized learned weight (exact BIGINT), batches
    of 128 tokens, batch j of a b-batch source at stride position
    (2j−1)/(2b), global step order."""
    return f"""
WITH {_p40_chain()},
tok AS MATERIALIZED (
  SELECT source, sum(len(string_split(text, ' '))) AS tok
  FROM documents GROUP BY source),
al AS MATERIALIZED (
  SELECT w.source,
         ((SELECT sum(tok) FROM tok)
          * ((w.w * 1000000) // (sum(w.w) OVER ()))) // 1000000
           AS alloc
  FROM wt w),
sched AS MATERIALIZED (
  SELECT source, CAST(alloc // {_P41_BATCH_TOK} AS BIGINT) AS n_batches
  FROM al WHERE alloc // {_P41_BATCH_TOK} > 0),
srows AS MATERIALIZED (
  SELECT source, u.j AS batch_idx,
         ((2 * u.j - 1) * 1000000000) // (2 * n_batches) AS key_micro
  FROM sched, UNNEST(range(1, n_batches + 1)) AS u(j))
SELECT CAST(row_number() OVER (ORDER BY key_micro, source)
            AS BIGINT) AS step,
       source, CAST(batch_idx AS BIGINT) AS batch_idx,
       CAST(key_micro AS BIGINT) AS key_micro
FROM srows ORDER BY step
"""


@query("p41_learned_schedule", oracle=_p41_oracle())
def p41_learned_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """P41: the LEARNED training schedule — p40's group-robust
    weights driven through p37's deterministic stride interleave,
    closing the loop the budgeting arc opened: p40 learns per-source
    mixture weights, p41 turns them into the batch order a training
    loop consumes (per-source allocation = corpus token budget ×
    normalized learned weight in exact BIGINT arithmetic; batch j of
    a b-batch source at stride position (2j−1)/(2b), so every
    schedule prefix holds each source at its LEARNED proportion ±1
    batch). p37 schedules p35's capacity-derived allocation; p41
    schedules the allocation the MWU learner says the model needs —
    the DoReMi deployment step.

    Scale shape: p40's two corpus passes produce the |sources|-row
    weight table; the budget aggregate is one more |sources|-key
    corpus rollup; the schedule is a sequence-explode of |sources|
    rows to budget/batch_size rows (KB per million tokens at any
    corpus size), and the only exchange past the weight/budget
    aggregates is the global step-order sort, which IS the
    deliverable (p37's contract)."""
    from iceberg_playground_spark.queries._util import load

    w = p40_mixture_weight_learn(spark, sf).select(
        "source", "w_final"
    )
    tok = (
        load(spark, sf, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("tok"))
    )
    total = tok.agg(F.sum("tok").alias("t"))
    al = (
        w.withColumn(
            "wm",
            F.expr("w_final * 1000000 DIV sum(w_final) OVER ()"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            F.expr(f"(t * wm) DIV 1000000").alias("alloc"),
        )
    )
    sched = al.select(
        "source",
        F.expr(f"CAST(alloc DIV {_P41_BATCH_TOK} AS BIGINT)").alias(
            "n_batches"
        ),
    ).filter(F.col("n_batches") > 0)
    rows = sched.select(
        "source",
        "n_batches",
        F.explode(F.sequence(F.lit(1), F.col("n_batches"))).alias(
            "batch_idx"
        ),
    ).select(
        "source",
        F.col("batch_idx").cast("bigint").alias("batch_idx"),
        F.expr(
            f"CAST(((2 * batch_idx - 1) * 1000000000) DIV "
            f"(2 * n_batches) AS BIGINT)"
        ).alias("key_micro"),
    )
    win = W.orderBy("key_micro", "source")
    return rows.select(
        F.row_number().over(win).cast("bigint").alias("step"),
        "source",
        "batch_idx",
        "key_micro",
    ).orderBy("step")


# ---------------------------------------------------------------------------
# p42 — streaming mixture-weight learning (p40 as continuous ingest)
# ---------------------------------------------------------------------------

_P42_SCHEMA = "doc_id BIGINT, source STRING, text STRING"


def _p42_grid(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """The complete B² NLL grid from a (p, c, n) count state — the
    same kernel fold as p40's batch grid (_p40_nll_fold), so a
    state equal to an epoch prefix yields the batch pass's exact
    integers. An empty state yields the uniform model (every cell =
    the kernel's 1e6·ln B — the same value p40 inlines for epoch 1)."""
    b = _P40_B
    g = (
        spark.range(b * b)
        .select(
            F.expr(f"id DIV {b}").cast("bigint").alias("p"),
            (F.col("id") % b).cast("bigint").alias("c"),
        )
        .join(counts, ["p", "c"], "left")
        .fillna(0, ["n"])
        .withColumn("tn", F.sum("n").over(W.partitionBy("p")))
    )
    return _p40_nll_fold(g, "n", "tn", "nll").select("p", "c", "nll")


@query("p42_streaming_mixture_learn", oracle=_p40_oracle())
def p42_streaming_mixture_learn(spark: SparkSession, sf: str) -> DataFrame:
    """P42: p40's DoReMi-lite learner as CONTINUOUS ingest — the
    streaming proof that group-robust mixture learning fits the
    incremental lakehouse shape (p36/p38's convention, applied to the
    budgeting arc's LEARN step): documents arrive as 3 epoch
    micro-batches in epoch order (mtime-pinned, the p36 ordering
    contract — the proxy is the model BEFORE the batch merges, so
    order is semantic here, unlike p38's order-free sums); each batch
    scores its bigrams against the NLL grid built from the CURRENT
    count state (epoch 1 sees the empty state = the uniform model),
    appends its per-(source, epoch) prox partials, then merges its
    bigram counts into the state. After the drain one batch pass over
    the arrivals scores everything under the final (= full-corpus)
    model for the reference column, and the shared MWU tail
    (_p40_weights) folds the weights. The drained result is
    hash-IDENTICAL to batch p40 — the oracle IS p40's oracle.

    Scale shape: per-epoch work is one pure-map bigram pass over the
    batch + a broadcast-grid score join + a |B²|-key count merge —
    cross-batch state is ≤ B² integer rows however large the corpus
    (the mergeable-sketch property, made a graded contract for the
    learner); the reference pass is p40's own score pass. At 100 TB
    each ingest epoch pays |batch|, never |corpus|."""
    from iceberg_playground_spark.queries._util import hash_bucket, load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.queries.streaming import _scratch

    d = load(spark, sf, "documents").select("doc_id", "source", "text")

    def build(tmp: str) -> str:
        src = os.path.join(tmp, "incoming")
        os.makedirs(src, exist_ok=True)
        now = int(os.stat(tmp).st_mtime)
        for i in range(1, _P40_E + 1):
            part_dir = os.path.join(tmp, f"stage_{i}")
            (
                d.filter(
                    hash_bucket(F.col("doc_id")) % _P40_E + 1 == i
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(part_dir)
            )
            part = next(
                f
                for f in os.listdir(part_dir)
                if f.startswith("part-") and f.endswith(".parquet")
            )
            dst = os.path.join(src, f"arrival_{i}.parquet")
            shutil.copyfile(os.path.join(part_dir, part), dst)
            os.utime(dst, (now + 10 * i, now + 10 * i))
        return src

    src = _built(spark, sf, "p42", build)
    work = _scratch("ips_stream_mwu_")
    counts_dir = os.path.join(work, "counts")
    scores_dir = os.path.join(work, "scores")
    try:

        def read_counts() -> DataFrame:
            try:
                return (
                    spark.read.parquet(counts_dir)
                    .groupBy("p", "c")
                    .agg(F.sum("n").alias("n"))
                )
            except Exception:
                return spark.createDataFrame(
                    [], "p BIGINT, c BIGINT, n BIGINT"
                )

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            bgb = _p40_bigrams(batch_df).localCheckpoint(eager=False)
            grid = _p42_grid(spark, read_counts())
            (
                bgb.join(F.broadcast(grid), ["p", "c"])
                .groupBy("source", "ep")
                .agg(
                    F.sum("nll").alias("prox"),
                    F.count("*").alias("m"),
                )
                .write.mode("append")
                .parquet(scores_dir)
            )
            (
                bgb.groupBy("p", "c")
                .agg(F.count("*").alias("n"))
                .write.mode("append")
                .parquet(counts_dir)
            )

        stream = (
            spark.readStream.schema(_P42_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", _scratch("ips_stream_mwuck_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # post-drain reference pass: the state now holds the FULL
        # corpus counts, so its grid IS batch p40's nllf grid
        bg = _p40_bigrams(spark.read.parquet(src)).localCheckpoint(
            eager=False
        )
        refgrid = _p42_grid(spark, read_counts())
        ref = (
            bg.join(F.broadcast(refgrid), ["p", "c"])
            .groupBy("source", "ep")
            .agg(F.sum("nll").alias("ref"))
        )
        prox = (
            spark.read.parquet(scores_dir)
            .groupBy("source", "ep")
            .agg(F.sum("prox").alias("prox"), F.sum("m").alias("m"))
        )
        # SIZE GUARD: |sources| rows, collected because the scratch
        # state dirs are deleted in finally (p18's literal-result rule)
        rows = _p40_weights(prox.join(ref, ["source", "ep"])).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "source STRING, exc1_micro BIGINT, exc2_micro BIGINT, "
        "exc3_micro BIGINT, w_final BIGINT, weight_micro BIGINT",
    ).orderBy("source")


# ---------------------------------------------------------------------------
# b163 — metadata_log_entries table (Iceberg's t.metadata_log_entries)
# ---------------------------------------------------------------------------

_B163_ORACLE = """
WITH na AS (SELECT count(*) AS n FROM part WHERE p_partkey % 2 = 0),
nb AS (SELECT count(*) AS n FROM part WHERE p_partkey % 2 = 1)
SELECT CAST(1 AS INT) AS version, CAST(0 AS INT) AS parent,
       'append' AS operation, CAST(2 AS INT) AS n_fields,
       FALSE AS is_current,
       CAST((SELECT n FROM na) AS BIGINT) AS n_rows
UNION ALL
SELECT 2, 1, 'add-column', 3, FALSE, (SELECT n FROM na)
UNION ALL
SELECT 3, 2, 'append', 3, FALSE,
       (SELECT n FROM na) + (SELECT n FROM nb)
UNION ALL
SELECT 4, 3, 'compact', 3, TRUE,
       (SELECT n FROM na) + (SELECT n FROM nb)
ORDER BY version
"""


@query("b163_metadata_log", oracle=_B163_ORACLE)
def b163_metadata_log(spark: SparkSession, sf: str) -> DataFrame:
    """B163: the ``metadata_log_entries`` metadata table (Iceberg's
    ``t.metadata_log_entries``) as a queryable relation — one row per
    committed metadata file in version order: parent pointer,
    committing operation, the field count of the schema that version
    SERVES (schema evolution visible as the count moving), currency
    flag (see tables.py::metadata_log; commit wall time is
    deliberately omitted — nondeterministic, so ungradeable). The
    graded relation adds each version's committed row count from
    per-file stats (``metadata_count`` — still zero data I/O), tying
    the log to the data lineage it describes.

    The demo exercises the log's full vocabulary: append (v1, 2
    fields) → add-column (v2 — metadata-only, same rows, 3 fields) →
    append under the widened schema (v3) → compaction (v4, current).
    With b79 snapshots, b160 history, b159 refs, b158 partitions,
    b92 files, b161 entries and b162 all_manifests this makes the
    metadata-table family complete against Iceberg's list.

    Scale shape: one JSON header per version, ZERO data files opened
    (the b92 rule; plan-pinned: no parquet scan)."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.tables import LakeCatalog, LakeTable

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo",
            "part_mlog",
            "p_partkey BIGINT, p_size BIGINT",
            drop_if_exists=True,
        )
        p = load(spark, sf, "part").select(
            F.col("p_partkey").cast("bigint"),
            F.col("p_size").cast("bigint"),
        )
        t.append(
            p.filter(F.col("p_partkey") % 2 == 0).repartition(
                2, "p_partkey"
            )
        )
        t.add_column("p_size_wide", "BIGINT")
        p3 = load(spark, sf, "part").select(
            F.col("p_partkey").cast("bigint"),
            F.col("p_size").cast("bigint"),
            (F.col("p_size") * 2).cast("bigint").alias("p_size_wide"),
        )
        t.append(
            p3.filter(F.col("p_partkey") % 2 == 1).repartition(
                2, "p_partkey"
            )
        )
        t.compact(target_files=1)
        return t

    t = _built(spark, sf, "b163", build)
    counts = [
        (v, t.metadata_count(v)) for v in t.versions()
    ]
    cdf = spark.createDataFrame(counts, "version INT, n_rows BIGINT")
    return t.metadata_log().join(cdf, "version").orderBy("version")


# ---------------------------------------------------------------------------
# c78 — hybrid retrieval: dense + BM25 fused by reciprocal-rank fusion
# ---------------------------------------------------------------------------

_C78_LIST = 100  # retrieved-list depth per backend
_C78_TOPK = 10
_C78_RRF_K = 60  # the standard RRF constant (Cormack et al. 2009)
_C78_K1 = 1200  # BM25 k1 = 1.2 in millis
_C78_B = 750  # BM25 b = 0.75 in millis
_C78_TERMS = 3


def _c78_idf_micro(nd: int, df: int) -> int:
    """BM25 idf in integer micro-nats, Lucene's non-negative form:
    1 + (N−df+0.5)/(df+0.5) = (2N+2)/(2df+1) exactly, so the idf
    evaluates through the shared fixed-point integer ln kernel
    (round 13: libm left the graded contract — this was the last
    oracle-side ln in the retrieval family; the oracle CTE runs the
    same kernel chain)."""
    from iceberg_playground_spark.queries._util import int_ln_micro_py

    return int_ln_micro_py(2 * df + 1, 2 * nd + 2)


# the 3 idf values evaluate through the integer-ln kernel in BOTH
# engines (see _c78_idf_micro)
_IDF_CHAIN = int_ln_micro_cte_sql("idfin", "t", "idf", prefix="_idf")


def _c78_ctes() -> str:
    """The full hybrid-retrieval CTE block through ``fused`` —
    shared by c78's own oracle and c94's cross-encoder re-rank
    (round13.py), so the re-rank provably scores EXACTLY the fused
    list c78 ships."""
    from iceberg_playground_spark.queries.llm import _dot_sql, _norm_sql

    k1, b, kk = _C78_K1, _C78_B, _C78_RRF_K
    return f"""cand AS MATERIALIZED (
  SELECT d.doc_id, d.text, e.embedding
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  WHERE d.doc_id <> 0),
qv AS MATERIALIZED (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
dlist AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosine DESC, doc_id) AS rn_d
  FROM (SELECT doc_id,
               round({_dot_sql('embedding', 'qe')}
                     / ({_norm_sql('embedding')} * {_norm_sql('qe')}), 6)
                 AS cosine
        FROM cand, qv)
  QUALIFY rn_d <= {_C78_LIST}),
stats AS MATERIALIZED (
  SELECT count(*) AS nd,
         sum(len(string_split(text, ' '))) AS tl
  FROM cand),
terms AS MATERIALIZED (
  SELECT t, df FROM (
    SELECT t, count(*) AS c, count(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
          FROM cand)
    WHERE t <> '' GROUP BY t) ts, stats
  WHERE df * 4 <= nd
  ORDER BY c DESC, t LIMIT {_C78_TERMS}),
idfin AS MATERIALIZED (
  SELECT t, CAST(2 * df + 1 AS BIGINT) AS num,
         CAST(2 * nd + 2 AS BIGINT) AS den
  FROM terms, stats),
{_IDF_CHAIN},
idf AS (SELECT t, idf FROM _idf_fin),
lex AS MATERIALIZED (
  SELECT c.doc_id,
         sum((idf.idf * (tf * ({k1} + 1000)))
             // (tf * 1000
                 + ({k1} * (1000 - {b}
                            + ({b} * dl * nd) // tl)) // 1000))
           AS bm25
  FROM (SELECT doc_id, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM cand) c,
       stats, idf,
       LATERAL (SELECT CAST(len(list_filter(
                  string_split(c.text, ' '), x -> x = idf.t))
                  AS BIGINT) AS tf) tt
  GROUP BY c.doc_id),
llist AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn_l
  FROM lex QUALIFY rn_l <= {_C78_LIST}),
fused AS MATERIALIZED (
  SELECT COALESCE(d.doc_id, l.doc_id) AS doc_id,
         COALESCE(1000000 // ({kk} + d.rn_d), 0)
         + COALESCE(1000000 // ({kk} + l.rn_l), 0) AS rrf_micro,
         CAST(d.rn_d AS BIGINT) AS rn_dense,
         CAST(l.rn_l AS BIGINT) AS rn_lex
  FROM dlist d FULL OUTER JOIN llist l ON d.doc_id = l.doc_id)"""


def _c78_oracle() -> str:
    return f"""
WITH {_c78_ctes()}
SELECT doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
       rn_dense, rn_lex
FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {_C78_TOPK}
"""


@query("c78_hybrid_rrf_search", oracle=_c78_oracle())
def c78_hybrid_rrf_search(spark: SparkSession, sf: str) -> DataFrame:
    """C78: HYBRID RETRIEVAL — dense cosine top-{list} and integer
    BM25 top-{list} fused by reciprocal-rank fusion (Cormack, Clarke
    & Büttcher, SIGIR 2009: score = Σ 1/(60+rank); the fusion every
    production RAG / retrieval stack runs when it has both a vector
    index and a lexical index), opening the hybrid-search family the
    corpus pipeline was missing: c03 is the dense backend, c78 adds
    the lexical backend and the fusion. Query = vector 0's embedding
    (dense) and the corpus's top-{terms} tokens (lexical — a
    deterministic stand-in for a user query). BM25 is EXACT INTEGER
    arithmetic end-to-end: k1/b in millis, avgdl carried as the
    (total_len, n_docs) rational and cross-multiplied, one ln per
    TERM for idf (model-sized, the c65 idiom) — so ranks, and
    therefore the fusion, can never drift between engines; the dense
    rank orders by the 6dp-rounded cosine (c03's contract).

    Scale shape: both backends end in TakeOrderedAndProject
    top-{list} lists — the fusion joins two ≤{list}-row frames
    (broadcast by size), never the corpus; the lexical pass is one
    pure-map score over candidates with the 3-term model as literals
    + the idf/term/stat aggregates (3 bounded collects); at 100 TB
    each backend is its own index scan and RRF touches only the
    retrieved lists, which is the entire point of fusion."""
    return _c78_fused(spark, sf).orderBy(
        F.desc("rrf_micro"), "doc_id"
    ).limit(_C78_TOPK)


def _c78_fused(spark: SparkSession, sf: str) -> DataFrame:
    """The full hybrid pipeline through the FUSED frame (doc_id,
    rrf_micro, rn_dense, rn_lex) — c78 takes its top-{k}; c94
    (round13.py) re-ranks the same list, provably scoring exactly
    what c78 ships."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.llm import _dot, _norm

    d = load(spark, sf, "documents").select("doc_id", "text")
    e = load(spark, sf, "embeddings")
    cand = d.join(
        e.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    ).filter(F.col("doc_id") != 0)
    cand = cand.localCheckpoint(eager=False)  # dense + lex + 3 aggregates

    qe = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][
        "embedding"
    ]
    from iceberg_playground_spark.queries._util import lit_double_array

    qlit = lit_double_array(qe)
    cos = F.round(
        _dot(F.col("embedding"), qlit) / (_norm(F.col("embedding")) * _norm(qlit)),
        6,
    )
    dense = (
        cand.select("doc_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(_C78_LIST)
        .withColumn(
            "rn_d",
            F.row_number().over(W.orderBy(F.desc("cosine"), "doc_id")),
        )
        .select("doc_id", "rn_d")
    )

    toks = F.split("text", " ")
    st = cand.agg(
        F.count("*").alias("nd"), F.sum(F.size(toks)).alias("tl")
    ).collect()[0]
    nd, tl = int(st["nd"]), int(st["tl"])
    # query terms: the most frequent MID-frequency tokens (document
    # frequency <= N/4 — the discriminative band; the raw top tokens
    # appear in nearly every doc and carry no lexical signal)
    trows = (
        cand.select("doc_id", F.explode(toks).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(
            F.count("*").alias("c"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("df") * 4 <= nd)
        .orderBy(F.col("c").desc(), "t")
        .limit(_C78_TERMS)
        .collect()
    )
    idf = {
        r["t"]: _c78_idf_micro(nd, int(r["df"])) for r in trows
    }
    terms = [r["t"] for r in trows]
    # one inline expression per term (exact integer DIVs, mirrored by
    # the oracle clause-for-clause; tf = 0 zeroes the term naturally)
    term_scores = []
    for t in terms:
        tesc = t.replace("'", "''")
        tf = (
            f"CAST(size(filter(split(text, ' '), x -> x = '{tesc}')) "
            f"AS BIGINT)"
        )
        dl = "CAST(size(split(text, ' ')) AS BIGINT)"
        term_scores.append(
            f"((CAST({idf[t]} AS BIGINT) * ({tf} * ({_C78_K1} + 1000))) "
            f"DIV ({tf} * 1000 + ({_C78_K1} * (1000 - {_C78_B} "
            f"+ ({_C78_B} * {dl} * {nd}) DIV {tl})) DIV 1000))"
        )
    lex = cand.select(
        "doc_id", F.expr(" + ".join(term_scores)).alias("bm25")
    )
    llist = (
        lex.orderBy(F.desc("bm25"), "doc_id")
        .limit(_C78_LIST)
        .withColumn(
            "rn_l",
            F.row_number().over(W.orderBy(F.desc("bm25"), "doc_id")),
        )
        .select("doc_id", "rn_l")
    )
    fused = dense.join(llist, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(
                F.expr(f"1000000 DIV ({_C78_RRF_K} + rn_d)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 DIV ({_C78_RRF_K} + rn_l)"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("rrf_micro"),
        F.col("rn_d").cast("bigint").alias("rn_dense"),
        F.col("rn_l").cast("bigint").alias("rn_lex"),
    )
    return fused
