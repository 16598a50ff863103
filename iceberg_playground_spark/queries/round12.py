"""Round-12 operators: the trained PQ codebook (VERDICT r11 item 2).

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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.registry import query

_C74_SUB = 8  # subspaces (64 dims -> 8 x 8, c36's geometry)
_C74_SDIM = 8
_C74_K = 16  # centroids per subspace -> 4-bit codes, 8 B/vector
_C74_ITERS = 2  # Lloyd iterations (c36's _PQ_ITERS)
_C74_SHORT = 50
_C74_TOPK = 10


def _c74_sub_col(s: int):
    """Subspace ``s`` slice of the quantized vector column ``q``."""
    return F.slice("q", s * _C74_SDIM + 1, _C74_SDIM)


def _c74_code_col(cb: list[list[list[int]]], s: int):
    """Exact BIGINT argmin code for subspace ``s`` against a literal
    16×8 centroid matrix — ONE JVM expression, zero joins (the c54
    literal-matrix rule). array_position's first minimum IS the
    lowest-j tie-break the oracle's min-struct encodes."""
    cmat = F.array(
        *[
            F.array(*[F.lit(int(v)) for v in cb[s][j]])
            for j in range(_C74_K)
        ]
    )
    dists = F.transform(
        cmat,
        lambda c: F.aggregate(
            F.zip_with(_c74_sub_col(s), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


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


def _c74_train(
    spark: SparkSession, sf: str
) -> tuple[DataFrame, list[list[list[int]]]]:
    """Per-subspace Lloyd on the integer grid: returns (quantized
    corpus frame, trained codebook). Each iteration = one corpus scan
    (joinless assignment for ALL subspaces at once) + one 128-key
    aggregate collected to the driver; the floor'd integer mean is
    Python's ``//`` (mirrored exactly by the oracle's
    sign-safe-mod construction); empty cells keep their centroid."""
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    qdf = _c54_quantized(spark, sf)
    cb = _c74_seed(qdf)
    for _ in range(_C74_ITERS):
        pairs = F.array(
            *[
                F.struct(
                    F.lit(s).alias("s"),
                    _c74_code_col(cb, s).alias("j"),
                    _c74_sub_col(s).alias("sub"),
                )
                for s in range(_C74_SUB)
            ]
        )
        agg = (
            qdf.select(F.explode(pairs).alias("e"))
            .select("e.s", "e.j", "e.sub")
            .groupBy("s", "j")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.col("sub")[d]).alias(f"d{d}")
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
    return qdf, cb


def _c74_cent_sql(t: int) -> str:
    """One unrolled Lloyd iteration (assignment + floor'd-mean update)
    as materialized CTEs. The update's floor division is the
    sign-safe-mod form ``(sv - ((sv % n + n) % n)) // n`` — the
    numerator is exactly divisible, so DuckDB's integer division
    equals Python's ``//`` even on negative sums."""
    p = t - 1
    return f"""
asg{t} AS MATERIALIZED (
  SELECT vec_id, s, (min({{'d2': d2, 'j': j}})).j AS code
  FROM (SELECT q.vec_id, q.s, c.j, sum((q.v - c.v) * (q.v - c.v)) AS d2
        FROM q JOIN cent{p} c ON q.s = c.s AND q.d = c.d
        GROUP BY q.vec_id, q.s, c.j)
  GROUP BY vec_id, s),
sums{t} AS MATERIALIZED (
  SELECT a.s, a.code AS j, q.d, sum(q.v) AS sv, count(*) AS n
  FROM asg{t} a JOIN q ON q.vec_id = a.vec_id AND q.s = a.s
  GROUP BY a.s, a.code, q.d),
cent{t} AS MATERIALIZED (
  SELECT c.s, c.j, c.d,
         CASE WHEN m.n IS NULL THEN c.v
              ELSE (m.sv - ((m.sv % m.n + m.n) % m.n)) // m.n END AS v
  FROM cent{p} c LEFT JOIN sums{t} m
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
    est = None
    for s in range(_C74_SUB):
        alit = F.array(*[F.lit(int(x)) for x in adc[s]])
        term = F.element_at(alit, _c74_code_col(cb, s) + 1)
        est = term if est is None else est + term
    short = (
        qdf.select("vec_id", est.cast("bigint").alias("est_d2"))
        .orderBy("est_d2", "vec_id")
        .limit(_C74_SHORT)
    )
    qlit = F.array(*[F.lit(v) for v in qv])
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
