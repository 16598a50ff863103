"""Late-round-12 operators: the file-grain lineage metadata table,
the PCA family (trained on the c54 integer grid), the multimodal
near-dup verb, and the dedup-aware epoch plan.

- b164: ALL_DATA_FILES METADATA TABLE — Iceberg's ``t.all_data_files``
  as a queryable relation, completing the metadata family's grain
  ladder: b79 snapshots → b163 metadata log → b162 all_manifests
  (lineage × manifest) → b161 entries (snapshot × file) → b164
  (lineage × FILE). One row per distinct data file ever committed,
  with adding snapshot, latest referencing snapshot, live flag, and
  record count; dead files (last_ref < current) are precisely the
  reclaim set orphan-file cleanup computes after expire_snapshots —
  the relation the reference's manifest-Avro layer serializes file
  descriptors for (decouple.rs:82-96). Metadata-only: one JSON header
  per snapshot, ZERO data files opened at any table size (the b92
  rule).

- c79: PCA TOP COMPONENT BY POWER ITERATION — the corpus-statistics
  step every embedding-pipeline audit runs before whitening, energy
  thresholds, or dimensionality decisions (Halko, Martinsson & Tropp,
  SIAM Rev. 2011 frame the family; plain power iteration is the
  textbook member). Distributed work is ONE corpus scan producing the
  exact integer Gram sufficient statistics on c54's fixed-point grid
  (q = floor(x·1000)): an Arrow-batched ``mapInPandas`` kernel
  reduces each batch to its d×d outer-product partials with numpy
  BIGINT sums (the sanctioned vectorized-Python surface — per-batch
  model-sized output, so the exchange carries d² ints per batch,
  never a vector), then a (d², )-key aggregate folds the partials.
  The covariance Gram is the exact integer G = n·Σqqᵀ − (Σq)(Σq)ᵀ —
  no centering pass, no float. The driver then runs a FIXED 8 power
  iterations on the 64×64 integer matrix (model-sized state, the
  c70/c74 discipline): v₀ = e_k at the max-variance diagonal
  (lowest-k tie-break), w = G·v exact, rescale v ← (w·10⁶) div
  max|w| in TRUNCATING integer division (DuckDB ``//`` and Spark
  ``DIV`` semantics — mirrored exactly by a sign-split in Python).
  Graded on the full 64-row loading vector joined back onto the
  distributed per-dimension sums, plus the Rayleigh eigenvalue
  estimate and the explained-variance share against trace(G) — one
  different Gram cell or one division anywhere changes the hash.

  Scale shape: the only corpus-sized work is the single Gram scan;
  its exchange is d²-bounded partials (plan-pinned: no vector column
  rides a shuffle, no join), driver state is d² ints, the iteration
  is free. At 100 TB this is exactly how a PCA/whitening stat is
  gathered (per-executor numpy Gram partials merging up a tree);
  beyond ~10⁶ rows the int64 headroom rule is to fold n into the
  Gram (divide partials by a fixed 2^s) — documented here, not
  needed at test scale.

- c81: PCA-PREFILTERED EXACT SEARCH + RECALL — the 1-D projection
  index a scalar-quantizer family degenerates to (and the cheapest
  member of the learned-prefilter ladder c29 hyperplane LSH → c11
  IVF → c81): project every vector onto c79's trained component
  (exact BIGINT dot on the integer grid), keep the {cand} candidates
  closest to the query's projection (|proj − qproj|, vec_id
  tie-break), exact-L2 re-rank the candidates, and grade top-{k}
  alongside the brute-force truth with per-rank hit flags + the
  recall@{k} share (c45's eval shape). Proves the trained component
  is USABLE, not just converged — the same train→deploy→audit arc
  c70→c72 runs for IVF, at projection grain.

  Scale shape: train = c79's one Gram scan; deploy = one pure-map
  projection pass (the component rides as a 64-literal array);
  search = two TakeOrderedAndProject top-k passes (candidates by
  projection distance, truth by exact d²) + an exact re-rank on the
  {cand}-row broadcast candidate set — no corpus join, no cartesian
  (plan-pinned). At 100 TB the projection column is the sort key of
  a range-partitioned layout and the prefilter becomes a range scan.

- c80: PERCEPTUAL-HASH NEAR-DUP OVER OPAQUE PAYLOADS — the multimodal
  family's missing VERB (c15 decodes, p08 samples frames; nothing
  deduplicates payloads): an average-hash (aHash) thumbnail signature
  computed per payload inside the same Arrow-batched ``mapInPandas``
  kernel c15 established (numpy over byte arrays — a real image
  decoder drops in unchanged), then Hamming-radius near-dup via
  multi-index banding (Norouzi, Punjani & Fleet, "Fast Search in
  Hamming Space with Multi-Index Hashing", CVPR 2012: r-near
  neighbors in a B-bit code must agree exactly on ≥1 of B/8 bands).
  The thumbnail is deterministic: the payload's first 32·⌊L/32⌋
  bytes in 32 equal blocks, one integer block-sum each; bit_p = 1
  iff 32·sum_p > total (exact integer cross-multiplication — no
  mean, no division); the 4 aHash bands bucket candidates, and
  pairs verify at Hamming ≤ {r}. Graded on the per-source dup
  topology: candidate pairs, verified pairs, and distinct members.

  Scale shape: signatures are one mapInPandas pass (payloads never
  shuffle — the exchange carries a 32-bit signature per doc); the
  candidate stage is the banded Σ|bucket|² self-join of the LSH
  family (plan-pinned: never cartesian); verification is a pure-map
  popcount on the ≤Σ|bucket|² pair set. The multi-index identity
  makes radius-{r} recall EXACT, not probabilistic — at 100 TB the
  bands are the partition keys and each bucket verifies locally.

- p43: DEDUP-AWARE EPOCH PLAN — joins the near-dup arc's fixpoint to
  the budgeting arc (the step between c49's cluster census and
  p22/p30's budget math that neither runs: what does an epoch COST
  once duplicates collapse?): reuse c49's graded LSH
  connected-components fixpoint (same bands, same pointer-jumping
  supersteps), elect each cluster's min-doc_id representative,
  weight it by the CAPPED cluster size (min(|cluster|, {cap}) — the
  "count duplicates once, upweight at most {cap}×" rule public
  dedup pipelines apply so mega-clusters don't dominate), and roll
  up per source: raw vs surviving docs and tokens, the weighted
  epoch token cost, and the dedup savings share in micro. Attribution
  follows the representative's source (the deterministic min rule —
  a cluster spanning sources is one training document and must be
  counted once, in one place).

  Scale shape: inherits c49's contract wholesale (bucket-bounded
  candidate edges, |docs|-row rep relation per superstep, log-depth
  rounds, driver sees only round control); the plan tail is one
  |docs|-row join (rep → token counts) + a |sources|-key rollup.
  The weight arithmetic is pure integers end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import (
    int_ln_micro_cte_sql,
    lit_int_array,
)
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# c79 — PCA top component by power iteration (integer Gram + fixed point)
# ---------------------------------------------------------------------------

_C79_DIM = 64
_C79_SCALE = 1000  # c54's fixed-point grid: q = floor(x * 1000)
_C79_VSCALE = 1_000_000  # component fixed point (micro units)
_C79_ITERS = 8


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's ``//`` and
    Spark's ``DIV`` semantics, mirrored exactly in Python (whose own
    ``//`` FLOORS, differing on negative numerators)."""
    return -((-a) // b) if a < 0 else a // b


def _c79_partials(qdf: DataFrame) -> DataFrame:
    """Exact integer Gram sufficient statistics of a quantized-vector
    frame (column ``q``), as a (d²+d+1)-row frame: (i, j, v) = Σ qᵢqⱼ
    for i,j ≥ 1; (i, 0, v) = Σ qᵢ; (0, 0, v) = n. The Arrow-batched
    kernel reduces each batch to its own d×d outer-product partials
    with numpy int64 sums — the exchange carries model-sized partial
    rows, never a vector (the sanctioned vectorized-Python surface,
    c15's convention applied to statistics). Integer sums are
    associative, so partials from ANY split of the corpus (Arrow
    batches here, ingest epochs in p44) merge to the same statistics
    by plain addition — the mergeable-sketch property made a graded
    contract by p44's stream/batch parity."""
    import pandas as pd  # local import: only the executors need it

    d = _C79_DIM

    def _partials(batches):
        import numpy as np

        ii = np.repeat(np.arange(1, d + 1), d)
        jj = np.tile(np.arange(1, d + 1), d)
        for pdf in batches:
            m = np.stack(pdf["q"].to_numpy()).astype("int64")
            gram = (m.T @ m).reshape(-1)
            yield pd.DataFrame(
                {
                    "i": np.concatenate((ii, np.arange(1, d + 1), [0])),
                    "j": np.concatenate((jj, np.zeros(d, "int64"), [0])),
                    "v": np.concatenate(
                        (gram, m.sum(axis=0), [m.shape[0]])
                    ),
                }
            )

    part = qdf.select("q").mapInPandas(
        _partials, schema="i int, j int, v long"
    )
    return part.groupBy("i", "j").agg(F.sum("v").alias("v"))


def _c79_stats(spark: SparkSession, sf: str) -> DataFrame:
    """ONE corpus scan → the Gram statistics (see _c79_partials).

    repartition=False: the Arrow kernel reduces each batch to d²
    partial sums map-side, so the pinned plan property is that no
    vector column ever rides an exchange — the scan's own split
    layout is the right parallelism source here."""
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    return _c79_partials(_c54_quantized(spark, sf, repartition=False))


def _c79_stats_cached(spark: SparkSession, sf: str) -> DataFrame:
    return _c79_stats(spark, sf).localCheckpoint(eager=False)


def _c79_gram(stats_rows) -> tuple[dict, list, int]:
    """Collected statistics rows → the exact integer covariance Gram
    G = n·Σqqᵀ − (Σq)(Σq)ᵀ plus the per-dim sums and n."""
    d = _C79_DIM
    ss: dict[tuple[int, int], int] = {}
    s = [0] * (d + 1)
    n = 0
    for r in stats_rows:
        if r["i"] == 0:
            n = int(r["v"])
        elif r["j"] == 0:
            s[r["i"]] = int(r["v"])
        else:
            ss[(r["i"], r["j"])] = int(r["v"])
    g = {
        (i, j): n * ss[(i, j)] - s[i] * s[j]
        for i in range(1, d + 1)
        for j in range(1, d + 1)
    }
    return g, s, n


def _c79_power(g: dict) -> tuple[list, int]:
    """The fixed 8 power iterations on an integer Gram — pure-Python
    exact arithmetic (model-sized driver state, the c70/c74
    discipline): seed e_k at the max diagonal (lowest-k tie),
    w = G·v exact, v ← (w·10⁶) trunc-div max|w|. Returns the final
    loading vector (micro) and the Rayleigh eigenvalue estimate.
    Shared by c79 (top component) and c82 (deflated spectrum)."""
    d, vs = _C79_DIM, _C79_VSCALE
    k0 = max(range(1, d + 1), key=lambda i: (g[(i, i)], -i))
    v = [vs if i == k0 else 0 for i in range(1, d + 1)]
    for _ in range(_C79_ITERS):
        w = [
            sum(g[(i, j)] * v[j - 1] for j in range(1, d + 1))
            for i in range(1, d + 1)
        ]
        m = max(abs(x) for x in w)
        v = [_tdiv(x * vs, m) for x in w]
    w = [
        sum(g[(i, j)] * v[j - 1] for j in range(1, d + 1))
        for i in range(1, d + 1)
    ]
    num = sum(v[i] * w[i] for i in range(d))
    den = sum(x * x for x in v)
    return v, _tdiv(num, den)


def _c79_iterate(stats_rows) -> dict:
    """c79's driver tail: Gram, one power pass, trace + explained."""
    g, s, _ = _c79_gram(stats_rows)
    v, lam = _c79_power(g)
    trace = sum(g[(i, i)] for i in range(1, _C79_DIM + 1))
    return {
        "v": v,
        "lambda": lam,
        "trace": trace,
        "explained": _tdiv(lam * _C79_VSCALE, trace),
        "sums": s,
    }


def _c79_chain() -> str:
    """The shared oracle chain (quantize → Gram → 8 unrolled
    iterations), ending in CTEs ``sv`` (per-dim sums), ``v8`` (the
    loading vector), ``lam``/``tr`` (eigenvalue + trace). Composed by
    c79's and c81's oracles (the compose-never-slice rule). All
    intermediates run in HUGEINT (DuckDB BIGINT multiplication
    overflows LOUDLY, never promotes); ``//`` truncates toward zero,
    matching the Python driver's _tdiv."""
    d, vs = _C79_DIM, _C79_VSCALE
    steps = [
        f"""q AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_C79_SCALE})
              AS BIGINT) AS x
  FROM embeddings, range(1, {d + 1}) t(i)),
nn AS (SELECT count(*) AS n FROM embeddings),
sv AS MATERIALIZED (SELECT i, sum(x) AS s FROM q GROUP BY i),
sp AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, sum(CAST(a.x AS HUGEINT) * b.x) AS ss
  FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i),
g AS MATERIALIZED (
  SELECT sp.i, sp.j,
         CAST((SELECT n FROM nn) AS HUGEINT) * sp.ss
           - CAST(sa.s AS HUGEINT) * sb.s AS gv
  FROM sp JOIN sv sa ON sa.i = sp.i JOIN sv sb ON sb.i = sp.j),
v0 AS (
  SELECT i, CASE WHEN i = (SELECT i FROM g WHERE i = j
                           ORDER BY gv DESC, i LIMIT 1)
                 THEN CAST({vs} AS HUGEINT) ELSE 0 END AS x
  FROM range(1, {d + 1}) t(i))"""
    ]
    for t in range(1, _C79_ITERS + 1):
        steps.append(
            f"""w{t} AS MATERIALIZED (
  SELECT g.i, sum(g.gv * v.x) AS w
  FROM g JOIN v{t - 1} v ON v.i = g.j GROUP BY g.i),
m{t} AS (SELECT max(abs(w)) AS m FROM w{t}),
v{t} AS MATERIALIZED (
  SELECT i, (w * {vs}) // (SELECT m FROM m{t}) AS x FROM w{t})"""
        )
    steps.append(
        f"""wf AS (
  SELECT g.i, sum(g.gv * v.x) AS w
  FROM g JOIN v{_C79_ITERS} v ON v.i = g.j GROUP BY g.i),
ray AS (SELECT sum(v.x * wf.w) AS num, sum(v.x * v.x) AS den
        FROM v{_C79_ITERS} v JOIN wf ON wf.i = v.i),
tr AS (SELECT sum(gv) AS t FROM g WHERE i = j),
lam AS (SELECT num // den AS l FROM ray)"""
    )
    return ",\n".join(steps)


def _c79_oracle() -> str:
    return f"""
WITH {_c79_chain()}
SELECT sv.i AS dim, CAST(sv.s AS BIGINT) AS sum_q,
       CAST(v.x AS BIGINT) AS loading_micro,
       CAST((SELECT l FROM lam) AS BIGINT) AS lambda_est,
       CAST((SELECT (l * {_C79_VSCALE}) // (SELECT t FROM tr) FROM lam)
            AS BIGINT) AS explained_micro
FROM sv JOIN v{_C79_ITERS} v ON v.i = sv.i
ORDER BY dim
"""


@query("c79_pca_power_iteration", oracle=_c79_oracle())
def c79_pca_power_iteration(spark: SparkSession, sf: str) -> DataFrame:
    """C79: PCA TOP COMPONENT — the corpus statistic every
    embedding-pipeline audit gathers before whitening, energy
    thresholds, or dimensionality decisions (power iteration is the
    textbook member of the randomized-sketch family of Halko,
    Martinsson & Tropp, SIAM Rev. 2011). Distributed work is ONE
    corpus scan producing exact integer Gram sufficient statistics on
    c54's fixed-point grid (an Arrow-batched mapInPandas kernel emits
    d² partial sums per batch — model-sized rows, never a vector);
    the covariance Gram G = n·Σqqᵀ − (Σq)(Σq)ᵀ needs no centering
    pass and no float. The driver runs a FIXED 8 power
    iterations on the 64×64 integer matrix: v₀ = e_k at the
    max-variance diagonal (lowest-k tie-break), w = G·v exact,
    v ← (w·10⁶) trunc-div max|w| — every step mirrored by the
    oracle's unrolled CTEs in HUGEINT, so one different Gram cell or
    one division anywhere changes the hash. Graded on the 64-row
    loading vector joined back onto the DISTRIBUTED per-dim sums,
    plus the Rayleigh eigenvalue estimate and its explained-variance
    share of trace(G).

    Scale shape: the only corpus-sized work is the single Gram scan;
    its exchange is d²-bounded partials per batch (plan-pinned: no
    vector rides a shuffle, no corpus join), driver state is d² ints,
    the iteration is free. At 100 TB this is exactly how PCA stats
    are gathered (per-executor numpy Gram partials merging up the
    aggregate tree). Int64 headroom: n·Σqq at |q| ≤ 1000 holds to
    ~10⁶ rows; past that, fold a fixed 2^s down-shift into the
    partials (documented, not needed at test scale)."""
    return _c79_report(spark, _c79_stats_cached(spark, sf))


def _c79_report(spark: SparkSession, stats: DataFrame) -> DataFrame:
    """The graded tail from a Gram-statistics frame: driver iteration
    + the 64-row output join. Shared by c79 (one-scan batch stats)
    and p44 (epoch-merged streaming stats): identical arithmetic on
    identical statistics IS the parity proof (p40/p42's convention)."""
    res = _c79_iterate(stats.collect())  # d²+d+1 rows — model-sized
    comp = spark.createDataFrame(
        [(i + 1, res["v"][i]) for i in range(_C79_DIM)],
        "dim INT, loading_micro BIGINT",
    )
    sums = stats.filter((F.col("i") > 0) & (F.col("j") == 0)).select(
        F.col("i").alias("dim"), F.col("v").alias("sum_q")
    )
    return (
        sums.join(F.broadcast(comp), "dim")
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.col("sum_q").cast("bigint").alias("sum_q"),
            "loading_micro",
            F.lit(res["lambda"]).cast("bigint").alias("lambda_est"),
            F.lit(res["explained"]).cast("bigint").alias(
                "explained_micro"
            ),
        )
        .orderBy("dim")
    )

# ---------------------------------------------------------------------------
# c82 — PCA energy spectrum: top components by integer Hotelling deflation
# ---------------------------------------------------------------------------

_C82_COMPS = 3  # spectrum depth (components 1..3)


def _c82_iter_sql(gname: str, pfx: str) -> str:
    """The 8-iteration power chain over gram CTE ``gname``, producing
    ``{pfx}8`` (loading), ``lam_{pfx}`` (Rayleigh estimate) — the
    generic form of _c79_chain's v0..v8/lam block, reused per
    deflated component."""
    d, vs = _C79_DIM, _C79_VSCALE
    steps = [
        f"""{pfx}0 AS (
  SELECT i, CASE WHEN i = (SELECT i FROM {gname} WHERE i = j
                           ORDER BY gv DESC, i LIMIT 1)
                 THEN CAST({vs} AS HUGEINT) ELSE 0 END AS x
  FROM range(1, {d + 1}) t(i))"""
    ]
    for t in range(1, _C79_ITERS + 1):
        steps.append(
            f"""w{pfx}{t} AS MATERIALIZED (
  SELECT g.i, sum(g.gv * v.x) AS w
  FROM {gname} g JOIN {pfx}{t - 1} v ON v.i = g.j GROUP BY g.i),
m{pfx}{t} AS (SELECT max(abs(w)) AS m FROM w{pfx}{t}),
{pfx}{t} AS MATERIALIZED (
  SELECT i, (w * {vs}) // (SELECT m FROM m{pfx}{t}) AS x
  FROM w{pfx}{t})"""
        )
    steps.append(
        f"""wf_{pfx} AS (
  SELECT g.i, sum(g.gv * v.x) AS w
  FROM {gname} g JOIN {pfx}{_C79_ITERS} v ON v.i = g.j GROUP BY g.i),
lam_{pfx} AS (
  SELECT sum(v.x * wf.w) // sum(v.x * v.x) AS l
  FROM {pfx}{_C79_ITERS} v JOIN wf_{pfx} wf ON wf.i = v.i)"""
    )
    return ",\n".join(steps)


def _c82_deflate_sql(gname: str, pfx: str, out: str) -> str:
    """Integer Hotelling deflation: G' = G − (λ̂·uuᵀ) trunc-div uᵀu
    with the ESTIMATED pair (u = {pfx}8, λ̂ = lam_{pfx}) — the exact
    arithmetic both engines replicate bit-for-bit."""
    return f"""uu_{pfx} AS (SELECT sum(x * x) AS d FROM {pfx}{_C79_ITERS}),
{out} AS MATERIALIZED (
  SELECT g.i, g.j,
         g.gv - ((SELECT l FROM lam_{pfx}) * a.x * b.x)
                // (SELECT d FROM uu_{pfx}) AS gv
  FROM {gname} g
  JOIN {pfx}{_C79_ITERS} a ON a.i = g.i
  JOIN {pfx}{_C79_ITERS} b ON b.i = g.j)"""


def _c82_oracle() -> str:
    vs = _C79_VSCALE
    it = _C79_ITERS
    # component 1 rides c79's chain verbatim (v0..v8, lam, tr);
    # components 2..k deflate and re-run the generic block
    parts = [_c79_chain()]
    prev_pfx, prev_g = "v", "g"
    sel = [
        f"""SELECT CAST(1 AS BIGINT) AS component, sv.i AS dim,
       CAST(v.x AS BIGINT) AS loading_micro,
       CAST((SELECT l FROM lam) AS BIGINT) AS lambda_est,
       CAST((SELECT (l * {vs}) // (SELECT t FROM tr) FROM lam)
            AS BIGINT) AS cum_explained_micro
FROM sv JOIN v{it} v ON v.i = sv.i"""
    ]
    cums = ["(SELECT l FROM lam)"]
    for k in range(2, _C82_COMPS + 1):
        pfx, gname = f"u{k}_", f"g{k}"
        if k == 2:  # component 1's chain names its pair lam/v8
            parts.append(
                f"""uu_v AS (SELECT sum(x * x) AS d FROM v{it}),
g2 AS MATERIALIZED (
  SELECT g.i, g.j,
         g.gv - ((SELECT l FROM lam) * a.x * b.x) // (SELECT d FROM uu_v)
           AS gv
  FROM g JOIN v{it} a ON a.i = g.i JOIN v{it} b ON b.i = g.j)"""
            )
        else:
            parts.append(_c82_deflate_sql(prev_g, prev_pfx, gname))
        parts.append(_c82_iter_sql(gname, pfx))
        cums.append(f"(SELECT l FROM lam_{pfx})")
        cum = " + ".join(cums)
        sel.append(
            f"""SELECT {k}, sv.i,
       CAST(v.x AS BIGINT),
       CAST((SELECT l FROM lam_{pfx}) AS BIGINT),
       CAST((({cum}) * {vs}) // (SELECT t FROM tr) AS BIGINT)
FROM sv JOIN {pfx}{it} v ON v.i = sv.i"""
        )
        prev_pfx, prev_g = pfx, gname
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(sel)
        + "\nORDER BY component, dim"
    )


@query("c82_pca_energy_spectrum", oracle=_c82_oracle())
def c82_pca_energy_spectrum(spark: SparkSession, sf: str) -> DataFrame:
    """C82: PCA ENERGY SPECTRUM — the top-3 components by integer
    Hotelling deflation, extending c79 from "the" direction to the
    spectrum an embedding-pipeline owner actually decides with (how
    many dimensions carry the corpus's energy — the input to
    Matryoshka truncation depth (c47), PQ subspace allocation (c74),
    and whitening): after each power pass, the Gram deflates by the
    ESTIMATED pair — G' = G − (λ̂·uuᵀ) trunc-div (uᵀu) — in exact
    integer arithmetic (λ̂·uᵢuⱼ ≤ 10¹² λ̂ holds inside HUGEINT/python
    int; one trunc-div per cell, mirrored by the oracle bit-for-bit),
    then the identical 8-iteration power pass re-runs on the deflated
    matrix (shared _c79_power — the c70/c74 superstep discipline,
    here entirely driver-side on d² ints). Graded on the full
    3×64-row loading spectrum + per-component Rayleigh estimates +
    CUMULATIVE explained share of trace(G): one different Gram cell,
    division, or deflation anywhere changes the hash. Estimated-pair
    deflation (not exact-eigen) is deliberate: it is what finite
    iteration gives ANY engine, and both sides replicate it exactly —
    the spectral error is bounded by the component-1 residual and the
    audit's decisions (energy thresholds) are insensitive to it.

    Scale shape: identical to c79 — the ONE Gram scan is the only
    corpus-sized work (d²-bounded mapInPandas partials, no vector on
    any exchange); the whole spectrum (deflations + 2 more power
    passes) is driver arithmetic on d² ints, free at any corpus
    size. At 100 TB the spectrum costs exactly what c79 costs."""
    stats = _c79_stats_cached(spark, sf)
    g, _, _ = _c79_gram(stats.collect())  # model-sized collect
    d, vs = _C79_DIM, _C79_VSCALE
    trace = sum(g[(i, i)] for i in range(1, d + 1))
    rows = []
    cum = 0
    for comp in range(1, _C82_COMPS + 1):
        v, lam = _c79_power(g)
        cum += lam
        rows.extend(
            (comp, i + 1, v[i], lam, _tdiv(cum * vs, trace))
            for i in range(d)
        )
        if comp < _C82_COMPS:
            den = sum(x * x for x in v)
            g = {
                (i, j): g[(i, j)]
                - _tdiv(lam * v[i - 1] * v[j - 1], den)
                for i in range(1, d + 1)
                for j in range(1, d + 1)
            }
    spec = spark.createDataFrame(
        rows,
        "component BIGINT, dim BIGINT, loading_micro BIGINT,"
        " lambda_est BIGINT, cum_explained_micro BIGINT",
    )
    # tie the graded frame to the distributed lineage exactly as c79
    # does: the 64-row dim axis joins back onto the Gram-scan sums
    sums = stats.filter((F.col("i") > 0) & (F.col("j") == 0)).select(
        F.col("i").cast("bigint").alias("dim")
    )
    return (
        sums.join(F.broadcast(spec), "dim")
        .select(
            "component", "dim", "loading_micro", "lambda_est",
            "cum_explained_micro",
        )
        .orderBy("component", "dim")
    )


# ---------------------------------------------------------------------------
# p48 — gate attribution report (which filter earns its keep)
# ---------------------------------------------------------------------------


def _p48_oracle() -> str:
    from iceberg_playground_spark.queries.round9c import (
        _P29_ML_HI10,
        _P29_ML_LO10,
        _P29_STOP_MIN,
        _P29_WC_HI,
        _P29_WC_LO,
    )

    return f"""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
g AS (SELECT doc_id, count(*) AS n_words,
             sum(length(token)) AS sum_len,
             sum(CASE WHEN token IN ('a', 'the') THEN 1 ELSE 0 END)
               AS n_stop
      FROM t WHERE token <> '' GROUP BY doc_id),
fl AS (SELECT doc_id,
              NOT (n_words BETWEEN {_P29_WC_LO} AND {_P29_WC_HI}) AS r1,
              NOT ({_P29_ML_LO10} * n_words <= 10 * sum_len
                   AND 10 * sum_len <= {_P29_ML_HI10} * n_words) AS r2,
              NOT (n_stop >= {_P29_STOP_MIN}) AS r3
       FROM g),
x AS (SELECT count(*) AS n_docs,
             sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS j1,
             sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS j2,
             sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS j3,
             sum(CASE WHEN r1 AND NOT r2 AND NOT r3 THEN 1 ELSE 0 END)
               AS u1,
             sum(CASE WHEN r2 AND NOT r1 AND NOT r3 THEN 1 ELSE 0 END)
               AS u2,
             sum(CASE WHEN r3 AND NOT r1 AND NOT r2 THEN 1 ELSE 0 END)
               AS u3,
             sum(CASE WHEN NOT (r1 OR r2 OR r3) THEN 1 ELSE 0 END)
               AS passed
      FROM fl)
SELECT 'g1_wordcount' AS gate, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(j1 AS BIGINT) AS n_reject,
       CAST(u1 AS BIGINT) AS n_unique_reject,
       CAST(CASE WHEN j1 = 0 THEN 0
                 ELSE (u1 * 1000000) // j1 END AS BIGINT)
         AS unique_share_micro,
       CAST(passed AS BIGINT) AS n_pass_all
FROM x
UNION ALL
SELECT 'g2_meanlen', CAST(n_docs AS BIGINT), CAST(j2 AS BIGINT),
       CAST(u2 AS BIGINT),
       CAST(CASE WHEN j2 = 0 THEN 0
                 ELSE (u2 * 1000000) // j2 END AS BIGINT),
       CAST(passed AS BIGINT)
FROM x
UNION ALL
SELECT 'g3_stopword', CAST(n_docs AS BIGINT), CAST(j3 AS BIGINT),
       CAST(u3 AS BIGINT),
       CAST(CASE WHEN j3 = 0 THEN 0
                 ELSE (u3 * 1000000) // j3 END AS BIGINT),
       CAST(passed AS BIGINT)
FROM x
ORDER BY gate
"""


@query("p48_gate_attribution", oracle=_p48_oracle())
def p48_gate_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """P48: GATE ATTRIBUTION REPORT — three of p29's Gopher sub-gates
    decomposed into a portfolio view, answering the question p47's
    rank-correlation raises (two agreeing signals might be one gate
    twice): per sub-gate — rejects, UNIQUE rejects (documents ONLY
    that gate catches: its marginal value; a gate with zero unique
    catches is free to drop), the unique share, and the common
    pass-all count. This is how a filter-stack owner prunes gates
    before paying their cost at 100 TB — the FineWeb-style ablation
    at the cheap counting level. All columns are exact integer
    counts with one DIV each at the output boundary; the gate
    thresholds are p29's own constants imported, so this report can
    never drift from the production gate it audits.

    Scale shape: ONE tokenize → per-doc aggregate (p29's two-level
    shape, map-side partials), one |docs|-row flag projection, one
    global 8-sum rollup; the 3-row output pivots a single scalar row
    (no join, no window over corpus rows)."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.round9c import (
        _P29_ML_HI10,
        _P29_ML_LO10,
        _P29_STOP_MIN,
        _P29_WC_HI,
        _P29_WC_LO,
    )

    g = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("token")).alias("sum_len"),
            F.sum(
                F.col("token").isin("a", "the").cast("long")
            ).alias("n_stop"),
        )
    )
    fl = g.select(
        (~F.col("n_words").between(_P29_WC_LO, _P29_WC_HI)).alias("r1"),
        (
            ~(
                (F.lit(_P29_ML_LO10) * F.col("n_words")
                 <= 10 * F.col("sum_len"))
                & (10 * F.col("sum_len")
                   <= F.lit(_P29_ML_HI10) * F.col("n_words"))
            )
        ).alias("r2"),
        (~(F.col("n_stop") >= _P29_STOP_MIN)).alias("r3"),
    )
    x = fl.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("r1").cast("long")).alias("j1"),
        F.sum(F.col("r2").cast("long")).alias("j2"),
        F.sum(F.col("r3").cast("long")).alias("j3"),
        F.sum(
            (F.col("r1") & ~F.col("r2") & ~F.col("r3")).cast("long")
        ).alias("u1"),
        F.sum(
            (F.col("r2") & ~F.col("r1") & ~F.col("r3")).cast("long")
        ).alias("u2"),
        F.sum(
            (F.col("r3") & ~F.col("r1") & ~F.col("r2")).cast("long")
        ).alias("u3"),
        F.sum(
            (~(F.col("r1") | F.col("r2") | F.col("r3"))).cast("long")
        ).alias("passed"),
    ).localCheckpoint(eager=False)  # one corpus pass serves all 3 rows
    share = lambda u, j: (  # noqa: E731
        F.when(F.col(j) == 0, F.lit(0))
        .otherwise(F.expr(f"{u} * 1000000 DIV {j}"))
        .cast("bigint")
    )
    row = lambda name, j, u: x.select(  # noqa: E731
        F.lit(name).alias("gate"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col(j).cast("bigint").alias("n_reject"),
        F.col(u).cast("bigint").alias("n_unique_reject"),
        share(u, j).alias("unique_share_micro"),
        F.col("passed").cast("bigint").alias("n_pass_all"),
    )
    return (
        row("g1_wordcount", "j1", "u1")
        .unionByName(row("g2_meanlen", "j2", "u2"))
        .unionByName(row("g3_stopword", "j3", "u3"))
        .orderBy("gate")
    )


# ---------------------------------------------------------------------------
# p47 — quality-signal agreement audit (exact Kendall tau, bounded sample)
# ---------------------------------------------------------------------------

_P47_SAMPLE = 50  # audit sample (pairs = 50·49/2 = 1225, bounded)

_P47_ORACLE = f"""
WITH s AS MATERIALIZED (
  SELECT doc_id,
         (sum(length(t)) * 1000) // count(*) AS s1,
         (count(DISTINCT t) * 1000000) // count(*) AS s2
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE doc_id < {_P47_SAMPLE})
  WHERE t <> '' GROUP BY doc_id),
p AS (SELECT (a.s1 - b.s1) * (a.s2 - b.s2) AS prod
      FROM s a JOIN s b ON a.doc_id < b.doc_id),
agg AS (SELECT count(*) AS n_pairs,
               sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS conc,
               sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS disc,
               sum(CASE WHEN prod = 0 THEN 1 ELSE 0 END) AS ties
        FROM p)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_docs,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(conc AS BIGINT) AS concordant,
       CAST(disc AS BIGINT) AS discordant,
       CAST(ties AS BIGINT) AS ties,
       CAST(((conc - disc) * 1000000) // n_pairs AS BIGINT) AS tau_micro
FROM agg
"""


@query("p47_signal_agreement_audit", oracle=_P47_ORACLE)
def p47_signal_agreement_audit(spark: SparkSession, sf: str) -> DataFrame:
    """P47: QUALITY-SIGNAL AGREEMENT AUDIT — exact Kendall rank
    correlation (Kendall 1938) between two per-document quality
    signals on a bounded audit sample: the sanity check a filter-
    stack owner runs before composing gates (p29 + c65 + c86 + ...)
    — two signals that rank documents identically are one gate twice
    (redundant cost), two that anti-correlate are fighting each
    other, and the stack's designer needs the NUMBER. Signals here:
    mean word length (milli) vs type-token ratio (micro) — the
    length-vs-diversity axes every heuristic stack mixes. Tau is the
    exact concordant-minus-discordant count over all sample pairs
    divided once at the boundary; the sign product (s1ᵢ−s1ⱼ)(s2ᵢ−s2ⱼ)
    is exact integer arithmetic, so every pair's verdict — and the
    tau — can never drift between engines.

    Scale shape: the per-doc signals are one tokenize + one
    (doc, term) aggregate over the SAMPLE only (pushed-down doc_id
    predicate); the pair stage is the bounded {n}·({n}−1)/2 self-join
    of a {n}-row frame (the sanctioned eval-arm shape — rank
    correlation is quadratic in the SAMPLE by definition, which is
    why audits sample; at 100 TB the sample is still 50 rows)."""
    from iceberg_playground_spark.queries._util import load

    s = (
        load(spark, sf, "documents")
        .filter(F.col("doc_id") < _P47_SAMPLE)
        .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("doc_id")
        .agg(
            F.expr("sum(length(t)) * 1000 DIV count(*)").alias("s1"),
            F.expr("count(DISTINCT t) * 1000000 DIV count(*)").alias(
                "s2"
            ),
        )
        .localCheckpoint(eager=False)  # both pair-join sides + census
    )
    a = s.select(
        F.col("doc_id").alias("da"),
        F.col("s1").alias("a1"),
        F.col("s2").alias("a2"),
    )
    b = s.select(
        F.col("doc_id").alias("db"),
        F.col("s1").alias("b1"),
        F.col("s2").alias("b2"),
    )
    prod = (
        a.join(b, F.col("da") < F.col("db"))
        .select(
            ((F.col("a1") - F.col("b1")) * (F.col("a2") - F.col("b2")))
            .alias("prod")
        )
    )
    n_docs = s.count()  # bounded: the 50-row sample
    return prod.agg(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum((F.col("prod") > 0).cast("bigint"))
        .cast("bigint")
        .alias("concordant"),
        F.sum((F.col("prod") < 0).cast("bigint"))
        .cast("bigint")
        .alias("discordant"),
        F.sum((F.col("prod") == 0).cast("bigint"))
        .cast("bigint")
        .alias("ties"),
    ).withColumn(
        "tau_micro",
        F.expr(
            "(concordant - discordant) * 1000000 DIV n_pairs"
        ).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# c88 — PCA component stability audit (half-vs-full corpus, exact cos²)
# ---------------------------------------------------------------------------


def _c88_gram_sql(pred: str, pfx: str) -> str:
    """A prefix-named copy of the quantize→Gram block over
    ``embeddings WHERE {pred}`` — feeds _c82_iter_sql's generic
    iteration chain, so the audit's two arms run the identical
    machinery c79/c82 grade."""
    d = _C79_DIM
    return f"""q{pfx} AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_C79_SCALE})
              AS BIGINT) AS x
  FROM embeddings, range(1, {d + 1}) t(i) WHERE {pred}),
nn{pfx} AS (SELECT count(*) AS n FROM embeddings WHERE {pred}),
sv{pfx} AS MATERIALIZED (SELECT i, sum(x) AS s FROM q{pfx} GROUP BY i),
sp{pfx} AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, sum(CAST(a.x AS HUGEINT) * b.x) AS ss
  FROM q{pfx} a JOIN q{pfx} b USING (vec_id) GROUP BY a.i, b.i),
g{pfx} AS MATERIALIZED (
  SELECT sp.i, sp.j,
         CAST((SELECT n FROM nn{pfx}) AS HUGEINT) * sp.ss
           - CAST(sa.s AS HUGEINT) * sb.s AS gv
  FROM sp{pfx} sp JOIN sv{pfx} sa ON sa.i = sp.i
  JOIN sv{pfx} sb ON sb.i = sp.j)"""


def _c88_oracle() -> str:
    it = _C79_ITERS
    vs = _C79_VSCALE
    return f"""
WITH {_c88_gram_sql("1 = 1", "F")},
{_c88_gram_sql("vec_id * 2 < (SELECT count(*) FROM embeddings)", "H")},
{_c82_iter_sql("gF", "vF_")},
{_c82_iter_sql("gH", "vH_")},
st AS (SELECT sum(CAST(h.x AS HUGEINT) * f.x) AS dot,
              sum(CAST(h.x AS HUGEINT) * h.x) AS n1,
              sum(CAST(f.x AS HUGEINT) * f.x) AS n2
       FROM vH_{it} h JOIN vF_{it} f ON f.i = h.i)
SELECT CAST(h.i AS BIGINT) AS dim,
       CAST(h.x AS BIGINT) AS loading_half_micro,
       CAST(f.x AS BIGINT) AS loading_full_micro,
       CAST((SELECT l FROM lam_vH_) AS BIGINT) AS lambda_half,
       CAST((SELECT l FROM lam_vF_) AS BIGINT) AS lambda_full,
       CAST((SELECT (dot * dot * {vs}) // (n1 * n2) FROM st)
            AS BIGINT) AS cos2_micro
FROM vH_{it} h JOIN vF_{it} f ON f.i = h.i
ORDER BY dim
"""


@query("c88_component_stability", oracle=_c88_oracle())
def c88_component_stability(spark: SparkSession, sf: str) -> DataFrame:
    """C88: PCA COMPONENT STABILITY AUDIT — the resampling check an
    embedding owner runs before TRUSTING c79's component (the p38
    question asked of the statistics family: is the learned artifact
    an artifact of the corpus or of the sample?): train the identical
    power iteration on the FIRST HALF of the corpus and on the whole,
    and grade both loading vectors side by side with their Rayleigh
    estimates and the squared cosine between them — cos² in EXACT
    integer micro ((Σ v_h·v_f)²·10⁶ trunc-div (‖v_h‖²·‖v_f‖²): no
    square root ever materializes, the c85 cross-multiplication
    discipline). Low cos² = the "top direction" is sampling noise
    (this near-isotropic synthetic corpus sits exactly there — the
    eigengap is tiny, so the half-corpus direction genuinely swings;
    itself the finding the audit exists to surface); cos² ≈ 1 = the
    component is a stable corpus property safe to deploy (c81) and
    monitor (p44).

    Scale shape: exactly two Gram scans (the half-arm scans less),
    each c79's d²-bounded mapInPandas aggregate; both iterations and
    the cos² arithmetic are driver work on model-sized ints. At
    100 TB the audit costs two c79 runs — and the half-arm partials
    could come free from p44's epoch state, which is the point of
    proving mergeability first."""
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    qdf = _c54_quantized(spark, sf)
    # one scalar; parameterizes the half-arm filter (round9b's
    # bounded-collect rule — the Gram folds below are driver-side
    # model math anyway)
    n = qdf.count()
    full = _c79_stats_cached(spark, sf)
    half = (
        _c79_partials(qdf.filter(F.col("vec_id") * 2 < n))
        .localCheckpoint(eager=False)
    )
    gf, _, _ = _c79_gram(full.collect())
    gh, _, _ = _c79_gram(half.collect())
    vf, lf = _c79_power(gf)
    vh, lh = _c79_power(gh)
    dot = sum(a * b for a, b in zip(vh, vf))
    n1 = sum(x * x for x in vh)
    n2 = sum(x * x for x in vf)
    cos2 = _tdiv(dot * dot * _C79_VSCALE, n1 * n2)
    comp = spark.createDataFrame(
        [
            (i + 1, vh[i], vf[i], lh, lf, cos2)
            for i in range(_C79_DIM)
        ],
        "dim BIGINT, loading_half_micro BIGINT,"
        " loading_full_micro BIGINT, lambda_half BIGINT,"
        " lambda_full BIGINT, cos2_micro BIGINT",
    )
    # tie to the distributed lineage (c79's rule): the dim axis joins
    # back onto the full-corpus Gram scan's sums slice
    dims = full.filter((F.col("i") > 0) & (F.col("j") == 0)).select(
        F.col("i").cast("bigint").alias("dim")
    )
    return dims.join(F.broadcast(comp), "dim").orderBy("dim")


# ---------------------------------------------------------------------------
# p44 — streaming Gram merge (c79 as continuous ingest; parity proof)
# ---------------------------------------------------------------------------

_P44_EPOCHS = 4


@query("p44_streaming_gram_merge", oracle=_c79_oracle())
def p44_streaming_gram_merge(spark: SparkSession, sf: str) -> DataFrame:
    """P44: c79's PCA statistics as CONTINUOUS ingest — the proof of
    c79's scale claim that Gram partials are MERGEABLE state (p38's
    convention applied to the statistics family): vectors arrive as
    {E} vec_id-quartile micro-batches (availableNow); each batch runs
    the SAME Arrow-batched Gram kernel (_c79_partials — no batch ever
    sees another batch's data) and appends its (i, j, partial-sum)
    rows to a state table; the final pass merges the ≤ epochs·(d²+d+1)
    partial rows by plain addition and runs the identical driver
    iteration. Integer sums are associative, so the drained result is
    hash-IDENTICAL to batch c79 REGARDLESS of arrival order — the
    oracle IS c79's oracle, and tests additionally pin row-for-row
    parity against the batch op. This is how a 100 TB embedding store
    maintains its PCA/whitening statistics: each ingest epoch pays
    |batch|, the component re-derives from d² ints of state, and the
    corpus is never rescanned.

    Scale shape: per-epoch work is one mapInPandas pass over the
    batch + a (d²)-key aggregate; cross-batch state is d²-bounded
    integer rows per epoch however large the corpus; the final merge
    aggregates epochs·d² rows. Corpus vectors never cross an epoch
    boundary."""
    import os
    import shutil

    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.queries.streaming import _scratch

    e = load(spark, sf, "embeddings").select("vec_id", "embedding")

    def build(tmp: str) -> str:
        n = e.count()  # only the cold build pays the scan
        src = os.path.join(tmp, "incoming")
        os.makedirs(src, exist_ok=True)
        for i in range(_P44_EPOCHS):
            part_dir = os.path.join(tmp, f"stage_{i}")
            (
                e.filter(
                    F.floor(F.col("vec_id") * _P44_EPOCHS / F.lit(n)) == i
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(part_dir)
            )
            part = next(
                f
                for f in os.listdir(part_dir)
                if f.endswith(".parquet") and f.startswith("part-")
            )
            shutil.copyfile(
                os.path.join(part_dir, part),
                os.path.join(src, f"arrival_{i}.parquet"),
            )
        return src

    src = _built(spark, sf, "p44", build)
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    work = _scratch("ips_stream_gram_")
    state = os.path.join(work, "state")
    try:

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            qb = batch_df.select(
                F.transform(
                    "embedding",
                    lambda x: F.floor(x.cast("double") * _C79_SCALE)
                    .cast("bigint"),
                ).alias("q")
            )
            # the SAME kernel as batch c79: the partials this epoch
            # appends are exactly the rows its batches would have
            # contributed to the one-scan aggregate
            _c79_partials(qb).write.mode("append").parquet(state)

        q = (
            stream.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", _scratch("ips_stream_gramck_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        merged = (
            spark.read.parquet(state)
            .groupBy("i", "j")
            .agg(F.sum("v").alias("v"))
        )
        # SIZE GUARD: d²+d+1 rows, collected because the scratch state
        # dir is deleted in finally (p18's literal-result rule)
        rows = [(int(r["i"]), int(r["j"]), int(r["v"])) for r in merged.collect()]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    stats = spark.createDataFrame(rows, "i int, j int, v long")
    return _c79_report(spark, stats)


# ---------------------------------------------------------------------------
# c81 — PCA-prefiltered exact search + recall (c79 deployed, c45's eval)
# ---------------------------------------------------------------------------

_C81_CAND = 100  # projection-window candidate budget
_C81_K = 10  # graded top-k


def _c81_oracle() -> str:
    it = _C79_ITERS
    return f"""
WITH {_c79_chain()},
pj AS MATERIALIZED (
  SELECT q.vec_id, sum(CAST(q.x AS HUGEINT) * v.x) AS p
  FROM q JOIN v{it} v ON v.i = q.i GROUP BY q.vec_id),
qp AS (SELECT p FROM pj WHERE vec_id = 0),
cand AS (SELECT vec_id FROM pj WHERE vec_id <> 0
         ORDER BY abs(p - (SELECT p FROM qp)), vec_id
         LIMIT {_C81_CAND}),
q0 AS (SELECT i, x FROM q WHERE vec_id = 0),
dall AS MATERIALIZED (
  SELECT q.vec_id, sum((q.x - q0.x) * (q.x - q0.x)) AS d2
  FROM q JOIN q0 USING (i) WHERE q.vec_id <> 0 GROUP BY q.vec_id),
atop AS (SELECT d.vec_id FROM dall d JOIN cand c USING (vec_id)
         ORDER BY d.d2, d.vec_id LIMIT {_C81_K}),
ttop AS (SELECT vec_id, d2,
                row_number() OVER (ORDER BY d2, vec_id) AS rn
         FROM dall ORDER BY d2, vec_id LIMIT {_C81_K}),
rc AS (SELECT count(*) AS h FROM ttop t JOIN atop a USING (vec_id))
SELECT CAST(t.rn AS BIGINT) AS rank, CAST(t.vec_id AS BIGINT) AS vec_id,
       CAST(t.d2 AS BIGINT) AS exact_d2,
       a.vec_id IS NOT NULL AS found,
       CAST((SELECT h FROM rc) * {1_000_000 // _C81_K} AS BIGINT)
         AS recall_micro
FROM ttop t LEFT JOIN atop a USING (vec_id)
ORDER BY rank
"""


@query("c81_pca_prefilter_recall", oracle=_c81_oracle())
def c81_pca_prefilter_recall(spark: SparkSession, sf: str) -> DataFrame:
    """C81: PCA-PREFILTERED EXACT SEARCH + RECALL — c79's trained
    component DEPLOYED as a 1-D projection index and audited with
    c45's eval shape, completing the train → deploy → audit arc for
    the PCA family exactly as c70 → c72 runs it for IVF: every
    vector projects onto the component (exact BIGINT dot on the
    integer grid), the {cand} candidates nearest the query's
    projection (|p − p₀|, vec_id tie-break) are exact-L2 re-ranked,
    and the graded frame is the TRUE top-{k} with per-rank found
    flags + the recall@{k} share — the number that says whether a
    1-D learned prefilter is usable on this corpus or the full IVF
    is required. Query = vector 0 (c78's convention).

    Scale shape: train = c79's one Gram scan (model-sized exchange);
    deploy = one pure-map projection pass (the component rides as 64
    literals); both the candidate pick and the truth arm end in
    TakeOrderedAndProject top-k passes; the re-rank touches only the
    {cand}-row candidate frame and the found-join touches two
    {k}-row frames (plan-pinned: no sort-merge, no cartesian). At
    100 TB the projection column becomes the sort key of a
    range-partitioned layout and the prefilter a range scan — this
    op measures whether that layout would pay."""
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    stats = _c79_stats_cached(spark, sf)
    res = _c79_iterate(stats.collect())  # model-sized (d²+d+1 rows)
    vlit = lit_int_array(res["v"])
    qdf = _c54_quantized(spark, sf).localCheckpoint(
        eager=False
    )  # projection arm + truth arm
    zero = F.lit(0).cast("long")
    proj = qdf.select(
        "vec_id",
        "q",
        F.aggregate(
            F.zip_with("q", vlit, lambda x, y: x * y),
            zero,
            lambda a, x: a + x,
        ).alias("p"),
    ).localCheckpoint(eager=False)  # 1-row query read + candidates
    q0row = proj.filter(F.col("vec_id") == 0).select("q", "p").collect()[
        0
    ]  # bounded: the query vector
    q0lit = lit_int_array(q0row["q"])
    d2 = F.aggregate(
        F.zip_with("q", q0lit, lambda x, y: (x - y) * (x - y)),
        zero,
        lambda a, x: a + x,
    )
    cand = (
        proj.filter(F.col("vec_id") != 0)
        .orderBy(F.abs(F.col("p") - F.lit(int(q0row["p"]))), "vec_id")
        .limit(_C81_CAND)
    )
    atop = (
        cand.select("vec_id", d2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(_C81_K)
        .select("vec_id", F.lit(True).alias("in_approx"))
    )
    truth = (
        qdf.filter(F.col("vec_id") != 0)
        .select("vec_id", d2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(_C81_K)
        .withColumn("rank", F.row_number().over(W.orderBy("d2", "vec_id")))
    )
    out = truth.join(F.broadcast(atop), "vec_id", "left").select(
        F.col("rank").cast("bigint").alias("rank"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("d2").cast("bigint").alias("exact_d2"),
        F.coalesce("in_approx", F.lit(False)).alias("found"),
    )
    recall = (
        F.sum(F.col("found").cast("long")).over(
            W.partitionBy(F.lit(1))
        )
        * (1_000_000 // _C81_K)
    ).cast("bigint")
    return out.withColumn("recall_micro", recall).orderBy("rank")


# ---------------------------------------------------------------------------
# c80 — perceptual-hash near-dup over opaque payloads (multimodal dedup)
# ---------------------------------------------------------------------------

_C80_BLOCKS = 32  # aHash thumbnail cells (one signature bit each)
_C80_BANDS = 4  # multi-index bands of 8 bits
_C80_R = 3  # verified-duplicate Hamming radius (= bands − 1: exact)

_C80_ORACLE = f"""
WITH d AS (SELECT doc_id, source, hex(encode(text)) AS hx,
                  strlen(text) AS L
           FROM documents WHERE strlen(text) >= {_C80_BLOCKS}),
byt AS MATERIALIZED (
  SELECT d.doc_id,
         CAST('0x' || substring(d.hx, CAST(2 * u.i - 1 AS INT), 2)
              AS BIGINT) AS byte,
         (u.i - 1) // (d.L // {_C80_BLOCKS}) AS blk
  FROM d, unnest(generate_series(
            1, {_C80_BLOCKS} * (d.L // {_C80_BLOCKS}))) u(i)),
blk AS (SELECT doc_id, blk, sum(byte) AS s FROM byt GROUP BY doc_id, blk),
tot AS (SELECT doc_id, sum(s) AS t FROM blk GROUP BY doc_id),
sigt AS MATERIALIZED (
  SELECT b.doc_id,
         sum(CASE WHEN {_C80_BLOCKS} * b.s > t.t
                  THEN CAST(1 AS BIGINT) << b.blk ELSE 0 END) AS sig
  FROM blk b JOIN tot t USING (doc_id) GROUP BY b.doc_id),
sg AS (SELECT s.doc_id, d.source, s.sig FROM sigt s JOIN d USING (doc_id)),
bands AS (SELECT doc_id, source, sig, r.b,
                 (sig >> (8 * CAST(r.b AS INT))) & 255 AS bval
          FROM sg, range(0, {_C80_BANDS}) r(b)),
pairs AS (SELECT DISTINCT a.doc_id AS da, a.sig AS sa, a.source AS src,
                          b.doc_id AS db, b.sig AS sb
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.bval = b.bval AND a.doc_id < b.doc_id),
ph AS (SELECT src, bit_count(xor(sa, sb)) AS h FROM pairs),
agg AS (SELECT src AS source, count(*) AS n_cand,
               sum(CASE WHEN h <= {_C80_R} THEN 1 ELSE 0 END) AS n_dup,
               sum(CASE WHEN h <= {_C80_R} THEN h ELSE 0 END) AS sh
        FROM ph GROUP BY src),
docs AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source)
SELECT docs.source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand_pairs,
       CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_pairs,
       CAST(coalesce(sh, 0) AS BIGINT) AS hamming_sum
FROM docs LEFT JOIN agg USING (source)
ORDER BY docs.source
"""


def _c80_sig_frame(docs: DataFrame) -> DataFrame:
    """Per-payload 32-bit aHash signatures of a (doc_id, source, text)
    frame: the Arrow-batched multimodal kernel (c15's surface — a
    real image decoder/resizer drops in unchanged; here the
    deterministic stand-in thumbnail is the payload's 32 equal byte
    blocks). bit_p = 1 iff 32·blocksum_p > total — exact integer
    cross-multiplication, no mean, no division. Payloads shorter
    than 32 bytes carry no thumbnail and are excluded (mirrored by
    the oracles). Shared by c80 (batch near-dup) and p45 (streaming
    novelty): the ingest path signs with the same kernel the batch
    audit ran."""
    import pandas as pd  # local import: only the executors need it

    nb = _C80_BLOCKS
    d = docs.select(
        "doc_id",
        "source",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    ).filter(F.octet_length("payload") >= nb)

    def _sig_batch(batches):
        import numpy as np

        shifts = np.arange(nb, dtype="int64")
        for pdf in batches:
            sigs = []
            for raw in pdf["payload"]:
                b = len(raw) // nb
                arr = (
                    np.frombuffer(raw[: nb * b], dtype=np.uint8)
                    .astype("int64")
                    .reshape(nb, b)
                    .sum(axis=1)
                )
                bits = (nb * arr > int(arr.sum())).astype("int64")
                sigs.append(int((bits << shifts).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "sig": sigs,
                }
            )

    return d.mapInPandas(
        _sig_batch, schema="doc_id long, source string, sig long"
    )


def _c80_sigs(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_playground_spark.queries._util import load

    return _c80_sig_frame(
        load(spark, sf, "documents").select("doc_id", "source", "text")
    )


def _c80_bands(col: str):
    """The multi-index band explode of a signature column: one
    (b, bval) struct per 8-bit band. Shared by c80 (batch self-join)
    and p45 (streaming index probe) — the two MUST band identically
    for the batch-vs-ingest pairing to hold."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("b"),
                    F.expr(f"shiftright({col}, {8 * b}) & 255").alias(
                        "bval"
                    ),
                )
                for b in range(_C80_BANDS)
            ]
        )
    )


@query("c80_phash_near_dup", oracle=_C80_ORACLE)
def c80_phash_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """C80: PERCEPTUAL-HASH NEAR-DUP — the multimodal family's missing
    verb (c15 decodes, p08 samples frames; nothing DEDUPLICATES
    payloads): a 32-bit average-hash thumbnail signature per opaque
    payload (the standard aHash recipe: equal-cell sums thresholded
    against the whole-image level, computed in the same Arrow-batched
    mapInPandas kernel c15 established — a real image decode/resize
    drops in unchanged), then Hamming-radius near-dup via multi-index
    banding (Norouzi, Punjani & Fleet, CVPR 2012: two codes within
    Hamming r MUST agree exactly on at least one of m bands whenever
    r < m — the pigeonhole identity; with m = 4 bands the radius-3
    sweep is EXACT, not probabilistic). Candidates form by band
    equality, verify at popcount(xor) ≤ 3; graded per source
    (attributed to each pair's lower doc_id): signed docs, candidate
    pairs, verified duplicate pairs, verified Hamming mass. Every
    step is exact integer arithmetic — threshold by
    cross-multiplication, signature as bit-sum, distance as
    bit_count — so the topology can never drift between engines.

    Scale shape: signatures are one mapInPandas pass (payloads never
    shuffle — the exchange carries one BIGINT signature per doc); the
    candidate stage is the banded Σ|bucket|² self-join of the LSH
    family (plan-pinned: never cartesian); verification is a pure-map
    popcount on the pair set. At 100 TB the bands are partition keys
    and each bucket verifies locally — the same deployment shape as
    c02, applied to binary columns."""
    sigs = _c80_sigs(spark, sf).localCheckpoint(
        eager=False
    )  # band arm ×2 + per-source census
    bands = sigs.select(
        "doc_id", "source", "sig", _c80_bands("sig").alias("bb")
    ).select("doc_id", "source", "sig", "bb.b", "bb.bval")
    a = bands.select(
        F.col("doc_id").alias("da"),
        F.col("sig").alias("sa"),
        F.col("source").alias("src"),
        "b",
        "bval",
    )
    bside = bands.select(
        F.col("doc_id").alias("db"), F.col("sig").alias("sb"), "b", "bval"
    )
    pairs = (
        a.join(bside, ["b", "bval"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "sa", "src", "db", "sb")
        .distinct()
    )
    ham = pairs.select(
        "src", F.bit_count(F.expr("sa ^ sb")).cast("bigint").alias("h")
    )
    agg = ham.groupBy(F.col("src").alias("source")).agg(
        F.count("*").cast("bigint").alias("n_cand_pairs"),
        F.sum((F.col("h") <= _C80_R).cast("bigint"))
        .cast("bigint")
        .alias("n_dup_pairs"),
        F.sum(F.when(F.col("h") <= _C80_R, F.col("h")).otherwise(0))
        .cast("bigint")
        .alias("hamming_sum"),
    )
    docs = sigs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return (
        docs.join(agg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_cand_pairs", F.lit(0)).alias("n_cand_pairs"),
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("hamming_sum", F.lit(0)).alias("hamming_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# c83 — LSH S-curve audit (empirical banding catch-rate vs theory)
# ---------------------------------------------------------------------------


def _c83_theo() -> list[int]:
    """The textbook banding S-curve 1 − (1 − s^r)^b at each Jaccard
    decile midpoint s = (2k+1)/20, in EXACT integer micro (python
    bignum rational — no pow() ulp ever crosses an engine boundary;
    both sides consume the same literals)."""
    from iceberg_playground_spark.queries.round7 import (
        _P17_BANDS,
        _P17_ROWS,
    )

    r, b = _P17_ROWS, _P17_BANDS
    out = []
    for k in range(10):
        num = (20**r - (2 * k + 1) ** r) ** b
        den = 20 ** (r * b)
        # floor(p·10⁶) for p = 1 − num/den needs CEILING division on
        # the complement (floor(1−x) = 1 − ceil(x) off integer points)
        out.append(1_000_000 - (1_000_000 * num + den - 1) // den)
    return out


def _c83_oracle() -> str:
    from iceberg_playground_spark.queries.llm import _SH_SQL
    from iceberg_playground_spark.queries.round7 import (
        _DIGEST_SQL,
        _bands_union_sql,
        _mh_sql,
    )

    theo = _c83_theo()
    theo_case = " ".join(f"WHEN {k} THEN {v}" for k, v in enumerate(theo))
    return f"""
WITH sh0 AS (SELECT doc_id, lang, {_SH_SQL} AS sh FROM documents),
shn AS (SELECT doc_id, lang, sh FROM sh0 WHERE len(sh) > 0),
post AS MATERIALIZED (
  SELECT doc_id, lang, len(sh) AS n, unnest(sh) AS s FROM shn),
jp AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b, min(a.n) AS an, min(b.n) AS bn,
         count(*) AS inter
  FROM post a JOIN post b
    ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
ds AS (SELECT doc_id, {_DIGEST_SQL} AS ds FROM shn),
mh AS (SELECT doc_id, {_mh_sql()} FROM ds),
sig AS (SELECT DISTINCT doc_id, band, sig
        FROM ({_bands_union_sql('mh', 'doc_id')})),
bp AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
jb AS (SELECT least((jp.inter * 10) // (jp.an + jp.bn - jp.inter), 9)
                AS bkt,
              (bp.a IS NOT NULL) AS caught
       FROM jp LEFT JOIN bp ON bp.a = jp.a AND bp.b = jp.b)
SELECT CAST(bkt AS BIGINT) AS bucket,
       CAST((2 * bkt + 1) * 50000 AS BIGINT) AS mid_micro,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN caught THEN 1 ELSE 0 END) AS BIGINT)
         AS n_caught,
       CAST((sum(CASE WHEN caught THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS empirical_micro,
       CAST(CASE bkt {theo_case} END AS BIGINT) AS theoretical_micro
FROM jb GROUP BY bkt ORDER BY bkt
"""


@query("c83_lsh_scurve_audit", oracle=_c83_oracle())
def c83_lsh_scurve_audit(spark: SparkSession, sf: str) -> DataFrame:
    """C83: LSH S-CURVE AUDIT — the tuning table every MinHash-LSH
    deployment publishes before trusting its banding (Leskovec,
    Rajaraman & Ullman, "Mining of Massive Datasets" ch. 3: banding
    (b, r) selects the threshold where 1 − (1 − s^r)^b crosses ½):
    per exact-Jaccard decile, how many shingle-sharing same-lang
    pairs exist (c09's inverted-index universe), how many the
    DEPLOYED 4×4 banding (c02/p17/c49's shared signature pipeline)
    actually catches, and the textbook prediction at the decile
    midpoint. Answers "is the production banding at its designed
    threshold ON THIS CORPUS" — the gap between empirical and
    theoretical columns is the finite-permutation + digest-collision
    reality the formula idealizes away. The theoretical column is
    computed ONCE in exact python-bignum rational arithmetic and
    consumed as literals by BOTH engines — no pow() ulp can ever
    cross the boundary; the empirical column is one integer division
    per decile row.

    Scale shape: the pair universe is c09's Σ df² postings join
    (df measured ≤25 on this corpus; at web scale the df cap applies
    exactly as c62 documents), the catch set is the banded
    Σ|bucket|² join, and the verdict join matches pair-keyed count
    rows — text never shuffles anywhere, no cartesian (plan-pinned).
    Both heavy joins are the ALREADY-DEPLOYED operators' own plans:
    the audit costs what one c09 + one c49-candidate pass costs."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.llm import _shingles, _tokens
    from iceberg_playground_spark.queries.round7 import _band_sigs

    theo = _c83_theo()
    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    post = (
        d.select("doc_id", "lang", _shingles(_tokens()).alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            "lang",
            F.size("sh").alias("n"),
            F.explode("sh").alias("s"),
        )
        .localCheckpoint(eager=False)  # both postings sides
    )
    a = post.select(
        F.col("lang").alias("al"),
        "s",
        F.col("doc_id").alias("a"),
        F.col("n").alias("an"),
    )
    b = post.select(
        F.col("lang").alias("bl"),
        F.col("s").alias("s2"),
        F.col("doc_id").alias("b"),
        F.col("n").alias("bn"),
    )
    jp = (
        a.join(
            b,
            (F.col("al") == F.col("bl"))
            & (F.col("s") == F.col("s2"))
            & (F.col("a") < F.col("b")),
        )
        .groupBy("a", "b", "an", "bn")
        .agg(F.count("*").alias("inter"))
    )
    sigs = _band_sigs(d.select("doc_id", "text"), "doc_id").localCheckpoint(
        eager=False
    )
    sa = sigs.select(F.col("doc_id").alias("a"), "band", "sig")
    sb = sigs.select(F.col("doc_id").alias("b"), "band", "sig")
    bp = (
        sa.join(sb, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .withColumn("caught", F.lit(True))
    )
    jb = jp.join(bp, ["a", "b"], "left").select(
        F.least(
            F.expr("inter * 10 DIV (an + bn - inter)"), F.lit(9)
        ).alias("bkt"),
        F.coalesce("caught", F.lit(False)).alias("caught"),
    )
    theo_case = " ".join(f"WHEN {k} THEN {v}" for k, v in enumerate(theo))
    return (
        jb.groupBy("bkt")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(F.col("caught").cast("bigint"))
            .cast("bigint")
            .alias("n_caught"),
        )
        .select(
            F.col("bkt").cast("bigint").alias("bucket"),
            ((F.col("bkt") * 2 + 1) * 50000)
            .cast("bigint")
            .alias("mid_micro"),
            "n_pairs",
            "n_caught",
            F.expr("n_caught * 1000000 DIV n_pairs")
            .cast("bigint")
            .alias("empirical_micro"),
            F.expr(f"CASE bkt {theo_case} END")
            .cast("bigint")
            .alias("theoretical_micro"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# b167 — position_deletes metadata table (Iceberg's t.position_deletes)
# ---------------------------------------------------------------------------

_B167_ORACLE = """
WITH np AS (SELECT count(*) AS n FROM customer WHERE c_custkey % 10 = 3)
SELECT CAST(3 AS INT) AS delete_seq, CAST(1 AS BIGINT) AS n_data_files,
       CAST((SELECT n FROM np) AS BIGINT) AS n_positions
"""


@query("b167_position_deletes", oracle=_B167_ORACLE)
def b167_position_deletes(spark: SparkSession, sf: str) -> DataFrame:
    """B167: the ``position_deletes`` metadata table (Iceberg's
    ``t.position_deletes``) — the per-delete-file view of b104's
    position-delete write path, completing the metadata family's
    delete-side coverage (b79/b92/b158-b166 cover snapshots, files,
    partitions, lineage, refs, policy; nothing listed the POSITION
    masks): one row per (delete file, masked data file) with the
    deleting sequence and pinned position count (see
    tables.py::position_deletes). The b104 trade made inspectable:
    the demo deletes ``c_custkey % 10 = 3`` — odd keys only, so of
    the two appended files (evens, odds) exactly ONE appears masked,
    with the position count equal to the predicate's row count.
    Graded on the per-sequence rollup (file names are uuids; counts
    are the contract, the b162 rule).

    Scale shape: reads the KB-scale (file, pos)-pair delete files
    only — Iceberg's own position_deletes table likewise scans delete
    files; data files stay closed at any table size."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.tables import LakeCatalog, LakeTable

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo",
            "customer_posdel",
            "c_custkey BIGINT, c_nationkey BIGINT",
            drop_if_exists=True,
        )
        c = load(spark, sf, "customer").select(
            F.col("c_custkey").cast("bigint"),
            F.col("c_nationkey").cast("bigint"),
        )
        t.append(c.filter(F.col("c_custkey") % 2 == 0).coalesce(1))
        t.append(c.filter(F.col("c_custkey") % 2 == 1).coalesce(1))
        t.delete_where_positional("c_custkey % 10 = 3")
        return t

    t = _built(spark, sf, "b167", build)
    return (
        t.position_deletes()
        .groupBy("delete_seq")
        .agg(
            F.countDistinct("data_file")
            .cast("bigint")
            .alias("n_data_files"),
            F.sum("n_positions").cast("bigint").alias("n_positions"),
        )
        .orderBy("delete_seq")
    )


# ---------------------------------------------------------------------------
# c87 — MMR diversified re-rank (greedy maximal marginal relevance)
# ---------------------------------------------------------------------------

_C87_CAND = 20  # dense shortlist the greedy diversifies over
_C87_K = 10  # selected list
_C87_LAM10 = 7  # λ = 0.7 in tenths: score = 7·d2q − 3·min-sel-d2


def _c87_greedy(rows) -> list:
    """The greedy MMR selection over collected shortlist rows —
    [(vec_id, msd_or_None, score)] in pick order, exact integers.
    Shared by c87 (the graded rerank) and c89 (its diversity audit):
    the audit measures the SAME selection the rerank ships."""
    vecs = {int(r["vec_id"]): [int(x) for x in r["q"]] for r in rows}
    d2q = {int(r["vec_id"]): int(r["d2"]) for r in rows}

    def pd2(a: int, b: int) -> int:
        return sum((x - y) * (x - y) for x, y in zip(vecs[a], vecs[b]))

    first = min(d2q, key=lambda v: (d2q[v], v))
    sel = [(first, None, _C87_LAM10 * d2q[first])]
    chosen = {first}
    for _ in range(_C87_K - 1):
        best = None
        for v in vecs:
            if v in chosen:
                continue
            msd = min(pd2(v, s) for s, _, _ in sel)
            score = _C87_LAM10 * d2q[v] - (10 - _C87_LAM10) * msd
            key = (score, v)
            if best is None or key < best[0]:
                best = (key, v, msd)
        _, v, msd = best
        sel.append((v, msd, _C87_LAM10 * d2q[v] - (10 - _C87_LAM10) * msd))
        chosen.add(v)
    return sel


def _c87_chain() -> str:
    """The shared oracle chain: quantize → query distances → top-{C}
    shortlist → pairwise matrix → the {K} unrolled greedy steps,
    ending in s1..s{K}/sel{K}. Composed by c87's and c89's oracles
    (the compose-never-slice rule)."""
    d = _C79_DIM
    parts = [
        f"""qq AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_C79_SCALE})
              AS BIGINT) AS x
  FROM embeddings, range(1, {d + 1}) t(i)),
q0 AS (SELECT i, x FROM qq WHERE vec_id = 0),
dall AS MATERIALIZED (
  SELECT q.vec_id, sum((q.x - q0.x) * (q.x - q0.x)) AS d2
  FROM qq q JOIN q0 USING (i) WHERE q.vec_id <> 0 GROUP BY q.vec_id),
cand AS MATERIALIZED (
  SELECT vec_id, d2 FROM dall ORDER BY d2, vec_id LIMIT {_C87_CAND}),
cq AS (SELECT q.vec_id, q.i, q.x FROM qq q JOIN cand c USING (vec_id)),
cp AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
         sum((a.x - b.x) * (a.x - b.x)) AS d2
  FROM cq a JOIN cq b ON a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id),
s1 AS MATERIALIZED (
  SELECT vec_id, d2, CAST(NULL AS BIGINT) AS msd,
         {_C87_LAM10} * d2 AS score
  FROM cand ORDER BY d2, vec_id LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM s1)"""
    ]
    for k in range(2, _C87_K + 1):
        parts.append(
            f"""s{k} AS MATERIALIZED (
  SELECT c.vec_id, c.d2, min(cp.d2) AS msd,
         {_C87_LAM10} * c.d2 - {10 - _C87_LAM10} * min(cp.d2) AS score
  FROM cand c JOIN cp ON cp.a = c.vec_id
    AND cp.b IN (SELECT vec_id FROM sel{k - 1})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
  GROUP BY c.vec_id, c.d2
  ORDER BY score, c.vec_id LIMIT 1),
sel{k} AS MATERIALIZED (SELECT vec_id FROM sel{k - 1}
           UNION ALL SELECT vec_id FROM s{k})"""
        )
    return ",\n".join(parts)


def _c87_oracle() -> str:
    sels = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, vec_id, d2, msd, score FROM s{k}"
        for k in range(1, _C87_K + 1)
    )
    return (
        "WITH "
        + _c87_chain()
        + f"""
SELECT CAST(rank AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(d2 AS BIGINT) AS d2_query,
       CAST(msd AS BIGINT) AS nearest_selected_d2,
       CAST(score AS BIGINT) AS mmr_score
FROM ({sels}) ORDER BY rank"""
    )


@query("c87_mmr_diversified_rerank", oracle=_c87_oracle())
def c87_mmr_diversified_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """C87: MMR DIVERSIFIED RE-RANK — greedy Maximal Marginal
    Relevance (Carbonell & Goldstein, SIGIR 1998) over the dense
    top-{C} shortlist, the rerank every retrieval stack applies when
    raw nearest-neighbor lists are redundant (on a near-dup-riddled
    corpus the plain top-k is copies of one document — the problem
    c02 fixes at corpus scale and MMR fixes at QUERY time): pick the
    nearest candidate, then repeatedly the candidate minimizing
    λ·d²(q,i) − (1−λ)·min_{{j∈S}} d²(i,j) (λ = 0.7; near the query
    but FAR from everything already picked). Graded on the full
    selection order with per-pick diagnostics — distance to query,
    distance to the nearest already-selected, the MMR objective. All
    arithmetic is exact BIGINTs on c54's grid with tenths-scaled λ
    (7·d2q − 3·msd — no float anywhere), and the oracle unrolls all
    {K} greedy steps declaratively, so every tie-break of the
    sequential algorithm is hash-graded.

    Scale shape: the shortlist comes from one TakeOrderedAndProject
    corpus pass (at deployment, from the ANN index — c70/c77); the
    pairwise matrix and the greedy run on the {C}-row candidate set
    (bounded collect, the sanctioned eval-arm shape — MMR is
    inherently sequential in k and only ever touches the shortlist,
    which is the entire point of reranking AFTER retrieval)."""
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    qdf = _c54_quantized(spark, sf).localCheckpoint(
        eager=False
    )  # query row + candidate arm
    q0 = qdf.filter(F.col("vec_id") == 0).collect()[0]["q"]
    q0lit = lit_int_array(q0)
    d2 = F.aggregate(
        F.zip_with("q", q0lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    cand = (
        qdf.filter(F.col("vec_id") != 0)
        .select("vec_id", "q", d2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(_C87_CAND)
        .localCheckpoint(eager=False)  # collect + graded join
    )
    rows = cand.collect()  # bounded: the 20-row shortlist
    sel = _c87_greedy(rows)
    pick = spark.createDataFrame(
        [
            (i + 1, v, msd, score)
            for i, (v, msd, score) in enumerate(sel)
        ],
        "rank BIGINT, vec_id BIGINT, nearest_selected_d2 BIGINT,"
        " mmr_score BIGINT",
    )
    return (
        cand.select("vec_id", F.col("d2").alias("d2_query"))
        .join(F.broadcast(pick), "vec_id")
        .select(
            "rank",
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("d2_query").cast("bigint").alias("d2_query"),
            "nearest_selected_d2",
            "mmr_score",
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# c89 — re-rank diversity audit (what MMR bought, what it paid)
# ---------------------------------------------------------------------------


def _c89_oracle() -> str:
    k = _C87_K
    np = k * (k - 1) // 2
    return f"""
WITH {_c87_chain()},
plain AS MATERIALIZED (
  SELECT vec_id FROM cand ORDER BY d2, vec_id LIMIT {k}),
mstat AS (SELECT sum(cp.d2) AS sd, min(cp.d2) AS md FROM cp
          WHERE cp.a IN (SELECT vec_id FROM sel{k})
            AND cp.b IN (SELECT vec_id FROM sel{k}) AND cp.a < cp.b),
pstat AS (SELECT sum(cp.d2) AS sd, min(cp.d2) AS md FROM cp
          WHERE cp.a IN (SELECT vec_id FROM plain)
            AND cp.b IN (SELECT vec_id FROM plain) AND cp.a < cp.b),
mq AS (SELECT sum(d2) AS sq FROM cand
       WHERE vec_id IN (SELECT vec_id FROM sel{k})),
pq AS (SELECT sum(d2) AS sq FROM cand
       WHERE vec_id IN (SELECT vec_id FROM plain)),
ns AS (SELECT count(*) AS n FROM cand)
SELECT 'mmr' AS list, CAST({k} AS BIGINT) AS n_items,
       CAST((SELECT sd FROM mstat) // {np} AS BIGINT) AS mean_pair_d2,
       CAST((SELECT md FROM mstat) AS BIGINT) AS min_pair_d2,
       CAST((SELECT sq FROM mq) // {k} AS BIGINT) AS mean_query_d2,
       CAST((SELECT n FROM ns) AS BIGINT) AS n_shortlist
UNION ALL
SELECT 'plain', CAST({k} AS BIGINT),
       CAST((SELECT sd FROM pstat) // {np} AS BIGINT),
       CAST((SELECT md FROM pstat) AS BIGINT),
       CAST((SELECT sq FROM pq) // {k} AS BIGINT),
       CAST((SELECT n FROM ns) AS BIGINT)
ORDER BY list
"""


@query("c89_rerank_diversity_audit", oracle=_c89_oracle())
def c89_rerank_diversity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """C89: RE-RANK DIVERSITY AUDIT — the before/after numbers that
    justify (or kill) c87's MMR in production: intra-list diversity
    (mean and MINIMUM pairwise distance inside the returned list —
    the ILD metric diversified-retrieval papers report) and the
    relevance PRICE paid for it (mean query distance), for the plain
    top-{k} versus the MMR selection of the SAME shortlist (shared
    _c87_greedy — the audit measures exactly the selection the
    rerank ships). Plain top-k provably minimizes mean query
    distance, so the mmr row's mean_query_d2 ≥ plain's by
    construction; what the owner reads is whether min_pair_d2 rose
    enough to be worth that gap. All exact BIGINTs; the two DIVs
    (mean pair, mean query) divide by literal constants at the
    output boundary.

    Scale shape: identical to c87 — one TakeOrderedAndProject
    shortlist pass, then bounded {k}-set arithmetic (SQL-side: set
    filters over the MATERIALIZED pairwise CTE; Spark-side: the same
    collected 20-row frame). The audit adds zero corpus work to the
    rerank it audits."""
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    qdf = _c54_quantized(spark, sf).localCheckpoint(eager=False)
    q0 = qdf.filter(F.col("vec_id") == 0).collect()[0]["q"]
    q0lit = lit_int_array(q0)
    d2 = F.aggregate(
        F.zip_with("q", q0lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    cand = (
        qdf.filter(F.col("vec_id") != 0)
        .select("vec_id", "q", d2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(_C87_CAND)
        .localCheckpoint(eager=False)  # collect + lineage tie
    )
    rows = cand.collect()  # bounded: the 20-row shortlist
    vecs = {int(r["vec_id"]): [int(x) for x in r["q"]] for r in rows}
    d2q = {int(r["vec_id"]): int(r["d2"]) for r in rows}
    mmr = [v for v, _, _ in _c87_greedy(rows)]
    plain = sorted(d2q, key=lambda v: (d2q[v], v))[: _C87_K]

    def pd2(a: int, b: int) -> int:
        return sum((x - y) * (x - y) for x, y in zip(vecs[a], vecs[b]))

    def stats(ids: list) -> tuple:
        pairs = [
            pd2(a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
        ]
        return (
            sum(pairs) // len(pairs),
            min(pairs),
            sum(d2q[v] for v in ids) // len(ids),
        )

    out = []
    for name, ids in (("mmr", mmr), ("plain", plain)):
        mp, mn, mq = stats(ids)
        out.append((name, len(ids), mp, mn, mq))
    lit = spark.createDataFrame(
        out,
        "list STRING, n_items BIGINT, mean_pair_d2 BIGINT,"
        " min_pair_d2 BIGINT, mean_query_d2 BIGINT",
    )
    ns = cand.agg(F.count("*").cast("bigint").alias("n_shortlist"))
    return lit.join(F.broadcast(ns)).orderBy("list")


# ---------------------------------------------------------------------------
# c86 — robust length-outlier filter (Tukey fences on exact quartiles)
# ---------------------------------------------------------------------------

_C86_ORACLE = """
WITH d AS (SELECT source, doc_id,
                  len(string_split(text, ' ')) AS nt
           FROM documents),
r AS (SELECT source, doc_id, nt,
             row_number() OVER (PARTITION BY source
                                ORDER BY nt, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM d),
q AS (SELECT source, max(n) AS n,
             max(CASE WHEN rn = (n + 3) // 4 THEN nt END) AS q1,
             max(CASE WHEN rn = (3 * n + 3) // 4 THEN nt END) AS q3
      FROM r GROUP BY source),
f AS (SELECT r.source, r.nt, q.n, q.q1, q.q3,
             (2 * r.nt < 2 * q.q1 - 3 * (q.q3 - q.q1)) AS low,
             (2 * r.nt > 2 * q.q3 + 3 * (q.q3 - q.q1)) AS high
      FROM r JOIN q ON q.source = r.source)
SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
       CAST(max(q1) AS BIGINT) AS q1, CAST(max(q3) AS BIGINT) AS q3,
       CAST(sum(CASE WHEN low THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN high THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST((sum(CASE WHEN low OR high THEN 1 ELSE 0 END) * 1000000)
            // max(n) AS BIGINT) AS outlier_micro
FROM f GROUP BY source ORDER BY source
"""


@query("c86_length_iqr_outliers", oracle=_C86_ORACLE)
def c86_length_iqr_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """C86: ROBUST LENGTH-OUTLIER FILTER — Tukey's 1.5·IQR fences on
    EXACT per-source length quartiles (the boxplot rule, Tukey 1977),
    the robust companion to the fixed-threshold word-count gate p29
    applies: fixed thresholds break when sources have different
    length regimes; quartile fences adapt per source, which is how a
    multi-source cleaning pipeline actually sets its cut. Per source:
    docs, Q1/Q3 (exact order statistics — the ceil(n/4)-th and
    ceil(3n/4)-th values, never interpolated, so both engines pick
    the SAME document's length), low/high outlier counts, outlier
    share. The fences are exact integer cross-multiplication
    (2·nt < 2·Q1 − 3·IQR — no halves ever materialize), so
    classification can never drift between engines.

    Scale shape: one ranking window per source partition (partition-
    local sort — sources shard independently at 100 TB) + a
    |sources|-row quartile table broadcast back for the fence pass;
    the only exchanges are the source-keyed window shuffle and the
    |sources|-key rollup. Exact quantiles here are by DESIGN at any
    scale: quartiles of doc LENGTH distributions are per-source
    order statistics a single window pass serves; b29/c42 hold the
    approximate-quantile alternative for when even that is too much."""
    from iceberg_playground_spark.queries._util import load

    d = load(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("nt"),
    )
    r = d.select(
        "source",
        "nt",
        F.row_number()
        .over(W.partitionBy("source").orderBy("nt", "doc_id"))
        .alias("rn"),
        F.count("*").over(W.partitionBy("source")).alias("n"),
    )
    q = r.groupBy("source").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("nt"))
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(3 * n + 3) DIV 4"), F.col("nt")
            )
        ).alias("q3"),
    )
    f = r.join(F.broadcast(q.drop("n")), "source").select(
        "source",
        "n",
        "q1",
        "q3",
        (
            2 * F.col("nt") < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))
        ).alias("low"),
        (
            2 * F.col("nt") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))
        ).alias("high"),
    )
    return (
        f.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.max("q1").cast("bigint").alias("q1"),
            F.max("q3").cast("bigint").alias("q3"),
            F.sum(F.col("low").cast("bigint"))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.col("high").cast("bigint"))
            .cast("bigint")
            .alias("n_high"),
            F.expr(
                "sum(CASE WHEN low OR high THEN 1 ELSE 0 END) * 1000000"
                " DIV max(n)"
            )
            .cast("bigint")
            .alias("outlier_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# p46 — canary leakage drill (end-to-end decontamination self-test)
# ---------------------------------------------------------------------------

_P46_CANARIES = 8
_P46_CLEAN = 12
_P46_TOKENS = 12


def _p46_text_sql(salt: str, n: int) -> str:
    """The synthetic doc table (k, text) for a salt: {tok} md5-derived
    8-hex tokens per doc — both engines generate identical strings."""
    return f"""(
  SELECT CAST(t.k AS INT) AS k,
         string_agg(substring(md5('{salt}-' || t.k || '-' || u.i), 1, 8),
                    ' ' ORDER BY u.i) AS text
  FROM range({n}) t(k), range({_P46_TOKENS}) u(i) GROUP BY t.k)"""


def _p46_oracle() -> str:
    from iceberg_playground_spark.queries.round9d import (
        _P31_SH_SQL,
        _p31_digest_sql,
    )

    return f"""
WITH can AS {_p46_text_sql('canary', _P46_CANARIES)},
cle AS {_p46_text_sql('cleaneval', _P46_CLEAN)},
tsh AS MATERIALIZED (
  SELECT DISTINCT {_p31_digest_sql('sh')} AS ds FROM (
    SELECT unnest({_P31_SH_SQL}) AS sh FROM documents
    UNION ALL
    SELECT unnest({_P31_SH_SQL}) AS sh FROM can)),
ev AS (SELECT 'canary' AS kind, k, text FROM can
       UNION ALL SELECT 'clean', k, text FROM cle),
esh AS (SELECT kind, k, {_p31_digest_sql('sh')} AS ds FROM (
          SELECT kind, k, unnest({_P31_SH_SQL}) AS sh FROM ev)),
det AS (SELECT DISTINCT kind, k FROM esh
        WHERE ds IN (SELECT ds FROM tsh))
SELECT e.kind, CAST(count(DISTINCT e.k) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT d.k) AS BIGINT) AS n_detected,
       CAST(count(DISTINCT d.k) * 1000000 // count(DISTINCT e.k)
            AS BIGINT) AS detect_micro
FROM ev e LEFT JOIN det d ON d.kind = e.kind AND d.k = e.k
GROUP BY e.kind ORDER BY e.kind
"""


@query("p46_canary_leakage_drill", oracle=_p46_oracle())
def p46_canary_leakage_drill(spark: SparkSession, sf: str) -> DataFrame:
    """P46: CANARY LEAKAGE DRILL — the end-to-end SELF-TEST of the
    decontamination tooling (the drill eval-integrity owners actually
    run: GPT-3's appendix-C methodology turned into a recurring
    check): inject {K} synthetic canary documents into the training
    corpus, keep {M} equally-synthetic but UNINJECTED eval documents
    as the control arm, run the production n-gram leakage detector
    (p31's w=4 shingle-digest kernel, shared verbatim), and grade the
    confusion table — every canary must be detected (recall 1.0) and
    every control doc must not (false-positive floor), per kind:
    docs, detected, detection share. p19/c22/c52 PREVENT leakage,
    p31 MEASURES it; p46 proves the measuring instrument itself
    works before anyone trusts a clean audit. Canary texts are
    md5-derived 8-hex token sequences both engines generate
    identically — no fixture files, no randomness.

    Scale shape: the train side collapses to a DISTINCT digest set
    with map-side partials (c43's digests-only discipline — text
    never shuffles); the probe is one digest semi-join of the
    {K}+{M}-doc eval side; injection is a union of {K} literal rows.
    At 100 TB the drill costs one pass over the train digests —
    exactly what the real audit costs, which is the point."""
    import hashlib

    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.round9d import _p31_shingles

    def mktext(salt: str, k: int) -> str:
        return " ".join(
            hashlib.md5(f"{salt}-{k}-{i}".encode()).hexdigest()[:8]
            for i in range(_P46_TOKENS)
        )

    can = spark.createDataFrame(
        [(k, mktext("canary", k)) for k in range(_P46_CANARIES)],
        "k INT, text STRING",
    )
    cle = spark.createDataFrame(
        [(k, mktext("cleaneval", k)) for k in range(_P46_CLEAN)],
        "k INT, text STRING",
    )
    digest = lambda c: F.conv(  # noqa: E731
        F.md5(c).substr(1, 8), 16, 10
    ).cast("bigint")
    train = (
        load(spark, sf, "documents")
        .select("text")
        .unionByName(can.select("text"))
    )
    tsh = (
        train.select(
            F.explode(_p31_shingles(F.split("text", " "))).alias("sh")
        )
        .select(digest(F.col("sh")).alias("ds"))
        .distinct()
    )
    ev = can.select(F.lit("canary").alias("kind"), "k", "text").unionByName(
        cle.select(F.lit("clean").alias("kind"), "k", "text")
    )
    esh = ev.select(
        "kind", "k", F.explode(_p31_shingles(F.split("text", " "))).alias("sh")
    ).select("kind", "k", digest(F.col("sh")).alias("ds"))
    det = (
        esh.join(tsh, "ds", "leftsemi")
        .select("kind", "k")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        ev.join(det, ["kind", "k"], "left")
        .groupBy("kind")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.coalesce("hit", F.lit(0)))
            .cast("bigint")
            .alias("n_detected"),
        )
        .withColumn(
            "detect_micro",
            F.expr("n_detected * 1000000 DIV n_docs").cast("bigint"),
        )
        .orderBy("kind")
    )


# ---------------------------------------------------------------------------
# b166 — retention forecast (expire_snapshots dry-run, per policy)
# ---------------------------------------------------------------------------

_B166_ORACLE = """
WITH na AS (SELECT count(*) AS n FROM customer WHERE c_custkey % 2 = 0),
nb AS (SELECT count(*) AS n FROM customer WHERE c_custkey % 2 = 1)
SELECT CAST(1 AS INT) AS keep_last, CAST(2 AS INT) AS n_expired,
       CAST(1 AS INT) AS n_reclaim_files,
       CAST((SELECT n FROM nb) AS BIGINT) AS reclaim_rows,
       CAST(3 AS INT) AS n_surviving_files
UNION ALL
SELECT 2, 1, 1, (SELECT n FROM nb), 3
UNION ALL
SELECT 3, 0, 0, 0, 4
ORDER BY keep_last
"""


@query("b166_retention_forecast", oracle=_B166_ORACLE)
def b166_retention_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """B166: RETENTION FORECAST — the dry-run every retention owner
    wants before committing to a policy: for each candidate
    ``keep_last``, what WOULD ``expire_snapshots`` expire and what
    file/record mass would orphan cleanup then reclaim (see
    tables.py::retention_forecast), mirroring the live procedure's
    own rules exactly — tags PIN their snapshots, and a file survives
    if ANY kept snapshot references it (the reference SET, not just
    the latest: the demo's v1 file outlives every forecast because
    the audit tag pins v1, while the v2 file becomes reclaimable the
    moment v2 expires — the compaction at v3 stranded it). b91 runs
    retention; b166 PLANS it — the pair a 100 TB table needs because
    expiry is irreversible there.

    Demo lineage: append (tagged ``audit``), append, compact, append
    — four snapshots, four distinct physical files, one tag. Graded
    on the 3-policy forecast table.

    Scale shape: one JSON header per snapshot, zero data files opened
    at any table size (the b92 rule; plan-pinned no parquet scan in
    the graded frame)."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.tables import LakeCatalog, LakeTable

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo",
            "customer_retf",
            "c_custkey BIGINT, c_nationkey BIGINT",
            drop_if_exists=True,
        )
        c = load(spark, sf, "customer").select(
            F.col("c_custkey").cast("bigint"),
            F.col("c_nationkey").cast("bigint"),
        )
        t.append(c.filter(F.col("c_custkey") % 2 == 0).coalesce(1))
        t.create_tag("audit", 1)
        t.append(c.filter(F.col("c_custkey") % 2 == 1).coalesce(1))
        t.compact(target_files=1)
        t.append(c.filter(F.col("c_nationkey") < 5).coalesce(1))
        return t

    t = _built(spark, sf, "b166", build)
    return t.retention_forecast([1, 2, 3]).orderBy("keep_last")


# ---------------------------------------------------------------------------
# c85 — term burstiness (index of dispersion over documents)
# ---------------------------------------------------------------------------

_C85_ORACLE = """
WITH nn AS (SELECT count(*) AS n FROM documents),
t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
dc AS (SELECT term, doc_id, count(*) AS c FROM t
       WHERE term <> '' GROUP BY term, doc_id),
st AS (SELECT term, count(*) AS df, sum(c) AS tot, sum(c * c) AS sq
       FROM dc GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df, CAST(tot AS BIGINT) AS tot,
       CAST(((SELECT n FROM nn) * sq - tot * tot) * 1000000
            // ((SELECT n FROM nn) * tot) AS BIGINT) AS vmr_micro,
       ((SELECT n FROM nn) * sq - tot * tot) > ((SELECT n FROM nn) * tot)
         AS bursty
FROM st ORDER BY term
"""


@query("c85_term_burstiness", oracle=_C85_ORACLE)
def c85_term_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """C85: TERM BURSTINESS — the index of dispersion (variance-to-
    mean ratio of a term's per-document count, zeros included) that
    separates TOPICAL terms (bursty: absent from most docs, repeated
    where present — VMR > 1, overdispersed vs Poisson) from FUNCTION
    words (uniform: VMR ≈ 1) — Church & Gale's burstiness statistic
    (1995), the corpus-linguistics diagnostic behind stopword lists,
    keyword extraction, and the df-band choices c78's lexical search
    and c62's hot-shingle cap make by hand. Per term: document
    frequency, total count, VMR in micro, and the overdispersion
    flag. VMR is EXACT INTEGER cross-multiplication end-to-end —
    var/mean = (N·Σc² − (Σc)²)/(N·Σc) with one DIV at the output
    boundary, and the bursty flag compares the same integers with no
    division at all, so the classification can never drift between
    engines.

    Scale shape: one tokenize → (term, doc) count aggregate (map-side
    partials) → |V|-key rollup; zeros never materialize (the
    all-documents variance folds into the cross-multiplied form
    algebraically — the trick that makes dispersion computable from
    the sparse counts alone); no join, no window over corpus rows."""
    from iceberg_playground_spark.queries._util import load

    d = load(spark, sf, "documents")
    # one scalar; parameterizes the cross-multiplied VMR expression
    # (round9b's bounded-collect rule: a broadcast 1-row count frame
    # would nested-loop-join into the |V|-key rollup instead)
    n = d.count()
    dc = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("c"))
    )
    st = dc.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("tot"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq"),
    )
    return st.select(
        "term",
        "df",
        "tot",
        F.expr(f"({n} * sq - tot * tot) * 1000000 DIV ({n} * tot)")
        .cast("bigint")
        .alias("vmr_micro"),
        (
            (F.lit(n) * F.col("sq") - F.col("tot") * F.col("tot"))
            > F.lit(n) * F.col("tot")
        ).alias("bursty"),
    ).orderBy("term")


# ---------------------------------------------------------------------------
# c84 — interpolated Kneser-Ney bigram LM (the canonical smoother)
# ---------------------------------------------------------------------------

# The NLL model rows evaluate ln through the shared FIXED-POINT
# INTEGER kernel (_util.int_ln_micro_*, ADVICE r12): identical
# integer steps in both engines, no libm anywhere in the graded
# contract. p(w|v) = [(cnt-D) + D·n1v·nw/ntot]/cv with D=3/4 is the
# exact integer ratio num/den below (cnt >= 1 keeps num >= 1).
_LN_CHAIN = int_ln_micro_cte_sql("nllin", "v, w, cnt", "nll_micro")

_C84_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT source, toks[i] AS v, toks[i + 1] AS w
  FROM tk, UNNEST(range(1, len(toks))) AS u(i)),
sc AS MATERIALIZED (
  SELECT source, v, w, count(*) AS scnt FROM bg GROUP BY source, v, w),
model AS (
  SELECT v, w, sum(scnt) AS cnt FROM sc GROUP BY v, w),
mw AS (
  SELECT v, w, cnt,
         sum(cnt) OVER (PARTITION BY v) AS cv,
         count(*) OVER (PARTITION BY v) AS n1v,
         count(*) OVER (PARTITION BY w) AS nw,
         count(*) OVER () AS ntot
  FROM model),
nllin AS MATERIALIZED (
  SELECT v, w, cnt,
         CAST((4 * cnt - 3) * ntot + 3 * n1v * nw AS BIGINT) AS num,
         CAST(4 * ntot * cv AS BIGINT) AS den
  FROM mw),
{_LN_CHAIN},
nll AS (SELECT v, w, cnt, nll_micro FROM _il_fin)
SELECT sc.source,
       CAST(sum(sc.scnt) AS BIGINT) AS n_events,
       CAST(sum(sc.scnt * n.nll_micro) AS BIGINT) AS nll_total_micro,
       CAST(floor(CAST(sum(sc.scnt * n.nll_micro) AS DOUBLE)
                  / sum(sc.scnt)) AS BIGINT) AS avg_nll_micro,
       CAST((sum(CASE WHEN n.cnt = 1 THEN sc.scnt ELSE 0 END) * 1000000)
            // sum(sc.scnt) AS BIGINT) AS singleton_micro
FROM sc JOIN nll n ON sc.v = n.v AND sc.w = n.w
GROUP BY sc.source ORDER BY sc.source
"""


@query("c84_kneser_ney_bigram", oracle=_C84_ORACLE)
def c84_kneser_ney_bigram(spark: SparkSession, sf: str) -> DataFrame:
    """C84: INTERPOLATED KNESER-NEY BIGRAM LM — the canonical n-gram
    smoother (Kneser & Ney 1995; Chen & Goodman 1999's benchmark
    winner), upgrading the LM family's smoothing ladder: c23/c65 are
    add-one, c60 measures the unseen mass Good-Turing-style, c84
    SMOOTHES the way production LMs actually did — absolute discount
    D = 0.75 with the continuation-probability backoff
    P(w|v) = (max(c(vw)−D, 0) + D·N1+(v·)·Pcont(w)) / c(v),
    Pcont(w) = N1+(·w)/N1+(··). Every source self-scores under the
    corpus model; the graded per-source report carries the event
    count, total and average NLL in micro-nats, and the singleton
    share (the mass KN discounts hardest — the diagnostic that says
    WHY a source's KN and add-one scores diverge).

    Determinism (hardened per ADVICE r12 — NO float anywhere in the
    graded contract): p(w|v) under KN is the exact integer ratio
    ((4·cnt−3)·ntot + 3·n1v·nw) / (4·ntot·cv), and its NLL in
    micro-nats evaluates through the shared FIXED-POINT INTEGER ln
    kernel (_util.int_ln_micro_*: binary-log digit extraction by
    repeated squaring — identical integer steps in both engines,
    bit-equal by construction, tested ≤20 micro-nats from true ln).
    The former round(-1e6·ln(double)) relied on JVM Math.log and
    DuckDB std::log agreeing to the last ulp near .5 boundaries; the
    kernel removes libm from the contract entirely. Model rows only
    (word-level bigram types, ≤|V|² however large the corpus; inputs
    bounded < 2^47 so every kernel intermediate fits int64); corpus
    rows carry COUNTS, so per-source totals are exact integer sums
    and the average floors one double divide.

    Scale shape: one corpus tokenize → (source, v, w) count aggregate
    (map-side partials); the model is |V|²-bounded and BROADCASTS
    into the score join (plan-pinned: no sort-merge over the corpus);
    the discount/backoff statistics are windows over MODEL rows."""
    from iceberg_playground_spark.queries._util import load

    d = load(spark, sf, "documents").select(
        "source", F.split("text", " ").alias("toks")
    )
    # guard BEFORE sequence(): sequence(0, n-2) with n < 2 generates a
    # DESCENDING range, not an empty one (the round8.py:122 hazard) —
    # a single-token doc must contribute zero bigrams, as the oracle's
    # range(1, len) does
    bg = d.select(
        "source",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS v, toks[i + 1] AS w))"
                ),
            ).otherwise(F.array())
        ).alias("e"),
    ).select("source", "e.v", "e.w")
    sc = bg.groupBy("source", "v", "w").agg(F.count("*").alias("scnt"))
    model = sc.groupBy("v", "w").agg(F.sum("scnt").alias("cnt"))
    mw = model.select(
        "v",
        "w",
        "cnt",
        F.sum("cnt").over(W.partitionBy("v")).alias("cv"),
        F.count("*").over(W.partitionBy("v")).alias("n1v"),
        F.count("*").over(W.partitionBy("w")).alias("nw"),
        F.count("*").over(W.partitionBy(F.lit(1))).alias("ntot"),
    )
    from iceberg_playground_spark.queries._util import int_ln_micro_col

    nll_in = mw.select(
        "v",
        "w",
        "cnt",
        F.expr("CAST((4 * cnt - 3) * ntot + 3 * n1v * nw AS BIGINT)").alias(
            "num"
        ),
        F.expr("CAST(4 * ntot * cv AS BIGINT)").alias("den"),
    )
    nll = int_ln_micro_col(nll_in, "num", "den", "nll_micro").select(
        "v", "w", "cnt", "nll_micro"
    )
    scored = sc.join(F.broadcast(nll), ["v", "w"])
    return (
        scored.groupBy("source")
        .agg(
            F.sum("scnt").cast("bigint").alias("n_events"),
            F.sum(F.col("scnt") * F.col("nll_micro"))
            .cast("bigint")
            .alias("nll_total_micro"),
            F.floor(
                F.sum(F.col("scnt") * F.col("nll_micro")).cast("double")
                / F.sum("scnt")
            )
            .cast("bigint")
            .alias("avg_nll_micro"),
            F.expr(
                "sum(CASE WHEN cnt = 1 THEN scnt ELSE 0 END) * 1000000"
                " DIV sum(scnt)"
            )
            .cast("bigint")
            .alias("singleton_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# p45 — streaming perceptual-hash novelty filter (c80 at ingest)
# ---------------------------------------------------------------------------

_P45_EPOCHS = 4


def _p45_oracle() -> str:
    nb, r = _C80_BLOCKS, _C80_R
    # the c80 signature chain, then the 4-epoch ingest unrolled:
    # the index after epoch e holds every signed doc admitted so far
    parts = [
        f"""d AS (SELECT doc_id, source, hex(encode(text)) AS hx,
                  strlen(text) AS L
           FROM documents WHERE strlen(text) >= {nb}),
byt AS MATERIALIZED (
  SELECT d.doc_id,
         CAST('0x' || substring(d.hx, CAST(2 * u.i - 1 AS INT), 2)
              AS BIGINT) AS byte,
         (u.i - 1) // (d.L // {nb}) AS blk
  FROM d, unnest(generate_series(1, {nb} * (d.L // {nb}))) u(i)),
blk AS (SELECT doc_id, blk, sum(byte) AS s FROM byt GROUP BY doc_id, blk),
tot AS (SELECT doc_id, sum(s) AS t FROM blk GROUP BY doc_id),
sigt AS MATERIALIZED (
  SELECT b.doc_id,
         sum(CASE WHEN {nb} * b.s > t.t
                  THEN CAST(1 AS BIGINT) << b.blk ELSE 0 END) AS sig
  FROM blk b JOIN tot t USING (doc_id) GROUP BY b.doc_id),
nn AS (SELECT count(*) AS n FROM documents),
ep AS MATERIALIZED (
  SELECT doc_id, sig, (doc_id * {_P45_EPOCHS}) // (SELECT n FROM nn) AS e
  FROM sigt),
al AS (SELECT doc_id,
              (doc_id * {_P45_EPOCHS}) // (SELECT n FROM nn) AS e
       FROM documents),
idx0 AS (SELECT sig FROM ep WHERE e = 0),
dup0 AS (SELECT doc_id FROM ep WHERE 1 = 0)"""
    ]
    for e in range(1, _P45_EPOCHS):
        parts.append(
            f"""dup{e} AS MATERIALIZED (
  SELECT p.doc_id FROM ep p WHERE p.e = {e} AND EXISTS (
    SELECT 1 FROM idx{e - 1} i
    WHERE bit_count(xor(p.sig, i.sig)) <= {r})),
idx{e} AS MATERIALIZED (
  SELECT sig FROM idx{e - 1}
  UNION ALL
  SELECT sig FROM ep WHERE e = {e}
    AND doc_id NOT IN (SELECT doc_id FROM dup{e}))"""
        )
    dups_union = "\nUNION ALL\n".join(
        f"SELECT {e} AS e, (SELECT count(*) FROM dup{e}) AS n_dup"
        for e in range(_P45_EPOCHS)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
dups AS ({dups_union}),
rep AS (SELECT e, count(*) AS n_arrivals FROM al GROUP BY e)
SELECT CAST(r.e AS BIGINT) AS epoch,
       CAST(r.n_arrivals AS BIGINT) AS n_arrivals,
       CAST(r.n_arrivals - d.n_dup AS BIGINT) AS n_novel,
       CAST(d.n_dup AS BIGINT) AS n_dup,
       CAST((d.n_dup * 1000000) // r.n_arrivals AS BIGINT) AS dup_micro
FROM rep r JOIN dups d USING (e) ORDER BY epoch"""
    )


@query("p45_streaming_phash_novelty", oracle=_p45_oracle())
def p45_streaming_phash_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """P45: STREAMING PERCEPTUAL-HASH NOVELTY FILTER — c80's
    multimodal near-dup verb moved to ingest time (p18 is the text
    twin; this is the binary-payload one): payload batches arrive as
    {E} doc_id-quartile micro-batches in mtime-pinned order (p36's
    ordering contract — order is SEMANTIC: the index grows), each
    batch signs its payloads with the SAME Arrow-batched aHash kernel
    (shared _c80_sig_frame), probes the ACCUMULATED signature index
    by band equi-join + Hamming ≤ {r} verify (the c80 pigeonhole
    identity makes the radius sweep exact), admits only novel
    payloads into the index, and reports per epoch. Dup-against-index
    only — intra-batch duplicates all admit (a batch near-dup job,
    c80, owns that); unsignable payloads (< 32 bytes) pass through
    novel by design. The oracle unrolls all {E} epochs declaratively,
    so the SEQUENTIAL stateful semantics (a dup admitted nowhere, a
    doc matching only an unadmitted dup still novel — transitivity
    through the index) are hash-graded, not just smoke-run.

    Scale shape: per-epoch work is one mapInPandas signing pass over
    the batch (payloads never shuffle) + a band equi-join against the
    index (broadcast while it fits, shuffle-bucketed beyond); state
    is one BIGINT signature per ADMITTED doc — the smallest possible
    dedup state, and exactly what an image-ingest pipeline keeps. At
    100 TB each epoch pays |batch|·|bucket| work, never |corpus|."""
    import os
    import shutil

    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.queries.streaming import _scratch

    docs = load(spark, sf, "documents").select("doc_id", "source", "text")
    # one scalar, frozen before the stream starts: n sizes the epoch
    # split in build() AND every micro-batch's novelty-rate divisor
    # in the sink (a stream can't derive a global corpus count
    # in-plan)
    n = docs.count()

    def build(tmp: str) -> str:
        src = os.path.join(tmp, "incoming")
        os.makedirs(src, exist_ok=True)
        now = int(os.stat(tmp).st_mtime)
        for i in range(_P45_EPOCHS):
            part_dir = os.path.join(tmp, f"stage_{i}")
            (
                docs.filter(
                    F.expr(f"(doc_id * {_P45_EPOCHS}) DIV {n}") == i
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(part_dir)
            )
            part = next(
                f
                for f in os.listdir(part_dir)
                if f.endswith(".parquet") and f.startswith("part-")
            )
            dst = os.path.join(src, f"arrival_{i}.parquet")
            shutil.copyfile(os.path.join(part_dir, part), dst)
            os.utime(dst, (now + 10 * i, now + 10 * i))
        return src

    src = _built(spark, sf, "p45", build)
    stream = (
        spark.readStream.schema("doc_id BIGINT, source STRING, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    work = _scratch("ips_stream_phash_")
    state = os.path.join(work, "state")
    report = os.path.join(work, "report")
    spark.createDataFrame([], "sig BIGINT").write.parquet(state)
    try:

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if batch_df.isEmpty():
                # an empty staged epoch file (possible at tiny SFs)
                # has no min(doc_id); int(None) would kill the stream
                return
            sigs = (
                _c80_sig_frame(batch_df)
                .select("doc_id", "sig")
                .localCheckpoint(eager=False)  # probe + admit + census
            )
            idx = spark.read.parquet(state)
            bb = sigs.select(
                "doc_id", "sig", _c80_bands("sig").alias("k")
            ).select("doc_id", "sig", "k.b", "k.bval")
            ib = (
                idx.select(F.col("sig").alias("isig"))
                .select("isig", _c80_bands("isig").alias("k"))
                .select("isig", "k.b", "k.bval")
            )
            dup = (
                bb.join(ib, ["b", "bval"])
                .filter(
                    F.bit_count(F.expr("sig ^ isig")) <= F.lit(_C80_R)
                )
                .select("doc_id")
                .distinct()
                .localCheckpoint(eager=False)  # probe runs ONCE:
                # the count materializes it, the anti-join reuses it
            )
            nd = dup.count()
            novel = sigs.join(dup, "doc_id", "left_anti")
            novel.select("sig").write.mode("append").parquet(state)
            st = batch_df.agg(
                F.min("doc_id").alias("mn"), F.count("*").alias("n")
            ).first()
            spark.createDataFrame(
                [
                    (
                        int(st["mn"]) * _P45_EPOCHS // n,
                        int(st["n"]),
                        int(st["n"]) - nd,
                        nd,
                    )
                ],
                "epoch BIGINT, n_arrivals BIGINT, n_novel BIGINT,"
                " n_dup BIGINT",
            ).write.mode("append").parquet(report)

        q = (
            stream.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", _scratch("ips_stream_phck_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # SIZE GUARD: |epochs| rows, collected because the scratch
        # dirs are deleted in finally (p18's literal-result rule)
        rows = sorted(
            tuple(int(x) for x in r)
            for r in spark.read.parquet(report).collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = spark.createDataFrame(
        rows,
        "epoch BIGINT, n_arrivals BIGINT, n_novel BIGINT, n_dup BIGINT",
    )
    return out.select(
        "epoch",
        "n_arrivals",
        "n_novel",
        "n_dup",
        F.expr("n_dup * 1000000 DIV n_arrivals")
        .cast("bigint")
        .alias("dup_micro"),
    ).orderBy("epoch")


# ---------------------------------------------------------------------------
# p43 — dedup-aware epoch plan (c49's fixpoint driving the budget math)
# ---------------------------------------------------------------------------

_P43_CAP = 3  # max upweight a collapsed cluster may claim


def _p43_oracle() -> str:
    from iceberg_playground_spark.queries.round8 import _c49_chain

    return f"""
WITH RECURSIVE {_c49_chain()},
tok AS (SELECT doc_id, source, len(string_split(text, ' ')) AS nt
        FROM documents),
rp AS (SELECT t.doc_id, coalesce(r.rep, t.doc_id) AS rep, t.nt
       FROM tok t LEFT JOIN rep r ON r.v = t.doc_id),
cl AS (SELECT rep, count(*) AS csize, sum(nt) AS tokens_raw
       FROM rp GROUP BY rep),
cw AS (SELECT c.csize, c.tokens_raw, t.source, t.nt AS rep_tokens,
              CASE WHEN c.csize < {_P43_CAP} THEN c.csize
                   ELSE {_P43_CAP} END AS w
       FROM cl c JOIN tok t ON t.doc_id = c.rep)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(csize) AS BIGINT) AS n_members,
       CAST(sum(tokens_raw) AS BIGINT) AS tokens_raw,
       CAST(sum(rep_tokens) AS BIGINT) AS tokens_kept,
       CAST(sum(rep_tokens * w) AS BIGINT) AS tokens_weighted,
       CAST(((sum(tokens_raw) - sum(rep_tokens * w)) * 1000000)
            // sum(tokens_raw) AS BIGINT) AS savings_micro
FROM cw GROUP BY source ORDER BY source
"""


@query("p43_dedup_aware_epochs", oracle=_p43_oracle())
def p43_dedup_aware_epochs(spark: SparkSession, sf: str) -> DataFrame:
    """P43: DEDUP-AWARE EPOCH PLAN — the step between the near-dup
    arc's cluster census (c49) and the budgeting arc's epoch math
    (p22/p30/p33) that neither runs: what does an epoch COST once
    duplicates collapse? Reuses c49's graded connected-components
    fixpoint verbatim (same bands, same pointer-jumping supersteps —
    _c49_rep), elects each cluster's min-doc_id representative (c33's
    canonical rule), weights it by the CAPPED cluster size
    (min(|cluster|, 3) — the "count duplicates once, upweight at
    most 3x" rule public dedup pipelines apply so mega-clusters
    don't dominate the mixture), and rolls up per the
    REPRESENTATIVE's source: clusters (= surviving docs), members,
    raw vs kept vs weighted epoch tokens, and the savings share in
    micro. A cluster spanning sources is one training document and
    is counted once, in one place — the deterministic min rule makes
    that place engine-independent. Shingle-less docs are singletons
    (they cannot collide; left-join coalesce).

    Scale shape: inherits c49's contract wholesale — bucket-bounded
    candidate edges (Σ|bucket|², digest-only), a |docs|-row rep
    relation per superstep, log-depth rounds, the driver controlling
    round count only. The plan tail is one |docs|-row join (rep →
    token counts) + a |sources|-key rollup; the weight arithmetic is
    exact integers end-to-end (the one division is a single DIV at
    the output boundary, truncation mirrored by the oracle's //)."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.round8 import _c49_rep

    d = (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("nt"),
        )
        .localCheckpoint(eager=False)  # member arm + rep-token arm
    )
    rep = _c49_rep(spark, sf).withColumnRenamed("v", "doc_id")
    rp = d.join(rep, "doc_id", "left").select(
        "nt", F.coalesce("rep", F.col("doc_id")).alias("rep")
    )
    cl = rp.groupBy("rep").agg(
        F.count("*").cast("bigint").alias("csize"),
        F.sum("nt").alias("tokens_raw"),
    )
    cw = cl.join(
        d.select(
            F.col("doc_id").alias("rep"),
            "source",
            F.col("nt").alias("rep_tokens"),
        ),
        "rep",
    ).withColumn("w", F.least(F.col("csize"), F.lit(_P43_CAP)))
    return (
        cw.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            F.sum("csize").cast("bigint").alias("n_members"),
            F.sum("tokens_raw").cast("bigint").alias("tokens_raw"),
            F.sum("rep_tokens").cast("bigint").alias("tokens_kept"),
            F.sum(F.col("rep_tokens") * F.col("w"))
            .cast("bigint")
            .alias("tokens_weighted"),
        )
        .withColumn(
            "savings_micro",
            F.expr(
                "(tokens_raw - tokens_weighted) * 1000000"
                " DIV tokens_raw"
            ).cast("bigint"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# b164 — all_data_files metadata table (Iceberg's t.all_data_files)
# ---------------------------------------------------------------------------

_B164_ORACLE = """
WITH na AS (SELECT count(*) AS n FROM customer WHERE c_custkey % 2 = 0),
nb AS (SELECT count(*) AS n FROM customer WHERE c_custkey % 2 = 1),
nk AS (SELECT count(*) AS n FROM customer WHERE c_nationkey <> 5)
SELECT CAST(1 AS INT) AS added_version, FALSE AS is_live,
       CAST(2 AS BIGINT) AS n_files,
       CAST(3 AS INT) AS last_ref_version,
       CAST((SELECT n FROM na) AS BIGINT) AS n_rows
UNION ALL
SELECT 2, FALSE, 2, 3, (SELECT n FROM nb)
UNION ALL
SELECT 4, TRUE, 1, 4, (SELECT n FROM nk)
ORDER BY added_version
"""


@query("b164_all_data_files", oracle=_B164_ORACLE)
def b164_all_data_files(spark: SparkSession, sf: str) -> DataFrame:
    """B164: the ``all_data_files`` metadata table (Iceberg's
    ``t.all_data_files``) as a queryable relation — the file-grain
    lineage view that completes the metadata family's grain ladder
    (b162 all_manifests is the same walk at manifest grain; b161
    entries is one snapshot at file grain): one row per distinct data
    file ever committed, with adding snapshot, latest referencing
    snapshot, live flag, and record count (see tables.py::all_files).
    Dead files — last_ref_version < current — are exactly what
    orphan-file cleanup reclaims once expire_snapshots drops their
    last referencing snapshot; this is the relation that plan is
    computed from.

    The demo lineage is b162's (every row shape exercised): two
    2-file appends, an equality DELETE (data files carry forward —
    MoR masks rows, it never retires files), then compaction (the
    rewritten file is live; all four original files' last reference
    is v3, making them the reclaim set). Graded on the
    per-(added_version, live) rollup: file count, latest reference,
    record sum.

    Scale shape: one JSON header per snapshot, ZERO data files opened
    however large the table (the b92 rule; plan-pinned no parquet
    scan). Appends are hash-repartitioned so the rollup is
    parallelism-invariant (the b61/b92 rule)."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.tables import LakeCatalog, LakeTable

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo",
            "customer_allfiles",
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

    t = _built(spark, sf, "b164", build)
    return (
        t.all_files()
        .groupBy("added_version", "is_live")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.max("last_ref_version").cast("int").alias(
                "last_ref_version"
            ),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .orderBy("added_version")
    )


# ---------------------------------------------------------------------------
# b165 — rewrite_manifests (metadata-only manifest consolidation)
# ---------------------------------------------------------------------------

_B165_ORACLE = """
WITH na AS (SELECT count(*) AS n FROM customer),
nb AS (SELECT count(*) AS n FROM customer WHERE c_nationkey < 5)
SELECT CAST(1 AS INT) AS ref_version, 'data' AS content,
       CAST(3 AS BIGINT) AS n_manifests, CAST(3 AS BIGINT) AS n_files,
       CAST((SELECT n FROM na) AS BIGINT) AS n_rows
UNION ALL
SELECT 2, 'data', 4, 4, (SELECT n FROM na) + (SELECT n FROM nb)
UNION ALL
SELECT 3, 'data', 4, 4, (SELECT n FROM na) + (SELECT n FROM nb)
UNION ALL
SELECT 3, 'delete', 1, 1, NULL
UNION ALL
SELECT 4, 'data', 2, 4, (SELECT n FROM na) + (SELECT n FROM nb)
UNION ALL
SELECT 4, 'delete', 1, 1, NULL
ORDER BY ref_version, content
"""


@query("b165_rewrite_manifests", oracle=_B165_ORACLE)
def b165_rewrite_manifests(spark: SparkSession, sf: str) -> DataFrame:
    """B165: ``rewrite_manifests`` — the metadata-only maintenance
    procedure the decoupled-writer architecture NEEDS (every
    BatchedCommitter epoch commits one manifest per staged dir, the
    reference's writers→committer shape at decouple.rs:112-156; scan
    planning degrades once a snapshot carries thousands of tiny
    manifests), completing the maintenance verbs alongside b83
    compaction, b91 expiration, and b157 cherry-pick. The rewrite
    merges manifest entries per DATA SEQUENCE — preserving sequence
    numbers is what keeps merge-on-read delete scoping exact across
    the rewrite (a delete masks strictly-older sequences), proven in
    the lifecycle test by the read being row-identical before/after.

    Demo lineage: a 3-writer fleet stages thirds of customer and one
    committer lands them as ONE snapshot with THREE manifests (v1,
    the A6 shape), a second append (v2), an equality DELETE (v3),
    then rewrite_manifests (v4): the three v1 manifests merge into
    one, v2's passes through, the delete manifest is untouched, and
    NO data file moves. Graded on the all_manifests rollup per
    (referencing version, content) — the consolidation is visible as
    v4's manifest count dropping to 2 while file count and record sum
    stay exactly v3's.

    Scale shape: one JSON header per snapshot, zero data I/O at any
    table size (the b92 rule; plan-pinned no parquet scan) — the
    whole point of the procedure."""
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.lakehouse import _built
    from iceberg_playground_spark.tables import LakeCatalog, LakeTable

    def build(tmp: str) -> LakeTable:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo",
            "customer_rwm",
            "c_custkey BIGINT, c_nationkey BIGINT",
            drop_if_exists=True,
        )
        c = load(spark, sf, "customer").select(
            F.col("c_custkey").cast("bigint"),
            F.col("c_nationkey").cast("bigint"),
        )
        staged = [
            t.stage_append(
                c.filter(F.col("c_custkey") % 3 == i).coalesce(1)
            )
            for i in range(3)
        ]
        t._commit(
            staged, [], {"operation": "append", "added": len(staged)}
        )
        t.append(c.filter(F.col("c_nationkey") < 5).coalesce(1))
        t.delete_where("c_nationkey = 5", ["c_custkey"])
        t.rewrite_manifests()
        return t

    t = _built(spark, sf, "b165", build)
    return (
        t.all_manifests()
        .groupBy("ref_version", "content")
        .agg(
            F.count("*").cast("bigint").alias("n_manifests"),
            F.sum("n_files").cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .orderBy("ref_version", "content")
    )
