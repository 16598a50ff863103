"""Round-11 operators: the ANN family's train step plus the streaming
release pipeline (VERDICT r10 items 5 and 6).

- c70: K-MEANS++ SEEDING (IVF index BUILD) — the missing middle of
  the embedding family's train→apply→eval arc: c54 runs Lloyd from
  FIXED seeds and c11/c40 probe a PREBUILT IVF structure; c70 builds
  the index — it LEARNS the seed set with the classic k-means++ D²
  rule (Arthur & Vassilvitskii, "k-means++: The Advantages of
  Careful Seeding", SODA 2007). Each of the k-1 supersteps scores
  every vector by its exact integer squared distance to the nearest
  chosen seed and draws the next seed ∝ D² — the draw is the
  Gumbel-max trick over deterministic md5 noise (c53's D²-sampling
  idiom: key = round(1e6·ln D²) + round(-1e6·ln(-ln u)), u from
  md5), so "randomness" is reproducible and engine-portable. Graded
  on the FULL final cell assignment (vec_id, cell_id = seed vec_id,
  exact sq distance) under c54's fixed-point contract — one seed
  drawn differently anywhere in the chain changes the hash.

  Scale shape: every superstep is ONE stateless pure-map scan (the
  min-distance over the ≤k chosen seeds folds into a single JVM
  expression against a literal centroid matrix — recomputing the
  k-term min beats carrying a corpus-sized running-min column, which
  would need a checkpoint per step) + ONE 1-row
  TakeOrderedAndProject argmax collect; driver state is k·d ints.
  k-1 scans total, zero joins, zero shuffles — the c63/c68
  bounded-superstep discipline applied to ANN. At 100 TB each
  superstep is a map-only pass; the k-means|| oversampling variant
  (Bahmani et al., VLDB 2012) drops in by drawing top-l per step
  from the SAME keyed scores instead of top-1.

- p36: STREAMING RELEASE PIPELINE — p34's quality-gated release
  (Gopher gate → dedup survivor selection → leakage-safe split →
  per-(split, lang) rollup) run as continuous ingest, the reference's
  whole point (decouple.rs's writer fleet; consume→decode→write→
  commit, src/bin/bench-kafka.rs:66-173): documents arrive as an
  ascending-doc_id file stream, each availableNow micro-batch gates
  its docs, probes-and-MERGEs a fingerprint-cluster state index
  (rep = cluster-min doc_id, canon = cluster-min PASSING doc_id),
  stamps the p32 split from the cluster rep, and appends per-epoch
  report rows. Because arrival files are doc_id-ordered, a cluster's
  rep/canon are FIXED by the first batch that sees it — later
  batches cannot lower the min — so every epoch's rows are final
  when written and the drained totals hash-match batch p34 on the
  same input (the b63/p18 stream-batch parity convention; the
  oracle IS p34's oracle).

  Scale shape: per-epoch work is |batch| flag rows (p29's two-level
  aggregate on the batch) + one fp-keyed probe join against the
  state index + a |splits·langs|-key rollup append; the state index
  is |clusters| rows keyed by fp (the c39 MERGE shape — at 100 TB
  the epoch delta upserts into the index without rewriting untouched
  partitions; the demo materializes the next-epoch index to an
  epoch-suffixed dir, which is the same exchange). Corpus text never
  crosses an epoch boundary; cross-batch state is exactly the
  cluster index.

- c71: IVF INDEX MAINTENANCE / DRIFT AUDIT — the operational step
  between c70's build and c11/c40's probes: as new vectors arrive
  after the coarse quantizer was trained, per-cell centroid drift
  (exact BIGINT under c54's fixed-point contract, floor'd means on
  the base-only vs full populations) decides which cells need
  re-training. One corpus scan: joinless literal-matrix assignment +
  a single |k|-key aggregate of conditional per-dim sums; the drift
  fold runs on k rows. The per-cell sums are mergeable state — a
  p36-style micro-batch arrival MERGEs them incrementally at 100 TB.

- b159: REFS METADATA TABLE — Iceberg's ``t.refs`` (main/tags/
  branches + per-ref visible row counts), completing the
  metadata-table family; see tables.py::refs.

- b160: HISTORY METADATA TABLE — Iceberg's ``t.history`` with the
  is_current_ancestor audit column: logical lineage follows rollback
  targets, so abandoned commits are flagged while staying
  time-travelable; see tables.py::history.

- c72: LEARNED-IVF RECALL EVAL — the eval step closing the ANN arc
  (c70 trains, c71 audits drift, c72 measures what the index buys):
  nprobe-restricted search vs exact brute top-k per probe, the same
  eval c45 runs against the LSH index.

- p38: STREAMING DRIFT AUDIT — c71 as continuous ingest: per-epoch
  partial per-cell sums merged by addition reproduce the batch audit
  hash-identically with NO ordering contract (integer sums are
  associative + commutative) — the mergeable-state proof of c71's
  scale story.

- c73: CLASSIFIER CALIBRATION CURVE — the reliability diagram for
  c57's hashed score against the target-source label, fixed-width
  histogram bins by design (quantile binning's global ntile is the
  100 TB anti-shape); completes the classifier family c68 train →
  c57 apply → c46 eval → c73 calibrate.

- p39: RELEASE DATACARD — the stats sheet a release ships
  (datasheets-for-datasets), a pure rollup of p34's report to
  (stat, value) rows, so card and report can never disagree.

- p37: MIXTURE SCHEDULE — p35's allocation turned into the
  deterministic stride-interleaved batch order a training loop
  consumes (batch j of a b-batch cell at position (2j-1)/(2b)), so
  every schedule prefix holds each source at its allocated
  proportion ±1 batch. Completes the budgeting arc p33 (diagnose) →
  p35 (rebalance) → p37 (order).

(Ref anchor: the c/p ops extend the reference's delegated query
surface the same way llm.py's c-family does — Layer-C/P mandate ops,
not reference parity ops; b159 extends the tables.py lakehouse core.
The reference's own surface is complete per SURVEY §2.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import hash_bucket, load
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.tables import LakeCatalog

# ---------------------------------------------------------------------------
# c70 — k-means++ seeding (the IVF index BUILD / train step)
# ---------------------------------------------------------------------------

_C70_K = 8  # cells to seed (matches c54's k and c11/c40's IVF lists)
_C70_DIM = 64
_C70_SCALE = 1000  # c54's fixed-point grid: v = floor(x * 1000)


def _c70_noise_sql(t: int) -> str:
    """Deterministic Gumbel noise for draw ``t`` in micro-units
    (DuckDB side): u = (md5-prefix % 1e6 + 0.5)/1e6, g = -ln(-ln u).
    Exactly c53's construction, tagged per superstep."""
    u = (
        f"(CAST(CAST('0x' || substring(md5('c70:{t}:' || "
        f"CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 "
        f"AS DOUBLE) + 0.5) / 1000000.0"
    )
    return f"CAST(round(-1000000.0 * ln(-ln({u}))) AS BIGINT)"


def _c70_chain() -> str:
    """The k-1 D²-draws unrolled as materialized CTEs (c63's rule),
    up through the learned centroid table ``cent`` — shared by c70's
    assignment grade and c72's recall eval.

    The running min-distance column is INCREMENTAL: step t computes
    each vector's distance to the ONE seed picked at step t-1 and
    LEASTs it into m — exact BIGINTs, so the fold equals the
    min-over-all-seeds the Spark side recomputes. (The naive
    re-derive — q self-joined on dim with the seed set filtered by
    an IN — leaves DuckDB a |q|² dim-join when the semi-join doesn't
    push below the MATERIALIZED barrier: ~520 s at sf0.1 vs ~2 s for
    this form.)"""
    steps = []
    for t in range(1, _C70_K):
        key = (
            f"CAST(round(1000000.0 * ln(CAST(m AS DOUBLE))) AS BIGINT) "
            f"+ {_c70_noise_sql(t)}"
        )
        # MATERIALIZED throughout (c63's rule): each step references
        # the previous one — inlined CTEs re-expand the whole chain
        # at every reference, which is exponential in k
        step = f"""
p{t} AS MATERIALIZED (
  SELECT vec_id FROM m{t} WHERE m > 0
  ORDER BY {key} DESC, vec_id LIMIT 1),
seeds{t + 1} AS MATERIALIZED (
  SELECT sid FROM seeds{t} UNION ALL SELECT vec_id FROM p{t})"""
        if t + 1 < _C70_K:  # the last draw needs no further minima
            step += f""",
m{t + 1} AS MATERIALIZED (
  SELECT nd.vec_id, CASE WHEN m.m < nd.d THEN m.m ELSE nd.d END AS m
  FROM (SELECT a.vec_id, sum((a.v - b.v) * (a.v - b.v)) AS d
        FROM q a
        JOIN p{t} p ON true
        JOIN q b ON b.vec_id = p.vec_id AND b.dim = a.dim
        GROUP BY a.vec_id) nd
  JOIN m{t} m ON m.vec_id = nd.vec_id)"""
        steps.append(step)
    chain = ",".join(steps)
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, i AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_C70_SCALE}) AS BIGINT)
           AS v
  FROM embeddings, range(1, {_C70_DIM + 1}) t(i)),
seeds1 AS MATERIALIZED (SELECT 0 AS sid),
m1 AS MATERIALIZED (
  SELECT a.vec_id, sum((a.v - b.v) * (a.v - b.v)) AS m
  FROM q a JOIN q b ON b.vec_id = 0 AND b.dim = a.dim
  GROUP BY a.vec_id),{chain},
cent AS MATERIALIZED (
  SELECT s.sid AS cluster, q.dim, q.v
  FROM seeds{_C70_K} s JOIN q ON q.vec_id = s.sid),
fdist AS MATERIALIZED (
  SELECT a.vec_id, c.cluster, sum((a.v - c.v) * (a.v - c.v)) AS d
  FROM q a JOIN cent c ON a.dim = c.dim
  GROUP BY a.vec_id, c.cluster),
ranked AS MATERIALIZED (
  SELECT vec_id, cluster, d, row_number() OVER
    (PARTITION BY vec_id ORDER BY d, cluster) AS rn
  FROM fdist)"""


def _c70_oracle() -> str:
    """c70's grade: the full final assignment off the shared chain."""
    return f"""{_c70_chain()}
SELECT vec_id, CAST(cluster AS BIGINT) AS cell_id,
       CAST(d AS BIGINT) AS sq_dist
FROM ranked WHERE rn = 1 ORDER BY vec_id
"""


def _c70_noise_micro(t: int):
    """Spark twin of _c70_noise_sql."""
    u = (
        (
            F.conv(
                F.md5(
                    F.concat(
                        F.lit(f"c70:{t}:"), F.col("vec_id").cast("string")
                    )
                ).substr(1, 8),
                16,
                10,
            ).cast("bigint")
            % 1000000
        ).cast("double")
        + 0.5
    ) / 1e6
    return F.round(-1e6 * F.log(-F.log(u))).cast("bigint")


def _c70_min_d2(cents: list[tuple[int, list[int]]]):
    """Exact BIGINT min squared distance to the chosen seed set, as
    ONE JVM expression over a literal centroid matrix (the c54 rule:
    one transform lambda, never k separate aggregates). One parsed
    SQL string per superstep (round 16): the nested-lambda DSL form
    cost a py4j round-trip per literal — same tree, one parse."""
    cmat = (
        "array("
        + ",".join(
            "array(" + ",".join(str(int(v)) for v in vec) + ")"
            for _, vec in cents
        )
        + ")"
    )
    return F.expr(
        f"array_min(transform({cmat}, c -> aggregate(zip_with(q, c, "
        f"(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), "
        f"(acc, x) -> acc + x)))"
    )


def _c70_train(
    spark: SparkSession, sf: str
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """The k-means++ train loop: returns (quantized corpus frame,
    learned seed list sorted by seed vec_id). Seed 0 = vec_id 0 (the
    c54 deterministic-seed rule); each later seed is the Gumbel-max
    D² draw over all vectors at m > 0 (exact duplicates of a chosen
    seed can never be drawn — ln 0 is the oracle's filter too)."""
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    qdf = _c54_quantized(spark, sf, cache=True)  # 7 D-squared draws
    r0 = qdf.filter(F.col("vec_id") == 0).collect()[0]
    seeds: list[tuple[int, list[int]]] = [(0, [int(v) for v in r0["q"]])]
    for t in range(1, _C70_K):
        # one stateless scan: min-d2 to the seeds so far + draw key
        key = (
            F.round(1e6 * F.log(F.col("m").cast("double"))).cast("bigint")
            + _c70_noise_micro(t)
        ).alias("key")
        pick = (
            qdf.select("vec_id", "q", _c70_min_d2(seeds).alias("m"))
            .filter(F.col("m") > 0)
            .select("vec_id", "q", key)
            .orderBy(F.col("key").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )  # 1-row TakeOrderedAndProject argmax (the c63 collect rule)
        seeds.append((int(pick["vec_id"]), [int(v) for v in pick["q"]]))
    return qdf, sorted(seeds)


@query("c70_kmeanspp_seed", oracle=_c70_oracle())
def c70_kmeanspp_seed(spark: SparkSession, sf: str) -> DataFrame:
    """C70: k-means++ seeding / IVF index build — see module
    docstring and _c70_train. Graded on the full final assignment:
    (vec_id, cell_id, sq_dist)."""
    from iceberg_playground_spark.queries.round9b import _c54_assign

    qdf, seeds = _c70_train(spark, sf)
    # ascending seed ids => _c54_assign's first-minimum IS the
    # oracle's ORDER BY d, cluster tie-break
    assigned = _c54_assign(qdf, seeds)
    return assigned.select(
        "vec_id",
        F.col("cluster_id").alias("cell_id"),
        "sq_dist",
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# c72 — recall eval of the LEARNED IVF index (train → probe → eval)
# ---------------------------------------------------------------------------

_C72_PROBES = 10
_C72_TOPK = 10
_C72_NPROBE = 2


def _c72_oracle() -> str:
    """c70's shared chain (the learned index), then the search eval:
    probe→cell ranking, cell-restricted candidates, exact top-k both
    ways, per-probe hit count."""
    return f"""{_c70_chain()},
asg AS MATERIALIZED (
  SELECT vec_id, cluster AS cell FROM ranked WHERE rn = 1),
pd AS MATERIALIZED (
  SELECT p.vec_id AS probe_id, a.vec_id, sum((a.v - p.v) * (a.v - p.v))
           AS d
  FROM q a JOIN q p ON p.vec_id < {_C72_PROBES} AND a.dim = p.dim
  WHERE a.vec_id <> p.vec_id
  GROUP BY p.vec_id, a.vec_id),
pcell AS MATERIALIZED (
  SELECT probe_id, cell FROM (
    SELECT p.vec_id AS probe_id, c.cluster AS cell,
           row_number() OVER (PARTITION BY p.vec_id
             ORDER BY sum((p.v - c.v) * (p.v - c.v)), c.cluster) AS crn
    FROM q p JOIN cent c ON p.dim = c.dim
    WHERE p.vec_id < {_C72_PROBES}
    GROUP BY p.vec_id, c.cluster) WHERE crn <= {_C72_NPROBE}),
brute AS MATERIALIZED (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id,
           row_number() OVER (PARTITION BY probe_id ORDER BY d, vec_id)
             AS rn
    FROM pd) WHERE rn <= {_C72_TOPK}),
cand AS MATERIALIZED (
  SELECT pd.probe_id, pd.vec_id, pd.d
  FROM pd JOIN asg ON pd.vec_id = asg.vec_id
  JOIN pcell ON pcell.probe_id = pd.probe_id AND pcell.cell = asg.cell),
ivf AS MATERIALIZED (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id,
           row_number() OVER (PARTITION BY probe_id ORDER BY d, vec_id)
             AS rn
    FROM cand) WHERE rn <= {_C72_TOPK})
SELECT c.probe_id,
       CAST(count(*) AS BIGINT) AS cand_n,
       CAST((SELECT count(*) FROM ivf i JOIN brute b
             ON i.probe_id = b.probe_id AND i.vec_id = b.vec_id
             WHERE i.probe_id = c.probe_id) AS BIGINT) AS hits,
       CAST(((SELECT count(*) FROM ivf i JOIN brute b
              ON i.probe_id = b.probe_id AND i.vec_id = b.vec_id
              WHERE i.probe_id = c.probe_id) * 1000000)
            // {_C72_TOPK} AS BIGINT) AS recall_micro
FROM cand c GROUP BY c.probe_id ORDER BY c.probe_id
"""


@query("c72_learned_ivf_recall", oracle=_c72_oracle())
def c72_learned_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    """C72: recall eval of the LEARNED index — closing the ANN arc
    c70 opened (c70 TRAINS the coarse quantizer, c71 audits its
    drift, c72 measures what the index actually buys): for each of
    the first 10 probe vectors, search restricted to the nprobe=2
    nearest learned cells vs the exact brute-force top-10 (both exact
    integer distances, ties to lowest vec_id), reporting candidate
    count and recall@10. c45 runs the same eval against the
    hyperplane-LSH index; c72 grades the k-means++ one — together
    they answer WHICH index family this corpus should deploy.

    Scale shape: the train loop is c70's (k-1 bounded supersteps);
    the eval arm is the sanctioned c67 shape — probes are BOUNDED
    (10 rows, broadcast, their nprobe cells resolved driver-side
    against the k·d literal seed matrix), the candidate pass is
    |probes|·N map work off ONE corpus scan, and both rankings (the
    brute global rank and the cell-restricted rank) ride ONE window
    partitioning in a single pass — the intersection is a per-row
    rank predicate, never a join (round 16: the old two-top-k-sets
    join form re-evaluated the distance-fold lineage 3x)."""
    from iceberg_playground_spark.queries.round9b import _c54_assign

    qdf, seeds = _c70_train(spark, sf)
    asg = _c54_assign(qdf, seeds).select(
        "vec_id", "q", F.col("cluster_id").alias("cell")
    )
    # probes are bounded: resolve each probe's nprobe cells exactly,
    # driver-side (the same ≤k-term integer min the oracle ranks)
    probes = sorted(
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in qdf.filter(F.col("vec_id") < _C72_PROBES).collect()
    )
    cells_of = {
        pid: [
            cid
            for _, cid in sorted(
                (
                    sum((a - b) * (a - b) for a, b in zip(pvec, svec)),
                    cid,
                )
                for cid, svec in seeds
            )[:_C72_NPROBE]
        ]
        for pid, pvec in probes
    }
    pframe = spark.createDataFrame(
        [
            (pid, pvec, cells_of[pid])
            for pid, pvec in probes
        ],
        "probe_id BIGINT, pq ARRAY<BIGINT>, pcells ARRAY<BIGINT>",
    )
    pairs = (
        asg.crossJoin(F.broadcast(pframe))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.array_contains("pcells", F.col("cell")).alias("in_cells"),
            F.aggregate(
                F.zip_with("q", "pq", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
    )
    # ONE pass computes both rankings (round 16): rn_all (global
    # brute rank) attaches BEFORE the cell filter, rn_ivf after —
    # both windows share the probe_id partitioning and (d, vec_id)
    # ordering, so the second window adds NO exchange and no sort,
    # and "in brute top-k" becomes a per-row predicate instead of a
    # join of two materialized top-k sets. The old form evaluated the
    # |probes|·N distance-fold lineage 3x (brute arm, ivf arm, cand_n
    # arm — no exchange reuse across the differently-shaped
    # consumers); this form evaluates it once. hits is identical by
    # definition: a candidate is in the intersection iff its rank
    # among candidates AND its global rank are both <= k (brute rows
    # outside the candidate set can never intersect).
    wp = W.partitionBy("probe_id").orderBy("d", "vec_id")
    cand = (
        pairs.withColumn("rn_all", F.row_number().over(wp))
        .filter(F.col("in_cells"))
        .withColumn("rn_ivf", F.row_number().over(wp))
    )
    return (
        cand.groupBy("probe_id")
        .agg(
            F.count("*").cast("bigint").alias("cand_n"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("rn_ivf") <= _C72_TOPK)
                        & (F.col("rn_all") <= _C72_TOPK),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("hits"),
        )
        .select(
            "probe_id",
            "cand_n",
            "hits",
            F.expr(
                f"CAST((hits * 1000000) DIV {_C72_TOPK} AS BIGINT)"
            ).alias("recall_micro"),
        )
        .orderBy("probe_id")
    )


# ---------------------------------------------------------------------------
# c71 — IVF index maintenance / centroid-drift audit
# ---------------------------------------------------------------------------

_C71_K = 8
_C71_DIM = 64
_C71_SCALE = 1000  # c54's fixed-point grid
# Re-train bar: drift_sq > 12000 ≈ the centroid moving ~13.7 grid
# steps rms across 64 dims. On this corpus it splits the cells 4/4 at
# sf0.01 and 5/3 at sf0.001, and clears everything at sf0.1 — drift
# shrinks as populations grow (means stabilize), which is exactly the
# signal the audit exists to read.
_C71_DRIFT_SQ = 12000


def _c71_stat_aggs() -> list:
    """The audit's per-cell aggregate columns over an assigned frame
    carrying (q, is_new): base/new counts + conditional per-dim sums.
    ONE definition shared by batch c71 and streaming p38 — the two
    must stay bit-identical for their shared oracle. The 130 columns
    render as parsed SQL (identical trees) — built column-by-column
    they cost ~1000 py4j round-trips per call (round-16 rule)."""
    base = "case when (not is_new) then 1 else 0 end"
    aggs = [
        F.expr(f"cast(sum({base}) as bigint) as n_base"),
        F.expr(f"cast(sum(1 - ({base})) as bigint) as n_new"),
    ]
    for i in range(_C71_DIM):
        aggs.append(
            F.expr(
                f"cast(sum(case when (not is_new) then q[{i}]"
                f" else 0 end) as bigint) as sb{i}"
            )
        )
        aggs.append(F.expr(f"cast(sum(q[{i}]) as bigint) as sa{i}"))
    return aggs


def _c71_report(cells: DataFrame) -> DataFrame:
    """Drift + retrain flag over a frame of per-cell stat columns
    (cell_id, n_base, n_new, sb*/sa*) — floor'd base-only vs
    full-population centroids, exact BIGINT fold."""
    # one-parse renders of the same per-dim floor'd-mean trees
    # (round-16 rule: ~650 py4j constructions -> 2 parses)
    old_c = F.expr(
        "array(" + ", ".join(
            f"cast(floor(cast(sb{i} as double) / n_base) as bigint)"
            for i in range(_C71_DIM)
        ) + ")"
    )
    new_c = F.expr(
        "array(" + ", ".join(
            f"cast(floor(cast(sa{i} as double) / (n_base + n_new))"
            " as bigint)"
            for i in range(_C71_DIM)
        ) + ")"
    )
    drift = F.aggregate(
        F.zip_with(old_c, new_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        cells.select("cell_id", "n_base", "n_new", drift.alias("drift_sq"))
        .withColumn(
            "retrain",
            F.when(F.col("drift_sq") > _C71_DRIFT_SQ, 1)
            .otherwise(0)
            .cast("int"),
        )
        .orderBy("cell_id")
    )


def _c71_oracle() -> str:
    """Assignment + conditional per-(cell, dim) sums, floor'd means
    on both the base-only and base+delta populations, drift folded
    per cell."""
    return f"""
WITH n AS (SELECT count(*) AS n FROM embeddings),
q AS (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_C71_SCALE}) AS BIGINT)
           AS v,
         vec_id >= (SELECT n // 2 FROM n) AS is_new
  FROM embeddings, UNNEST(range(1, {_C71_DIM} + 1)) AS u(i)),
cent0 AS (
  SELECT vec_id AS cell, i, v FROM q WHERE vec_id < {_C71_K}),
d AS (
  SELECT a.vec_id, c.cell, sum((a.v - c.v) * (a.v - c.v)) AS d
  FROM q a JOIN cent0 c ON a.i = c.i
  GROUP BY a.vec_id, c.cell),
asg AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM d) WHERE rn = 1),
cd AS (
  SELECT asg.cell, q.i,
         count(*) FILTER (WHERE NOT q.is_new) AS n_base,
         count(*) FILTER (WHERE q.is_new) AS n_new,
         sum(q.v) FILTER (WHERE NOT q.is_new) AS s_base,
         sum(q.v) AS s_all
  FROM q JOIN asg ON q.vec_id = asg.vec_id
  GROUP BY asg.cell, q.i),
drift AS (
  SELECT cell,
         max(n_base) AS n_base, max(n_new) AS n_new,
         sum((CAST(floor(CAST(s_base AS DOUBLE) / n_base) AS BIGINT)
              - CAST(floor(CAST(s_all AS DOUBLE) / (n_base + n_new))
                     AS BIGINT))
             * (CAST(floor(CAST(s_base AS DOUBLE) / n_base) AS BIGINT)
                - CAST(floor(CAST(s_all AS DOUBLE) / (n_base + n_new))
                       AS BIGINT))) AS drift_sq
  FROM cd GROUP BY cell)
SELECT CAST(cell AS BIGINT) AS cell_id,
       CAST(n_base AS BIGINT) AS n_base,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(drift_sq AS BIGINT) AS drift_sq,
       CAST(CASE WHEN drift_sq > {_C71_DRIFT_SQ} THEN 1 ELSE 0 END AS INT)
         AS retrain
FROM drift ORDER BY cell_id
"""


@query("c71_ivf_index_drift", oracle=_c71_oracle())
def c71_ivf_index_drift(spark: SparkSession, sf: str) -> DataFrame:
    """C71: IVF index maintenance — the drift audit that decides when
    the coarse quantizer needs re-training (the operational step
    between c70's BUILD and c11/c40's PROBES; FAISS ships the same
    check as index_factory re-train heuristics). The deployed index
    was built when only the BASE half of the corpus existed (cells =
    the first k base vectors, c54's deterministic-seed rule); the
    newer half is the post-build arrival set. Every vector assigns to
    its nearest cell; per cell the audit reports base/new populations
    and the exact squared drift between the floor'd base-only
    centroid and the floor'd full-population centroid, flagging cells
    whose drift exceeds the re-train bar.

    Scale shape: ONE corpus scan — assignment is a joinless map
    against the k·d literal seed matrix (the c54 rule) and the
    per-cell stats are a single |k|-key aggregate (2 counts + 2·d
    conditional sums, all map-side partials); the drift fold then
    runs on k rows. No join, no window, nothing corpus-sized past
    the aggregate. At 100 TB the delta would arrive via p36-style
    micro-batches and these sums are exactly the mergeable state an
    incremental audit MERGEs per epoch (the c39 shape)."""
    from iceberg_playground_spark.queries.round9b import (
        _c54_assign,
        _c54_quantized,
    )

    qdf = _c54_quantized(spark, sf)
    # one scalar; parameterizes the is_new split (round9b's bounded-
    # collect rule: a broadcast 1-row frame would replicate a nested-
    # loop join into every downstream branch instead)
    cut = qdf.count() // 2
    seeds = sorted(
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in qdf.filter(F.col("vec_id") < _C71_K).collect()
    )
    assigned = _c54_assign(qdf, seeds).select(
        "q",
        F.col("cluster_id").alias("cell_id"),
        (F.col("vec_id") >= cut).alias("is_new"),
    )
    return _c71_report(assigned.groupBy("cell_id").agg(*_c71_stat_aggs()))


# ---------------------------------------------------------------------------
# p39 — release datacard (the stats sheet shipped with a dataset)
# ---------------------------------------------------------------------------


def _p39_oracle() -> str:
    """p34's per-(split, lang) report wrapped as a CTE, rolled up into
    the datacard's (stat, value) rows — every value a BIGINT count or
    an integer-DIV micro rate."""
    from iceberg_playground_spark.queries.round10c import _p34_oracle

    return f"""
WITH card AS ({_p34_oracle()})
SELECT stat, CAST(value AS BIGINT) AS value FROM (
  SELECT 'docs_total' AS stat, sum(docs_in) AS value FROM card
  UNION ALL SELECT 'docs_kept', sum(kept_docs) FROM card
  UNION ALL SELECT 'tokens_kept', sum(kept_tokens) FROM card
  UNION ALL SELECT 'quality_drops', sum(quality_drops) FROM card
  UNION ALL SELECT 'dup_drops', sum(dup_drops) FROM card
  UNION ALL SELECT 'langs_released',
    count(DISTINCT CASE WHEN kept_docs > 0 THEN lang END) FROM card
  UNION ALL SELECT 'kept_rate_micro',
    (1000000 * sum(kept_docs)) // sum(docs_in) FROM card
  UNION ALL SELECT 'quality_drop_rate_micro',
    (1000000 * sum(quality_drops)) // sum(docs_in) FROM card
  UNION ALL SELECT 'dup_drop_rate_micro',
    (1000000 * sum(dup_drops)) // sum(docs_in) FROM card
  UNION ALL SELECT 'train_docs_kept',
    sum(CASE WHEN split = 'train' THEN kept_docs ELSE 0 END) FROM card
  UNION ALL SELECT 'validation_docs_kept',
    sum(CASE WHEN split = 'validation' THEN kept_docs ELSE 0 END)
    FROM card
  UNION ALL SELECT 'test_docs_kept',
    sum(CASE WHEN split = 'test' THEN kept_docs ELSE 0 END) FROM card
) ORDER BY stat
"""


@query("p39_release_datacard", oracle=_p39_oracle())
def p39_release_datacard(spark: SparkSession, sf: str) -> DataFrame:
    """P39: the release DATACARD — the one-page stats sheet a dataset
    release actually ships (datasheets-for-datasets practice: Gebru
    et al. 2021; every HF dataset card's numbers section): corpus in,
    kept docs/tokens, drop accounting by cause, languages released,
    per-split kept counts, and the kept/drop rates in integer micros
    — all rolled up from p34's per-(split, lang) release report, so
    the card can NEVER disagree with the report it summarizes (the
    p32/p34 same-stamp discipline one level up).

    Scale shape: p34's plan produces the |splits·langs| report; the
    card is a single aggregate over those ≤|splits·langs| rows plus a
    stack to (stat, value) — nothing corpus-sized is touched beyond
    p34's own exchanges; rates are exact integer DIV on BIGINT
    counts."""
    from iceberg_playground_spark.queries.round10c import (
        p34_release_report_v3,
    )

    card = p34_release_report_v3(spark, sf)
    agg = card.agg(
        F.sum("docs_in").cast("bigint").alias("docs_total"),
        F.sum("kept_docs").cast("bigint").alias("docs_kept"),
        F.sum("kept_tokens").cast("bigint").alias("tokens_kept"),
        F.sum("quality_drops").cast("bigint").alias("quality_drops"),
        F.sum("dup_drops").cast("bigint").alias("dup_drops"),
        F.count_distinct(
            F.when(F.col("kept_docs") > 0, F.col("lang"))
        ).cast("bigint").alias("langs_released"),
        *[
            F.sum(
                F.when(F.col("split") == s, F.col("kept_docs")).otherwise(0)
            ).cast("bigint").alias(f"{s}_docs_kept")
            for s in ("train", "validation", "test")
        ],
    )
    stacked = agg.select(
        F.expr(
            "stack(12,"
            " 'docs_total', docs_total,"
            " 'docs_kept', docs_kept,"
            " 'tokens_kept', tokens_kept,"
            " 'quality_drops', quality_drops,"
            " 'dup_drops', dup_drops,"
            " 'langs_released', langs_released,"
            " 'kept_rate_micro',"
            "   (1000000 * docs_kept) DIV docs_total,"
            " 'quality_drop_rate_micro',"
            "   (1000000 * quality_drops) DIV docs_total,"
            " 'dup_drop_rate_micro',"
            "   (1000000 * dup_drops) DIV docs_total,"
            " 'train_docs_kept', train_docs_kept,"
            " 'validation_docs_kept', validation_docs_kept,"
            " 'test_docs_kept', test_docs_kept"
            ") AS (stat, value)"
        )
    )
    return stacked.select(
        "stat", F.col("value").cast("bigint").alias("value")
    ).orderBy("stat")


# ---------------------------------------------------------------------------
# c73 — classifier calibration curve (reliability diagram)
# ---------------------------------------------------------------------------

_C73_BIN_CC = 50  # score-bin width in centi-units
_C73_TARGET = "src0"  # the c53/c68 target-source label convention

_C73_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(list_reduce(
           list_prepend(0, list_transform(
             string_split(text, ' '),
             t -> CAST('0x' || substring(md5(t), 1, 8) AS BIGINT)
                  % 1024 % 197 - 98)),
           (a, b) -> a + b) AS BIGINT) AS s,
         CASE WHEN source = '{_C73_TARGET}' THEN 1 ELSE 0 END AS y
  FROM documents),
binned AS (
  SELECT (s - ((s % {_C73_BIN_CC}) + {_C73_BIN_CC}) % {_C73_BIN_CC})
           / {_C73_BIN_CC} AS bin,
         s, y
  FROM scored)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(bin * {_C73_BIN_CC} AS BIGINT) AS score_lo_cc,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(y) AS BIGINT) AS n_pos,
       CAST(sum(s) AS BIGINT) AS sum_score_cc,
       CAST((1000000 * sum(y)) // count(*) AS BIGINT) AS pos_rate_micro
FROM binned GROUP BY bin ORDER BY bin
"""


@query("c73_classifier_calibration", oracle=_C73_ORACLE)
def c73_classifier_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """C73: the calibration curve / reliability diagram — the
    classifier family's last acceptance artifact (c68 TRAINS, c57
    APPLIES, c46 EVALUATES point metrics; c73 answers "can I trust
    the SCORE as a probability, and where do I put the quality
    threshold?"): c57's hashed linear score against the c53/c68
    target-source label, bucketed into fixed-width score bins — per
    bin, population, positive count, exact score mass, and the
    empirical positive rate in integer micros. A monotone
    pos_rate_micro across bins is what "the score ranks quality" means
    operationally; the bin where it crosses the base rate is the
    filtering threshold a pipeline owner picks.

    Binning is FIXED-WIDTH (histogram binning), not decile (quantile
    binning), by design: fixed bins are a PURE MAP + a |bins|-key
    aggregate (bins are bounded by weight range x doc length, not
    corpus size), while an exact global ntile moves every row through
    ONE partition — the classic 100 TB anti-shape. Negative-safe
    flooring uses the pmod identity ((s%w)+w)%w on BOTH engines
    (truncated % each side; integer DIV on negatives differs between
    engines, the p35 lesson's sharp edge)."""
    weights = F.transform(
        F.split("text", " "),
        lambda t: F.conv(F.md5(t).substr(1, 8), 16, 10).cast("bigint")
        % 1024
        % 197
        - 98,
    )
    score = F.aggregate(
        weights, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    d = load(spark, sf, "documents").select(
        score.alias("s"),
        F.when(F.col("source") == _C73_TARGET, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("y"),
    )
    binned = d.withColumn(
        "bin",
        F.expr(
            f"CAST((s - ((s % {_C73_BIN_CC}) + {_C73_BIN_CC})"
            f" % {_C73_BIN_CC}) / {_C73_BIN_CC} AS BIGINT)"
        ),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum("s").cast("bigint").alias("sum_score_cc"),
        )
        .select(
            "bin",
            (F.col("bin") * _C73_BIN_CC).cast("bigint")
            .alias("score_lo_cc"),
            "n",
            "n_pos",
            "sum_score_cc",
            F.expr("CAST((1000000 * n_pos) DIV n AS BIGINT)").alias(
                "pos_rate_micro"
            ),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# p38 — streaming drift audit (c71's mergeable state, proven)
# ---------------------------------------------------------------------------

_P38_EPOCHS = 4


@query("p38_streaming_drift_audit", oracle=_c71_oracle())
def p38_streaming_drift_audit(spark: SparkSession, sf: str) -> DataFrame:
    """P38: c71's drift audit as CONTINUOUS ingest — the proof of
    c71's scale claim that its per-cell stats are MERGEABLE state:
    vectors arrive as 4 vec_id-quartile micro-batches (availableNow);
    each batch assigns its vectors against the deployed quantizer's
    literal seed matrix (the same k·d ints — no batch ever sees
    another batch's data) and appends its PARTIAL per-cell sums
    (2 counts + 2·d conditional sums) to a state table; the final
    audit merges the ≤ epochs·k partial rows by plain addition and
    computes drift exactly as batch c71 does. Counts and sums are
    exact BIGINTs and addition is associative, so the drained result
    is hash-IDENTICAL to batch c71 on the same corpus REGARDLESS of
    arrival order — the oracle IS c71's oracle (the b63/p36 parity
    convention, here needing no ordering contract at all).

    Scale shape: per-epoch work is one joinless assignment map over
    the batch + a |k|-key aggregate; cross-batch state is k rows per
    epoch of integer sums (the mergeable-sketch property every
    distributed OLAP partial aggregate relies on); the final merge
    aggregates epochs·k rows. Corpus vectors never cross an epoch
    boundary."""
    from iceberg_playground_spark.queries.round9b import _c54_assign
    from iceberg_playground_spark.queries.streaming import _scratch

    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    # one scalar, frozen before the stream starts: n sizes the epoch
    # split in build(), cut parameterizes every micro-batch's is_new
    # flag (a stream can't derive a global corpus count in-plan)
    n = e.count()
    cut = n // 2
    seeds = sorted(
        (
            int(r["vec_id"]),
            [
                int(v)
                for v in r["q"]
            ],
        )
        for r in e.filter(F.col("vec_id") < _C71_K)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * _C71_SCALE)
                .cast("bigint"),
            ).alias("q"),
        )
        .collect()
    )

    def build(tmp: str) -> str:
        src = os.path.join(tmp, "incoming")
        os.makedirs(src, exist_ok=True)
        now = int(os.stat(tmp).st_mtime)
        for i in range(_P38_EPOCHS):
            part_dir = os.path.join(tmp, f"stage_{i}")
            (
                e.filter(
                    F.floor(F.col("vec_id") * _P38_EPOCHS / F.lit(n)) == i
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

    src = _built(spark, sf, "p38", build)
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    work = _scratch("ips_stream_drift_")
    state = os.path.join(work, "state")
    try:

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            qb = batch_df.select(
                "vec_id",
                F.transform(
                    "embedding",
                    lambda x: F.floor(x.cast("double") * _C71_SCALE)
                    .cast("bigint"),
                ).alias("q"),
            )
            assigned = _c54_assign(qb, seeds).select(
                "q",
                F.col("cluster_id").alias("cell_id"),
                (F.col("vec_id") >= cut).alias("is_new"),
            )
            # the SAME aggregate definition as batch c71 (shared
            # helper): the partials this epoch appends are exactly
            # the rows the batch pass would have produced for it
            assigned.groupBy("cell_id").agg(*_c71_stat_aggs()).write.mode(
                "append"
            ).parquet(state)

        q = (
            stream.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", _scratch("ips_stream_driftck_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        merged = spark.read.parquet(state).groupBy("cell_id").agg(
            F.expr("cast(sum(n_base) as bigint) as n_base"),
            F.expr("cast(sum(n_new) as bigint) as n_new"),
            *[
                F.expr(f"cast(sum({c}) as bigint) as {c}")
                for i in range(_C71_DIM)
                for c in (f"sb{i}", f"sa{i}")
            ],
        )
        # SIZE GUARD: k rows, collected because the scratch state dir
        # is deleted in finally (p18's literal-result rule); the
        # drift math is c71's shared helper — parity by construction
        rows = _c71_report(merged).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "cell_id BIGINT, n_base BIGINT, n_new BIGINT, drift_sq BIGINT,"
        " retrain INT",
    )


# ---------------------------------------------------------------------------
# b159 — refs metadata table
# ---------------------------------------------------------------------------

_B159_ORACLE = """
WITH c0 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 3 = 0),
c1 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 3 = 1),
c2 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 3 = 2),
cf AS (SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F')
SELECT 'audit-v1' AS ref_name, 'tag' AS ref_type,
       CAST(1 AS BIGINT) AS version, CAST(0 AS BIGINT) AS n_appends,
       CAST((SELECT n FROM c0) AS BIGINT) AS n_rows
UNION ALL
SELECT 'main', 'branch', CAST(3 AS BIGINT), CAST(0 AS BIGINT),
       CAST((SELECT n FROM c0) + (SELECT n FROM c1)
            + (SELECT n FROM cf) AS BIGINT)
UNION ALL
SELECT 'wip', 'branch', CAST(2 AS BIGINT), CAST(1 AS BIGINT),
       CAST((SELECT n FROM c0) + (SELECT n FROM c1)
            + (SELECT n FROM c2) AS BIGINT)
ORDER BY ref_name
"""


@query("b159_refs_metadata", oracle=_B159_ORACLE)
def b159_refs_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """B159: the ``refs`` metadata table — Iceberg's ``t.refs``,
    completing the metadata-table family (b79 snapshots, b92 files,
    b158 partitions): one row per named ref — main (a BRANCH at HEAD,
    Iceberg's convention), each tag, each branch with its fork base
    and staged-append count (see tables.py::refs). The graded relation
    adds each ref's visible row count: main and tag counts come from
    ``metadata_count`` (committed per-file stats — zero data I/O, the
    b92/b158 rule); the branch count must scan its view
    (``read_branch``) because branch entries stage without committed
    stats — exactly Iceberg's rule that absent stats mean unknown,
    never guessed.

    Demo lineage: append v1 (keys ≡0 mod 3) → tag ``audit-v1`` →
    append v2 (≡1) → branch ``wip`` forked at v2 + one branch append
    (≡2) → main append v3 (status F). The refs table is 3 bounded
    rows; the one data scan is the branch count."""

    def build(tmp: str):
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "orders_refs",
            "o_orderkey BIGINT, o_orderstatus STRING",
            drop_if_exists=True,
        )
        o = load(spark, sf, "orders").select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            "o_orderstatus",
        )
        t.append(o.filter(F.col("o_orderkey") % 3 == 0))
        t.create_tag("audit-v1", version=1)
        t.append(o.filter(F.col("o_orderkey") % 3 == 1))
        t.create_branch("wip", version=2)
        t.append_to_branch("wip", o.filter(F.col("o_orderkey") % 3 == 2))
        t.append(o.filter(F.col("o_orderstatus") == "F"))
        return t

    t = _built(spark, sf, "b159", build)
    rows = []
    for r in t.refs().collect():  # |refs| bounded rows, one listing
        if r["ref_type"] == "tag" or r["ref_name"] == "main":
            n_rows = t.metadata_count(int(r["version"]))
        else:
            n_rows = t.read_branch(r["ref_name"]).count()
        rows.append(
            (
                r["ref_name"],
                r["ref_type"],
                int(r["version"]),
                int(r["n_appends"]),
                int(n_rows),
            )
        )
    return spark.createDataFrame(
        sorted(rows),
        "ref_name STRING, ref_type STRING, version BIGINT,"
        " n_appends BIGINT, n_rows BIGINT",
    )


# ---------------------------------------------------------------------------
# b160 — history metadata table (snapshot lineage + ancestry audit)
# ---------------------------------------------------------------------------

_B160_ORACLE = """
WITH c0 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 4 = 0),
c1 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 4 = 1),
c2 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 4 = 2),
cf AS (SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F')
SELECT CAST(1 AS BIGINT) AS version, CAST(0 AS BIGINT) AS parent,
       'append' AS operation, TRUE AS is_current_ancestor,
       CAST((SELECT n FROM c0) AS BIGINT) AS n_rows
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'append', TRUE,
       CAST((SELECT n FROM c0) + (SELECT n FROM c1) AS BIGINT)
UNION ALL
SELECT CAST(3 AS BIGINT), CAST(2 AS BIGINT), 'append', FALSE,
       CAST((SELECT n FROM c0) + (SELECT n FROM c1)
            + (SELECT n FROM c2) AS BIGINT)
UNION ALL
SELECT CAST(4 AS BIGINT), CAST(3 AS BIGINT), 'rollback', TRUE,
       CAST((SELECT n FROM c0) + (SELECT n FROM c1) AS BIGINT)
UNION ALL
SELECT CAST(5 AS BIGINT), CAST(4 AS BIGINT), 'append', TRUE,
       CAST((SELECT n FROM c0) + (SELECT n FROM c1)
            + (SELECT n FROM cf) AS BIGINT)
ORDER BY version
"""


@query("b160_history_metadata", oracle=_B160_ORACLE)
def b160_history_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """B160: the ``history`` metadata table — Iceberg's ``t.history``
    with its load-bearing ``is_current_ancestor`` column (see
    tables.py::history): after an incident the audit reads exactly
    this relation to tell RESTORED history from ABANDONED history.
    Demo lineage: append v1 (keys ≡0 mod 4) → append v2 (≡1) →
    append v3 (≡2, the bad commit) → rollback to v2 (v4) → append v5
    (status F, recovery continues). The logical lineage walks
    5 → 4 → (rollback target) 2 → 1, so v3 — still time-travelable —
    is flagged NOT an ancestor. Each row adds the version's visible
    row count from ``metadata_count`` (committed per-file stats —
    zero data I/O; the whole relation is snapshot-JSON headers)."""

    def build(tmp: str):
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "orders_hist",
            "o_orderkey BIGINT, o_orderstatus STRING",
            drop_if_exists=True,
        )
        o = load(spark, sf, "orders").select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            "o_orderstatus",
        )
        for i in range(3):
            t.append(o.filter(F.col("o_orderkey") % 4 == i))
        t.rollback(2)
        t.append(o.filter(F.col("o_orderstatus") == "F"))
        return t

    t = _built(spark, sf, "b160", build)
    rows = [
        (
            int(r["version"]),
            int(r["parent"]),
            r["operation"],
            bool(r["is_current_ancestor"]),
            int(t.metadata_count(int(r["version"]))),
        )
        for r in t.history().collect()
    ]
    return spark.createDataFrame(
        sorted(rows),
        "version BIGINT, parent BIGINT, operation STRING,"
        " is_current_ancestor BOOLEAN, n_rows BIGINT",
    )


# ---------------------------------------------------------------------------
# p37 — mixture schedule (the batch order a training run consumes)
# ---------------------------------------------------------------------------

# Tokens per training batch. Sized against the demo corpus (~100
# (source, lang) cells sharing 28k-270k tokens): 128 gives every
# healthy cell a multi-batch presence (schedules of ~360/~360/~4100
# steps at sf0.001/0.01/0.1) while sub-batch cells still exercise the
# drop-out rule.
_P37_BATCH_TOK = 128


def _p37_oracle() -> str:
    """p35's unrolled water-filling chain, then batches per cell and
    the stride interleave."""
    from iceberg_playground_spark.queries.round10d import (
        _P35_ROUNDS,
        _p35_chain,
    )

    # p35's WITH chain verbatim, with the schedule clauses appended —
    # shared as a chain builder, never sliced out of assembled SQL
    # (ADVICE r11 item 2).
    n = _P35_ROUNDS
    return f"""WITH {_p35_chain()},
sched AS (
  SELECT source, lang,
         CAST(alloc{n} // {_P37_BATCH_TOK} AS BIGINT) AS n_batches
  FROM r{n} WHERE alloc{n} // {_P37_BATCH_TOK} > 0),
srows AS (
  SELECT source, lang, u.j AS batch_idx,
         ((2 * u.j - 1) * 1000000000) // (2 * n_batches) AS key_micro
  FROM sched, UNNEST(range(1, n_batches + 1)) AS u(j))
SELECT CAST(row_number() OVER (ORDER BY key_micro, source, lang)
            AS BIGINT) AS step,
       source, lang, CAST(batch_idx AS BIGINT) AS batch_idx,
       CAST(key_micro AS BIGINT) AS key_micro
FROM srows ORDER BY step
"""


@query("p37_mixture_schedule", oracle=_p37_oracle())
def p37_mixture_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """P37: the mixture SCHEDULE — the artifact a training loop
    actually consumes, completing the budgeting arc (p33 diagnoses
    over-replay, p35 fixes the allocation, p37 orders the batches):
    each cell's p35 allocation becomes final_tok DIV batch_size
    batches, and batch j of a b-batch cell lands at the stride
    position (2j-1)/(2b) — the classic deterministic stride
    interleave (lottery/stride scheduling; the same spacing
    DoReMi-style mixture loaders use), so every prefix of the
    schedule holds each source at its allocated proportion ±1 batch
    (no source ever fronts or starves). Cells too small to fill one
    batch drop out (their tokens are the rounding remainder a real
    loader carries over). Every position key is exact integer
    arithmetic; the global step is a row_number over (key, cell).

    Scale shape: ONE corpus aggregate to |cells| rows (p35's plan),
    then sequence-explode to |batches| rows — the schedule, at any
    corpus size, is budget/batch_size rows (KB per million tokens of
    budget); the one exchange past the cell table is the global
    step-order sort, which is the deliverable itself. Nothing
    corpus-sized survives the first aggregate."""
    from iceberg_playground_spark.queries.round10d import (
        p35_budget_rebalance,
    )

    alloc = p35_budget_rebalance(spark, sf).select(
        "source",
        "lang",
        F.expr(f"CAST(final_tok DIV {_P37_BATCH_TOK} AS BIGINT)")
        .alias("n_batches"),
    ).filter(F.col("n_batches") > 0)
    rows = alloc.select(
        "source",
        "lang",
        "n_batches",
        F.explode(F.sequence(F.lit(1), F.col("n_batches")))
        .alias("batch_idx"),
    ).select(
        "source",
        "lang",
        F.col("batch_idx").cast("bigint").alias("batch_idx"),
        F.expr(
            f"CAST(((2 * batch_idx - 1) * 1000000000) DIV "
            f"(2 * n_batches) AS BIGINT)"
        ).alias("key_micro"),
    )
    w = W.orderBy("key_micro", "source", "lang")
    return rows.select(
        F.row_number().over(w).cast("bigint").alias("step"),
        "source",
        "lang",
        "batch_idx",
        "key_micro",
    ).orderBy("step")


# ---------------------------------------------------------------------------
# p36 — streaming release pipeline (p34 as continuous ingest)
# ---------------------------------------------------------------------------

_P36_EPOCHS = 4


def _p36_oracle() -> str:
    """The oracle IS p34's oracle: the drained streaming totals must
    hash-match the batch release report on the same input — the
    stream/batch parity contract (b63/p18 convention), here made
    checkable because ascending-doc_id arrival fixes every cluster's
    rep/canon at first sight."""
    from iceberg_playground_spark.queries.round10c import _p34_oracle

    return _p34_oracle()


@query("p36_streaming_release_report", oracle=_p36_oracle())
def p36_streaming_release_report(spark: SparkSession, sf: str) -> DataFrame:
    """P36: the streaming release pipeline — see module docstring.

    Arrival = 4 doc_id-range quartile files with strictly ascending
    mtimes (FileStreamSource processes files in mtime order, so
    micro-batches arrive in doc_id order — the ingest-ordinal
    contract c17/p10 rely on, now load-bearing: it is what makes a
    cluster's rep/canon FINAL the first time any member is seen).
    Per epoch: Gopher-gate the batch (p29's exact expression tree via
    _gopher_flags), probe the fp-cluster state index, decide each
    doc's fate (quality_drop / dup_drop / kept), stamp the p32 split
    from the cluster rep, append the epoch's (split, lang) rollup
    rows, and merge the batch's cluster minima into the next state
    index. The returned frame is the drained sum over epoch rows —
    identical to batch p34 by construction."""
    from iceberg_playground_spark.queries.round9c import _gopher_flags
    from iceberg_playground_spark.queries.round10 import (
        _P32_TRAIN,
        _P32_VAL,
    )
    from iceberg_playground_spark.queries.streaming import _scratch

    def build(tmp: str) -> str:
        d = load(spark, sf, "documents").select("doc_id", "lang", "text")
        n = d.count()
        src = os.path.join(tmp, "incoming")
        os.makedirs(src, exist_ok=True)
        now = int(os.stat(tmp).st_mtime)
        for i in range(_P36_EPOCHS):
            part_dir = os.path.join(tmp, f"stage_{i}")
            (
                d.filter(
                    F.floor(F.col("doc_id") * _P36_EPOCHS / F.lit(n)) == i
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
            # ascending mtimes pin the batch order (10 s apart — far
            # beyond filesystem timestamp granularity)
            os.utime(dst, (now + 10 * i, now + 10 * i))
        return src

    src = _built(spark, sf, "p36", build)

    stream = (
        spark.readStream.schema("doc_id BIGINT, lang STRING, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    work = _scratch("ips_stream_release_")
    idx_schema = "fp STRING, rep BIGINT, canon BIGINT"
    reports = os.path.join(work, "reports")
    holder = {"idx_path": None}
    try:

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            flags = _gopher_flags(
                batch_df.select("doc_id", "text")
            ).select("doc_id", (F.col("pass") == 1).alias("pass"))
            d = batch_df.select(
                "doc_id",
                "lang",
                F.md5("text").alias("fp"),
                F.size(F.split("text", " ")).cast("bigint").alias("ntok"),
            ).join(flags, "doc_id")
            wfp = W.partitionBy("fp")
            b = d.withColumn("brep", F.min("doc_id").over(wfp)).withColumn(
                "bcanon",
                F.min(F.when(F.col("pass"), F.col("doc_id"))).over(wfp),
            )
            if holder["idx_path"] is None:
                idx = spark.createDataFrame([], idx_schema)
            else:
                idx = spark.read.parquet(holder["idx_path"])
            j = b.join(idx, "fp", "left")
            # F.least skips nulls: an unseen cluster's state minima
            # are null and the batch minima win; ascending arrival
            # means state minima can only ever tighten downward here
            s = (
                j.withColumn("rep_eff", F.least("rep", "brep"))
                .withColumn("canon_eff", F.least("canon", "bcanon"))
                .withColumn(
                    "bucket",
                    hash_bucket(
                        F.concat(
                            F.lit("p32:"), F.col("rep_eff").cast("string")
                        )
                    ),
                )
                .withColumn(
                    "split",
                    F.when(F.col("bucket") < _P32_TRAIN, "train")
                    .when(F.col("bucket") < _P32_VAL, "validation")
                    .otherwise("test"),
                )
                .withColumn(
                    "fate",
                    F.when(~F.col("pass"), "quality_drop")
                    .when(
                        F.col("doc_id") != F.col("canon_eff"), "dup_drop"
                    )
                    .otherwise("kept"),
                )
            )
            (
                s.groupBy("split", "lang")
                .agg(
                    F.count("*").cast("bigint").alias("docs_in"),
                    F.sum(
                        F.when(F.col("fate") == "quality_drop", 1).otherwise(0)
                    ).cast("bigint").alias("quality_drops"),
                    F.sum(
                        F.when(F.col("fate") == "dup_drop", 1).otherwise(0)
                    ).cast("bigint").alias("dup_drops"),
                    F.sum(
                        F.when(F.col("fate") == "kept", 1).otherwise(0)
                    ).cast("bigint").alias("kept_docs"),
                    F.coalesce(
                        F.sum(F.when(F.col("fate") == "kept", F.col("ntok"))),
                        F.lit(0),
                    ).cast("bigint").alias("kept_tokens"),
                )
                .withColumn("epoch", F.lit(int(epoch_id)).cast("bigint"))
                .write.mode("append")
                .parquet(reports)
            )
            # merge the batch's cluster minima into the state index
            # (epoch-suffixed dir = the demo's stand-in for the c39
            # MERGE upsert; same exchange, no read/write overlap)
            new_idx = (
                idx.unionByName(
                    b.groupBy("fp").agg(
                        F.min("brep").alias("rep"),
                        F.min("bcanon").alias("canon"),
                    )
                )
                .groupBy("fp")
                .agg(
                    F.min("rep").alias("rep"),
                    F.min("canon").alias("canon"),
                )
            )
            nxt = os.path.join(work, f"state_{epoch_id}")
            new_idx.write.mode("overwrite").parquet(nxt)
            holder["idx_path"] = nxt

        q = (
            stream.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", _scratch("ips_stream_relck_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # SIZE GUARD: |splits·langs|-row rollup only, collected
        # because the scratch dirs are deleted in finally (p18's
        # literal-result rule)
        rows = (
            spark.read.parquet(reports)
            .groupBy("split", "lang")
            .agg(
                F.sum("docs_in").cast("bigint").alias("docs_in"),
                F.sum("quality_drops").cast("bigint").alias("quality_drops"),
                F.sum("dup_drops").cast("bigint").alias("dup_drops"),
                F.sum("kept_docs").cast("bigint").alias("kept_docs"),
                F.sum("kept_tokens").cast("bigint").alias("kept_tokens"),
            )
            .orderBy("split", "lang")
            .collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "split STRING, lang STRING, docs_in BIGINT, quality_drops BIGINT,"
        " dup_drops BIGINT, kept_docs BIGINT, kept_tokens BIGINT",
    )
