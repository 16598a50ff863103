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

from iceberg_playground_spark.registry import query

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
