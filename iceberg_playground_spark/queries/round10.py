"""Round-10 operators: the two additions VERDICT r9 named (items 4,
5) plus the leakage-safe split a training pipeline runs between
dedup and corpus assembly.

- c63: BPE MERGE LEARNING — c32 counts one iteration's pair
  statistics and c51 APPLIES a fixed merge table; the missing middle
  (VERDICT r9 item 4) is learning the table itself: N greedy merge
  iterations (Sennrich, Haddow & Birch 2016, "Neural Machine
  Translation of Rare Words with Subword Units") run as driver
  supersteps under c54's bounded-collect Lloyd discipline. The
  corpus is first compressed to its WORD-FREQUENCY table (the
  classic BPE-trainer move — training cost scales with |vocab|, not
  corpus tokens); each superstep is ONE weighted pair-count
  aggregate over that table, a 1-row argmax collect
  (TakeOrderedAndProject), and a joinless re-segmentation fold with
  the winning pair as literals. Graded on the full merge table AND,
  per step, the re-tokenized corpus: token count + an
  order-independent md5 vocabulary digest — a single flipped symbol
  in any word at any step changes the hash.
- b157: SNAPSHOT CHERRY-PICK — Iceberg's ``cherrypick_snapshot``
  completes the ref-management quadruple (branches b82, WAP
  fast-forward, rollback b94, tags b86) the reference's
  single-committer design never needs (its one writer's history is
  linear by construction — /root/reference/src/bin/decouple.rs:22-24).
  The canonical post-rollback recovery: re-apply ONE off-lineage
  snapshot's delta onto HEAD, REFUSING replace snapshots,
  delete-bearing snapshots, and already-applied deltas (each a
  lost-update or double-count hazard; tables.py::cherrypick_snapshot
  documents the mapping to Iceberg's SnapshotManager validations).
  Like b144, the refusals are part of the graded contract.
- p32: LEAKAGE-SAFE SPLIT — c17 hash-splits DOCUMENTS, which leaks:
  two near-identical docs can land in train and test, and every
  dedup survivor policy (c01/c33) runs before splitting precisely to
  avoid grading a model on its own training data. Here the split is
  assigned at CLUSTER granularity (content-fingerprint groups; the
  cluster representative's hash decides, every member inherits), so
  duplicate clusters never straddle splits — and the query PROVES it
  with a leaky_clusters audit column recomputed from the doc-level
  assignment (0 by construction, verified not assumed — the c58
  est-vs-exact convention). The cluster definition is pluggable:
  c49's MinHash fixpoint closure slots in where md5(text) stands.
"""

from __future__ import annotations

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
from iceberg_playground_spark.tables import CommitConflict, LakeCatalog

# ---------------------------------------------------------------------------
# c63 — BPE merge learning (greedy merge-table training, driver supersteps)
# ---------------------------------------------------------------------------

_C63_MERGES = 6


def _c63_oracle() -> str:
    """Unrolled N-step trainer in DuckDB (the c54 convention: the
    oracle replays the exact superstep loop as nested CTEs; every
    multi-referenced level is MATERIALIZED so the plan stays linear
    in N instead of re-expanding the lineage per reference)."""
    parts = [
        "WITH w AS MATERIALIZED ("
        "  SELECT token AS word, CAST(count(*) AS BIGINT) AS cnt"
        "  FROM (SELECT unnest(string_split(text, ' ')) AS token"
        "        FROM documents) GROUP BY token)",
        "s0 AS MATERIALIZED (SELECT word, cnt,"
        r" trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seq FROM w)",
    ]
    for i in range(1, _C63_MERGES + 1):
        p = i - 1
        parts.append(
            f"p{i} AS MATERIALIZED ("
            f" SELECT pair, sum(cnt) AS tot FROM ("
            f"  SELECT cnt, unnest(list_transform("
            f"    range(1, len(string_split(seq, ' '))),"
            f"    k -> string_split(seq, ' ')[k] || ' ' ||"
            f"         string_split(seq, ' ')[k+1])) AS pair"
            f"  FROM s{p}) GROUP BY pair)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED ("
            f" SELECT string_split(pair, ' ')[1] AS a,"
            f"        string_split(pair, ' ')[2] AS b, tot"
            f" FROM p{i} ORDER BY tot DESC, pair LIMIT 1)"
        )
        # greedy left-to-right re-segmentation: fold over the symbol
        # list with a string accumulator; "last symbol == a" is the
        # uniform (acc = a OR acc ends with ' '||a) test and the merge
        # rewrites the tail in place — bit-identical to the Spark fold
        parts.append(
            f"s{i} AS MATERIALIZED ("
            f" SELECT word, cnt, list_reduce(string_split(seq, ' '),"
            f"  (acc, x) -> CASE WHEN (acc = a OR"
            f"      right(acc, len(a) + 1) = ' ' || a) AND x = b"
            f"    THEN substr(acc, 1, len(acc) - len(a)) || a || b"
            f"    ELSE acc || ' ' || x END) AS seq"
            f" FROM s{p}, m{i})"
        )
        parts.append(
            f"f{i} AS ("
            f" SELECT {i} AS step, a AS left_sym, b AS right_sym,"
            f"  a || b AS merged, CAST(tot AS BIGINT) AS pair_count,"
            f"  (SELECT CAST(sum(cnt * len(string_split(seq, ' ')))"
            f"          AS BIGINT) FROM s{i}) AS tokens_after,"
            f"  (SELECT CAST(sum(CAST('0x' ||"
            f"     substring(md5(word || '>' || seq), 1, 8) AS BIGINT))"
            f"          AS BIGINT) FROM s{i}) AS vocab_digest"
            f" FROM m{i})"
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM f{i}" for i in range(1, _C63_MERGES + 1)
    )
    return ",\n".join(parts) + f"\n{union} ORDER BY step"


def _c63_pairs(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the word table (c32's
    zip-of-shifted-slices bigram idiom, weighted by word frequency)."""
    syms = F.split("seq", " ")
    n = F.size(syms)
    z = F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("a"),
        F.slice(syms, 2, n - 1).alias("b"),
    )
    grams = F.transform(z, lambda s: F.concat_ws(" ", s["a"], s["b"]))
    return (
        words.select(
            "cnt",
            F.explode(
                F.when(n >= 2, grams).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("tot"))
    )


def _c63_fold(a: str, b: str) -> F.Column:
    """One merge application as a joinless JVM fold (the winning pair
    as literals — c54's centroid-literal discipline): greedy
    left-to-right over the symbol list, string accumulator; when the
    accumulated tail ends in symbol ``a`` and the next symbol is
    ``b``, the tail rewrites to ``a||b`` in place."""
    syms = F.split("seq", " ")
    n = F.size(syms)
    return F.aggregate(
        F.slice(syms, 2, n - 1),
        F.element_at(syms, 1),
        lambda acc, x: F.when(
            ((acc == F.lit(a)) | acc.endswith(F.lit(" " + a)))
            & (x == F.lit(b)),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(a))),
                F.lit(a + b),
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


@query("c63_bpe_merge_learn", oracle=_c63_oracle())
def c63_bpe_merge_learn(spark: SparkSession, sf: str) -> DataFrame:
    """C63: learn a BPE merge table (Sennrich et al. 2016) — see
    module docstring. Completes the tokenizer story end-to-end: c32
    (pair stats) → c63 (merge training) → c51 (apply).

    Scale shape (the 100 TB contract): the corpus collapses to its
    word-frequency table ONCE (one hash aggregate — the only
    corpus-sized operation), then every superstep touches only that
    table: one weighted pair aggregate with map-side partials, one
    1-ROW argmax collect (TakeOrderedAndProject — driver state is
    O(1) per step, O(N) total, never corpus- or vocab-sized), and a
    pure-map fold re-segmentation re-broadcast as literals. The
    grading stats of step i and the argmax that picks step i+1 are
    independent jobs over the same checkpointed table, so they run
    CONCURRENTLY from a 2-thread pool (round 16; guide §2.6) —
    values, merges, and hashes unchanged. The word
    table localCheckpoints each step so lineage stays one fold deep
    (the c54 lesson: nested per-step expression trees triple Catalyst
    analysis time) and the corpus is never re-scanned. Per-step
    grading columns (token count + order-independent md5 vocab
    digest) are one 2-scalar aggregate on the same table."""
    d = load(spark, sf, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn(
            "seq", F.rtrim(F.regexp_replace("word", "(.)", "$1 "))
        )
        .localCheckpoint(eager=False)
    )

    # Per superstep, two INDEPENDENT bounded jobs read the same
    # checkpointed word table: the grading stats of step i and the
    # pair argmax that picks step i+1's merge. Submitting both from a
    # 2-thread pool (guide §2.6 "overlap independent jobs" — actions
    # are only sequential because driver code calls them sequentially)
    # halves the superstep's job latency; the collected values, and
    # therefore every merge decision and grading row, are unchanged.
    def _argmax(w: DataFrame):
        return (
            _c63_pairs(w).orderBy(F.col("tot").desc(), "pair").limit(1)
        ).collect()

    def _stats(w: DataFrame):
        return w.agg(
            F.sum(
                F.col("cnt") * F.size(F.split("seq", " "))
            ).alias("tokens_after"),
            F.sum(
                F.conv(
                    F.md5(F.concat_ws(">", "word", "seq")).substr(1, 8),
                    16,
                    10,
                ).cast("bigint")
            ).alias("vocab_digest"),
        ).collect()

    from concurrent.futures import ThreadPoolExecutor

    rows: list[tuple] = []
    with ThreadPoolExecutor(max_workers=2) as pool:
        top_f = pool.submit(_argmax, words)
        for step in range(1, _C63_MERGES + 1):
            top = top_f.result()[0]
            a, b = top["pair"].split(" ")
            # eager per-step checkpoint (ADVICE r16 / round 17 A/B):
            # with eager=False both pool jobs raced to materialize the
            # fold pass — values stay deterministic (block-manager
            # locking) but the fold could run twice, reading 2.7-7.0 s
            # across runs; materializing once here before submitting
            # either job reads 2.1-2.4 s. Only the two bounded READS
            # stay overlapped, which is all §2.6 needs.
            words = words.withColumn(
                "seq", _c63_fold(a, b)
            ).localCheckpoint(eager=True)
            stats_f = pool.submit(_stats, words)
            if step < _C63_MERGES:
                top_f = pool.submit(_argmax, words)
            stats = stats_f.result()[0]
            rows.append(
                (
                    step,
                    a,
                    b,
                    a + b,
                    int(top["tot"]),
                    int(stats["tokens_after"]),
                    int(stats["vocab_digest"]),
                )
            )
    return spark.createDataFrame(
        rows,
        "step INT, left_sym STRING, right_sym STRING, merged STRING, "
        "pair_count BIGINT, tokens_after BIGINT, vocab_digest BIGINT",
    ).orderBy("step")


# ---------------------------------------------------------------------------
# b157 — snapshot cherry-pick (post-rollback recovery + refusals)
# ---------------------------------------------------------------------------

_B157_ORACLE = """
SELECT 'w' || CAST(n_nationkey % 3 AS VARCHAR) AS writer,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
       6 AS n_versions
FROM nation GROUP BY writer
"""


@query("b157_cherrypick_snapshot", oracle=_B157_ORACLE)
def b157_cherrypick_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    """B157: Iceberg's cherrypick_snapshot — see module docstring and
    tables.py::cherrypick_snapshot for the refusal contract.

    The scenario: three writers append (v1 w0, v2 w1, v3 w2), a
    compaction rewrites everything (v4, a REPLACE), then an incident
    rollback to v2 (v5) un-publishes w2's data along with the bad
    compaction. Cherry-picking v3 re-lands EXACTLY w2's delta on the
    rolled-back HEAD (v6) — pure metadata, no files read or written.
    Two refusals are REQUIRED to fire (the b144 convention): a second
    pick of v3 (delta already live at HEAD — would double w2's rows)
    and a pick of the REPLACE v4 (would erase v5/v6's lineage).
    Refused picks must not mint versions.

    Graded on the final table: per-writer counts and key checksums
    (all 3 writers whole again, nothing doubled) and the exact
    snapshot count (6 = 3 appends + compact + rollback + one landed
    cherry-pick)."""

    def build(tmp: str):
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "pick", "n_nationkey BIGINT, writer STRING",
            drop_if_exists=True,
        )
        n = load(spark, sf, "nation").select(
            F.col("n_nationkey").cast("bigint").alias("n_nationkey")
        )
        for i in range(3):  # v1..v3
            t.append(
                n.filter(F.col("n_nationkey") % 3 == i).withColumn(
                    "writer", F.lit(f"w{i}")
                )
            )
        t.compact(sort_by=["writer", "n_nationkey"])  # v4: REPLACE
        t.rollback(2)  # v5: incident recovery — w2 AND the compaction gone
        v = t.cherrypick_snapshot(3)  # v6: w2's delta re-lands
        if v != 6 or t.current_version() != 6:
            raise RuntimeError(f"cherry-pick landed at v{v}, expected v6")
        try:
            t.cherrypick_snapshot(3)  # delta already live: must refuse
            raise RuntimeError("double cherry-pick landed — rows doubled")
        except CommitConflict:
            pass
        try:
            t.cherrypick_snapshot(4)  # REPLACE snapshot: must refuse
            raise RuntimeError("replace cherry-pick landed — lost update")
        except CommitConflict:
            pass
        if t.current_version() != 6:
            raise RuntimeError("a refused cherry-pick minted a version")
        return t

    t = _built(spark, sf, "b157", build)
    return (
        t.read()
        .groupBy("writer")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .withColumn("n_versions", F.lit(len(t.versions())).cast("int"))
    )


# ---------------------------------------------------------------------------
# p32 — leakage-safe train/validation/test split (cluster granularity)
# ---------------------------------------------------------------------------

_P32_TRAIN, _P32_VAL = 80, 90  # hash-bucket cut points (80/10/10)

_P32_ORACLE = f"""
WITH d AS (
  SELECT doc_id, md5(text) AS fp,
         len(string_split(text, ' ')) AS ntok
  FROM documents),
r AS (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS rep FROM d),
s AS (
  SELECT *,
    CASE WHEN {bucket_sql("'p32:' || CAST(rep AS VARCHAR)")} < {_P32_TRAIN}
           THEN 'train'
         WHEN {bucket_sql("'p32:' || CAST(rep AS VARCHAR)")} < {_P32_VAL}
           THEN 'validation'
         ELSE 'test' END AS split
  FROM r),
g AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT fp) AS BIGINT) AS n_clusters,
         CAST(sum(ntok) AS BIGINT) AS n_tokens
  FROM s GROUP BY split),
l AS (
  SELECT CAST(count(*) AS BIGINT) AS leaky_clusters FROM (
    SELECT fp FROM s GROUP BY fp HAVING count(DISTINCT split) > 1))
SELECT split, n_docs, n_clusters, n_tokens, leaky_clusters
FROM g, l ORDER BY split
"""


@query("p32_leakage_safe_split", oracle=_P32_ORACLE)
def p32_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """P32: cluster-granular train/validation/test split — see module
    docstring. The GPT-3/Gopher papers' decontamination post-mortems
    both trace to document-granular splits; assigning the split to
    the duplicate CLUSTER (representative's hash, members inherit)
    removes the train→test leak channel by construction, and the
    leaky_clusters column re-derives the guarantee from the doc-level
    assignment (must be 0) instead of assuming it.

    Scale shape: one exchange on the content fingerprint serves the
    representative window, and the same partitioning feeds the leak
    audit's per-cluster regroup; the split stamp is p10/c17's
    engine-portable md5 bucket (re-running the build never reshuffles
    membership — adding corpus never moves EXISTING clusters across
    splits, the incremental-refresh property p25 relies on). The
    3-row summary crossJoins the 1-row leak count (broadcast, the c52
    convention)."""
    d = load(spark, sf, "documents").select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.size(F.split("text", " ")).cast("bigint").alias("ntok"),
    )
    s = d.withColumn(
        "rep", F.min("doc_id").over(W.partitionBy("fp"))
    ).withColumn(
        "bucket",
        hash_bucket(F.concat(F.lit("p32:"), F.col("rep").cast("string"))),
    ).withColumn(
        "split",
        F.when(F.col("bucket") < _P32_TRAIN, "train")
        .when(F.col("bucket") < _P32_VAL, "validation")
        .otherwise("test"),
    )
    g = s.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("fp").cast("bigint").alias("n_clusters"),
        F.sum("ntok").cast("bigint").alias("n_tokens"),
    )
    leaks = (
        s.groupBy("fp")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count("*").cast("bigint").alias("leaky_clusters"))
    )
    return g.crossJoin(F.broadcast(leaks)).orderBy("split")
