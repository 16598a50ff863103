"""Round-9d operators: the corpus-statistics panel additions to
Layer C (SURVEY §2 / BASELINE.json north_star) — the distributional
diagnostics a data-mixing owner reads before setting source weights,
plus the per-document information-theoretic quality signal.

- c59: PAIRWISE SOURCE KL DIVERGENCE — KL(a ‖ b) between every pair
  of sources over hashed-unigram distributions (md5-prefix buckets,
  B=256 — c53's feature space), Laplace-smoothed (+1/(tot+B), c53's
  smoothing), every per-bucket contribution rounded to an INTEGER
  micro-nat before the sum (c23's ulp-absorption rule: a correctly-
  rounded-ish libm log difference vanishes under 1e-6 rounding, and
  integer sums are associative — shuffle order can never change the
  answer). The divergence matrix is what DoReMi-style mixing and
  duplication analysis read: "which sources are distributionally
  redundant, which are outliers".
- c60: GOOD-TURING UNSEEN-MASS AUDIT — per source: vocab size, token
  mass, singleton/doubleton counts, and the Good-Turing estimate of
  unseen probability mass (N1/N) plus the r=1 discounted count
  (2·N2/N1) — the "how much of this source's distribution have we
  NOT seen yet" number that says whether a source is exhausted or
  worth crawling deeper. Micro-integer outputs via single floor'd
  divisions.
- c61: WITHIN-DOCUMENT TOKEN ENTROPY — Shannon entropy of each doc's
  own token distribution plus entropy efficiency (H / ln V): the
  information-theoretic repetition/gibberish signal (low entropy =
  copy-paste loops; near-zero efficiency = one token dominating) —
  the quality cut the C4/RefinedWeb lineage applies alongside rule
  filters (p29) and n-gram repetition (p01).
- p31: N-GRAM LEAKAGE AUDIT — the GPT-3-appendix contamination
  measurement: per language, the fraction of test documents and test
  shingle mass shared with train. The prevention ops (p19/c22/c52)
  remove contamination; p31 is the number an eval-integrity report
  publishes afterwards.
- c62: CONTAINMENT DETECTION — Broder's asymmetric C(A→B) =
  |sh(A)∩sh(B)|/|sh(A)|, the quote/subset detector resemblance
  (Jaccard/MinHash) misses when B is much larger than A; exact over
  the c09 inverted-index discipline with a df cap.

Scale shapes: all ops make ONE pass over the token stream into a
(source, bucket)- or (source, token)-keyed aggregate with map-side
partials; everything after runs on model-sized tables (|S|·B rows for
c59 — the |S|² pair join is 256·|S|² rows of INTEGER arithmetic,
bucket-partitioned; |S| rows for c60). At 100 TB the corpus is read
once per op and never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# c59 — pairwise source KL divergence over hashed-unigram LMs
# ---------------------------------------------------------------------------

_C59_B = 256  # hashed feature buckets (c53's space)


def _c59_oracle() -> str:
    # round 14: the two smoothed-ratio lns evaluate through the
    # integer kernel, ONCE on the |S|·B model table — kn ≈
    # -1e6·ln((c+1)/(tot+B)) — and the pair join takes the kernel-
    # integer DIFFERENCE (kb - ka = 1e6·(ln ra - ln rb)); the only
    # float left is the IEEE-exact p_a weighting, identical
    # left-to-right in both engines.
    from iceberg_playground_spark.queries._util import (
        int_ln_micro_cte_sql,
    )

    chain = int_ln_micro_cte_sql(
        "fk", "source, bucket, c, tot", "kn", prefix="_kl"
    )
    return f"""
WITH t AS (
  SELECT source,
         CAST('0x' || substring(md5(unnest(string_split(text, ' '))), 1, 8)
              AS BIGINT) % {_C59_B} AS bucket
  FROM documents),
cnt AS (SELECT source, bucket, count(*) AS c FROM t GROUP BY source, bucket),
grid AS (
  SELECT s.source, b.i AS bucket
  FROM (SELECT DISTINCT source FROM documents) s,
       range(0, {_C59_B}) b(i)),
full_cnt AS (
  SELECT g.source, g.bucket, COALESCE(c.c, 0) AS c,
         sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.source) AS tot
  FROM grid g LEFT JOIN cnt c
    ON g.source = c.source AND g.bucket = c.bucket),
fk AS (
  SELECT source, bucket, c, tot,
         CAST(c + 1 AS BIGINT) AS num,
         CAST(tot + {_C59_B} AS BIGINT) AS den
  FROM full_cnt),
{chain},
terms AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(round(((a.c + 1) / CAST(a.tot + {_C59_B} AS DOUBLE))
                    * (b.kn - a.kn)) AS BIGINT) AS term
  FROM _kl_fin a JOIN _kl_fin b ON a.bucket = b.bucket
  WHERE a.source <> b.source)
SELECT src_a, src_b, CAST(sum(term) AS BIGINT) AS kl_micro
FROM terms GROUP BY src_a, src_b ORDER BY src_a, src_b
"""


@query("c59_source_kl_divergence", oracle=_c59_oracle())
def c59_source_kl_divergence(spark: SparkSession, sf: str) -> DataFrame:
    """C59: the source-divergence matrix — see module docstring.

    The bucket grid is completed (every (source, bucket) pair exists
    with count 0) BEFORE smoothing, so both marginals share the same
    support and KL is finite and exact; the pair join runs on the
    completed |S|·B model table, keyed by bucket — at 100 TB that
    join never sees a corpus row. Float ops per term: two smoothed
    divisions, two logs, one multiply — identical left-to-right
    shapes on both engines, then micro-rounded to an integer so the
    cross-pair sum is associative (c23/c53's rule)."""
    t = (
        load(spark, sf, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("token"))
        .select(
            "source",
            (
                F.conv(F.md5("token").substr(1, 8), 16, 10).cast("bigint")
                % _C59_B
            ).alias("bucket"),
        )
    )
    cnt = t.groupBy("source", "bucket").agg(F.count("*").alias("c"))
    grid = (
        load(spark, sf, "documents")
        .select("source")
        .distinct()
        .crossJoin(F.broadcast(spark.range(_C59_B).select(F.col("id").alias("bucket"))))
    )
    # lazily checkpointed: the a/b arms below would otherwise each
    # re-evaluate the whole token pass (the multi-consumer
    # re-evaluation pitfall — 4 corpus scans instead of 2)
    from iceberg_playground_spark.queries._util import int_ln_micro_col

    full_cnt = (
        grid.join(cnt, ["source", "bucket"], "left")
        .na.fill({"c": 0})
        .withColumn("tot", F.sum("c").over(W.partitionBy("source")))
    )
    # ONE kernel fold on the |S|·B model table (round 14: the libm
    # lns left this graded contract); kn ≈ -1e6·ln((c+1)/(tot+B))
    full_cnt = int_ln_micro_col(
        full_cnt.withColumn(
            "num", (F.col("c") + 1).cast("bigint")
        ).withColumn("den", (F.col("tot") + _C59_B).cast("bigint")),
        "num",
        "den",
        "kn",
        prefix="_kl",
    ).localCheckpoint(eager=False)
    a = full_cnt.select(
        F.col("source").alias("src_a"),
        "bucket",
        F.col("c").alias("ca"),
        F.col("tot").alias("tota"),
        F.col("kn").alias("ka"),
    )
    b = full_cnt.select(
        F.col("source").alias("src_b"),
        "bucket",
        F.col("kn").alias("kb"),
    )
    pa = (F.col("ca") + 1) / (F.col("tota") + _C59_B).cast("double")
    terms = (
        a.join(b, "bucket")
        .filter(F.col("src_a") != F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.round(pa * (F.col("kb") - F.col("ka")))
            .cast("bigint")
            .alias("term"),
        )
    )
    return (
        terms.groupBy("src_a", "src_b")
        .agg(F.sum("term").cast("bigint").alias("kl_micro"))
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# c60 — Good-Turing unseen-mass audit per source
# ---------------------------------------------------------------------------

_C60_ORACLE = """
WITH t AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
tc AS (SELECT source, token, count(*) AS c FROM t GROUP BY source, token)
SELECT source,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       CAST(floor(1000000.0 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                  / sum(c)) AS BIGINT) AS unseen_mass_micro,
       CAST(CASE WHEN sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) > 0
            THEN floor(1000000.0
                       * 2 * sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                       / sum(CASE WHEN c = 1 THEN 1 ELSE 0 END))
            ELSE 0 END AS BIGINT) AS r1_discounted_micro
FROM tc GROUP BY source ORDER BY source
"""


@query("c60_good_turing_audit", oracle=_C60_ORACLE)
def c60_good_turing_audit(spark: SparkSession, sf: str) -> DataFrame:
    """C60: Good-Turing unseen-mass audit (Good 1953) — see module
    docstring.

    Two-level aggregate (p29's shape): token stream → (source, token)
    counts → per-source frequency-of-frequency rollup. unseen mass =
    N1/N; the r=1 Good-Turing discounted count = 2·N2/N1 — each ONE
    floor'd division (deterministic); all other outputs exact
    integers. On this synthetic 31-word corpus N1 is tiny and the
    audit certifies the machinery (the c53 convention) — on a real
    crawl this is the "is the source exhausted" number."""
    t = load(spark, sf, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    tc = t.groupBy("source", "token").agg(F.count("*").alias("c"))
    n1 = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    n2 = F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
    return (
        tc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("vocab"),
            F.sum("c").cast("bigint").alias("n_tokens"),
            n1.cast("bigint").alias("n1"),
            n2.cast("bigint").alias("n2"),
            F.floor(1000000.0 * n1 / F.sum("c")).cast("bigint")
            .alias("unseen_mass_micro"),
            F.when(
                n1 > 0, F.floor(1000000.0 * 2 * n2 / n1)
            )
            .otherwise(0)
            .cast("bigint")
            .alias("r1_discounted_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# c61 — within-document token entropy (gibberish/repetition signal)
# ---------------------------------------------------------------------------

# round 14: both lns evaluate through the integer kernel — the term's
# ln(c/n) is an integer ratio (term = c · kernel(c, n), scaled AFTER
# the kernel so the per-(doc,token) integer is exact), and the
# efficiency denominator ln(vocab) = ln(vocab/1)
_C61_ORACLE_T = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tc AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY doc_id, token),
g0 AS (
  SELECT doc_id, CAST(c AS BIGINT) AS num,
         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS den
  FROM tc),
{chain_t},
g AS (
  SELECT doc_id, max(den) AS n, sum(num * lnm) AS h_num_micro,
         count(*) AS vocab
  FROM _ct_fin GROUP BY doc_id),
gk AS (SELECT doc_id, n, h_num_micro, vocab,
              CAST(1 AS BIGINT) AS num, CAST(vocab AS BIGINT) AS den
       FROM g),
{chain_v}
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tok,
       CAST(vocab AS BIGINT) AS vocab,
       CAST(floor(CAST(h_num_micro AS DOUBLE) / n) AS BIGINT)
         AS entropy_micro,
       CAST(CASE WHEN vocab = 1 THEN 0
                 ELSE floor(1000000.0 * floor(CAST(h_num_micro AS DOUBLE)
                                              / n)
                            / lnv)
            END AS BIGINT) AS efficiency_micro
FROM _lv_fin ORDER BY doc_id
"""


def _c61_oracle() -> str:
    from iceberg_playground_spark.queries._util import (
        int_ln_micro_cte_sql,
    )

    return _C61_ORACLE_T.format(
        chain_t=int_ln_micro_cte_sql("g0", "doc_id", "lnm", prefix="_ct"),
        chain_v=int_ln_micro_cte_sql(
            "gk", "doc_id, n, h_num_micro, vocab", "lnv", prefix="_lv"
        ),
    )


@query("c61_token_entropy", oracle=_c61_oracle())
def c61_token_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """C61: within-document Shannon token entropy + entropy
    efficiency (H / ln V) — the gibberish-vs-repetition quality
    signal (low entropy = copy-paste loops, near-zero efficiency =
    one token dominating; complements p01's n-gram repetition filter
    with the information-theoretic form the C4/RefinedWeb lineage
    filters on).

    Determinism: each (doc, token) term -c·ln(c/n) = c·kernel(c, n)
    evaluates through the shared integer-ln kernel (round 14 — libm
    left this graded contract too; the count window and the term ride
    the SAME (doc, token) aggregate), so per-doc entropy =
    floor(Σterms / n) is exact integer arithmetic after one floor'd
    division; efficiency divides by the kernel's ln(vocab/1). Scale shape: p29's two-level aggregate —
    token stream → (doc, token) counts (map-side partials) → doc
    rollup; the n-for-normalization rides a window OVER THE COUNTS
    TABLE (model-sized rows), never a second corpus pass; single
    scan, plan-pinned."""
    t = load(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    from iceberg_playground_spark.queries._util import int_ln_micro_col

    tc = t.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    n_win = F.sum("c").over(W.partitionBy("doc_id"))
    g0 = tc.select(
        "doc_id",
        F.col("c").cast("bigint").alias("c"),
        n_win.cast("bigint").alias("n"),
    )
    terms = int_ln_micro_col(g0, "c", "n", "lnm", prefix="_ct").withColumn(
        "term", F.col("c") * F.col("lnm")
    )
    g = terms.groupBy("doc_id").agg(
        F.max("n").alias("n"),
        F.sum("term").alias("h_num_micro"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    g = int_ln_micro_col(g, "1", "vocab", "lnv", prefix="_lv")
    entropy = F.floor(F.col("h_num_micro").cast("double") / F.col("n"))
    return g.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tok"),
        F.col("vocab").cast("bigint").alias("vocab"),
        entropy.cast("bigint").alias("entropy_micro"),
        F.when(F.col("vocab") == 1, 0)
        .otherwise(F.floor(1000000.0 * entropy / F.col("lnv")))
        .cast("bigint")
        .alias("efficiency_micro"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# p31 — n-gram leakage audit across the train/test split
# ---------------------------------------------------------------------------

_P31_TEST_FROM = 90  # md5 stamp >= 90 -> test (c17's split convention)


def _p31_digest_sql(sh: str) -> str:
    return f"CAST('0x' || substring(md5({sh}), 1, 8) AS BIGINT)"


_P31_SH_SQL = """list_distinct(list_transform(
      range(1, len(string_split(text, ' ')) - 2),
      i -> string_split(text, ' ')[i] || ' ' ||
           string_split(text, ' ')[i+1] || ' ' ||
           string_split(text, ' ')[i+2] || ' ' ||
           string_split(text, ' ')[i+3]))"""


def _p31_shingles(toks):
    """w=4 shingles, llm._shingles' zip shape widened one slot."""
    n = F.size(toks)
    z = F.arrays_zip(
        F.slice(toks, 1, n - 3).alias("a"),
        F.slice(toks, 2, n - 3).alias("b"),
        F.slice(toks, 3, n - 3).alias("c"),
        F.slice(toks, 4, n - 3).alias("d"),
    )
    grams = F.transform(
        z, lambda t: F.concat_ws(" ", t["a"], t["b"], t["c"], t["d"])
    )
    return F.array_distinct(F.when(n >= 4, grams).otherwise(F.array()))


def _p31_oracle() -> str:
    from iceberg_playground_spark.queries._util import bucket_sql

    _SH_SQL = _P31_SH_SQL
    bkt = bucket_sql("doc_id")
    return f"""
WITH d AS (SELECT doc_id, lang, text, {bkt} AS bkt FROM documents),
tr_sh AS (
  SELECT DISTINCT {_p31_digest_sql('sh')} AS dg
  FROM (SELECT unnest({_SH_SQL}) AS sh FROM d WHERE bkt < {_P31_TEST_FROM})),
te_sh AS (
  SELECT doc_id, lang, {_p31_digest_sql('sh')} AS dg
  FROM (SELECT doc_id, lang, unnest({_SH_SQL}) AS sh
        FROM d WHERE bkt >= {_P31_TEST_FROM})),
hits AS (
  SELECT t.doc_id, t.lang,
         CASE WHEN tr.dg IS NULL THEN 0 ELSE 1 END AS hit
  FROM te_sh t LEFT JOIN tr_sh tr ON t.dg = tr.dg),
per_doc AS (
  SELECT doc_id, lang, count(*) AS n_sh, sum(hit) AS n_dirty
  FROM hits GROUP BY doc_id, lang),
docs AS (
  SELECT lang, count(*) AS n_test_docs
  FROM d WHERE bkt >= {_P31_TEST_FROM} GROUP BY lang)
SELECT docs.lang,
       CAST(docs.n_test_docs AS BIGINT) AS n_test_docs,
       CAST(COALESCE(sum(CASE WHEN n_dirty > 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_dirty_docs,
       CAST(COALESCE(sum(n_sh), 0) AS BIGINT) AS test_shingles,
       CAST(COALESCE(sum(n_dirty), 0) AS BIGINT) AS dirty_shingles,
       CAST(floor(1000000.0 * COALESCE(sum(n_dirty), 0)
                  / COALESCE(sum(n_sh), 1)) AS BIGINT) AS overlap_micro
FROM docs LEFT JOIN per_doc ON docs.lang = per_doc.lang
GROUP BY docs.lang, docs.n_test_docs ORDER BY docs.lang
"""


@query("p31_ngram_leakage_audit", oracle=_p31_oracle())
def p31_ngram_leakage_audit(spark: SparkSession, sf: str) -> DataFrame:
    """P31: post-hoc n-gram contamination audit across the train/test
    split — the GPT-3-appendix leakage measurement (shared-n-gram
    rate between eval and training data) that p19/c22/c52 PREVENT and
    this op MEASURES: per language, how many test documents share at
    least one shingle with train, and what fraction of test shingle
    mass is contaminated. w=4 shingles here, scaled to the 31-word
    synthetic vocabulary (real audits use 8-13-grams; w=3 saturates
    this corpus at ~99.9% and w=8 reads empty — w=4 lands at the
    background-collision floor a real audit subtracts) — the c48/c53
    calibration convention. The kernel is llm.py's _shingles zip
    shape widened one slot, so the audit measures the same
    shingle-granularity family the dedup ops operate on.

    Scale shape: shingles digest to BIGINTs BEFORE the join (c43's
    digests-only discipline — shingle text never shuffles); the train
    side collapses to a DISTINCT digest set (map-side partials); the
    test-vs-train probe is one digest equi-join; per-doc and per-lang
    rollups run on count rows. Three corpus scans (train shingles,
    test shingles, per-lang doc counts), no cartesian."""
    from iceberg_playground_spark.queries._util import hash_bucket

    _shingles = _p31_shingles
    d = load(spark, sf, "documents").select(
        "doc_id", "lang", "text", hash_bucket(F.col("doc_id")).alias("bkt")
    )
    toks = F.split("text", " ")

    def digests(df: DataFrame, *keep: str) -> DataFrame:
        return df.select(
            *keep, F.explode(_shingles(toks)).alias("sh")
        ).select(
            *keep,
            F.conv(F.md5("sh").substr(1, 8), 16, 10)
            .cast("bigint")
            .alias("dg"),
        )

    tr_sh = digests(d.filter(F.col("bkt") < _P31_TEST_FROM)).distinct()
    te_sh = digests(
        d.filter(F.col("bkt") >= _P31_TEST_FROM), "doc_id", "lang"
    )
    hits = te_sh.join(
        tr_sh.withColumn("hit", F.lit(1)), "dg", "left"
    ).na.fill({"hit": 0})
    per_doc = hits.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_sh"), F.sum("hit").alias("n_dirty")
    )
    docs = (
        d.filter(F.col("bkt") >= _P31_TEST_FROM)
        .groupBy("lang")
        .agg(F.count("*").alias("n_test_docs"))
    )
    return (
        docs.join(per_doc, "lang", "left")
        .groupBy("lang", "n_test_docs")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("n_dirty") > 0, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_dirty_docs"),
            F.coalesce(F.sum("n_sh"), F.lit(0))
            .cast("bigint")
            .alias("test_shingles"),
            F.coalesce(F.sum("n_dirty"), F.lit(0))
            .cast("bigint")
            .alias("dirty_shingles"),
            F.floor(
                1000000.0
                * F.coalesce(F.sum("n_dirty"), F.lit(0))
                / F.coalesce(F.sum("n_sh"), F.lit(1))
            )
            .cast("bigint")
            .alias("overlap_micro"),
        )
        .select(
            "lang",
            F.col("n_test_docs").cast("bigint").alias("n_test_docs"),
            "n_dirty_docs",
            "test_shingles",
            "dirty_shingles",
            "overlap_micro",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# c62 — containment detection (Broder's asymmetric measure)
# ---------------------------------------------------------------------------

_C62_DF_CAP = 32  # drop shingles hotter than this from the index
_C62_MIN_MICRO = 500_000  # report pairs with containment >= 50%


def _c62_oracle() -> str:
    from iceberg_playground_spark.queries.llm import _SH_SQL

    dg = "CAST('0x' || substring(md5(sh), 1, 8) AS BIGINT)"
    return f"""
WITH t AS (SELECT doc_id, {_SH_SQL} AS shs FROM documents),
e AS (SELECT doc_id, {dg} AS dg
      FROM (SELECT doc_id, unnest(shs) AS sh FROM t)),
df AS (SELECT dg, count(*) AS d FROM e GROUP BY dg),
kept AS (SELECT e.doc_id, e.dg FROM e JOIN df ON e.dg = df.dg
         WHERE df.d <= {_C62_DF_CAP}),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM kept a JOIN kept b ON a.dg = b.dg AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id),
sz AS (SELECT doc_id, len(shs) AS a_sh FROM t)
SELECT p.a_id, p.b_id,
       CAST(p.inter AS BIGINT) AS inter,
       CAST(sz.a_sh AS BIGINT) AS a_sh,
       CAST(floor(1000000.0 * p.inter / sz.a_sh) AS BIGINT)
         AS contain_micro
FROM pairs p JOIN sz ON p.a_id = sz.doc_id
WHERE floor(1000000.0 * p.inter / sz.a_sh) >= {_C62_MIN_MICRO}
ORDER BY p.a_id, p.b_id
"""


@query("c62_containment_detect", oracle=_c62_oracle())
def c62_containment_detect(spark: SparkSession, sf: str) -> DataFrame:
    """C62: shingle containment detection — Broder (1997)'s ASYMMETRIC
    measure C(A→B) = |sh(A)∩sh(B)| / |sh(A)|, the quote/subset
    detector the dedup family still lacked: resemblance (c09's
    Jaccard, c31's MinHash) misses "B embeds all of A" whenever B is
    much larger, which is exactly the quotes/boilerplate-reuse case a
    corpus audit needs. Reports every ordered pair with ≥50%
    containment of the A side (trigram shingles — llm.py's kernel).

    Scale shape: c09's inverted-index discipline — shingles digest to
    BIGINTs (text never shuffles), the postings self-join is bounded
    by Σ df² with hot shingles dropped at df ≤ {_C62_DF_CAP}
    (standard containment-index practice: a shingle shared by
    everyone identifies nothing, and rare shingles carry the
    signal — the cap makes the pair stage's cost a TUNABLE, not a
    corpus-size consequence); the intersection is symmetric, so each
    unordered pair is generated and counted ONCE (halving the Σ df²
    shuffle — the cell's dominant cost, measured 5.95 → 4.8 s at
    sf0.1) and both directed containment rows derive from it; the
    one division lands in a floor'd micro at the output boundary."""
    from iceberg_playground_spark.queries.llm import _shingles

    # hash-repartition ahead of the shingle digest pass (c31's rule,
    # round 17): the explode + per-shingle md5 otherwise inherits the
    # scan's one-split partitioning and runs single-core — and the
    # checkpointed digest RDD inherits that single partition too
    # (cell measured 5.3 -> 2.7 s at sf0.1 on 32 cores)
    t = (
        load(spark, sf, "documents")
        .select("doc_id", _shingles(F.split("text", " ")).alias("shs"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    # digest rows feed THREE consumers (the df table, the kept join
    # side, and — via the per-doc count — the size table); without a
    # checkpoint each consumer re-runs the shingle explode + md5 over
    # the corpus (round 16: 3 scans -> 1, digest rows are BIGINTs)
    e = (
        t.select("doc_id", F.explode("shs").alias("sh"))
        .select(
            "doc_id",
            F.conv(F.md5("sh").substr(1, 8), 16, 10)
            .cast("bigint")
            .alias("dg"),
        )
        .localCheckpoint(eager=False)
    )
    df_tbl = e.groupBy("dg").agg(F.count("*").alias("d"))
    kept = (
        e.join(df_tbl, "dg")
        .filter(F.col("d") <= _C62_DF_CAP)
        .select("doc_id", "dg")
    )
    a = kept.select(F.col("doc_id").alias("x_id"), "dg")
    b = kept.select(F.col("doc_id").alias("y_id"), "dg")
    # the intersection |sh(A) ∩ sh(B)| is SYMMETRIC, so the pair stage
    # generates each unordered pair once (x < y) — halving the Σdf²
    # shuffle, the cell's dominant cost — and both directed
    # containment rows derive from the one counted pair afterwards
    pairs = (
        a.join(b, "dg")
        .filter(F.col("x_id") < F.col("y_id"))
        .groupBy("x_id", "y_id")
        .agg(F.count("*").alias("inter"))
    )
    # size(shs) == the doc's row count in e (shingles are per-doc
    # distinct), so derive sizes from the checkpointed digests instead
    # of a third shingle pass; docs with zero shingles can't appear in
    # pairs (they have no kept rows), so their absence here is moot
    sz = e.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sx = sz.select(F.col("doc_id").alias("x_id"), F.col("n_sh").alias("x_sh"))
    sy = sz.select(F.col("doc_id").alias("y_id"), F.col("n_sh").alias("y_sh"))
    both = (
        pairs.join(sx, "x_id")
        .join(sy, "y_id")
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("x_id").alias("a_id"),
                        F.col("y_id").alias("b_id"),
                        F.col("inter").alias("inter"),
                        F.col("x_sh").alias("a_sh"),
                    ),
                    F.struct(
                        F.col("y_id").alias("a_id"),
                        F.col("x_id").alias("b_id"),
                        F.col("inter").alias("inter"),
                        F.col("y_sh").alias("a_sh"),
                    ),
                )
            ).alias("r")
        )
        .select("r.a_id", "r.b_id", "r.inter", "r.a_sh")
    )
    contain = F.floor(1000000.0 * F.col("inter") / F.col("a_sh"))
    return (
        both.select(
            "a_id",
            "b_id",
            F.col("inter").cast("bigint").alias("inter"),
            F.col("a_sh").cast("bigint").alias("a_sh"),
            contain.cast("bigint").alias("contain_micro"),
        )
        .filter(F.col("contain_micro") >= _C62_MIN_MICRO)
        .orderBy("a_id", "b_id")
    )
