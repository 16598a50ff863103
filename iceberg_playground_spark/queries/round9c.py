"""Round-9c operators: three more Layer-C additions (SURVEY §2
Layer C / BASELINE.json north_star), hash-graded via the repo's
exact-integer determinism discipline.

- p29: GOPHER QUALITY RULES — the published rule bundle (Rae et al.
  2021, Gopher appendix A1.1) as a per-document flag report: word
  count bounds, mean-word-length bounds, stopword containment, and
  top-token mass (the single-line synthetic corpus has no symbols,
  bullets, or line structure, so the line-based rules are n/a here
  and the thresholds are calibrated to this corpus — the c48/c53
  "certify the machinery" convention). Every ratio rule
  CROSS-MULTIPLIES in integers (mean length in [4.2, 4.8] ⟺
  42·words ≤ 10·chars ≤ 48·words) so no float division ever crosses
  an engine boundary.
- c58: COUNT-MIN SKETCH HEAVY HITTERS — completes the sketch family
  (c34 HLL / c41 theta / c42 KLL are rows-only engine-native; c58 is
  the first HASH-GRADED sketch): 2 md5-salted hash rows × 8 cells
  (deliberately undersized so collisions are VISIBLE), the classic
  CMS overestimate guarantee (est ≥ exact, graded per-token)
  demonstrated against exact counts for the top-10 tokens. The
  sketch is a 16-cell mergeable aggregate — the whole
  point at 100 TB: sketch size is independent of corpus size,
  map-side partials do the compression, and only cell totals ever
  shuffle.
- p30: TOKEN-BUDGET FILL — the assembly step that turns "sample
  sources at these weights" into an actual corpus cut: each source
  gets a token budget (α=0.5 temperature re-weighting of its natural
  token mass — c35's exponent discipline via integer sqrt), docs are
  ranked by the p10 md5 stamp (the seeded-shuffle rule), and the
  cumulative token window takes the longest prefix whose token sum
  fits the budget. Graded per source: budget, docs taken, tokens
  taken, fill ratio (micro). The window partitions BY SOURCE — the
  deterministic-parallelism contract; at 100 TB each source's
  cumsum is an independent partition-local scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# p29 — Gopher quality rules (Rae et al. 2021, corpus-calibrated)
# ---------------------------------------------------------------------------

_P29_WC_LO, _P29_WC_HI = 25, 90  # word-count bounds
# mean word length in [4.2, 4.8] (the corpus' 10th-90th pct band):
# 42*words <= 10*chars <= 48*words — cross-multiplied, never divided
_P29_ML_LO10, _P29_ML_HI10 = 42, 48
_P29_STOPS = ("a", "the")  # the corpus' function words
_P29_STOP_MIN = 3  # doc must contain >= 3 stopword instances
_P29_TOP_PCT10 = 2  # top token must be < 20% of tokens: 10*max < 2*10*n/10

_P29_ORACLE = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
g0 AS (
  SELECT doc_id, token, count(*) AS cnt FROM t GROUP BY doc_id, token),
g AS (
  SELECT doc_id, sum(cnt) AS n_words,
         sum(length(token) * cnt) AS sum_len,
         sum(CASE WHEN token IN ('a', 'the') THEN cnt ELSE 0 END)
           AS n_stop,
         max(cnt) AS top_cnt
  FROM g0 GROUP BY doc_id)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(CASE WHEN n_words BETWEEN {_P29_WC_LO} AND {_P29_WC_HI}
            THEN 1 ELSE 0 END AS BIGINT) AS wc_ok,
       CAST(CASE WHEN {_P29_ML_LO10} * n_words <= 10 * sum_len
                  AND 10 * sum_len <= {_P29_ML_HI10} * n_words
            THEN 1 ELSE 0 END AS BIGINT) AS mlen_ok,
       CAST(CASE WHEN n_stop >= {_P29_STOP_MIN} THEN 1 ELSE 0 END
            AS BIGINT) AS stop_ok,
       CAST(CASE WHEN 10 * top_cnt < {_P29_TOP_PCT10} * n_words
            THEN 1 ELSE 0 END AS BIGINT) AS topmass_ok,
       CAST(CASE WHEN n_words BETWEEN {_P29_WC_LO} AND {_P29_WC_HI}
                  AND {_P29_ML_LO10} * n_words <= 10 * sum_len
                  AND 10 * sum_len <= {_P29_ML_HI10} * n_words
                  AND n_stop >= {_P29_STOP_MIN}
                  AND 10 * top_cnt < {_P29_TOP_PCT10} * n_words
            THEN 1 ELSE 0 END AS BIGINT) AS pass
FROM g ORDER BY doc_id
"""


@query("p29_gopher_quality_rules", oracle=_P29_ORACLE)
def p29_gopher_quality_rules(spark: SparkSession, sf: str) -> DataFrame:
    """P29: the Gopher rule bundle — see module docstring.

    Two-level aggregate: the token stream collapses to (doc, token)
    counts first (map-side partials absorb the hot tokens), then a
    doc-keyed aggregate derives ALL four rule inputs from those
    counts (n_words = Σcnt, char mass = Σ len·cnt, stopword hits,
    top-token count = max cnt) — the second exchange moves
    per-(doc, distinct-token) rows, strictly smaller than the token
    stream. Every threshold compares integers (cross-multiplied
    ratios), so the flags are bit-identical on both engines."""
    return _gopher_flags(
        load(spark, sf, "documents").select("doc_id", "text")
    ).orderBy("doc_id")


def _gopher_flags(docs: DataFrame) -> DataFrame:
    """The Gopher rule bundle over ANY (doc_id, text) frame — p29's
    body, factored out so p36's micro-batches gate with the IDENTICAL
    expression tree (the flags are per-doc, hence batch-local, so
    stream/batch parity is structural)."""
    t = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    g0 = t.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    g = g0.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.length("token") * F.col("cnt")).alias("sum_len"),
        F.sum(
            F.when(
                F.col("token").isin(*_P29_STOPS), F.col("cnt")
            ).otherwise(0)
        ).alias("n_stop"),
        F.max("cnt").alias("top_cnt"),
    )
    wc_ok = (F.col("n_words") >= _P29_WC_LO) & (
        F.col("n_words") <= _P29_WC_HI
    )
    mlen_ok = (
        _P29_ML_LO10 * F.col("n_words") <= 10 * F.col("sum_len")
    ) & (10 * F.col("sum_len") <= _P29_ML_HI10 * F.col("n_words"))
    stop_ok = F.col("n_stop") >= _P29_STOP_MIN
    topmass_ok = 10 * F.col("top_cnt") < _P29_TOP_PCT10 * F.col("n_words")
    flag = lambda c: F.when(c, 1).otherwise(0).cast("bigint")  # noqa: E731
    return g.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        flag(wc_ok).alias("wc_ok"),
        flag(mlen_ok).alias("mlen_ok"),
        flag(stop_ok).alias("stop_ok"),
        flag(topmass_ok).alias("topmass_ok"),
        flag(wc_ok & mlen_ok & stop_ok & topmass_ok).alias("pass"),
    )


# ---------------------------------------------------------------------------
# c58 — count-min sketch heavy hitters (the hash-graded sketch)
# ---------------------------------------------------------------------------

_C58_W = 8  # cells per hash row — deliberately undersized (c52's rule)
_C58_D = 2  # hash rows — so collisions are VISIBLE and the overcount
_C58_TOPK = 10  # column actually grades the estimate-vs-exact gap


def _c58_cell_sql(row: int, tok: str) -> str:
    return (
        f"CAST('0x' || substring(md5('s{row}:' || {tok}), 1, 8) "
        f"AS BIGINT) % {_C58_W}"
    )


def _c58_oracle() -> str:
    cells = " UNION ALL ".join(
        f"SELECT {j} AS j, {_c58_cell_sql(j, 'token')} AS cell, token FROM t"
        for j in range(_C58_D)
    )
    return f"""
WITH t AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
exact AS (
  SELECT token, count(*) AS exact_cnt FROM t GROUP BY token
  ORDER BY exact_cnt DESC, token LIMIT {_C58_TOPK}),
h AS ({cells}),
cms AS (SELECT j, cell, count(*) AS c FROM h GROUP BY j, cell),
est AS (
  SELECT e.token, e.exact_cnt, min(m.c) AS cms_est
  FROM exact e
  JOIN (SELECT DISTINCT j, cell, token FROM h) hh ON hh.token = e.token
  JOIN cms m ON m.j = hh.j AND m.cell = hh.cell
  GROUP BY e.token, e.exact_cnt)
SELECT token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est ORDER BY exact_cnt DESC, token
"""


@query("c58_countmin_heavy_hitters", oracle=_c58_oracle())
def c58_countmin_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """C58: count-min sketch (Cormode & Muthukrishnan 2005) heavy
    hitters — see module docstring.

    The sketch is the 2×8-cell aggregate (_C58_D rows × _C58_W
    cells, deliberately undersized so collisions show): every token
    instance maps to 2 (row, cell) pairs via md5-salted hashes
    (deterministic — the reason this sketch can be HASH-graded while
    c34/c41/c42's engine-native sketches are rows-only), cells
    count-aggregate with map-side partials, and the estimate for a
    token is min over rows of its cell counts — ≥ exact by
    construction, with the overcount graded per token. Scale shape:
    corpus → 16 cells (mergeable, shard-and-merge friendly; a
    production sketch widens _C58_W without changing the plan); the
    top-10 exact arm lowers to TakeOrderedAndProject; the estimate
    join is 10·2 probe rows against 16 cells — both sides
    broadcast-sized regardless of corpus size."""
    t = load(spark, sf, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    cell = lambda j: (  # noqa: E731
        F.conv(
            F.md5(F.concat(F.lit(f"s{j}:"), F.col("token"))).substr(1, 8),
            16,
            10,
        ).cast("bigint")
        % _C58_W
    )
    h = t.select(
        "token",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), cell(j).alias("cell"))
                for j in range(_C58_D)
            ])
        ).alias("jc"),
    ).select("token", "jc.j", "jc.cell")
    cms = h.groupBy("j", "cell").agg(F.count("*").alias("c"))
    exact = (
        t.groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(_C58_TOPK)
    )
    probes = exact.select(
        "token",
        "exact_cnt",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), cell(j).alias("cell"))
                for j in range(_C58_D)
            ])
        ).alias("jc"),
    ).select("token", "exact_cnt", "jc.j", "jc.cell")
    return (
        F.broadcast(probes)
        .join(cms, ["j", "cell"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "token",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_cnt"))
            .cast("bigint")
            .alias("overcount"),
        )
        .orderBy(F.col("exact_cnt").desc(), "token")
    )


# ---------------------------------------------------------------------------
# p30 — token-budget fill (temperature-weighted corpus cut)
# ---------------------------------------------------------------------------

_P30_BUDGET_PCT = 40  # total budget = 40% of corpus token mass


def _p30_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) AS stamp
  FROM documents),
mass AS (SELECT source, sum(n_tok) AS src_tok FROM d GROUP BY source),
wt AS (
  SELECT source, src_tok,
         CAST(floor(sqrt(CAST(src_tok AS DOUBLE)) * 1000000) AS BIGINT)
           AS w_micro
  FROM mass),
bud AS (
  SELECT source, src_tok,
         CAST(floor(
           CAST(w_micro AS DOUBLE) / sum(w_micro) OVER ()
           * ({_P30_BUDGET_PCT} / 100.0)
           * sum(src_tok) OVER ()) AS BIGINT) AS budget_tok
  FROM wt),
r AS (
  SELECT d.doc_id, d.source, d.n_tok, b.budget_tok, b.src_tok,
         sum(d.n_tok) OVER (PARTITION BY d.source
                            ORDER BY d.stamp, d.doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_tok
  FROM d JOIN bud b ON d.source = b.source)
SELECT source,
       CAST(max(src_tok) AS BIGINT) AS src_tok,
       CAST(max(budget_tok) AS BIGINT) AS budget_tok,
       CAST(sum(CASE WHEN cum_tok <= budget_tok THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_taken,
       CAST(COALESCE(sum(CASE WHEN cum_tok <= budget_tok
                          THEN n_tok END), 0) AS BIGINT) AS tokens_taken,
       CAST(floor(1000000.0 * COALESCE(sum(CASE WHEN cum_tok <= budget_tok
                                         THEN n_tok END), 0)
                  / max(budget_tok)) AS BIGINT) AS fill_micro
FROM r GROUP BY source ORDER BY source
"""


@query("p30_token_budget_fill", oracle=_p30_oracle())
def p30_token_budget_fill(spark: SparkSession, sf: str) -> DataFrame:
    """P30: temperature-weighted token-budget fill — see module
    docstring.

    Budgets: source weight = floor(sqrt(src_tokens)·1e6) (α=0.5
    temperature, integer micro-weights — sqrt and ONE division are
    the only float ops and both are single correctly-rounded IEEE
    steps, c35's discipline); total budget = {_P30_BUDGET_PCT}% of
    corpus token mass, split ∝ weight. The cut: docs rank by the
    md5 stamp (p10's seeded shuffle — a reproducible "random" order),
    the per-source cumulative token window takes the longest prefix
    with cum ≤ budget. fill_micro grades how close the greedy prefix
    lands (never over; under only by the first rejected doc)."""
    d = load(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        F.conv(F.md5(F.col("doc_id").cast("string")).substr(1, 8), 16, 10)
        .cast("bigint")
        .alias("stamp"),
    )
    mass = d.groupBy("source").agg(F.sum("n_tok").alias("src_tok"))
    wt = mass.select(
        "source",
        "src_tok",
        F.floor(F.sqrt(F.col("src_tok").cast("double")) * 1000000)
        .cast("bigint")
        .alias("w_micro"),
    )
    wall = W.partitionBy()
    bud = wt.select(
        "source",
        "src_tok",
        F.floor(
            F.col("w_micro").cast("double")
            / F.sum("w_micro").over(wall)
            * (_P30_BUDGET_PCT / 100.0)
            * F.sum("src_tok").over(wall)
        )
        .cast("bigint")
        .alias("budget_tok"),
    )
    cum = W.partitionBy("source").orderBy("stamp", "doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    r = d.join(F.broadcast(bud), "source").withColumn(
        "cum_tok", F.sum("n_tok").over(cum)
    )
    taken = F.when(F.col("cum_tok") <= F.col("budget_tok"), 1).otherwise(0)
    taken_tok = F.when(
        F.col("cum_tok") <= F.col("budget_tok"), F.col("n_tok")
    )
    return (
        r.groupBy("source")
        .agg(
            F.max("src_tok").cast("bigint").alias("src_tok"),
            F.max("budget_tok").cast("bigint").alias("budget_tok"),
            F.sum(taken).cast("bigint").alias("docs_taken"),
            F.coalesce(F.sum(taken_tok), F.lit(0))
            .cast("bigint")
            .alias("tokens_taken"),
            F.floor(
                1000000.0
                * F.coalesce(F.sum(taken_tok), F.lit(0))
                / F.max("budget_tok")
            )
            .cast("bigint")
            .alias("fill_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# b156 — skyline (Pareto frontier) via grid-prune + exact pass
# ---------------------------------------------------------------------------

_B156_GRID = 100  # price cents per grid cell (1-dollar buckets)


def _b156_oracle() -> str:
    return """
WITH pts AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cc,
         -CAST(p_size AS BIGINT) AS sz
  FROM part),
b AS (SELECT *, CAST(floor(price_cc / 100.0) AS BIGINT) AS bucket
      FROM pts),
bmin AS (SELECT bucket, min(sz) AS m FROM b GROUP BY bucket),
pre AS (
  SELECT bucket,
         min(m) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pre_min
  FROM bmin),
surv AS (
  SELECT b.p_partkey, b.price_cc, b.sz
  FROM b JOIN pre ON b.bucket = pre.bucket
  WHERE pre.pre_min IS NULL OR b.sz < pre.pre_min),
pgm AS (SELECT price_cc, min(sz) AS gmin FROM surv GROUP BY price_cc),
pp AS (
  SELECT price_cc, gmin,
         min(gmin) OVER (ORDER BY price_cc
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pre_p
  FROM pgm)
SELECT s.p_partkey, s.price_cc, -s.sz AS p_size
FROM surv s JOIN pp ON s.price_cc = pp.price_cc
WHERE s.sz = pp.gmin AND (pp.pre_p IS NULL OR s.sz < pp.pre_p)
ORDER BY s.p_partkey
"""


@query("b156_skyline", oracle=_b156_oracle())
def b156_skyline(spark: SparkSession, sf: str) -> DataFrame:
    """B156: 2-D skyline (Pareto frontier — min price, MAX size:
    the "cheap and large" value frontier) as
    pure relational ops, the Spark-SQL-integration shape of the
    skyline literature (PAPERS.md: "Integration of Skyline Queries
    into Spark SQL", EDBT 2023 — their answer is a custom physical
    operator; ours re-expresses the classic grid-pruned distributed
    skyline with groupBy/window/broadcast so Catalyst plans it).

    Algorithm (provably exact — dominance is transitive, so every
    dominated point has a SKYLINE dominator, and the checks below
    test against exactly the sets that dominator must appear in):
    1. GRID PRUNE: floor-grid on price (1-dollar cells); per-cell
       best (max) size; running strict-prefix best over the ~100-row
       cell table. A point no larger than the prefix best is
       dominated by a strictly-cheaper cell's point and drops.
       Skyline points can never drop (their would-be dominator
       contradicts skylinehood). Size is negated internally so the
       whole pipeline is the canonical min-min skyline.
    2. EXACT PASS over the surviving fringe: per-price best size
       (same-price domination) + strict-prefix best over the
       per-price table (cheaper-price domination); both windows run
       over aggregate rows, never corpus rows.

    Scale shape: one |cells|-row aggregate + broadcast back (the
    corpus never shuffles to be pruned); the fringe is bounded by the
    grid granularity (at 100 TB, pick the grid so one cell's fringe
    fits a task — cents-level cells make the fringe one price point);
    the fringe is lazily checkpointed so the exact pass costs 2 scans
    total, and both exact-pass windows run over per-price AGGREGATE
    rows. No nested loop, no global sort of the input anywhere —
    compare the textbook NOT EXISTS self-join (quadratic), which the
    sf0.001 brute-force pytest uses to prove this algorithm equal to
    the definition."""
    pts = load(spark, sf, "part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cc"),
        (-F.col("p_size").cast("bigint")).alias("sz"),
    )
    b = pts.withColumn(
        "bucket", F.floor(F.col("price_cc") / float(_B156_GRID)).cast("bigint")
    )
    bmin = b.groupBy("bucket").agg(F.min("sz").alias("m"))
    wpre = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    pre = bmin.select("bucket", F.min("m").over(wpre).alias("pre_min"))
    surv = (
        b.join(F.broadcast(pre), "bucket")
        .filter(F.col("pre_min").isNull() | (F.col("sz") < F.col("pre_min")))
        .select("p_partkey", "price_cc", "sz")
        .localCheckpoint(eager=False)
    )
    pgm = surv.groupBy("price_cc").agg(F.min("sz").alias("gmin"))
    wp = W.orderBy("price_cc").rowsBetween(W.unboundedPreceding, -1)
    pp = pgm.select("price_cc", "gmin", F.min("gmin").over(wp).alias("pre_p"))
    return (
        surv.join(F.broadcast(pp), "price_cc")
        .filter(
            (F.col("sz") == F.col("gmin"))
            & (F.col("pre_p").isNull() | (F.col("sz") < F.col("pre_p")))
        )
        .select("p_partkey", "price_cc", (-F.col("sz")).alias("p_size"))
        .orderBy("p_partkey")
    )
