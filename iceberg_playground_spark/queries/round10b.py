"""Round-10 operators, continued: four Layer-C/P additions that round
out families the earlier rounds opened (registered in _R10_NEW_TAIL —
never graded, they lead round 11's window).

- c64: TOKENIZER FERTILITY AUDIT — the acceptance report a tokenizer
  owner reads after training (c63) and applying (c51): per language,
  fertility (subword tokens per word), compression (characters per
  subword token), and the <unk> count — the fairness/efficiency
  numbers multilingual-tokenizer papers publish (a language with 2×
  fertility pays 2× the compute per sentence). Reuses c51's fixed
  public vocabulary and greedy longest-prefix expression so the audit
  measures exactly the tokenizer the pipeline ships.
- c65: BIGRAM LM PERPLEXITY — c23/p21 score documents with a UNIGRAM
  LM; the CCNet-grade filter conditions on context: hashed-bucket
  bigram counts (Laplace-smoothed P(cur|prev)) trained on the corpus
  and self-scored per document as average negative log-likelihood in
  integer micro-nats. The model is bucket²-bounded (B²=4096 rows
  regardless of corpus size) — the same "model rows, not corpus
  rows" discipline as c53/c59.
- c66: EMBEDDING OUTLIER DETECTION — the quality-side complement of
  c48's SemDeDup (which removes vectors TOO CLOSE to a centroid):
  per label, the top-5 vectors FARTHEST from their label centroid —
  the mislabeled/garbage-embedding shortlist an embedding-corpus
  audit reviews. c54's fixed-point contract (floor(x·1000) BIGINTs,
  floor'd centroid means) makes every distance exact.
- p33: EPOCH BUDGET REPORT — the mixture-planning view of p30's
  budget math: given a total training budget (2× the corpus) and
  α=0.5 temperature weights, the effective EPOCH count per
  (source, language) cell, flagging cells repeated past 4 epochs —
  the published diminishing-returns bound for data-constrained
  pretraining (Muennighoff et al. 2023). p30 answers "which docs
  fill the budget"; p33 answers "how many times will each cell
  repeat" — the number that decides whether to crawl more data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import (
    int_ln_micro_col,
    int_ln_micro_cte_sql,
    load,
)
from iceberg_playground_spark.queries.round9 import _c51_token_expr
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# c64 — tokenizer fertility audit (per-language subword efficiency)
# ---------------------------------------------------------------------------

# Reuses c51's recursive greedy-match oracle machinery, aggregated per
# language instead of per document (same vocabulary, same semantics).
_C64_ORACLE = """
WITH RECURSIVE vocab(tok, id) AS (VALUES {vocab_values}),
docs AS (SELECT doc_id, lang, lower(text) AS text FROM documents),
wt AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM docs),
words AS (
  SELECT doc_id, lang, i AS wpos, toks[i] AS word
  FROM wt, UNNEST(range(1, len(toks) + 1)) AS u(i)
  WHERE toks[i] <> ''),
tok(doc_id, wpos, rem, ntok, nunk) AS (
  SELECT doc_id, wpos, word, 0, 0 FROM words
  UNION ALL
  SELECT t.doc_id, t.wpos, substr(t.rem, m.len + 1),
         t.ntok + 1, t.nunk + CASE WHEN m.id = 0 THEN 1 ELSE 0 END
  FROM tok t, LATERAL (
    SELECT id, len FROM (
      SELECT v.id AS id, length(v.tok) AS len, 1 AS pri
      FROM vocab v WHERE v.tok IN ({probes})
      UNION ALL SELECT 0, 1, 2)
    ORDER BY pri, len DESC LIMIT 1) AS m(id, len)
  WHERE t.rem <> ''),
final AS (SELECT doc_id, wpos, ntok, nunk FROM tok WHERE rem = ''),
wl AS (
  SELECT w.lang, count(*) AS n_words,
         sum(length(w.word)) AS n_chars,
         sum(f.ntok) AS n_subtokens, sum(f.nunk) AS n_unk
  FROM words w JOIN final f
    ON w.doc_id = f.doc_id AND w.wpos = f.wpos
  GROUP BY w.lang),
dc AS (SELECT lang, count(*) AS n_docs FROM docs GROUP BY lang)
SELECT d.lang, CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(w.n_words AS BIGINT) AS n_words,
       CAST(w.n_subtokens AS BIGINT) AS n_subtokens,
       CAST(w.n_unk AS BIGINT) AS n_unk,
       CAST(floor(1000000.0 * w.n_subtokens / w.n_words) AS BIGINT)
         AS fertility_micro,
       CAST(floor(1000000.0 * w.n_chars / w.n_subtokens) AS BIGINT)
         AS chars_per_token_micro
FROM dc d JOIN wl w ON d.lang = w.lang
ORDER BY d.lang
"""


def _c64_oracle() -> str:
    from iceberg_playground_spark.queries.round9 import (
        _C51_MAXLEN,
        _C51_VOCAB,
    )

    vocab_values = ", ".join(f"('{t}', {i})" for t, i in _C51_VOCAB)
    probes = ", ".join(
        f"substr(t.rem, 1, {l})" for l in range(_C51_MAXLEN, 0, -1)
    )
    return _C64_ORACLE.format(vocab_values=vocab_values, probes=probes)


@query("c64_tokenizer_fertility", oracle=_c64_oracle())
def c64_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """C64: per-language tokenizer fertility audit — see module
    docstring. Fertility = subword tokens per word; compression =
    characters per subword token; n_unk counts <unk> fallbacks (0 on
    this corpus — the vocabulary covers its alphabet; the column is
    the audit's point, c58's verified-not-assumed convention).

    Scale shape: the c51 tokenizer expression runs inside the
    per-document projection (pure map — tokenization never shuffles),
    and the only exchange is the |langs|-key aggregate with map-side
    partials. Both micro ratios floor a single double divide (the
    p30 discipline)."""
    d = load(spark, sf, "documents")
    words = F.filter(
        F.split(F.lower("text"), " "), lambda w: w != ""
    )
    ids = F.expr(_c51_token_expr())
    per_doc = d.select(
        "lang",
        F.size(words).cast("bigint").alias("n_words"),
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
        ).alias("n_chars"),
        F.size(ids).cast("bigint").alias("n_subtokens"),
        F.size(F.filter(ids, lambda t: t == 0)).cast("bigint").alias("n_unk"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_subtokens").cast("bigint").alias("n_subtokens"),
            F.sum("n_unk").cast("bigint").alias("n_unk"),
            F.floor(
                1000000.0 * F.sum("n_subtokens") / F.sum("n_words")
            ).cast("bigint").alias("fertility_micro"),
            F.floor(
                1000000.0 * F.sum("n_chars") / F.sum("n_subtokens")
            ).cast("bigint").alias("chars_per_token_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# c65 — bigram LM perplexity (hashed-bucket conditional model)
# ---------------------------------------------------------------------------

_C65_B = 64  # token hash buckets — model is B² rows, corpus-size-free

# Model-row NLL through the shared fixed-point integer ln kernel
# (ADVICE r12: c65 was the first op flagged for the JVM-Math.log vs
# libm-std::log .5-boundary hazard; the kernel removes libm from the
# graded contract). p(c|p) add-one = (cnt+1)/(cv+B), an exact integer
# ratio.
_C65_LN_CHAIN = int_ln_micro_cte_sql("nllin", "p, c", "nll_micro")

_C65_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bk AS (
  SELECT doc_id,
         list_transform(toks, t ->
           CAST('0x' || substring(md5(t), 1, 8) AS BIGINT) % {_C65_B})
           AS b
  FROM tk),
bg AS (
  SELECT doc_id, b[i] AS p, b[i+1] AS c
  FROM bk, UNNEST(range(1, len(b))) AS u(i)),
model AS (
  SELECT p, c, count(*) AS cnt FROM bg GROUP BY p, c),
nllin AS MATERIALIZED (
  SELECT p, c, CAST(cnt + 1 AS BIGINT) AS num,
         CAST(sum(cnt) OVER (PARTITION BY p) + {_C65_B} AS BIGINT) AS den
  FROM model),
{_C65_LN_CHAIN},
nll AS (SELECT p, c, nll_micro FROM _il_fin)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(n.nll_micro) AS BIGINT) AS nll_total_micro,
       CAST(floor(CAST(sum(n.nll_micro) AS DOUBLE) / count(*)) AS BIGINT)
         AS avg_nll_micro
FROM bg g JOIN nll n ON g.p = n.p AND g.c = n.c
GROUP BY g.doc_id
"""


@query("c65_bigram_perplexity", oracle=_C65_ORACLE)
def c65_bigram_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """C65: bigram-LM document scoring — see module docstring. Every
    document's average negative log-likelihood under the corpus's own
    hashed-bucket bigram model (self-scoring; scoring held-out data
    adds one backoff row per prev bucket, same plan). High avg = the
    doc's token transitions are rare in the corpus — the perplexity
    filter signal, now with conditional context c23's unigram misses.

    Determinism (hardened per ADVICE r12 — no float, no libm): the
    add-one probability is the exact integer ratio (cnt+1)/(cv+B),
    and its micro-nat NLL evaluates through the shared FIXED-POINT
    INTEGER ln kernel (_util.int_ln_micro_*: identical integer steps
    in both engines, bit-equal by construction) over the B² = 4096
    model rows; per-document totals are integer sums, and the average
    floors a single double divide.

    Scale shape: 2 corpus scans (train aggregate, score pass — the
    c53/c59 budget); the model never exceeds B² + B rows whatever the
    corpus size, so the score join BROADCASTS it (plan-pinned: no
    sort-merge join, no cartesian); the per-doc rollup is one hash
    aggregate with map-side partials."""
    # hash-repartition ahead of the two bigram passes (c31's rule,
    # round 17): the per-token md5 bucketing otherwise inherits the
    # scan's one-split partitioning and runs single-core (cell
    # measured 3.2 -> 1.2 s at sf0.1 on 32 cores)
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    bucket = lambda t: (  # noqa: E731
        F.conv(F.md5(t).substr(1, 8), 16, 10).cast("bigint") % _C65_B
    )
    toks = F.split("text", " ")
    b = F.transform(toks, bucket)
    n = F.size(b)
    z = F.arrays_zip(
        F.slice(b, 1, n - 1).alias("p"),
        F.slice(b, 2, n - 1).alias("c"),
    )
    bg = d.select(
        "doc_id", F.explode(z).alias("pc")
    ).select("doc_id", F.col("pc.p").alias("p"), F.col("pc.c").alias("c"))
    model = bg.groupBy("p", "c").agg(F.count("*").alias("cnt"))
    nll_in = model.select(
        "p",
        "c",
        (F.col("cnt") + 1).cast("bigint").alias("num"),
        (F.sum("cnt").over(W.partitionBy("p")) + _C65_B)
        .cast("bigint")
        .alias("den"),
    )
    nll = int_ln_micro_col(nll_in, "num", "den", "nll_micro").select(
        "p", "c", "nll_micro"
    )
    return (
        bg.join(F.broadcast(nll), ["p", "c"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("nll_micro").cast("bigint").alias("nll_total_micro"),
            F.floor(
                F.sum("nll_micro").cast("double") / F.count("*")
            ).cast("bigint").alias("avg_nll_micro"),
        )
    )


# ---------------------------------------------------------------------------
# c66 — embedding outlier detection (farthest-from-centroid shortlist)
# ---------------------------------------------------------------------------

_C66_TOPK = 5
_C66_SCALE = 1000  # c54's fixed-point contract
_C66_DIM = 64

_C66_ORACLE = f"""
WITH q AS (
  SELECT vec_id, label, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_C66_SCALE})
              AS BIGINT) AS qi
  FROM embeddings, UNNEST(range(1, {_C66_DIM} + 1)) AS u(i)),
cent AS (
  SELECT label, i,
         CAST(floor(CAST(sum(qi) AS DOUBLE) / count(*)) AS BIGINT) AS ci
  FROM q GROUP BY label, i),
d AS (
  SELECT q.vec_id, q.label,
         sum((q.qi - c.ci) * (q.qi - c.ci)) AS sq_dist
  FROM q JOIN cent c ON q.label = c.label AND q.i = c.i
  GROUP BY q.vec_id, q.label)
SELECT label, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(sq_dist AS BIGINT) AS sq_dist,
       CAST(row_number() OVER (
         PARTITION BY label ORDER BY sq_dist DESC, vec_id) AS INT)
         AS outlier_rank
FROM d QUALIFY outlier_rank <= {_C66_TOPK}
"""


@query("c66_embedding_outliers", oracle=_C66_ORACLE)
def c66_embedding_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """C66: per-label embedding outlier shortlist — see module
    docstring. Exact integer distances under c54's fixed-point
    contract (quantize once, floor'd centroid means) make the full
    shortlist hash-gradeable; ties break on vec_id.

    Scale shape: centroids are ONE |labels|-key aggregate of 64
    per-dimension sums (map-side partials; k·d driver-free — the
    centroid table stays distributed and BROADCASTS into the distance
    pass, c54's literal-centroid discipline without the driver trip
    since no iteration follows); the distance pass is a pure map over
    vectors; the per-label top-5 is a ranking window with the group
    limit pushed below the exchange (plan-pinned)."""
    e = load(spark, sf, "embeddings")
    q = e.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _C66_SCALE).cast("bigint"),
        ).alias("q"),
    )
    sums = [F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(_C66_DIM)]
    cent = q.groupBy("label").agg(F.count("*").alias("n"), *sums).select(
        "label",
        F.array(*[
            F.floor(F.col(f"s{i}").cast("double") / F.col("n"))
            .cast("bigint")
            for i in range(_C66_DIM)
        ]).alias("cent"),
    )
    dist = (
        q.join(F.broadcast(cent), "label")
        .select(
            "label",
            "vec_id",
            F.aggregate(
                F.zip_with("q", "cent", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("sq_dist"),
        )
    )
    w = W.partitionBy("label").orderBy(F.col("sq_dist").desc(), "vec_id")
    return (
        dist.withColumn("outlier_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("outlier_rank") <= _C66_TOPK)
        .select("label", "vec_id", "sq_dist", "outlier_rank")
    )


# ---------------------------------------------------------------------------
# p33 — epoch budget report (data-constrained mixture planning)
# ---------------------------------------------------------------------------

_P33_MULT = 2  # total training budget = 2x the corpus token mass
_P33_EPOCH_BOUND = 4_000_000  # 4 epochs in micro units (Muennighoff 2023)

_P33_ORACLE = f"""
WITH cell AS (
  SELECT source, lang, sum(len(string_split(text, ' '))) AS cell_tok
  FROM documents GROUP BY source, lang),
wt AS (
  SELECT source, lang, cell_tok,
         CAST(floor(sqrt(CAST(cell_tok AS DOUBLE)) * 1000000) AS BIGINT)
           AS w_micro
  FROM cell),
bud AS (
  SELECT source, lang, cell_tok, w_micro,
         CAST(floor(
           CAST(w_micro AS DOUBLE) / sum(w_micro) OVER ()
           * {_P33_MULT} * sum(cell_tok) OVER ()) AS BIGINT) AS budget_tok
  FROM wt)
SELECT source, lang, CAST(cell_tok AS BIGINT) AS cell_tok, w_micro,
       budget_tok,
       CAST(floor(1000000.0 * budget_tok / cell_tok) AS BIGINT)
         AS epochs_micro,
       CAST(floor(1000000.0 * budget_tok / cell_tok) AS BIGINT)
         > {_P33_EPOCH_BOUND} AS over_replay
FROM bud ORDER BY source, lang
"""


@query("p33_epoch_budget_report", oracle=_P33_ORACLE)
def p33_epoch_budget_report(spark: SparkSession, sf: str) -> DataFrame:
    """P33: effective-epoch mixture plan — see module docstring. For
    each (source, language) cell: natural token mass, α=0.5
    temperature weight (p30's integer-sqrt discipline), the token
    budget the weight allots out of a 2×-corpus training run, the
    effective epoch count in micro units, and the >4-epoch replay
    flag (beyond ~4 epochs repeated data stops buying loss —
    Muennighoff et al. 2023, "Scaling Data-Constrained Language
    Models").

    Scale shape: ONE corpus aggregate to (source, lang) cells;
    everything after runs on the |cells|-row table (window sums over
    cells, per-row float sqrt + one division — each a single
    correctly-rounded IEEE step, the p30 discipline)."""
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
    )
    wall = W.partitionBy()
    bud = cells.withColumn(
        "budget_tok",
        F.floor(
            F.col("w_micro").cast("double")
            / F.sum("w_micro").over(wall)
            * _P33_MULT
            * F.sum("cell_tok").over(wall)
        ).cast("bigint"),
    )
    epochs = F.floor(
        1000000.0 * F.col("budget_tok") / F.col("cell_tok")
    ).cast("bigint")
    return bud.select(
        "source",
        "lang",
        "cell_tok",
        "w_micro",
        "budget_tok",
        epochs.alias("epochs_micro"),
        (epochs > _P33_EPOCH_BOUND).alias("over_replay"),
    ).orderBy("source", "lang")
