"""Layer C — LLM-data-pipeline operators (SURVEY.md §2 C1-C24: dedup
family, similarity search, text analysis, multimodal, corpus assembly
— split/sample/pack — quantization, decontamination, LM quality
scoring, iterative cluster provenance).

The reference is an ingestion playground for ML-ish asset data
(/root/reference/kafka-load-gen/main.go:51-120); the rebuild's mandate
(BASELINE.json:north_star) extends the engine with the operators a
large-scale training-data pipeline runs over such tables: dedup (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity
search (brute-force + IVF-pruned ANN), text analysis (language-ID,
quality scoring, token counting, fingerprinting), and multimodal
columns (binary payload + typed metadata through Arrow-batched
mapInPandas).

Everything is declarative DataFrame code over ``documents`` /
``embeddings``; Python appears only at the mapInPandas multimodal edge
(Arrow-batched, never row-at-a-time). Scale notes inline — the binding
design rule is: no all-pairs joins without a blocking/bucketing key,
no driver-side collect.

Float determinism (oracle hash-matching): dot products fold
float32→double products left-to-right on both engines (Spark
``aggregate`` with 0.0 init ≡ DuckDB ``list_reduce``: IEEE addition is
performed in the same sequence, so the bits agree); results are
additionally rounded at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import (
    bucket_sql as _bucket_sql,
    hash_bucket as _hash_bucket,
    int_ln_micro_col,
    int_ln_micro_cte_sql,
    load,
)
from iceberg_playground_spark.queries._util import lit_int_array
from iceberg_playground_spark.registry import query

# ---------------------------------------------------------------------------
# shared expression builders (column-level, no state)
# ---------------------------------------------------------------------------


def _tokens(col: str = "text") -> Column:
    """Whitespace tokens of a document (documents.text is single-spaced)."""
    return F.split(F.col(col), " ")


def _shingles(toks: Column) -> Column:
    """Distinct word-3-gram shingles. With a ~31-word vocabulary,
    unigrams collide constantly (any two docs share most words) —
    3-grams are the smallest unit that separates near-dups from random
    pairs in this corpus (verified: 25 pairs > 0.3 Jaccard on 3-grams
    vs 68k pairs > 0.6 on unigrams at sf0.01).

    Built as arrays_zip of three shifted slices, NOT index lookups:
    an element_at(toks, i) lambda would re-inline the split() through
    CollapseProject and evaluate it per index — O(tokens²) per doc
    (measured 7× slower at sf0.1). The zip form is O(tokens)."""
    n = F.size(toks)
    z = F.arrays_zip(
        F.slice(toks, 1, n - 2).alias("a"),
        F.slice(toks, 2, n - 2).alias("b"),
        F.slice(toks, 3, n - 2).alias("c"),
    )
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", s["a"], s["b"], s["c"])
    )
    return F.array_distinct(F.when(n >= 3, grams).otherwise(F.array()))


_SH_SQL = """list_distinct(list_transform(
      range(1, len(string_split(text, ' ')) - 1),
      i -> string_split(text, ' ')[i] || ' ' ||
           string_split(text, ' ')[i+1] || ' ' ||
           string_split(text, ' ')[i+2]))"""


def _dbl(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (bit-stable across engines)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _seeded_minhash_expr(arr: str, seed: int) -> str:
    """SQL text of one MinHash permutation: min over column ``arr``
    of xxhash64(seed, element) — rendered as text so 16 permutations
    parse in one py4j round-trip instead of ~150 per-element calls
    (round-16 rule; same expression tree). Historical pitfall, kept
    documented because every per-element Column builder hits it: the
    seed must bind as a CLOSURE constant — a two-parameter transform
    lambda (the old ``lambda x, i=i`` idiom) receives (element,
    ARRAY-INDEX) from Spark, so the default was shadowed by the index
    column and every 'permutation' degenerated to the same
    index-seeded hash (caught by c31's oracle mismatch — invisible in
    the rows-only c02/c24). In SQL text the seed is inlined, so the
    class of bug cannot occur."""
    return f"array_min(transform({arr}, x -> xxhash64({int(seed)}, x)))"


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_dbl(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


# DuckDB mirrors of _dot/_norm (list_reduce folds left like aggregate).
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        f"(x, y) -> x + y)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))"
    )


# ---------------------------------------------------------------------------
# C1 — exact dedup
# ---------------------------------------------------------------------------


@query(
    "c01_exact_dedup",
    oracle="""
    SELECT doc_id, sha256(text) AS content_hash, lang, source
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY sha256(text)
                               ORDER BY doc_id) = 1
    """,
)
def c01_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """C1: exact dedup by content hash, keep-first by doc_id.

    Scale shape: the shuffle key is the 32-byte sha256, never the
    document body — at 100 TB the exchange carries hashes + ids, and
    InferWindowGroupLimit keeps only one row per hash per map task
    before the shuffle. (Equivalent semantics to the reference's
    equality-delete of duplicate keys, /root/reference/src/bin/
    deletes.rs:60-110, expressed as keep-first.)"""
    d = load(spark, sf, "documents")
    h = F.sha2(F.col("text"), 256).alias("content_hash")
    w = W.partitionBy("content_hash").orderBy("doc_id")
    return (
        d.select("doc_id", h, "lang", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# C2 — MinHash-LSH near-dedup (approximate → rows-only)
# ---------------------------------------------------------------------------

_MINHASH_PERMS = 16
_LSH_BANDS = 4
_LSH_ROWS = _MINHASH_PERMS // _LSH_BANDS


@query("c02_minhash_lsh_dedup")  # approximate/engine-hash-dependent → rows-only
def c02_minhash_lsh_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """C2: MinHash-LSH near-dedup — shingle → 16 seeded-minhash sig →
    4 bands × 4 rows → band-bucket grouping → keep the min doc per
    cluster. NEVER all-pairs: candidates only meet inside a
    (band, signature) bucket, so the heavy operation is a groupBy on
    band hashes (tiny keys), which scales to 100 TB the same way any
    hash aggregation does. Banding math: docs with 3-gram Jaccard j
    collide in ≥1 band with prob 1-(1-j^4)^4 — ~0.93 at j=0.8, ~0.03
    at j=0.3, matching this corpus's bimodal pair distribution.
    Single-pass min-doc representative (one hop); a transitive-closure
    pass (iterate until fixpoint) would chain clusters at scale.
    Engine-native xxhash64 seeds ⇒ no DuckDB oracle (rows-only)."""
    # explicit-count repartition so the shingle+minhash pass
    # parallelizes off a one-split source (keyed-only would be
    # AQE-coalesced back to one partition)
    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    sh = d.select("doc_id", "lang", _shingles(_tokens()).alias("sh")).filter(
        F.size("sh") > 0
    )
    sig = sh.selectExpr(
        "doc_id",
        "lang",
        *[
            f"{_seeded_minhash_expr('sh', i)} AS mh{i}"
            for i in range(_MINHASH_PERMS)
        ],
    )
    band_structs = ", ".join(
        "named_struct('band', {b}, 'sig', xxhash64({args}))".format(
            b=b,
            args=", ".join(
                [str(b)]
                + [f"mh{b * _LSH_ROWS + r}" for r in range(_LSH_ROWS)]
            ),
        )
        for b in range(_LSH_BANDS)
    )
    bands = sig.select(
        "doc_id",
        "lang",
        F.explode(F.expr(f"array({band_structs})")).alias("bk"),
    ).select("doc_id", "lang", "bk.band", "bk.sig")
    # Bucket canon as a two-level MIN aggregation — NOT a window and
    # NOT groupBy + join-back. The join-back re-evaluates the
    # shingle+minhash lineage (two parquet scans, verified); the
    # window shuffles EVERY row of a bucket to one task, so one hot
    # bucket (a doc duplicated millions of times — exactly what a
    # dedup corpus contains) serializes at 100 TB. A groupBy gets
    # map-side partial aggregation: each map task reduces its slice of
    # a hot bucket to one candidate row BEFORE the exchange, which is
    # the skew remedy salting approximates for joins (b73/c10), free
    # here because MIN is algebraic. Equivalence to the one-hop
    # rep==doc_id rule: a doc's rep (min over its buckets of each
    # bucket's min) equals its own id iff it WINS every one of its
    # _LSH_BANDS buckets, since a bucket min can never exceed a
    # member's id. Still one scan: one aggregation chain consumes the
    # lineage exactly once.
    winners = bands.groupBy("band", "sig").agg(
        F.min(F.struct("doc_id", "lang")).alias("w")
    )
    return (
        winners.groupBy(
            F.col("w.doc_id").alias("doc_id"), F.col("w.lang").alias("lang")
        )
        .agg(F.count("*").alias("won"))
        .filter(F.col("won") == _LSH_BANDS)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# C3 / C4 — similarity search
# ---------------------------------------------------------------------------


@query(
    "c03_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round({_dot_sql('embedding', 'qe')}
                 / ({_norm_sql('embedding')} * {_norm_sql('qe')}), 6)
             AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def c03_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """C3: brute-force cosine top-k against one query vector — the
    exact baseline every ANN variant is judged against. The query row
    is broadcast (1 row); the base table streams map-side with zero
    shuffle, and orderBy+limit plans TakeOrderedAndProject (per-
    partition top-k, k-row driver merge) — linear scan, 100 TB-safe.
    Dot product via zip_with/aggregate built-ins: JVM-codegen, no
    Python, no UDF."""
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    base = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    cosine = F.round(
        _dot(F.col("embedding"), F.col("qe"))
        / (_norm(F.col("embedding")) * _norm(F.col("qe"))),
        6,
    ).alias("cosine")
    return (
        base.select("vec_id", cosine)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


@query(
    "c04_knn_join",
    oracle=f"""
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe
                    FROM embeddings WHERE vec_id < 5),
         base AS (SELECT vec_id AS base_id, embedding AS be
                  FROM embeddings WHERE vec_id >= 5)
    SELECT probe_id, base_id,
           round({_dot_sql('be', 'pe')}
                 / ({_norm_sql('be')} * {_norm_sql('pe')}), 6) AS cosine
    FROM probes, base
    QUALIFY row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, base_id) <= 3
    """,
)
def c04_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """C4: batch KNN join — k=3 nearest base vectors per probe,
    via ``knn_join``'s strategy switch. At 5 probes this resolves to
    the EXACT brute-force path (broadcast probes, one base scan, no
    join shuffle — the registered hash-match contract); probe sets
    past the brute threshold take the hyperplane-LSH bucket path
    (equi-join on band keys, never a cartesian — pinned in
    tests/test_plans.py)."""
    e = load(spark, sf, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    base = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("base_id"), F.col("embedding").alias("be")
    )
    return knn_join(base, probes, k=3, n_probes=5)


_KNN_BRUTE_MAX = 10_000  # probe sets above this switch to the LSH path


def knn_join(
    base: DataFrame,
    probes: DataFrame,
    k: int = 3,
    brute_max: int = _KNN_BRUTE_MAX,
    n_probes: int | None = None,
) -> DataFrame:
    """Batch KNN join with a strategy switch (the c04 scale path,
    VERDICT r6 item 3). ``base`` is (base_id, be), ``probes`` is
    (probe_id, pe); returns (probe_id, base_id, cosine), top-k per
    probe.

    - |probes| ≤ brute_max: EXACT brute force — broadcast the probe
      set against one base scan (|base|·|probes| dot products,
      embarrassingly parallel, zero shuffle for the join). Right up
      to ~10^4 probes × any base size.
    - |probes| > brute_max: hyperplane-LSH candidate path — both
      sides get c29's 16 sign bits from the fixed ±1 projection
      (c27's matrix), 4 bands × 4 bits; candidates meet ONLY inside
      a (band, bval) bucket via an equi-join — the cartesian never
      materializes, so cost is Σ|base_bucket|·|probe_bucket| instead
      of |base|·|probes| — then the exact cosine re-ranks survivors
      per probe. Approximate: a true neighbor sharing no band is
      missed (standard sign-LSH recall); a probe whose exact vector
      exists in base always self-hits (identical vectors agree on
      every band). The band explode carries the vectors (4× fan-out)
      so re-ranking needs no second join back to either side.

    ``n_probes`` skips the sizing count when the caller already knows
    it (c04 passes its literal probe count; a pipeline caller would
    pass the batch size). When omitted, an exact count() job sizes the
    probe side. The optimizer's rowCount() statistic is deliberately
    NOT consulted (ADVICE r8): it is an ESTIMATE, not a count — a
    .limit(N) plan reports N even when fewer rows exist, and CBO
    selectivity guesses are worse — and since this number flips the
    strategy between exact brute force and approximate LSH, a wrong
    stat silently degrades exact top-k to approximate (or broadcasts
    an unexpectedly huge probe side). An exact answer is worth one
    scan; callers in a hot path should keep passing n_probes."""
    if n_probes is None:
        n_probes = probes.count()
    cosine = F.round(
        _dot(F.col("be"), F.col("pe"))
        / (_norm(F.col("be")) * _norm(F.col("pe"))),
        6,
    ).alias("cosine")
    if n_probes <= brute_max:
        pairs = base.crossJoin(F.broadcast(probes)).select(
            "probe_id", "base_id", cosine
        )
    else:
        from iceberg_playground_spark.queries.meta import _RP_SIGNS

        def bands(df: DataFrame, id_col: str, emb_col: str) -> DataFrame:
            emb = F.col(emb_col)
            bits = [
                F.when(
                    _dot(
                        emb, lit_int_array(_RP_SIGNS[j])
                    )
                    >= 0,
                    1,
                ).otherwise(0)
                for j in range(16)
            ]
            structs = []
            for b in range(4):
                val = None
                for r in range(4):
                    term = bits[b * 4 + r] * (1 << (3 - r))
                    val = term if val is None else val + term
                structs.append(
                    F.struct(F.lit(b).alias("band"), val.alias("bval"))
                )
            return df.select(
                id_col,
                emb_col,
                F.explode(F.array(*structs)).alias("bk"),
            ).select(id_col, emb_col, "bk.band", "bk.bval")

        pairs = (
            bands(base, "base_id", "be")
            .join(bands(probes, "probe_id", "pe"), ["band", "bval"])
            # a pair sharing several bands appears once per band —
            # dedup BEFORE the window so top-k ranks distinct neighbors
            .dropDuplicates(["probe_id", "base_id"])
            .select("probe_id", "base_id", cosine)
        )
    w = W.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "base_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# C5 — text analysis
# ---------------------------------------------------------------------------


@query(
    "c05_text_analysis",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks
      FROM documents),
    per_lang AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
             CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
      FROM base GROUP BY lang),
    tok AS (SELECT lang, unnest(toks) AS token FROM base),
    dt AS (SELECT lang, CAST(count(DISTINCT token) AS BIGINT)
                    AS n_distinct_tokens
           FROM tok GROUP BY lang),
    top AS (
      SELECT lang, token AS top_token, CAST(count(*) AS BIGINT)
               AS top_token_count
      FROM tok GROUP BY lang, token
      QUALIFY row_number() OVER (PARTITION BY lang
                                 ORDER BY count(*) DESC, token) = 1)
    SELECT per_lang.lang, n_docs, total_tokens, avg_chars,
           n_distinct_tokens, top_token, top_token_count
    FROM per_lang JOIN dt USING (lang) JOIN top USING (lang)
    """,
)
def c05_text_analysis(spark: SparkSession, sf: str) -> DataFrame:
    """C5: per-language corpus statistics — doc counts, token totals,
    vocabulary size, average length, modal token (term frequency).

    Single-pass over the text: the corpus is tokenized exactly once
    into the (lang, token) count relation, which is vocab-sized (tiny
    relative to the corpus) and materialized via a lazy local
    checkpoint so its three consumers — vocabulary size, total token
    count, modal token — don't each re-scan and re-explode 100 TB of
    text (lineage duplication puts a scan under every consumer; AQE
    exchange reuse does not fire here because the window branch plans
    a different partitioning). Doc-level stats read only (lang,
    n_chars) — column pruning keeps text out of that scan entirely.
    On a cluster, swap localCheckpoint for a reliable checkpoint/table
    write; the materialization point is the same."""
    d = load(spark, sf, "documents")
    per_doc = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )
    tok = d.select("lang", F.explode(_tokens()).alias("token"))
    counts = (
        tok.groupBy("lang", "token")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    per_lang_tok = counts.groupBy("lang").agg(
        F.sum("c").alias("total_tokens"),
        F.count("*").alias("n_distinct_tokens"),
    )
    wtop = W.partitionBy("lang").orderBy(F.col("c").desc(), "token")
    top = (
        counts.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            "lang",
            F.col("token").alias("top_token"),
            F.col("c").alias("top_token_count"),
        )
    )
    return (
        per_doc.join(per_lang_tok, "lang")
        .join(top, "lang")
        .select(
            "lang", "n_docs", "total_tokens", "avg_chars",
            "n_distinct_tokens", "top_token", "top_token_count",
        )
    )


# ---------------------------------------------------------------------------
# C6 — multimodal columns
# ---------------------------------------------------------------------------


@query(
    "c06_multimodal_join",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
           CAST(len(e.embedding) AS INT) AS dim,
           round({_norm_sql('e.embedding')}, 6) AS emb_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def c06_multimodal_join(spark: SparkSession, sf: str) -> DataFrame:
    """C6: multimodal row assembly — text + typed metadata + embedding
    vector in one row (doc_id ⋈ vec_id). At 100 TB both sides are
    fact-sized: equi-join shuffles both on the id (sort-merge), or
    stays shuffle-free if both tables are bucketed/partitioned on the
    id at write time — which is how a production pipeline lays these
    out (see tables.py partitioning)."""
    d = load(spark, sf, "documents")
    e = load(spark, sf, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "label",
        F.size("embedding").alias("dim"),
        F.round(_norm(F.col("embedding")), 6).alias("emb_norm"),
    )


@query(
    "c15_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(list_reduce(list_transform(range(1, length(text) + 1),
                            i -> ascii(substr(text, i, 1))),
                            (a, b) -> a + b) AS BIGINT) AS byte_sum
    FROM documents
    """,
)
def c15_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """C6b: opaque-binary decode plumbing — the Spark-side pattern for
    image/audio columns: a `binary` payload column + typed metadata,
    pushed through Arrow-batched ``mapInPandas`` (one Python call per
    columnar batch, never per row; executors stream batches, so 100 TB
    of payloads never co-reside anywhere).

    The decode kernel here is a deterministic fake (byte stats of the
    UTF-8 payload) because no image/audio codec ships in this
    container; a real decoder drops into `_decode_batch` unchanged —
    the schema, batching, and partitioning are the production shape.
    `fmt` other than "fake" raises NotImplementedError by design."""
    import pandas as pd  # local import: only the executors need it

    d = load(spark, sf, "documents")
    payloads = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    fmt = "fake"

    def _decode_batch(batches):
        if fmt != "fake":  # pragma: no cover — real codecs not in env
            raise NotImplementedError(
                f"payload decoder for format {fmt!r} (image/audio libs "
                "not available in this container)"
            )
        for pdf in batches:
            raw = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": raw.map(len).astype("int32"),
                    "first_byte": raw.map(lambda b: b[0]).astype("int32"),
                    "byte_sum": raw.map(lambda b: int(sum(b))).astype(
                        "int64"
                    ),
                }
            )

    return payloads.mapInPandas(
        _decode_batch,
        schema="doc_id long, n_bytes int, first_byte int, byte_sum long",
    )


# ---------------------------------------------------------------------------
# C7 — quality filters
# ---------------------------------------------------------------------------


@query(
    "c07_quality_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr,
             list_aggregate(list_transform(string_split(text, ' '),
                            x -> length(x)), 'max') AS max_tok_len
      FROM documents),
    kept AS (
      SELECT doc_id, source, n_chars, n_tokens, round(ttr, 6) AS ttr
      FROM scored
      WHERE n_chars BETWEEN 100 AND 500
        AND n_tokens >= 20
        AND max_tok_len <= 15)
    SELECT doc_id, source, n_chars, n_tokens, ttr,
           CAST(row_number() OVER (PARTITION BY source
                ORDER BY n_chars DESC, doc_id) AS BIGINT) AS source_rank
    FROM kept
    QUALIFY source_rank <= 10
    """,
)
def c07_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """C7: quality filtering — length bounds, token-count floor,
    max-token-length cap (garbage detector), type-token ratio, then a
    per-source quota (top-10 by length) via a group-limit-pushable
    ranking window. The cheap scalar predicates run first and push into
    the scan; only survivors reach the (already small) quota window."""
    d = load(spark, sf, "documents")
    toks = _tokens()
    scored = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "ttr"
        ),
        F.array_max(F.transform(toks, F.length)).alias("max_tok_len"),
    )
    kept = scored.filter(
        F.col("n_chars").between(100, 500)
        & (F.col("n_tokens") >= 20)
        & (F.col("max_tok_len") <= 15)
    ).select("doc_id", "source", "n_chars", "n_tokens", F.round("ttr", 6).alias("ttr"))
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return kept.withColumn(
        "source_rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("source_rank") <= 10)


# ---------------------------------------------------------------------------
# SimHash dedup (C2 family, oracle-checkable variant)
# ---------------------------------------------------------------------------


@query(
    "c08_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    bits AS (
      SELECT doc_id, md5(token) AS h, unnest(range(0, 32)) AS b
      FROM tok),
    pm AS (
      SELECT doc_id, b,
             2 * ((CAST(strpos('0123456789abcdef',
                               substr(h, CAST(b // 4 AS INT) + 1, 1)) - 1
                        AS INT)
                   // CAST(pow(2, 3 - (b % 4)) AS INT)) % 2) - 1 AS pm
      FROM bits),
    s AS (SELECT doc_id, b, sum(pm) AS s FROM pm GROUP BY doc_id, b),
    sh AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM s GROUP BY doc_id)
    SELECT doc_id, simhash,
           CASE WHEN row_number() OVER (PARTITION BY simhash
                                        ORDER BY doc_id) = 1
                THEN 1 ELSE 0 END AS kept
    FROM sh
    """,
)
def c08_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """C2b: SimHash content signature (32-bit) + keep-first dedup on
    identical signatures. Bits are derived from md5 hex nibbles with
    integer arithmetic only, so DuckDB reproduces the exact signature
    (hash-match oracle — unlike MinHash, which uses engine-native
    xxhash64). Token-frequency-weighted: each occurrence votes ±1 per
    bit, applied as freq × ±1 over per-(doc, token) counts so the ×32
    bit expansion multiplies distinct doc-tokens, not occurrences
    (~3× fewer rows; 10 s → 1.9 s at sf0.1). Both aggs combine
    map-side; the (doc, bit) shuffle carries 32 rows per doc
    regardless of document size. A pandas-UDF kernel could fold the
    32 sums per batch but leaves JVM codegen; built-ins are chosen
    for engine-neutral verifiability. The corpus hash-repartitions
    before the explode so the per-occurrence md5 work parallelizes
    even off a single-file (one-split) source (the c31 rule; ~2x at
    sf0.1)."""
    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    # Pre-aggregate occurrences per (doc, token-hash) BEFORE the 32-bit
    # explode: votes become freq-weighted (identical sums), md5 runs
    # once per distinct doc-token, and the x32 expansion applies to
    # ~|vocab-per-doc| rows instead of every occurrence (~3x fewer).
    freq = tok.groupBy("doc_id", F.md5("token").alias("h")).agg(
        F.count("*").alias("freq")
    )
    bits = freq.select(
        "doc_id",
        "h",
        "freq",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    )
    nib = F.conv(
        F.col("h").substr(
            (F.col("b") / 4).cast("int") + 1, F.lit(1)
        ),
        16,
        10,
    ).cast("int")
    shift = F.pow(F.lit(2), F.lit(3) - (F.col("b") % 4)).cast("int")
    pm = (2 * ((nib / shift).cast("int") % 2) - 1).alias("pm")
    s = (
        bits.select("doc_id", "b", (pm * F.col("freq")).alias("vote"))
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("s"))
    )
    sh = s.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("b")).cast("bigint"))
            .otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("simhash")
    )
    w = W.partitionBy("simhash").orderBy("doc_id")
    return sh.select(
        "doc_id",
        "simhash",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (C2 family, exact, blocked)
# ---------------------------------------------------------------------------


@query(
    "c09_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, n_chars, {_SH_SQL} AS sh
      FROM documents)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh)
                    - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 60
    WHERE len(list_intersect(a.sh, b.sh)) * 2
           >= (len(a.sh) + len(b.sh)
               - len(list_intersect(a.sh, b.sh)))
    """,
)
def c09_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """C2c: exact 3-gram Jaccard near-dup pairs (j ≥ 0.5, same lang,
    within 60 chars) via an INVERTED-INDEX join: explode distinct
    shingles into postings, equi-join postings on (lang, shingle), and
    the per-pair match count IS the intersection size — no array
    intersect per pair, and pairs sharing zero shingles (jaccard 0)
    never materialize at all.

    Scale shape: the old blocked self-join's only equi-key was lang
    (5 values) — a per-language near-cartesian with an array_intersect
    per pair, 110 s at sf0.1 and quadratic per block at 100 TB. Here
    candidate volume is Σ_shingle df² (df = shingle doc-frequency,
    measured max 25 / p99 18 on this corpus), a hash join + count
    aggregation that scales like any agg; at web scale you cap df
    (drop ultra-common shingles) exactly as MinHash banding (c02)
    bounds its buckets. Postings are lazily checkpointed so the
    shingle computation runs once, not once per join side — and the
    corpus is hash-repartitioned first so the shingling CPU work
    parallelizes even off a single-file (one-split) source (the c31
    rule; measured 3.7x on the first run at sf0.1)."""
    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    post = d.select(
        "doc_id",
        "lang",
        "n_chars",
        _shingles(_tokens()).alias("sh"),
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        F.size("sh").alias("n_sh"),
        F.explode("sh").alias("s"),
    ).localCheckpoint(eager=False)
    a = post.select(
        F.col("lang").alias("a_lang"),
        "s",
        F.col("doc_id").alias("a_id"),
        F.col("n_chars").alias("a_nc"),
        F.col("n_sh").alias("a_n"),
    )
    b = post.select(
        F.col("lang").alias("b_lang"),
        "s",
        F.col("doc_id").alias("b_id"),
        F.col("n_chars").alias("b_nc"),
        F.col("n_sh").alias("b_n"),
    )
    cand = a.join(
        b,
        (F.col("a_lang") == F.col("b_lang"))
        & (a["s"] == b["s"])
        & (F.col("a_id") < F.col("b_id"))
        & (F.abs(F.col("a_nc") - F.col("b_nc")) <= 60),
    )
    pairs = cand.groupBy("a_id", "b_id", "a_n", "b_n").agg(
        F.count("*").alias("inter")
    )
    uni = F.col("a_n") + F.col("b_n") - F.col("inter")
    return (
        pairs.filter(F.col("inter") * 2 >= uni)
        .select(
            "a_id",
            "b_id",
            F.round(F.col("inter").cast("double") / uni, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (C2 family, vector variant)
# ---------------------------------------------------------------------------

_NEARDUP_SALT = 8  # b73's salt width; see c10's salted-join rationale


@query(
    "c10_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round({_dot_sql('a.embedding', 'b.embedding')}
                 / ({_norm_sql('a.embedding')} * {_norm_sql('b.embedding')}),
                 6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id <> b.vec_id
    QUALIFY row_number() OVER (PARTITION BY a.vec_id
                               ORDER BY cosine DESC, b.vec_id) = 1
    """,
)
def c10_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """C2d: embedding near-dup candidate report — each vector's nearest
    neighbor within its `label` block (a dedup pipeline thresholds this
    cosine to decide drops; this corpus's max same-label cosine is
    0.475, i.e. no vector dups, and the report proves it). Blocking by
    label is the IVF idea applied to dedup: vectors only compare
    within their coarse partition, turning all-pairs O(n²) into
    Σ|bucket|². At 100 TB the label comes from a cheap clustering
    (or LSH hyperplane signs, c02-style) instead of a stored column;
    the join/window shape is identical."""
    e = load(spark, sf, "embeddings")
    # Norm is per-VECTOR, so hoist it out of the pair loop: computed
    # once per row here instead of once per candidate pair (|bucket|x
    # per vector — measured 3x wall time at sf0.1). The division below
    # consumes the identical double either way, so oracle bits agree.
    en = e.select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    # Salted self-join (b73 pattern): one hot label is one Σ|bucket|²
    # task in a shuffled plan, so the probe side gets a deterministic
    # per-row salt (hash of its unique key — never rand(), which
    # breaks retry idempotence) and the build side is exploded ×SALT
    # so every (label, salt) cell still sees the label's full vector
    # set. Each pair meets exactly once (in the probe row's salt), so
    # the join output — and the oracle hash — is bit-identical to the
    # unsalted join; a hot label's pair work now spreads across SALT
    # reducers. At this sf the build side broadcasts and the salt is
    # latent in the keys; at 100 TB neither side broadcasts and the
    # salted exchange is what keeps the hot label parallel.
    a = en.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        F.pmod(F.xxhash64("vec_id"), F.lit(_NEARDUP_SALT))
        .cast("int")
        .alias("a_salt"),
    ).repartition(
        spark.sparkContext.defaultParallelism, "a_label", "a_salt"
    )
    # ^ the explicit exchange makes the salt OPERATIVE even when the
    # build side broadcasts: without it the probe stays on the scan's
    # input splits (a single-file corpus = ONE task doing every
    # Σ|bucket|² dot product — measured 2x wall at sf0.1); with it the
    # pair work spreads across the same (label, salt) cells a shuffle
    # join would use at 100 TB, so the plan is scale-shaped at every sf.
    b = en.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    ).withColumn(
        "b_salt",
        F.explode(F.array(*[F.lit(i) for i in range(_NEARDUP_SALT)])),
    )
    pairs = a.join(
        b,
        (F.col("a_label") == F.col("b_label"))
        & (F.col("a_salt") == F.col("b_salt"))
        & (F.col("a_id") != F.col("b_id")),
    )
    cosine = F.round(
        _dot(F.col("a_emb"), F.col("b_emb"))
        / (F.col("a_nrm") * F.col("b_nrm")),
        6,
    ).alias("cosine")
    # Top-1 as an arg-max aggregate, NOT a row_number window: a groupBy
    # gets map-side partial aggregation, so each join partition reduces
    # its Σ|bucket|² candidate pairs to one best-so-far per a_id BEFORE
    # the exchange — the shuffle carries |vectors| rows, not |pairs|
    # (the window formulation shuffles every pair to sort it). Struct
    # max compares cosine first, then -b_id, which reproduces the
    # oracle's deterministic (cosine DESC, b_id ASC) tie-break exactly.
    best = F.max(
        F.struct(F.col("cosine"), (-F.col("b_id")).alias("nb"))
    ).alias("best")
    return (
        pairs.select("a_id", "b_id", cosine)
        .groupBy("a_id")
        .agg(best)
        .select(
            "a_id",
            (-F.col("best.nb")).cast("bigint").alias("b_id"),
            F.col("best.cosine").alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-pruned ANN (C3/C4 scale path; engine-native → rows-only)
# ---------------------------------------------------------------------------


@query("c11_ann_ivf")  # float centroid averaging is order-sensitive → rows-only
def c11_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """C3b: IVF-style ANN — the 100 TB path for similarity search.
    (1) Build per-label centroids distributedly (posexplode →
    groupBy(label, pos) avg → re-assemble, never collecting vectors);
    (2) score the probe against |labels| centroids (broadcast both —
    they're tiny); (3) scan ONLY the top-2 labels' vectors for the
    exact top-5. Work drops from |base| to |base|·(nprobe/nlist) dot
    products; the label column is the inverted-file cell id. Float
    averaging is accumulation-order-sensitive, so this op is declared
    rows-only by design (the exact ops c03/c04 carry the oracles;
    c40_ivf_adc_rerank is the hash-graded IVF composition over a
    deterministic seed codebook)."""
    e = load(spark, sf, "embeddings")
    pos = e.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    cent = (
        pos.groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("c")))
                ),
                lambda s: s.getField("c"),
            ).alias("centroid")
        )
    )
    probe = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("pe")
    )
    scored_cells = (
        cent.crossJoin(F.broadcast(probe))
        .select(
            "label",
            (
                _dot(F.col("centroid"), _dbl(F.col("pe")))
                / (_norm(F.col("centroid")) * _norm(F.col("pe")))
            ).alias("cell_score"),
        )
        .orderBy(F.col("cell_score").desc())
        .limit(2)
    )
    candidates = e.filter(F.col("vec_id") != 0).join(
        F.broadcast(scored_cells.select("label")), "label"
    )
    cosine = F.round(
        _dot(F.col("embedding"), F.col("pe"))
        / (_norm(F.col("embedding")) * _norm(F.col("pe"))),
        6,
    ).alias("cosine")
    return (
        candidates.crossJoin(F.broadcast(probe))
        .select("vec_id", "label", cosine)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic / token counting / fingerprinting (C5 family)
# ---------------------------------------------------------------------------


@query(
    "c12_lang_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x IN ('the', 'a', 'of')))
                  AS BIGINT) AS n_markers,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT doc_id, lang, n_markers,
           round(CAST(n_markers AS DOUBLE) / n_tokens, 6) AS marker_ratio,
           CASE WHEN CAST(n_markers AS DOUBLE) / n_tokens >= 0.05
                THEN 'en-like' ELSE 'other' END AS predicted
    FROM t
    """,
)
def c12_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """C5b: language-ID by marker-token ratio (n-gram-heuristic
    family): count closed-class English markers per document, predict
    by threshold. Pure per-row column math — embarrassingly parallel,
    no shuffle at all; at 100 TB this is a free pass over the scan.
    (A real ID model swaps the marker list for per-language char
    n-gram log-odds; the plan shape is identical.)"""
    d = load(spark, sf, "documents")
    toks = _tokens()
    n_markers = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "of"))
    ).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    ratio = n_markers.cast("double") / n_tokens
    return d.select(
        "doc_id",
        "lang",
        n_markers.alias("n_markers"),
        F.round(ratio, 6).alias("marker_ratio"),
        F.when(ratio >= 0.05, "en-like").otherwise("other").alias(
            "predicted"
        ),
    )


@query(
    "c13_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS BIGINT) AS bpe_ish_tokens,
           round(CAST(n_chars AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS chars_per_token
    FROM documents
    """,
)
def c13_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """C5c: token counting — whitespace tokens plus a BPE-ish regex
    tokenizer (letter runs | digit runs | single punctuation), the
    standard pre-training budget estimator. Per-row JVM regex, no
    shuffle; regexp_count keeps the match count without materializing
    the token array."""
    d = load(spark, sf, "documents")
    ws = F.size(_tokens()).cast("bigint")
    bpe = F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast(
        "bigint"
    )
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        F.round(F.col("n_chars").cast("double") / ws, 6).alias(
            "chars_per_token"
        ),
    )


@query(
    "c16_training_pipeline",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             list_aggregate(list_transform({_SH_SQL}, x -> md5(x)), 'min')
               AS fingerprint
      FROM documents),
    deduped AS (
      SELECT * FROM fp
      QUALIFY row_number() OVER (PARTITION BY fingerprint
                                 ORDER BY doc_id) = 1),
    kept AS (
      SELECT * FROM deduped
      WHERE n_chars BETWEEN 100 AND 500 AND n_tokens >= 20)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS token_budget,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM kept GROUP BY lang
    """,
)
def c16_training_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end training-data pipeline — the Layer C operators
    COMPOSED the way a real corpus build runs them: fingerprint
    near-dedup (min-digest collision keep-first; on this corpus it
    removes the same 25 near-dups MinHash finds, exactly — near-dup
    shingle sets share their minimum md5) → quality filter (length +
    token floors) → per-language token-budget report. One window over
    the fingerprint, one final agg; every stage is the registered
    operator's plan, so the composition inherits their scale shapes
    (group-limit-pushable dedup window, pushdown-friendly filters,
    map-side-combinable budget agg)."""
    # hash-repartition before the fingerprint map (the c31/c33 rule,
    # round 17): the per-doc shingle + md5-min transform otherwise
    # inherits the scan's one-split partitioning (cell measured
    # 1.1 -> 0.7 s at sf0.1 on 32 cores)
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "lang", "n_chars", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = _tokens()
    fp = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_min(F.transform(_shingles(toks), F.md5)).alias(
            "fingerprint"
        ),
    )
    w = W.partitionBy("fingerprint").orderBy("doc_id")
    deduped = (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    kept = deduped.filter(
        F.col("n_chars").between(100, 500) & (F.col("n_tokens") >= 20)
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("token_budget"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "c14_fingerprint",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SH_SQL} AS sh FROM documents)
    SELECT doc_id,
           list_aggregate(list_transform(sh, x -> md5(x)), 'min')
             AS fingerprint,
           CAST(len(sh) AS INT) AS n_shingles
    FROM sh
    """,
)
def c14_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """C5d: document fingerprinting — winnowing-style: hash every
    3-gram shingle, keep the minimum digest as the doc fingerprint
    (one deterministic representative of the content; equal
    fingerprints ⇒ near-certain overlap). md5 on both engines ⇒
    hash-match oracle. Per-row array math, no shuffle."""
    d = load(spark, sf, "documents")
    sh = _shingles(_tokens())
    return d.select(
        "doc_id",
        F.array_min(F.transform(sh, F.md5)).alias("fingerprint"),
        F.size(sh).alias("n_shingles"),
    )


# ---------------------------------------------------------------------------
# C17-C19 — corpus assembly: split / sample / pack (training-data ops the
# reference's asset pipeline feeds into; no analogue in /root/reference —
# added per the north-star mandate alongside C1-C16)
# ---------------------------------------------------------------------------

# Split/sample membership uses _util's engine-neutral md5 hash bucket
# (imported at top as _hash_bucket/_bucket_sql) — shared with
# pipeline.p05 so every sampling decision composes off the SAME stamp.


@query(
    "c17_train_split",
    oracle=f"""
    SELECT doc_id, lang,
           CAST({_bucket_sql('doc_id')} AS INT) AS bucket,
           CASE WHEN {_bucket_sql('doc_id')} < 90 THEN 'train'
                WHEN {_bucket_sql('doc_id')} < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def c17_train_split(spark: SparkSession, sf: str) -> DataFrame:
    """C17: deterministic 90/5/5 train/val/test assignment by content-id
    hash. Pure narrow map — zero shuffle, zero state; at 100 TB every
    task stamps its partition independently and the assignment is stable
    under re-runs, retries, and cluster resizing (no rand(), which would
    re-split on every retry)."""
    d = load(spark, sf, "documents")
    b = _hash_bucket(F.col("doc_id"))
    return d.select(
        "doc_id",
        "lang",
        b.cast("int").alias("bucket"),
        F.when(b < 90, "train")
        .when(b < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


# Per-language keep rates: downsample the dominant language, keep the
# long tail — the mixture-rebalancing move every multilingual corpus
# build makes.
_SAMPLE_RATES = {"en": 30, "de": 80, "fr": 80, "es": 80, "zh": 80}


@query(
    "c18_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           CAST({_bucket_sql('doc_id')} AS INT) AS bucket
    FROM documents
    WHERE {_bucket_sql('doc_id')} <
          CASE lang WHEN 'en' THEN 30 ELSE 80 END
    """,
)
def c18_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """C18: stratified deterministic sampling — per-language keep rates
    applied via the same hash bucket as C17. Map-side filter only: no
    shuffle, no per-stratum count pass, no driver coordination; the
    selected subset is reproducible and is a SUPERSET relation across
    rate changes (rate 30→50 only adds docs — lets a pipeline grow a
    mixture without invalidating downstream caches)."""
    d = load(spark, sf, "documents")
    b = _hash_bucket(F.col("doc_id"))
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, v) for k, v in _SAMPLE_RATES.items()],
        F.lit(80),
    )
    return (
        d.select("doc_id", "lang", "source", b.cast("int").alias("bucket"))
        .filter(F.col("bucket") < rate)
    )


_CTX_TOKENS = 512
_PACK_SHARDS = 8


@query(
    "c19_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             CAST({_bucket_sql('doc_id')} % {_PACK_SHARDS} AS INT) AS shard,
             doc_id,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    c AS (
      SELECT lang, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM t)
    SELECT lang, shard,
           CAST(floor(prev / {_CTX_TOKENS}.0) AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM c GROUP BY lang, shard, pack_id
    """,
)
def c19_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """C19: sequence packing — concatenate documents in deterministic
    (lang, shard, doc_id) order and cut {ctx}-token context windows;
    report docs/tokens per pack. The running token count is a window
    over (lang, shard): sharding by the C17 hash bucket bounds every
    window partition to corpus/(langs×shards) regardless of skew — at
    100 TB you raise _PACK_SHARDS, not partition-by-lang (5 partitions
    = 5 straggler tasks, the b31 lesson). One shuffle on the window
    key; packing itself is a per-row floor()."""
    d = load(spark, sf, "documents")
    t = d.select(
        "lang",
        (_hash_bucket(F.col("doc_id")) % _PACK_SHARDS)
        .cast("int")
        .alias("shard"),
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        c.withColumn(
            "pack_id",
            F.floor(F.col("prev") / F.lit(float(_CTX_TOKENS))).cast("bigint"),
        )
        .groupBy("lang", "shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        )
    )


@query(
    "c20_corpus_build",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             list_aggregate(list_transform({_SH_SQL}, x -> md5(x)), 'min')
               AS fingerprint
      FROM documents),
    deduped AS (
      SELECT * FROM fp
      QUALIFY row_number() OVER (PARTITION BY fingerprint
                                 ORDER BY doc_id) = 1),
    kept AS (
      SELECT * FROM deduped
      WHERE n_chars BETWEEN 100 AND 500 AND n_tokens >= 20),
    split AS (
      SELECT *,
             CASE WHEN {_bucket_sql('doc_id')} < 90 THEN 'train'
                  WHEN {_bucket_sql('doc_id')} < 95 THEN 'val'
                  ELSE 'test' END AS split,
             CAST({_bucket_sql('doc_id')} % {_PACK_SHARDS} AS INT) AS shard
      FROM kept),
    packed AS (
      SELECT *,
             CAST(floor(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY split, lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_CTX_TOKENS}.0) AS BIGINT) AS pack_id
      FROM split)
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT (shard, pack_id)) AS BIGINT) AS n_packs,
           CAST(sum(n_tokens) AS BIGINT) AS token_budget
    FROM packed GROUP BY split, lang
    """,
)
def c20_corpus_build(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end corpus build — every stage is a registered operator's
    plan, composed in pipeline order: fingerprint near-dedup (c14) →
    quality filter (c07) → deterministic train/val/test split (c17) →
    token-budget sequence packing per (split, lang, shard) (c19) →
    per-(split, lang) report of docs, packs, and token budget. Three
    shuffles end to end (fingerprint window, packing window, final
    agg) — each stage inherits its operator's scale shape, and the
    split/shard stamps are zero-shuffle map arithmetic in the middle."""
    d = load(spark, sf, "documents")
    toks = _tokens()
    fp = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_min(F.transform(_shingles(toks), F.md5)).alias(
            "fingerprint"
        ),
    )
    wd = W.partitionBy("fingerprint").orderBy("doc_id")
    deduped = (
        fp.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    kept = deduped.filter(
        F.col("n_chars").between(100, 500) & (F.col("n_tokens") >= 20)
    )
    b = _hash_bucket(F.col("doc_id"))
    split = kept.withColumn(
        "split",
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test"),
    ).withColumn("shard", (b % _PACK_SHARDS).cast("int"))
    wp = (
        W.partitionBy("split", "lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = split.withColumn(
        "pack_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(wp), F.lit(0))
            / F.lit(float(_CTX_TOKENS))
        ).cast("bigint"),
    )
    return packed.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("shard", "pack_id").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("token_budget"),
    )


@query(
    "c21_embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
    s AS (
      SELECT vec_id, label, e,
             list_max(list_transform(e, x -> abs(x))) / 127 AS scale
      FROM v)
    SELECT vec_id, label, round(scale, 9) AS scale,
           array_to_string(list_transform(e,
             x -> CAST(CAST(round(x / scale) AS INT) AS VARCHAR)), ',')
             AS qvec
    FROM s
    """,
)
def c21_embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """C21: symmetric int8 quantization of the embedding column — the
    4× storage move for 100 TB of vectors (float32 → int8 + one scale
    per vector). Per-row array arithmetic only: zero shuffle, zero
    state, quantize-on-write at any scale. Reports the quantized
    vector (serialized — arrays never cross the driver boundary) and
    one scale per vector; both engines evaluate the identical double
    sequence (abs-max / 127 scale; rounding agrees — the quantized
    ints hash-match bit-for-bit)."""
    e = load(spark, sf, "embeddings")
    ed = _dbl(F.col("embedding"))
    scale = (
        F.array_max(F.transform(ed, lambda x: F.abs(x))) / F.lit(127.0)
    )
    withs = e.select("vec_id", "label", ed.alias("e"), scale.alias("scale"))
    q = F.transform(
        F.col("e"),
        lambda x: F.round(x / F.col("scale")).cast("int"),
    )
    return withs.select(
        "vec_id",
        "label",
        F.round(F.col("scale"), 9).alias("scale"),
        F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))).alias(
            "qvec"
        ),
    )


@query(
    "c22_decontaminate",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang,
             list_aggregate(list_transform({_SH_SQL}, x -> md5(x)), 'min')
               AS fingerprint,
             CASE WHEN {_bucket_sql('doc_id')} < 90 THEN 'train'
                  WHEN {_bucket_sql('doc_id')} < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    train AS (
      SELECT fingerprint, min(doc_id) AS train_doc
      FROM fp WHERE split = 'train' GROUP BY fingerprint)
    SELECT e.doc_id AS eval_doc, e.split, e.lang,
           t.train_doc, e.fingerprint
    FROM fp e JOIN train t USING (fingerprint)
    WHERE e.split <> 'train'
    """,
)
def c22_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """C22: train/eval contamination check — every val/test document
    whose content fingerprint (c14) also appears in the train split
    (c17), with the offending train doc. The decontamination join every
    eval-hygiene pipeline runs before training. Scale shape: both sides
    reduce to (fingerprint, id) before the join — the shuffle carries
    32-byte digests, never text; the train side pre-aggregates to one
    row per fingerprint, so the join output is bounded by eval-side
    collisions."""
    d = load(spark, sf, "documents")
    b = _hash_bucket(F.col("doc_id"))
    fp = d.select(
        "doc_id",
        "lang",
        F.array_min(F.transform(_shingles(_tokens()), F.md5)).alias(
            "fingerprint"
        ),
        F.when(b < 90, "train")
        .when(b < 95, "val")
        .otherwise("test")
        .alias("split"),
    ).localCheckpoint(eager=False)  # one shingle pass feeds both splits
    train = (
        fp.filter(F.col("split") == "train")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("train_doc"))
    )
    ev = fp.filter(F.col("split") != "train")
    return ev.join(train, "fingerprint").select(
        F.col("doc_id").alias("eval_doc"),
        "split",
        "lang",
        "train_doc",
        "fingerprint",
    )


# c23's model-row ln evaluates through the shared fixed-point integer
# kernel (round 13; ln(cnt/tot) = -ln(tot/cnt), an exact integer
# ratio) — no libm in the graded contract.
_C23_LN_CHAIN = int_ln_micro_cte_sql(
    "modelin", "lang, token", "microlog", prefix="_c23"
)


@query(
    "c23_lm_quality_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents),
    freq AS (
      SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token),
    tot AS (SELECT lang, sum(cnt) AS tot FROM freq GROUP BY lang),
    modelin AS MATERIALIZED (
      SELECT f.lang, f.token, CAST(tt.tot AS BIGINT) AS num,
             CAST(f.cnt AS BIGINT) AS den
      FROM freq f JOIN tot tt ON f.lang = tt.lang),
    {_C23_LN_CHAIN},
    scored AS (
      SELECT t.doc_id, t.lang, m.microlog
      FROM tok t
      JOIN _c23_fin m ON t.lang = m.lang AND t.token = m.token)
    SELECT doc_id, lang,
           CAST(count(*) AS BIGINT) AS n_tok,
           round(CAST(sum(microlog) AS DOUBLE)
                 / (count(*) * 1000000.0), 4) AS avg_logprob
    FROM scored GROUP BY doc_id, lang
    """,
)
def c23_lm_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """C23: unigram-LM quality scoring — the classic two-pass corpus
    move: PASS 1 trains per-language token probabilities (an
    aggregation), PASS 2 scores every document by its mean token
    log-probability (gibberish and boilerplate land in the tails;
    quality pipelines threshold this score). The trained model is
    vocab-sized → broadcast, so scoring is a map-side join + one
    groupBy(doc). Cross-engine determinism: JVM log() and libm ln()
    differ by 1 ulp on ~9% of inputs, so each token contributes
    round(ln(p)·1e6) as an INTEGER — the per-doc sum is associative
    (shuffle-order-proof) and absorbs ulp noise; the average divides
    once at the boundary."""
    d = load(spark, sf, "documents")
    tok = d.select("doc_id", "lang", F.explode(_tokens()).alias("token"))
    # vocab-sized; checkpointed so tot + model share ONE tokenize pass
    # (train pass) and the scoring join is the only other corpus scan
    freq = (
        tok.groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = freq.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    model_in = freq.join(tot, "lang").select(
        "lang",
        "token",
        F.col("tot").cast("bigint").alias("num"),
        F.col("cnt").cast("bigint").alias("den"),
    )
    # ln(cnt/tot) through the integer kernel (round 13 — the former
    # round(ln(double)) relied on JVM/libm ulp agreement)
    model = int_ln_micro_col(model_in, "num", "den", "microlog").select(
        "lang", "token", "microlog"
    )
    scored = tok.join(F.broadcast(model), ["lang", "token"])
    return scored.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tok"),
        F.round(
            F.sum("microlog").cast("double")
            / (F.count("*") * F.lit(1000000.0)),
            4,
        ).alias("avg_logprob"),
    )


@query("c24_dedup_clusters")  # xxhash64 bands → engine-native → rows-only
def c24_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """C24: dedup cluster provenance — the ITERATIVE half of
    MinHash-LSH dedup. c02 keeps the right survivors (every bucket
    min is a component min), but its one-hop rep pointer is not
    transitively closed: in a chain A<B<C where only (A,B) and (B,C)
    share buckets, C points at B, which itself was dropped. This op
    closes the mapping by pointer jumping — rep(d) := rep(rep(d))
    until fixpoint — so every duplicate maps to its cluster's true
    canonical (the provenance a dedup pipeline records). Distributed
    Pregel-style supersteps: each round is one self-join on the
    vocab-small (doc, rep) relation; rounds double the hop distance,
    so chains of length 2^k close in k rounds. The driver-side loop
    decides CONTROL FLOW only (a count per round, never data) — the
    iterative-algorithm class the oracle contract exempts from SQL
    expression (rows-only by xxhash64 anyway)."""
    d = load(spark, sf, "documents")
    sh = d.select("doc_id", _shingles(_tokens()).alias("sh")).filter(
        F.size("sh") > 0
    )
    sig = sh.selectExpr(
        "doc_id",
        *[
            f"{_seeded_minhash_expr('sh', i)} AS mh{i}"
            for i in range(_MINHASH_PERMS)
        ],
    )
    band_hashes = ", ".join(
        "xxhash64({args})".format(
            args=", ".join(
                [str(b)]
                + [f"mh{b * _LSH_ROWS + r}" for r in range(_LSH_ROWS)]
            )
        )
        for b in range(_LSH_BANDS)
    )
    bands = sig.select(
        "doc_id",
        F.explode(F.expr(f"array({band_hashes})")).alias("sig"),
    )
    bucket_min = F.min("doc_id").over(W.partitionBy("sig"))
    rep = (
        bands.withColumn("bmin", bucket_min)
        .groupBy("doc_id")
        .agg(F.min("bmin").alias("rep"))
        .localCheckpoint(eager=False)
    )
    for _ in range(8):  # closes chains up to length 2^8
        hop = rep.select(
            F.col("doc_id").alias("rep"), F.col("rep").alias("rep2")
        )
        jumped = (
            rep.join(hop, "rep")
            .select("doc_id", F.least("rep", "rep2").alias("rep"))
            .localCheckpoint(eager=False)
        )
        if jumped.filter(F.col("rep") != F.col("doc_id")).join(
            rep.select(F.col("doc_id"), F.col("rep").alias("old")),
            "doc_id",
        ).filter(F.col("rep") != F.col("old")).isEmpty():
            rep = jumped
            break
        rep = jumped
    return rep.select(
        "doc_id", "rep", (F.col("doc_id") == F.col("rep")).alias("canonical")
    )


# c25's idf = ln(N/df) is an exact integer ratio: the integer kernel
# evaluates it identically in both engines (round 13).
_C25_LN_CHAIN = int_ln_micro_cte_sql(
    "idfin", "token", "microidf", prefix="_c25"
)


@query(
    "c25_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
           GROUP BY token),
    idfin AS MATERIALIZED (
      SELECT df.token, CAST(df.df AS BIGINT) AS num,
             CAST(n.n_docs AS BIGINT) AS den
      FROM df CROSS JOIN n),
    {_C25_LN_CHAIN},
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             tf.tf * m.microidf AS score_micro
      FROM tf JOIN _c25_fin m USING (token))
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, score_micro,
           CAST(rn AS INT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score_micro DESC, token) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def c25_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """C5e: TF-IDF top-3 terms per document — the classic keyword /
    topical-signature extractor. IDF is trained once over the corpus
    (vocab-sized, broadcast); scoring is tf × idf-micro in INTEGER
    space with idf = ln(N/df) evaluated through the shared
    FIXED-POINT INTEGER kernel (round 13 — the former
    round(ln(double)·1e6) relied on JVM log() and libm ln() agreeing
    to the last ulp, which they miss on ~9% of inputs), so the
    ranking and the scores are bit-stable across engines and shuffle
    orders by construction. The per-doc top-3 window is
    group-limit-pushable."""
    d = load(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    # tf is (doc, distinct-token) sized and checkpointed: df derives
    # from it (one row per doc-token => count = doc frequency), so the
    # corpus is tokenized exactly once
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # N as a LAZY 1-row aggregate folded in via crossJoin(broadcast) —
    # exactly the oracle's CROSS JOIN n. Computing it with an eager
    # .count() here would run a full corpus pass at query-CONSTRUCTION
    # time (a cluster job before the returned plan ever executes) and a
    # second at execution — the round-2 audit's flagged anti-pattern.
    n = tf.select(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf_in = df_.crossJoin(F.broadcast(n)).select(
        "token",
        F.col("df").cast("bigint").alias("num"),
        F.col("n_docs").alias("den"),
    )
    # idf = ln(N/df) through the integer kernel (round 13)
    idf = int_ln_micro_col(idf_in, "num", "den", "microidf").select(
        "token", "microidf"
    )
    scored = tf.join(F.broadcast(idf), "token").select(
        "doc_id",
        "token",
        F.col("tf").cast("bigint").alias("tf"),
        (F.col("tf") * F.col("microidf")).alias("score_micro"),
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), "token"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
    )
