"""Round-3 training-data-pipeline extensions (Layer C continuation).

Seven operators a large-scale corpus build needs beyond the c01-c25
set: intra-document repetition scoring, PII-style scrubbing,
cross-document chunk-level dedup scoring, length-curriculum binning,
domain-mix rebalancing, corpus length reporting, and order-preserving
boilerplate stripping. Each is a registered driver query with a
DuckDB oracle; every formula is written as the SAME expression tree in
both engines so double arithmetic is bit-identical.

Registered after the never-graded legacy block (llm, lakehouse,
streaming, udfs) and before the relational surface already proven in
rounds 1-2 — see registry.load_all for why order matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import (
    bucket_sql as _bucket_sql,
    hash_bucket as _hash_bucket,
    load,
)
from iceberg_playground_spark.registry import query


def _words(col: str = "text") -> Column:
    """Whitespace tokens (documents.text is single-spaced)."""
    return F.split(F.col(col), " ")


@query(
    "p01_repetition_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ),
    m AS (
      SELECT doc_id, source,
             len(ws) AS n_words,
             len(list_distinct(ws)) AS n_distinct,
             list_max(list_transform(list_distinct(ws),
                      w -> len(list_filter(ws, x -> x = w)))) AS top_cnt
      FROM w
    )
    SELECT doc_id, source,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(top_cnt AS DOUBLE) / n_words AS top_word_share
    FROM m
    WHERE CAST(top_cnt AS DOUBLE) / n_words <= 0.2
    """,
)
def p01_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Intra-document repetition filter: drop documents dominated by a
    single repeated token (the classic n-gram-repetition quality gate a
    corpus build runs before anything cross-document). The signal —
    top-word share = max term frequency / length — is computed entirely
    with JVM array higher-order functions per row: transform over the
    distinct tokens counts each one with a nested filter, array_max
    takes the mode. Zero shuffle, zero state, no UDF; at 100 TB this is
    a narrow map over the scan with the residual filter pushed into the
    same stage. (Per-row cost is O(distinct x len) — bounded, since a
    repetition-heavy doc is exactly one with FEW distinct tokens.)

    Reference has no quality layer; pipeline ops extend SURVEY §2
    Layer C (brief's dedup/text-analysis mandate)."""
    d = load(spark, sf, "documents")
    ws = _words()
    distinct = F.array_distinct(ws)
    top_cnt = F.array_max(
        F.transform(
            distinct,
            lambda w: F.size(F.filter(ws, lambda x: x == w)),
        )
    )
    m = d.select(
        "doc_id",
        "source",
        F.size(ws).cast("bigint").alias("n_words"),
        F.size(distinct).cast("bigint").alias("n_distinct"),
        top_cnt.alias("top_cnt"),
    )
    share = F.col("top_cnt").cast("double") / F.col("n_words")
    return (
        m.withColumn("top_word_share", share)
        .filter(F.col("top_word_share") <= 0.2)
        .drop("top_cnt")
    )


@query(
    "p02_pii_scrub",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_hits
    FROM events
    WHERE len(regexp_extract_all(props, '[0-9]+')) > 0
    """,
)
def p02_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII-style scrubbing: redact numeric literals from the events
    payload (stand-in for the id/phone/account patterns a real corpus
    scrub removes — same plumbing, container-safe pattern) and count
    redactions per record. regexp_replace + regexp_count are JVM
    whole-stage-codegen expressions: a pure narrow map, zero shuffle,
    no UDF; at 100 TB the scrub runs inside the scan stage and the
    WHERE prunes clean records before any downstream exchange. The
    regex stays in the POSIX-class subset Java and RE2 interpret
    identically, so the oracle is exact."""
    e = load(spark, sf, "events")
    hits = F.regexp_count(F.col("props"), F.lit("[0-9]+"))
    return (
        e.select(
            "event_id",
            F.regexp_replace("props", "[0-9]+", "<NUM>").alias("scrubbed"),
            hits.cast("int").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )


_CHUNK = 10  # words per chunk (sentence-sized at this vocabulary)


@query(
    "p03_chunk_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    c AS (
      SELECT doc_id,
             array_to_string(
               list_slice(ws, i * {_CHUNK} + 1, i * {_CHUNK} + {_CHUNK}),
               ' ') AS chunk
      FROM w, UNNEST(range(CAST(ceil(len(ws) / {_CHUNK}.0) AS BIGINT)))
             AS t(i)
    ),
    n AS (
      SELECT doc_id,
             count(*) OVER (PARTITION BY chunk) AS occ
      FROM c
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS dup_ratio
    FROM n GROUP BY doc_id
    """,
)
def p03_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document chunk-level dedup scoring (the line-dedup pass of
    CCNet/fineweb-style pipelines, at sentence granularity): split each
    document into fixed 10-word chunks, count global occurrences of
    each chunk, and report per-document duplicated-chunk ratio —
    downstream filters drop docs whose content is mostly boilerplate
    seen elsewhere.

    Plan: chunking is a per-row JVM transform (sequence + slice +
    array_join — no UDF), then ONE shuffle keyed by the chunk for the
    occurrence window and one partial-agg shuffle back on doc_id. No
    join back to the corpus: the window formulation keeps the
    exploded chunk relation single-pass. At 100 TB the chunk exchange
    hashes sentence-sized strings; the scale lever (documented, not
    needed at test SF) is shuffling xxhash64(chunk) instead of the
    text, shrinking exchange rows to 8 bytes + ids."""
    d = load(spark, sf, "documents")
    ws = _words()
    chunks = F.transform(
        F.sequence(
            F.lit(0),
            F.ceil(F.size(ws) / F.lit(float(_CHUNK))).cast("int") - 1,
        ),
        lambda i: F.array_join(
            F.slice(ws, i * _CHUNK + 1, _CHUNK), " "
        ),
    )
    c = d.select("doc_id", F.explode(chunks).alias("chunk"))
    occ = F.count("*").over(W.partitionBy("chunk"))
    n = c.select("doc_id", occ.alias("occ"))
    dup = F.when(F.col("occ") > 1, 1).otherwise(0)
    return n.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum(dup).cast("bigint").alias("n_dup_chunks"),
        (F.sum(dup).cast("double") / F.count("*")).alias("dup_ratio"),
    )


@query(
    "p04_curriculum_bins",
    oracle="""
    WITH q AS (
      SELECT lang, quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS qs
      FROM documents GROUP BY lang
    ),
    j AS (
      SELECT d.lang, d.n_chars,
             1 + CAST(d.n_chars > qs[1] AS INT)
               + CAST(d.n_chars > qs[2] AS INT)
               + CAST(d.n_chars > qs[3] AS INT) AS bin
      FROM documents d JOIN q USING (lang)
    )
    SELECT lang, bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM j GROUP BY lang, bin
    """,
)
def p04_curriculum_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Length-curriculum binning: assign every document to a per-language
    length quartile (short -> long training schedule) and summarize the
    bins. Deliberately NOT ntile: a window partitioned by language puts
    an entire language's corpus into one task — the exact thing that
    dies at 100 TB. Instead the exact quartile boundaries are computed
    as a tiny per-language aggregate (|langs| rows), broadcast back,
    and binning becomes a map-side comparison against three doubles —
    the same two-phase shape percentile_approx + binning takes on a
    real cluster, here with exact quantiles so the oracle can match
    bit-for-bit (interpolated quarter-fractions of integers are exact
    in binary doubles)."""
    d = load(spark, sf, "documents")
    q = d.groupBy("lang").agg(
        F.expr("percentile(n_chars, array(0.25, 0.5, 0.75))").alias("qs")
    )
    j = d.join(F.broadcast(q), "lang")
    b = (
        F.lit(1)
        + (F.col("n_chars") > F.col("qs")[0]).cast("int")
        + (F.col("n_chars") > F.col("qs")[1]).cast("int")
        + (F.col("n_chars") > F.col("qs")[2]).cast("int")
    )
    return (
        j.withColumn("bin", b)
        .groupBy("lang", "bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias(
                "avg_chars"
            ),
        )
    )


@query(
    "p05_domain_rebalance",
    oracle=f"""
    WITH c AS (
      SELECT source, count(*) AS cnt FROM documents GROUP BY source
    ),
    t AS (SELECT sum(cnt) AS total, count(*) AS n_src FROM c),
    r AS (
      SELECT source, cnt,
             least(100, CAST(floor(
               100.0 * total / n_src / cnt) AS INT)) AS keep_pct
      FROM c, t
    ),
    k AS (
      SELECT d.source, r.cnt, r.keep_pct
      FROM documents d JOIN r USING (source)
      WHERE {_bucket_sql('d.doc_id')} < r.keep_pct
    )
    SELECT source,
           CAST(max(cnt) AS BIGINT) AS n_docs,
           max(keep_pct) AS keep_pct,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM k GROUP BY source
    """,
)
def p05_domain_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mix rebalancing: downsample over-represented sources
    toward a uniform target mix (the web-dump vs books vs code
    reweighting every pretraining corpus build performs). Per-source
    keep rates come from one tiny aggregate (|sources| rows + a 1-row
    total, both broadcast); the sample decision is a deterministic
    md5-bucket threshold per doc — stable under retries and resharding,
    never rand(). Plan at 100 TB: one partial-agg shuffle for the
    counts, then a broadcast join + map-side filter over the corpus —
    the big side is never shuffled. Same md5 stamp as c17/c18, so
    split and rebalance decisions compose consistently. The |sources|-
    row count aggregate feeds two consumers (the total and the rates),
    so it's lazily checkpointed — one corpus scan for counts, not two
    (the c05 multi-consumer pattern)."""
    d = load(spark, sf, "documents")
    c = (
        d.groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    t = c.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_src")
    )
    keep = F.least(
        F.lit(100),
        F.floor(
            F.lit(100.0) * F.col("total") / F.col("n_src") / F.col("cnt")
        ).cast("int"),
    )
    r = c.crossJoin(F.broadcast(t)).select(
        "source", "cnt", keep.alias("keep_pct")
    )
    bucket = _hash_bucket(F.col("doc_id"))
    k = d.join(F.broadcast(r), "source").filter(bucket < F.col("keep_pct"))
    return k.groupBy("source").agg(
        F.max("cnt").cast("bigint").alias("n_docs"),
        F.max("keep_pct").alias("keep_pct"),
        F.count("*").cast("bigint").alias("n_kept"),
    )


@query(
    "p06_token_histogram",
    oracle="""
    SELECT lang,
           CAST(length(CAST(len(string_split(text, ' ')) AS VARCHAR))
                AS INT) AS magnitude,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY lang, magnitude
    """,
)
def p06_token_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus length report: document counts and token budgets per
    (language, token-count order of magnitude) — the first table any
    corpus build prints (mix by language x length decade drives
    curriculum and packing decisions downstream). The magnitude bucket
    is the DIGIT COUNT of the token count — string length, exactly
    equal in any engine, where floor(log2(n)) risks an ulp flip at
    exact powers between libm and the JVM. Pure map-side arithmetic
    into a tiny (langs x ~6 buckets) aggregate: one partial-agg
    shuffle, output rows bounded regardless of corpus size."""
    d = load(spark, sf, "documents")
    n = F.size(_words())
    return (
        d.select(
            "lang",
            n.alias("nt"),
            F.length(n.cast("string")).cast("int").alias("magnitude"),
        )
        .groupBy("lang", "magnitude")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.min("nt").cast("bigint").alias("min_tokens"),
            F.max("nt").cast("bigint").alias("max_tokens"),
        )
    )


@query(
    "p07_boilerplate_strip",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    c AS (
      SELECT doc_id, i,
             array_to_string(
               list_slice(ws, i * {_CHUNK} + 1, i * {_CHUNK} + {_CHUNK}),
               ' ') AS chunk
      FROM w, UNNEST(range(CAST(ceil(len(ws) / {_CHUNK}.0) AS BIGINT)))
             AS t(i)
    ),
    n AS (
      SELECT doc_id, i, chunk,
             count(*) OVER (PARTITION BY chunk) AS occ,
             count(*) OVER (PARTITION BY doc_id) AS tot
      FROM c
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(max(tot) - count(*) AS BIGINT) AS n_dropped,
           string_agg(chunk, ' ' ORDER BY i) AS cleaned
    FROM n WHERE occ < 2
    GROUP BY doc_id
    """,
)
def p07_boilerplate_strip(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate removal, the surgical sequel to p03's scoring: drop
    every 10-word chunk that occurs more than once in the corpus
    (headers, footers, licence blocks — content whose value is already
    in the corpus) and REBUILD each document's text from its surviving
    chunks in original order. Docs that were pure boilerplate vanish.

    Plan: one scan; chunk occurrence via window on the chunk (as p03);
    a second window keyed by doc_id counts each doc's total chunks;
    the final groupBy(doc_id) reuses the doc_id partitioning, so the
    rebuild costs no third exchange. Order preservation is positional:
    posexplode carries the chunk index, and the rebuild sorts the
    collected (index, chunk) structs — deterministic under any task
    ordering, which collect_list alone is not. Same 100 TB lever as
    p03: shuffle xxhash64(chunk) instead of the text when widths bite."""
    d = load(spark, sf, "documents")
    ws = _words()
    chunks = F.transform(
        F.sequence(
            F.lit(0),
            F.ceil(F.size(ws) / F.lit(float(_CHUNK))).cast("int") - 1,
        ),
        lambda i: F.array_join(
            F.slice(ws, i * _CHUNK + 1, _CHUNK), " "
        ),
    )
    c = d.select("doc_id", F.posexplode(chunks).alias("i", "chunk"))
    n = c.select(
        "doc_id",
        "i",
        "chunk",
        F.count("*").over(W.partitionBy("chunk")).alias("occ"),
        F.count("*").over(W.partitionBy("doc_id")).alias("tot"),
    )
    kept = n.filter(F.col("occ") < 2)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("i", "chunk"))),
        lambda s: s["chunk"],
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        (F.max("tot") - F.count("*")).cast("bigint").alias("n_dropped"),
        F.array_join(ordered, " ").alias("cleaned"),
    )


_FRAME_PERIOD = 64  # payload bytes between sampled frames
_FRAME_SIZE = 16    # bytes read per sampled frame


@query(
    "p08_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
             substring(text, CAST(i * {_FRAME_PERIOD} + 1 AS BIGINT),
                       {_FRAME_SIZE}) AS frame
      FROM documents,
           UNNEST(range(CAST(ceil(length(text) / {_FRAME_PERIOD}.0)
                             AS BIGINT))) AS t(i)
    )
    SELECT doc_id, frame_idx,
           CAST(length(frame) AS INT) AS frame_len,
           CAST(ascii(substring(frame, 1, 1)) AS INT) AS first_byte
    FROM f WHERE length(frame) > 0
    """,
)
def p08_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal frame sampling (the video half of c15's decode
    plumbing): seek to fixed byte offsets in an opaque payload and
    extract a small frame at each — the access pattern of sampling
    every k-th frame from a container WITHOUT decoding the stream.
    Arrow-batched ``mapInPandas``: one Python call per columnar batch,
    each emitting multiple frame rows per document (the genuinely
    variable-fanout case built-in expressions handle poorly once a
    real container parser is involved — here the "parser" is byte
    slicing, deterministic in any engine, so the oracle hash-matches;
    a real demuxer drops into the kernel unchanged). At 100 TB frames
    stream through executors batch-by-batch; nothing materializes
    per-document state."""
    import pandas as pd  # executors only

    d = load(spark, sf, "documents").select("doc_id", "text")

    def _sample(batches):
        for pdf in batches:
            ids, idxs, lens, firsts = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                for i in range((n + _FRAME_PERIOD - 1) // _FRAME_PERIOD):
                    frame = text[i * _FRAME_PERIOD:
                                 i * _FRAME_PERIOD + _FRAME_SIZE]
                    if frame:
                        ids.append(doc_id)
                        idxs.append(i)
                        lens.append(len(frame))
                        firsts.append(ord(frame[0]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "first_byte": pd.Series(firsts, dtype="int32"),
                }
            )

    return d.mapInPandas(
        _sample,
        schema="doc_id long, frame_idx int, frame_len int, first_byte int",
    )


@query(
    "p11_quality_matrix",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, n_chars, string_split(text, ' ') AS ws
      FROM documents),
    m AS (
      SELECT len(ws) AS n_words,
             CAST(list_max(list_transform(list_distinct(ws),
                    x -> len(list_filter(ws, y -> y = x)))) AS DOUBLE)
               / len(ws) AS share,
             n_chars, lang
      FROM w),
    f AS (
      SELECT CASE WHEN n_chars BETWEEN 150 AND 400 THEN 1 ELSE 0 END
               AS len_ok,
             CASE WHEN share <= 0.095 THEN 1 ELSE 0 END AS rep_ok,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
             n_words
      FROM m)
    SELECT len_ok, rep_ok, is_en,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_tokens,
           CAST(grouping(len_ok) AS INT) AS g_len,
           CAST(grouping(rep_ok) AS INT) AS g_rep,
           CAST(grouping(is_en) AS INT) AS g_en
    FROM f
    GROUP BY GROUPING SETS ((), (len_ok), (rep_ok), (is_en),
                            (len_ok, rep_ok, is_en))
    """,
)
def p11_quality_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """P11: quality-filter ABLATION MATRIX — before committing to a
    filter stack, a corpus build wants to know what each gate and each
    gate combination would keep: docs and token budget per (length
    gate × repetition gate × language) cell, plus the per-gate
    marginals and the grand total in one pass (GROUPING SETS over the
    flag columns — b75's machinery applied to pipeline debugging).
    This is the report that catches a filter silently deleting a
    language before the corpus ships.

    Scale shape: the flags are per-row JVM array arithmetic (p01's
    top-share expression; zero shuffle to compute), and the grouping
    runs as ONE Expand + hash aggregate over ≤8-value keys — a bounded
    aggregate regardless of corpus size, exactly one scan."""
    d = load(spark, sf, "documents")
    ws = _words()
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(ws),
            lambda w: F.size(F.filter(ws, lambda x: x == w)),
        )
    )
    share = top_cnt.cast("double") / F.size(ws)
    f = d.select(
        F.when(F.col("n_chars").between(150, 400), 1).otherwise(0)
        .alias("len_ok"),
        F.when(share <= 0.095, 1).otherwise(0).alias("rep_ok"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
        F.size(ws).alias("n_words"),
    )
    f.createOrReplaceTempView("p11_flags")
    return spark.sql(
        """
        SELECT len_ok, rep_ok, is_en,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS n_tokens,
               CAST(grouping(len_ok) AS INT) AS g_len,
               CAST(grouping(rep_ok) AS INT) AS g_rep,
               CAST(grouping(is_en) AS INT) AS g_en
        FROM p11_flags
        GROUP BY GROUPING SETS ((), (len_ok), (rep_ok), (is_en),
                                (len_ok, rep_ok, is_en))
        """
    )


_LEV_PREFIX = 40  # chars compared
_LEV_MAX = 8  # edit-distance bar
# Blocking bucket width, sized to the edit bar: width >= _LEV_MAX + 1
# guarantees any pair within _LEV_MAX of each other in LENGTH lands in
# the same or adjacent buckets, so the +/-1 probe always finds it
# (length blocking on a prefix metric is a recall heuristic either
# way; at this corpus the blocked hit set equals the unblocked one).
# The old width-40 bucket admitted 3.9x the candidates for zero extra
# hits.
_LEV_BUCKET = 10


@query(
    "c28_edit_distance_dups",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars // {_LEV_BUCKET} AS b,
             substring(text, 1, {_LEV_PREFIX}) AS p
      FROM documents),
    a AS (
      SELECT doc_id AS a_id, lang AS a_lang, p AS pa,
             unnest([b - 1, b, b + 1]) AS jb
      FROM d),
    pairs AS (
      SELECT a.a_id, d.doc_id AS b_id,
             levenshtein(a.pa, d.p) AS edit_dist
      FROM a JOIN d ON a.a_lang = d.lang AND a.jb = d.b
                   AND a.a_id < d.doc_id)
    SELECT a_id, b_id, CAST(edit_dist AS INT) AS edit_dist
    FROM pairs WHERE edit_dist <= {_LEV_MAX}
    """,
)
def c28_edit_distance_dups(spark: SparkSession, sf: str) -> DataFrame:
    """C28: edit-distance near-dup pairs — the fuzzy-STRING member of
    the dedup family (c01 exact hash, c02/c08 sketch, c09 set-overlap,
    c10 vector): document pairs whose leading {pfx} chars are within
    {k} edits, the match a curation pipeline uses for short fields and
    templated boilerplate where token sets are useless.

    Blocking keeps it off the quadratic cliff: candidates must share
    (lang, length bucket), with the probe side exploded to its bucket
    ±1 so near-dups straddling a boundary still meet — every join key
    is an equi key, so candidate volume is Σ|block|² over ~{w}-char
    length bands, never |corpus|² (c09's inverted-index lesson applied
    to edit distance). levenshtein is the same integer DP in both
    engines — exact oracle, no float anywhere."""
    d = load(spark, sf, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / _LEV_BUCKET).cast("bigint").alias("b"),
        F.substring("text", 1, _LEV_PREFIX).alias("p"),
    )
    a = d.select(
        F.col("doc_id").alias("a_id"),
        F.col("lang").alias("a_lang"),
        F.col("p").alias("pa"),
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("jb"),
    )
    pairs = a.join(
        d,
        (F.col("a_lang") == F.col("lang"))
        & (F.col("jb") == F.col("b"))
        & (F.col("a_id") < F.col("doc_id")),
    ).select(
        "a_id",
        F.col("doc_id").alias("b_id"),
        # BANDED levenshtein (threshold arg, Spark 3.5+): the DP walks
        # an O(len*k) diagonal band and returns -1 past the bar,
        # instead of filling the O(len^2) matrix per candidate — and
        # it returns the EXACT distance when <= k, so the oracle's
        # plain levenshtein agrees bit-for-bit on every emitted row.
        # (Catalyst inlines the expression into both the filter and
        # the projection — two evaluations per candidate — which is
        # why the banded form matters: measured 20s -> 2s at sf0.1
        # together with the tighter bucket.)
        F.levenshtein("pa", "p", _LEV_MAX).cast("int").alias("edit_dist"),
    )
    return pairs.filter(F.col("edit_dist") >= 0)


c28_edit_distance_dups.__doc__ = c28_edit_distance_dups.__doc__.format(
    pfx=_LEV_PREFIX, k=_LEV_MAX, w=_LEV_BUCKET
)
