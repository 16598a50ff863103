"""Round-9 operators: the three additions VERDICT r8 named (items 2,
6, 8) plus Bloom-filter decontamination, each lifting an already-
proven capability into a registered, hash-graded query. (The round's
other additions, TPC-H Q15/Q17/Q22, live in tpch.py with the rest of
the same-text pack.)

- b144: CONCURRENT-COMMIT CONFLICT resolution — the reference declares
  a ``concurrent_writes`` experiment it never shipped
  (/root/reference/Cargo.toml:53-55; its single-committer design,
  src/bin/decouple.rs:22-24, exists precisely to dodge this race).
  Here the race actually runs: four writers stage file sets and commit
  CONCURRENTLY from four threads through the optimistic CAS
  (tables.py::_commit — atomic os.link, losers re-read HEAD and
  replay); then a compaction pinned to a stale base proves the
  REPLACE-vs-append conflict: the replace must REFUSE (lost update)
  and re-plan on the new HEAD, never blindly rewrite. Graded on the
  final table state: every writer's rows present, exact key checksums,
  exact snapshot count — no lost rows, no double rows.
- b145: DICTIONARY/RLE LAYOUT AUDIT — the reference's other declared-
  but-absent bin (``dict-array``, /root/reference/Cargo.toml:44-46:
  Arrow dictionary-array experiments). The Spark-first re-expression
  is the report a table owner reads before choosing a sort order:
  per column, global cardinality, value-adjacency runs in ingest
  order, and the run count a sort-for-adjacency rewrite would reach.
  Runs are counted within fixed 64-order EXTENTS (the row-group/
  dictionary-batch granularity — Arrow dictionaries and parquet RLE
  pages never span files), so the window is partitioned and the
  whole audit is shuffle-parallel: no global sort exists in the plan.
- c51: TOKENIZER APPLY — c32 counts BPE merge-pair statistics but
  nothing applied a merge table (VERDICT r8 item 8: "the last missing
  step between corpus stats and model-ready token streams"). A fixed
  public subword vocabulary (single characters + common English
  n-gram merges, greedy longest-prefix match, max token length 4 —
  the WordPiece/BPE-inference shape) is applied per document as ONE
  JVM expression: nested higher-order functions (transform over
  words, aggregate over match steps), zero Python, zero exchanges —
  a pure map over the corpus, graded on per-document token counts
  and an md5 digest of the exact token-id stream.
- c52: BLOOM-FILTER DECONTAMINATION — the two-phase membership shape
  (broadcast bitmap prefilter with no false negatives, exact confirm
  join on the flagged fraction only) that replaces c22's
  exact-join-everything form when the eval set is millions of rows.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from iceberg_playground_spark.queries._util import hash_bucket, load
from iceberg_playground_spark.queries.lakehouse import _built
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.tables import CommitConflict, LakeCatalog

# ---------------------------------------------------------------------------
# b144 — concurrent-commit conflict (racing CAS committers + replace)
# ---------------------------------------------------------------------------

_B144_WRITERS = 4

_B144_ORACLE = f"""
WITH w AS (
  SELECT 'w' || CAST(n_nationkey % {_B144_WRITERS} AS VARCHAR) AS writer,
         n_nationkey
  FROM nation
  UNION ALL
  SELECT 'late', n_nationkey FROM nation)
SELECT writer,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
       6 AS n_versions
FROM w GROUP BY writer
"""


@query("b144_concurrent_commit", oracle=_B144_ORACLE)
def b144_concurrent_commit(spark: SparkSession, sf: str) -> DataFrame:
    """B144: racing committers + conflict-checked compaction (the
    reference's declared-but-absent concurrent_writes experiment,
    Cargo.toml:53-55).

    Act 1 — APPEND race: four writers stage disjoint nation slices,
    then commit SIMULTANEOUSLY from four threads. The CAS
    (tables.py::_commit: write-temp + atomic os.link; a loser re-reads
    HEAD and replays) serializes them into versions 1-4 in whatever
    order the race lands. Append replay is safe by construction —
    staged files extend ANY head — so all four must land and no retry
    may duplicate a file set.

    Act 2 — REPLACE conflict: a compactor reads HEAD (v4) and stages
    the rewritten file set; BEFORE it commits, a fifth writer's append
    lands (v5). The compactor's replace is pinned to base=4 and MUST
    raise CommitConflict — replaying a replace onto v5 would silently
    erase the late append (the lost-update Iceberg's
    rewrite_data_files validation rejects). The query REQUIRES the
    conflict to fire, then re-plans: re-read v5, re-compact, commit v6.

    Graded on the final state: per-writer row counts and key checksums
    (nothing lost, nothing doubled through 5 appends + 1 conflicted
    compaction) and the exact snapshot count (6 = 4 raced appends +
    late append + re-planned replace; the REFUSED replace must not
    have minted a version)."""

    def build(tmp: str):
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "demo", "race", "n_nationkey BIGINT, writer STRING",
            drop_if_exists=True,
        )
        n = load(spark, sf, "nation").select(
            F.col("n_nationkey").cast("bigint").alias("n_nationkey")
        )
        # writers stage first (parallel parquet writes), then RACE the
        # commits — each thread runs its own footer-bounds job + CAS
        staged = [
            t.stage_append(
                n.filter(F.col("n_nationkey") % _B144_WRITERS == i)
                .withColumn("writer", F.lit(f"w{i}"))
            )
            for i in range(_B144_WRITERS)
        ]
        errs: list[Exception] = []

        def commit_one(d: str) -> None:
            try:
                t._commit([d], [], {"operation": "append", "race": "b144"})
            except Exception as ex:  # pragma: no cover - surfaced below
                errs.append(ex)

        threads = [
            threading.Thread(target=commit_one, args=(d,)) for d in staged
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        if errs:
            raise errs[0]
        if t.current_version() != _B144_WRITERS:
            raise RuntimeError(
                f"append race lost rows: HEAD v{t.current_version()}"
            )
        # compactor reads its base, stages the rewrite ...
        base = t.current_version()
        stale_rewrite = t.stage_append(t.read(version=base))
        # ... and loses the race: a late append lands first
        t.append(
            n.withColumn("writer", F.lit("late")).select(
                "n_nationkey", "writer"
            )
        )
        # the stale replace MUST refuse — this is the graded contract:
        # blind replay here would erase the late append's rows, which
        # the oracle's per-writer checksums would expose
        try:
            t._commit(
                [stale_rewrite],
                [],
                {"operation": "compact"},
                replace=True,
                base=base,
            )
            raise RuntimeError(
                "stale replace landed — lost-update protection broken"
            )
        except CommitConflict:
            pass
        # re-plan on the new HEAD: tables.py::compact re-reads and
        # rewrites v5 (all five appends) into one sorted file set
        t.compact(sort_by=["writer", "n_nationkey"])
        return t

    t = _built(spark, sf, "b144", build)
    return (
        t.read()
        .groupBy("writer")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .withColumn(
            "n_versions", F.lit(len(t.versions())).cast("int")
        )
    )


# ---------------------------------------------------------------------------
# b145 — dictionary/RLE layout audit (runs-per-extent report)
# ---------------------------------------------------------------------------

# Orders per extent: the adjacency domain within which runs are
# counted — the row-group / Arrow-dictionary-batch granularity.
# Encoders never carry a run across this boundary, so neither does
# the audit, and the window is partitioned (shuffle-parallel) instead
# of a global sort.
_B145_EXT = 64

_B145_COLS = ["l_returnflag", "l_linestatus", "l_quantity", "l_suppkey"]


def _b145_oracle() -> str:
    fl = ",\n    ".join(
        f"CASE WHEN lag({c}) OVER w IS DISTINCT FROM {c} "
        f"THEN 1 ELSE 0 END AS ch_{c}"
        for c in _B145_COLS
    )
    per_ext = ",\n    ".join(
        f"sum(ch_{c}) AS r_{c}, count(DISTINCT {c}) AS d_{c}"
        for c in _B145_COLS
    )
    tot = ",\n    ".join(
        f"sum(r_{c}) AS runs_{c}, sum(d_{c}) AS srt_{c}"
        for c in _B145_COLS
    )
    glob = ", ".join(
        f"count(DISTINCT {c}) AS g_{c}" for c in _B145_COLS
    )
    branches = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       CAST(g_{c} AS BIGINT) AS n_distinct,
       CAST(runs_{c} AS BIGINT) AS ingest_runs,
       CAST(srt_{c} AS BIGINT) AS sorted_runs,
       round(CAST(n_rows AS DOUBLE) / runs_{c}, 4) AS avg_run_len,
       round(CAST(runs_{c} AS DOUBLE) / srt_{c}, 4) AS sort_gain
FROM tot, gstats"""
        for c in _B145_COLS
    )
    order_tb = ", ".join(_B145_COLS)
    return f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, {", ".join(_B145_COLS)},
         CAST(floor(l_orderkey / {_B145_EXT}) AS BIGINT) AS ext
  FROM lineitem),
fl AS (
  SELECT ext, {", ".join(_B145_COLS)},
    {fl}
  FROM li WINDOW w AS (PARTITION BY ext
    ORDER BY l_orderkey, l_linenumber, {order_tb})),
per_ext AS (
  SELECT ext,
    {per_ext}
  FROM fl GROUP BY ext),
tot AS (
  SELECT
    {tot}
  FROM per_ext),
gstats AS (
  SELECT count(*) AS n_rows, {glob} FROM lineitem)
{branches}
"""


@query("b145_dict_layout_audit", oracle=_b145_oracle())
def b145_dict_layout_audit(spark: SparkSession, sf: str) -> DataFrame:
    """B145: dictionary/RLE layout audit — the Spark-first
    re-expression of the reference's absent ``dict-array`` bin
    (Cargo.toml:44-46, Arrow dictionary arrays). Per tracked column:

    - n_distinct: global cardinality (dictionary size);
    - ingest_runs: value-adjacency runs in ingest order, counted
      within fixed {EXT}-order extents (rows never RLE across a
      row-group/file boundary, so neither does the audit);
    - sorted_runs: the run count a sort-for-adjacency rewrite reaches
      (= per-extent cardinality summed — each distinct value becomes
      one run inside its extent);
    - avg_run_len and sort_gain: rows/run today and today's runs per
      post-sort run — the RLE/dictionary win of committing to a
      sort order, the number that justifies tables.py::compact's
      sort_by rewrite (b83/b88's layout moves) before paying it.

    Scale shape: ONE partitioned window (extent-hash exchange, sorted
    within extents — NO global sort anywhere in the plan) computes
    the change flags for all four columns in a single pass; the
    rollups are |extents|-row and 1-row aggregates. At 100 TB the
    audit costs one shuffle of the projected columns, the same order
    as writing them once."""
    ext = F.floor(F.col("l_orderkey") / _B145_EXT).cast("bigint")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", *_B145_COLS
    ).withColumn("ext", ext)
    # the synthetic lineitem repeats (l_orderkey, l_linenumber) pairs,
    # so the ingest order alone is not total — the tracked columns
    # break ties, which keeps every lag() comparison order-invariant
    # (tie rows are identical in every compared column) and therefore
    # engine-independent
    w = W.partitionBy("ext").orderBy(
        "l_orderkey", "l_linenumber", *_B145_COLS
    )
    fl = li.select(
        "ext",
        *_B145_COLS,
        *[
            (~F.lag(c).over(w).eqNullSafe(F.col(c)))
            .cast("bigint")
            .alias(f"ch_{c}")
            for c in _B145_COLS
        ],
    )
    per_ext = fl.groupBy("ext").agg(
        *[F.sum(f"ch_{c}").alias(f"r_{c}") for c in _B145_COLS],
        *[F.countDistinct(c).alias(f"d_{c}") for c in _B145_COLS],
    )
    tot = per_ext.agg(
        *[F.sum(f"r_{c}").alias(f"runs_{c}") for c in _B145_COLS],
        *[F.sum(f"d_{c}").alias(f"srt_{c}") for c in _B145_COLS],
    )
    glob = li.agg(
        F.count("*").alias("n_rows"),
        *[F.countDistinct(c).alias(f"g_{c}") for c in _B145_COLS],
    )
    joined = tot.crossJoin(glob)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"g_{c}").cast("bigint").alias("n_distinct"),
                    F.col(f"runs_{c}").cast("bigint").alias("ingest_runs"),
                    F.col(f"srt_{c}").cast("bigint").alias("sorted_runs"),
                    F.round(
                        F.col("n_rows").cast("double") / F.col(f"runs_{c}"),
                        4,
                    ).alias("avg_run_len"),
                    F.round(
                        F.col(f"runs_{c}").cast("double")
                        / F.col(f"srt_{c}"),
                        4,
                    ).alias("sort_gain"),
                )
                for c in _B145_COLS
            ]
        )
    ).alias("r")
    return joined.select(per_col).select("r.*")


b145_dict_layout_audit.__doc__ = b145_dict_layout_audit.__doc__.replace(
    "{EXT}", str(_B145_EXT)
)


# ---------------------------------------------------------------------------
# c51 — tokenizer apply (greedy longest-prefix subword match)
# ---------------------------------------------------------------------------

# Fixed public vocabulary: id 0 is <unk>; single characters cover the
# corpus alphabet; the multi-char entries are common English n-gram
# merges (the c32 top-pair shape frozen into a literal so both engines
# share one table). Greedy longest-prefix match, max token length 4 —
# BPE/WordPiece inference semantics.
_C51_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"
_C51_MERGES = [
    "tion", "ment", "the", "and", "ing", "ion", "ent", "er", "re",
    "on", "at", "en", "ed", "es", "te", "ti", "st", "ar", "nd",
    "or", "an", "in", "le", "al", "ow", "ta", "ke", "va", "ue",
    "pa", "ha", "sc", "ba", "wi", "so", "fa",
]
_C51_VOCAB: list[tuple[str, int]] = [
    (ch, i + 1) for i, ch in enumerate(_C51_CHARS)
] + [
    (m, len(_C51_CHARS) + 1 + j) for j, m in enumerate(_C51_MERGES)
]
_C51_MAXLEN = 4


def _c51_spark_map() -> str:
    """The vocab as a Spark SQL map literal token -> struct(id, len)."""
    entries = ", ".join(
        f"'{tok}', named_struct('id', {tid}, 'len', {len(tok)})"
        for tok, tid in _C51_VOCAB
    )
    return f"map({entries})"


def _c51_token_expr() -> str:
    """One JVM expression tokenizing a whole document: words (split on
    spaces), each consumed by a bounded aggregate loop — per step,
    greedy longest vocab prefix (4..1), else <unk> consuming one
    char. No Python, no shuffle: the plan is scan -> project.

    The matched entry is bound ONCE per step through a 1-element
    transform (the expression-language "let"): higher-order functions
    are interpreted, not codegen'd, so evaluating the 4-probe coalesce
    twice (once for rem, once for ids) measurably doubled the hot
    loop — the let-bind form benches ~6x faster than the naive
    twice-evaluated step at sf0.1."""
    vm = _c51_spark_map()
    tries = ", ".join(
        f"try_element_at({vm}, substring(acc.rem, 1, {l}))"
        for l in range(_C51_MAXLEN, 0, -1)
    )
    step = f"""
      element_at(transform(
        array(coalesce({tries}, named_struct('id', 0, 'len', 1))),
        m -> named_struct(
          'rem', substring(acc.rem, m.len + 1),
          'ids', array_append(acc.ids, m.id))), 1)
    """
    return f"""
    flatten(transform(
      filter(split(lower(text), ' '), w -> w <> ''),
      w -> aggregate(
        sequence(1, char_length(w)),
        named_struct('rem', w, 'ids', array_repeat(0, 0)),
        (acc, step) -> IF(acc.rem = '', acc, {step}),
        acc -> acc.ids)))
    """


def _c51_oracle() -> str:
    vocab_values = ", ".join(f"('{t}', {i})" for t, i in _C51_VOCAB)
    probes = ", ".join(
        f"substr(t.rem, 1, {l})" for l in range(_C51_MAXLEN, 0, -1)
    )
    return f"""
WITH RECURSIVE vocab(tok, id) AS (VALUES {vocab_values}),
docs AS (SELECT doc_id, lower(text) AS text FROM documents),
wt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM docs),
words AS (
  SELECT doc_id, i AS wpos, toks[i] AS word
  FROM wt, UNNEST(range(1, len(toks) + 1)) AS u(i)
  WHERE toks[i] <> ''),
tok(doc_id, wpos, rem, ids, ntok) AS (
  SELECT doc_id, wpos, word, CAST('' AS VARCHAR), 0 FROM words
  UNION ALL
  SELECT t.doc_id, t.wpos, substr(t.rem, m.len + 1),
         CASE WHEN t.ids = '' THEN CAST(m.id AS VARCHAR)
              ELSE t.ids || ',' || CAST(m.id AS VARCHAR) END,
         t.ntok + 1
  FROM tok t, LATERAL (
    SELECT id, len FROM (
      SELECT v.id AS id, length(v.tok) AS len, 1 AS pri
      FROM vocab v WHERE v.tok IN ({probes})
      UNION ALL SELECT 0, 1, 2)
    ORDER BY pri, len DESC LIMIT 1) AS m(id, len)
  WHERE t.rem <> ''),
final AS (SELECT doc_id, wpos, ids, ntok FROM tok WHERE rem = '')
SELECT doc_id,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       md5(string_agg(ids, ',' ORDER BY wpos)) AS ids_digest
FROM final GROUP BY doc_id
"""


@query("c51_tokenizer_apply", oracle=_c51_oracle())
def c51_tokenizer_apply(spark: SparkSession, sf: str) -> DataFrame:
    """C51: apply a subword tokenizer to the corpus — the step between
    c32's merge-pair statistics and a model-ready token stream
    (VERDICT r8 item 8). Greedy longest-prefix match against a fixed
    public vocabulary (single chars + common English n-gram merges,
    max token length 4; id 0 = <unk> consuming one character) — the
    BPE/WordPiece inference loop.

    The entire document tokenizes inside ONE JVM expression: transform
    over the word array, and per word a bounded ``aggregate`` loop
    (at most |word| steps) that strips the longest matching vocab
    prefix per step via 4 map probes. Graded per document on the
    token count and the md5 digest of the exact comma-joined token-id
    stream — any divergence in a single token id anywhere in the
    corpus flips the digest.

    Scale shape: a map plus one demo-parallelism input spread (the
    c43 single-split lesson — pinned in tests). At 100 TB tokenization
    is embarrassingly parallel and this plan is exactly that:
    expression work on each input split, no data movement beyond the
    input spread. Two evaluation traps, both measured at sf0.1:
    the per-step match is let-bound (see _c51_token_expr), and the
    two outputs derive from the ids array through ONE ``inline``
    generator — a plain two-column projection gets
    CollapseProject-inlined into TWO full tokenization passes
    (3.0 s -> 0.6 s steady-state)."""
    ids = F.expr(_c51_token_expr())
    # spread the CPU before tokenizing: a one-file demo corpus is ONE
    # input split, and the match loop is this query's entire cost (the
    # c43/_flagged_positions single-split lesson — measured 12.2 s ->
    # sub-second at sf0.1 with the explicit count). On a real many-
    # file corpus this exchange is ~free against the pass it spreads.
    out = F.inline(
        F.transform(
            F.array(ids),  # let-bind: ids evaluates once, 'a' is bound
            lambda a: F.struct(
                F.size(a).cast("bigint").alias("n_tokens"),
                F.md5(
                    F.array_join(
                        F.transform(a, lambda i: i.cast("string")), ","
                    )
                ).alias("ids_digest"),
            ),
        )
    )
    return (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
        .select("doc_id", out)
        .filter(F.col("n_tokens") > 0)
    )


# ---------------------------------------------------------------------------
# c52 — Bloom-filter decontamination (two-phase: bitmap prefilter + exact)
# ---------------------------------------------------------------------------

# Bloom geometry, sized to DEMONSTRATE false positives at demo scale
# (~50 eval fingerprints, k*n/m ≈ 0.6 → ~8% fp rate). A production
# run sizes m for fp ≈ 1e-6; the shapes below are m-independent.
_C52_M = 256          # bits
_C52_K = 3            # hash probes per fingerprint
_C52_W = 32           # bits per bitmap word (1 << 31 stays positive)


def _c52_positions_sql(fp: str) -> list[str]:
    """The K bit positions of a fingerprint, DuckDB form — md5-derived
    per the hash_bucket cross-engine convention ('0x' cast here,
    conv(hex) on the Spark side; both read the same 8 hex chars to
    the same integer, but each engine only accepts its own spelling —
    Spark's ANSI cast rejects '0x' strings)."""
    return [
        f"CAST('0x' || substring(md5({fp} || ':{i}'), 1, 8) AS BIGINT) "
        f"% {_C52_M}"
        for i in range(_C52_K)
    ]


def _c52_positions_spark(fp: str) -> list[str]:
    """The same K positions in Spark SQL spelling (conv hex->dec)."""
    return [
        f"CAST(conv(substring(md5({fp} || ':{i}'), 1, 8), 16, 10) "
        f"AS BIGINT) % {_C52_M}"
        for i in range(_C52_K)
    ]


def _c52_oracle() -> str:
    bkt = "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"
    pos_eval = ", ".join(_c52_positions_sql("fp"))
    return f"""
WITH docs AS (
  SELECT doc_id, lang, md5(text) AS fp, {bkt} AS bkt FROM documents),
eval_fps AS (SELECT DISTINCT fp FROM docs WHERE bkt >= 90),
eval_pos AS (
  SELECT DISTINCT u.p FROM eval_fps, UNNEST([{pos_eval}]) AS u(p)),
bitmap AS (
  SELECT CAST(floor(p / {_C52_W}.0) AS BIGINT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % {_C52_W} AS INTEGER)) AS bits
  FROM eval_pos GROUP BY 1),
train AS (SELECT doc_id, lang, fp FROM docs WHERE bkt < 90),
train_pos AS (
  SELECT doc_id, lang, fp, u.p FROM train, UNNEST([{pos_eval}]) AS u(p)),
probed AS (
  SELECT t.doc_id, t.lang, t.fp,
         bool_and((COALESCE(b.bits, 0)
                   & (CAST(1 AS BIGINT) << CAST(t.p % {_C52_W} AS INTEGER)))
                  <> 0) AS flagged
  FROM train_pos t
  LEFT JOIN bitmap b ON b.word = CAST(floor(t.p / {_C52_W}.0) AS BIGINT)
  GROUP BY t.doc_id, t.lang, t.fp),
truth AS (
  SELECT p.lang, count(*) AS n_true
  FROM probed p JOIN eval_fps e ON p.fp = e.fp
  WHERE p.flagged GROUP BY p.lang)
SELECT p.lang,
       CAST(count(*) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN p.flagged THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(COALESCE(max(t.n_true), 0) AS BIGINT) AS n_true_hits,
       CAST(sum(CASE WHEN p.flagged THEN 1 ELSE 0 END)
            - COALESCE(max(t.n_true), 0) AS BIGINT) AS n_false_pos
FROM probed p LEFT JOIN truth t ON p.lang = t.lang
GROUP BY p.lang
"""


@query("c52_bloom_decontaminate", oracle=_c52_oracle())
def c52_bloom_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """C52: Bloom-filter decontamination — the TWO-PHASE membership
    shape (Bloom 1970, public work) every 100 TB decontamination job
    actually runs: the eval set's fingerprints compress into a
    fixed-size bitmap that BROADCASTS (phase 1: map-side probe over
    the whole train corpus, zero shuffle, no-false-negative filter),
    and only the tiny flagged fraction pays the exact semi-join
    (phase 2: confirm). c22 is the exact-join-everything form; this
    is what replaces it when the eval set is millions of rows — the
    bitmap is KBs where the broadcast fingerprint set would be GBs.
    Per language: train size, bloom-flagged count, exact-confirmed
    hits, and false positives — the report that says whether m/k are
    sized right BEFORE trusting the filter. Demo geometry
    (m={M}, k={K}) deliberately undersized so false positives are
    visible and graded; everything is md5-derived integer math, so
    bitmap, flags, and counts hash-match across engines.

    Scale shape: the bitmap build aggregates |eval|*k bit positions
    into <= m/{W} words (one tiny exchange), then rides a 1-row
    broadcast; the train scan probes via map-side lambda arithmetic
    (forall over k positions, no per-row join); the confirm
    semi-join's left side is ONLY the flagged docs. No train shuffle
    anywhere."""
    bkt = hash_bucket(F.col("doc_id"))
    d = load(spark, sf, "documents").select(
        "doc_id", "lang", F.md5("text").alias("fp"), bkt.alias("bkt")
    )
    eval_fps = d.filter(F.col("bkt") >= 90).select("fp").distinct()
    # each probe as a precomputed (word, mask) struct — the shift
    # amount is per-row, which the SQL shiftleft takes but the Python
    # F.shiftleft (literal-only numBits) does not
    wm_exprs = [
        f"named_struct("
        f"'word', CAST(floor(({e}) / {_C52_W}.0) AS BIGINT), "
        f"'mask', shiftleft(CAST(1 AS BIGINT), "
        f"CAST(({e}) % {_C52_W} AS INT)))"
        for e in _c52_positions_spark("fp")
    ]
    probes_arr = F.expr(f"array({', '.join(wm_exprs)})")
    bitmap = (
        eval_fps.select(F.explode(probes_arr).alias("wm"))
        .select("wm.word", "wm.mask")
        .distinct()
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("bmap")
        )
    )
    train = d.filter(F.col("bkt") < 90).select("doc_id", "lang", "fp")
    probe = F.forall(
        probes_arr,
        lambda wm: (
            F.coalesce(
                F.try_element_at(F.col("bmap"), wm["word"]),
                F.lit(0).cast("bigint"),
            ).bitwiseAND(wm["mask"])
            != 0
        ),
    )
    # project to the three columns downstream needs (dropping the
    # broadcast bitmap column), then checkpoint once: the report agg
    # and the confirm arm both consume tf, and without the barrier
    # the whole phase-1 probe pass (corpus scan + md5 + k-position
    # forall) evaluated twice (round 16; the c62 checkpoint-once
    # rule). The confirm semi-join still sees only flagged rows.
    tf = (
        train.crossJoin(F.broadcast(bitmap))
        .withColumn("flagged", probe)
        .select("lang", "fp", "flagged")
        .localCheckpoint(eager=False)
    )
    truth = (
        tf.filter("flagged")
        .join(eval_fps, "fp", "leftsemi")
        .groupBy("lang")
        .agg(F.count("*").alias("n_true"))
    )
    return (
        tf.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_train"),
            F.sum(F.col("flagged").cast("int"))
            .cast("bigint")
            .alias("n_flagged"),
        )
        .join(truth, "lang", "left")
        .select(
            "lang",
            "n_train",
            "n_flagged",
            F.coalesce(F.col("n_true"), F.lit(0))
            .cast("bigint")
            .alias("n_true_hits"),
            (
                F.col("n_flagged")
                - F.coalesce(F.col("n_true"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_false_pos"),
        )
    )


c52_bloom_decontaminate.__doc__ = (
    c52_bloom_decontaminate.__doc__.replace("{M}", str(_C52_M))
    .replace("{K}", str(_C52_K))
    .replace("{W}", str(_C52_W))
)


# ---------------------------------------------------------------------------
# c53 — DSIR importance resampling (Xie et al., "Data Selection for
# Language Models via Importance Resampling", 2023)
# ---------------------------------------------------------------------------

_C53_B = 256          # hashed feature buckets
_C53_K = 100          # Gumbel top-k sample size
_C53_TARGET = "src0"  # the target-distribution source


def _c53_oracle() -> str:
    return f"""
    WITH feat AS (
      SELECT doc_id, source,
             CAST('0x' || substring(md5(token), 1, 8) AS BIGINT)
               % {_C53_B} AS bucket
      FROM (SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS token
            FROM documents)),
    model AS (
      SELECT bucket, count(*) AS cnt_raw,
             sum(CASE WHEN source = '{_C53_TARGET}' THEN 1 ELSE 0 END)
               AS cnt_tgt
      FROM feat GROUP BY bucket),
    deltas AS (
      SELECT bucket,
             CAST(round(1000000.0 *
                    (ln((CAST(cnt_tgt AS DOUBLE) + 1)
                        / (sum(cnt_tgt) OVER () + {_C53_B}))
                   - ln((CAST(cnt_raw AS DOUBLE) + 1)
                        / (sum(cnt_raw) OVER () + {_C53_B}))))
                  AS BIGINT) AS delta_micro
      FROM model),
    wdoc AS (
      SELECT f.doc_id, f.source,
             CAST(sum(d.delta_micro) AS BIGINT) AS weight_micro
      FROM feat f JOIN deltas d ON f.bucket = d.bucket
      GROUP BY f.doc_id, f.source),
    keyed AS (
      SELECT doc_id, source, weight_micro,
             weight_micro + CAST(round(-1000000.0 * ln(-ln(
                 (CAST(CAST('0x' ||
                        substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 1000000 AS DOUBLE) + 0.5)
                 / 1000000.0))) AS BIGINT) AS key_micro
      FROM wdoc),
    sel AS (
      SELECT doc_id, source, weight_micro FROM keyed
      ORDER BY key_micro DESC, doc_id LIMIT {_C53_K})
    SELECT s.source,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(count(sel.doc_id) AS BIGINT) AS n_selected,
           CAST(coalesce(sum(sel.doc_id), 0) AS BIGINT) AS sel_docid_sum,
           CAST(coalesce(sum(sel.weight_micro), 0) AS BIGINT)
             AS sel_weight_micro
    FROM (SELECT source, count(*) AS n_docs FROM documents
          GROUP BY source) s
    LEFT JOIN sel ON s.source = sel.source
    GROUP BY s.source, s.n_docs
    ORDER BY s.source
    """


@query("c53_dsir_resample", oracle=_c53_oracle())
def c53_dsir_resample(spark: SparkSession, sf: str) -> DataFrame:
    """C53: DSIR importance resampling (Xie et al. 2023) — the
    principled version of "train on data that looks like the target":
    two hashed-unigram LMs (target = one source's docs; raw = the
    whole corpus) assign every document an importance weight
    Σ_tokens [ln p_tgt(f) - ln p_raw(f)] over hashed features, and
    Gumbel-top-k sampling draws the training subset ∝ exp(weight) —
    closing the selection family: c35 resamples by given temperature,
    p22 by given recipe, c53 LEARNS the weights from a target. The
    graded report is per-source: corpus docs, docs selected, a
    doc_id checksum of the selection, and its total micro-weight.
    (On real data, target-like sources upsample; this synthetic
    corpus draws every source from one 31-word distribution, so
    weights hover near zero and the report instead certifies the
    machinery — weights, noise, and selection — bit-for-bit.)

    Every arithmetic step is engine-portable by construction:
    features hash through the md5-prefix family (hash_bucket's
    discipline), both LMs use +1/(tot+B) Laplace smoothing, each
    per-token contribution rounds to an INTEGER micro-log (c23's
    ulp-absorption rule) so the per-doc sum is associative, and the
    Gumbel noise derives from the md5 of doc_id — u=(h%1e6+0.5)/1e6,
    g=-ln(-ln(u)) — so "randomness" is deterministic, reproducible,
    and identical on both engines (the p10 seeded-shuffle rule
    applied to sampling).

    Scale shape: the model pass is one corpus tokenize → 256-row
    aggregate (map-side partials); totals ride a window over those
    256 rows, never a rescan; scoring re-tokenizes the corpus once
    more against the BROADCAST 256-row delta table (c23's two-scan
    shape — at 100 TB the model is KBs and both passes are
    map-side); the top-k lowers to TakeOrderedAndProject
    (per-partition top-100 + merge, never a global sort); the final
    report joins the 100-row sample against a |sources|-row rollup.
    (Ref anchor: extends the reference's delegated query surface the
    same way c35/p22 do — a Layer-C mandate op, not a reference
    parity op.)"""
    # hash-repartition ahead of the two tokenize passes (c31's rule,
    # round 17): the per-token md5 hashing otherwise inherits the
    # scan's one-split partitioning and runs single-core (cell
    # measured 2.1 -> 0.9 s at sf0.1 on 32 cores)
    d = (
        load(spark, sf, "documents")
        .select("doc_id", "source", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    tok = d.select(
        "doc_id", "source",
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    feat = tok.select(
        "doc_id", "source",
        (F.conv(F.md5(F.col("token")).substr(1, 8), 16, 10).cast("bigint")
         % _C53_B).alias("bucket"),
    )
    model = feat.groupBy("bucket").agg(
        F.count("*").alias("cnt_raw"),
        F.sum(
            F.when(F.col("source") == _C53_TARGET, 1).otherwise(0)
        ).alias("cnt_tgt"),
    )
    w = W.partitionBy()
    deltas = model.select(
        "bucket",
        F.round(
            1e6
            * (
                F.log(
                    (F.col("cnt_tgt").cast("double") + 1)
                    / (F.sum("cnt_tgt").over(w) + _C53_B)
                )
                - F.log(
                    (F.col("cnt_raw").cast("double") + 1)
                    / (F.sum("cnt_raw").over(w) + _C53_B)
                )
            )
        ).cast("bigint").alias("delta_micro"),
    )
    wdoc = (
        feat.join(F.broadcast(deltas), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum("delta_micro").cast("bigint").alias("weight_micro"))
    )
    u = (
        (
            F.conv(F.md5(F.col("doc_id").cast("string")).substr(1, 8), 16, 10)
            .cast("bigint") % 1000000
        ).cast("double")
        + 0.5
    ) / 1e6
    keyed = wdoc.withColumn(
        "key_micro",
        F.col("weight_micro")
        + F.round(-1e6 * F.log(-F.log(u))).cast("bigint"),
    )
    sel = keyed.orderBy(F.col("key_micro").desc(), "doc_id").limit(_C53_K)
    src_tot = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return (
        src_tot.join(sel, "source", "left")
        .groupBy("source", "n_docs")
        .agg(
            F.count("doc_id").cast("bigint").alias("n_selected"),
            F.coalesce(F.sum("doc_id"), F.lit(0))
            .cast("bigint").alias("sel_docid_sum"),
            F.coalesce(F.sum("weight_micro"), F.lit(0))
            .cast("bigint").alias("sel_weight_micro"),
        )
        .orderBy("source")
    )
