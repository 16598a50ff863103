"""Round-9 operator semantics: the concurrent-commit conflict query
(b144), the dictionary/RLE layout audit (b145), and the tokenizer-apply
operator (c51). Oracle parity is covered by test_correctness's
registry-wide parametrization; these pin the invariants an oracle diff
alone would not localize — the conflict/retry protocol, the
partitioned-window plan shape, and the greedy-match semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402


# --- b144 concurrent-commit conflict ---------------------------------------


def _b144_table(spark):
    registry.QUERIES["b144_concurrent_commit"](spark, SF_CHECK)
    from iceberg_playground_spark.queries.lakehouse import _BUILT

    key = (spark.sparkContext.applicationId, SF_CHECK, "b144")
    return _BUILT[key]


def test_b144_final_state_is_one_replaced_file_set(spark):
    # the re-planned compaction REPLACED the five appended sets with
    # one rewritten set — blind-append compaction would leave 6 sets
    # and double every row
    t = _b144_table(spark)
    head = t.snapshot(t.current_version())
    assert head["summary"]["operation"] == "compact"
    assert len(head["data_files"]) == 1


def test_b144_refused_replace_minted_no_version(spark):
    # 6 = 4 raced appends + late append + re-planned replace; the
    # CommitConflict-refused replace must not appear in the log
    t = _b144_table(spark)
    assert t.versions() == [1, 2, 3, 4, 5, 6]
    ops = [
        t.snapshot(v)["summary"]["operation"] for v in t.versions()
    ]
    assert ops == ["append"] * 5 + ["compact"]


def test_b144_retry_replans_on_new_head_not_blind_rewrite(spark):
    # the committed compaction carries the LATE append's rows — proof
    # the retry re-read v5 rather than replaying the v4 rewrite
    t = _b144_table(spark)
    final = t.read()
    assert final.filter(F.col("writer") == "late").count() > 0
    # and time travel still serves the pre-compaction history
    v5 = t.read(version=5)
    assert v5.count() == final.count()


def test_b144_stale_replace_raises_not_erases(spark):
    # direct protocol probe: a replace pinned to a stale base must
    # raise CommitConflict and leave HEAD untouched
    from iceberg_playground_spark.tables import CommitConflict

    t = _b144_table(spark)
    head = t.current_version()
    staged = t.stage_append(t.read().limit(1))
    with pytest.raises(CommitConflict):
        t._commit(
            [staged], [], {"operation": "compact"},
            replace=True, base=head - 1,
        )
    assert t.current_version() == head


# --- b145 dictionary/RLE layout audit --------------------------------------


def test_b145_window_is_extent_partitioned_never_global(spark):
    # the run-count window must partition by extent (shuffle-parallel);
    # a single-partition window over the fact table is the scale bug
    # this audit exists to avoid
    df = registry.QUERIES["b145_dict_layout_audit"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(ext" in plan
    # the only SinglePartition exchanges feed the 1-row rollups, which
    # consume |extents|-row / 4-row inputs — never the fact scan
    assert plan.count("Exchange SinglePartition") <= 2


def test_b145_audit_invariants(spark):
    rows = {
        r["col_name"]: r
        for r in registry.QUERIES["b145_dict_layout_audit"](
            spark, SF_CHECK
        ).collect()
    }
    assert set(rows) == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_suppkey"
    }
    for r in rows.values():
        # sorting for adjacency can only merge runs, never split them
        assert r["sorted_runs"] <= r["ingest_runs"]
        # a run needs at least one row; an extent holds >= 1 run/value
        assert r["n_distinct"] <= r["sorted_runs"]
        assert r["sort_gain"] >= 1.0
    # low-cardinality columns must show the dictionary win the
    # reference's dict-array experiment was after; high-card l_suppkey
    # must not pretend to have one
    assert rows["l_returnflag"]["sort_gain"] > rows["l_suppkey"]["sort_gain"]


# --- c51 tokenizer apply ----------------------------------------------------


def _greedy_reference(word: str) -> list[int]:
    """Independent Python mirror of the greedy longest-prefix match."""
    from iceberg_playground_spark.queries.round9 import (
        _C51_MAXLEN,
        _C51_VOCAB,
    )

    vocab = dict(_C51_VOCAB)
    ids, i = [], 0
    while i < len(word):
        for l in range(_C51_MAXLEN, 0, -1):
            tok = word[i : i + l]
            if tok in vocab:
                ids.append(vocab[tok])
                i += len(tok)
                break
        else:
            ids.append(0)
            i += 1
    return ids


def test_c51_matches_independent_greedy_reference(spark):
    # tokenize a handful of adversarial words through the JVM
    # expression and through a from-scratch Python implementation
    from iceberg_playground_spark.queries.round9 import _c51_token_expr

    words = [
        "the",          # whole word is a merge
        "theory",       # 'the' + ...
        "entanglement", # overlapping merges, greedy must win left-first
        "ingestion",    # 'ing' 'es' 'tion'
        "x1z9",         # chars + digits
        "a",            # single char
        "scan!table",   # '!' is <unk>
        "station",      # 'st' 'at' 'ion'? vs 'sta'+'tion' — greedy decides
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    ).select("doc_id", F.expr(_c51_token_expr()).alias("ids"))
    got = {r["doc_id"]: list(r["ids"]) for r in df.collect()}
    for i, w in enumerate(words):
        assert got[i] == _greedy_reference(w), w


def test_c51_plan_is_pure_map_one_spread_exchange(spark):
    # the tokenizer must be a scan -> spread -> project chain: the ONE
    # exchange is the demo-parallelism input repartition (a one-file
    # corpus is one split; the match loop is the whole cost), and no
    # Python worker appears — tokenization at 100 TB is embarrassingly
    # parallel and the plan must keep it that way
    df = registry.QUERIES["c51_tokenizer_apply"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "Python" not in plan and "ArrowEval" not in plan


def test_c51_token_stream_reconstructs_corpus_lengths(spark):
    # token ids must cover every character: Σ len(token) per doc ==
    # count of non-space characters (vocab covers the alphabet, unk
    # consumes exactly one char)
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.round9 import _c51_token_expr

    d = load(spark, SF_CHECK, "documents").select("doc_id", "text")
    got = d.select(
        "doc_id",
        F.expr(_c51_token_expr()).alias("ids"),
        F.length(F.regexp_replace(F.lower(F.col("text")), " ", "")).alias(
            "n_chars"
        ),
    )
    from iceberg_playground_spark.queries.round9 import (
        _C51_VOCAB,
    )

    lens = F.create_map(
        *[
            x
            for tok, tid in _C51_VOCAB
            for x in (F.lit(tid), F.lit(len(tok)))
        ]
    )
    bad = got.select(
        F.aggregate(
            "ids",
            F.lit(0),
            lambda acc, i: acc + F.coalesce(lens[i], F.lit(1)),
        ).alias("covered"),
        "n_chars",
    ).filter(F.col("covered") != F.col("n_chars"))
    assert bad.count() == 0


# --- c52 bloom decontamination ----------------------------------------------


def test_c52_bloom_has_no_false_negatives(spark):
    # the Bloom contract: every exact hit MUST be flagged — a false
    # negative means contamination passes the filter silently
    rows = registry.QUERIES["c52_bloom_decontaminate"](
        spark, SF_CHECK
    ).collect()
    assert rows
    for r in rows:
        assert r["n_true_hits"] <= r["n_flagged"]
        assert r["n_false_pos"] == r["n_flagged"] - r["n_true_hits"]
        assert r["n_flagged"] <= r["n_train"]


def test_c52_train_probe_is_broadcast_map_side(spark):
    # phase 1 must be a broadcast of the bitmap row + map-side probe:
    # no sort-merge join against the train corpus, no cartesian; the
    # only nested-loop is the sanctioned 1-row bitmap crossJoin
    df = registry.QUERIES["c52_bloom_decontaminate"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
