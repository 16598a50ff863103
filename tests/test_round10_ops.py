"""Round-10 operator semantics: BPE merge learning (c63), snapshot
cherry-pick (b157), and the leakage-safe split (p32). Oracle parity is
covered by test_correctness's registry-wide parametrization; these pin
the invariants an oracle diff alone would not localize — the greedy
trainer against an independent Python reference, the cherry-pick
refusal contract, and the cluster-granularity guarantee."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from iceberg_playground_spark import registry
from iceberg_playground_spark.tables import CommitConflict, LakeCatalog

registry.load_all()

from tests.conftest import SF_CHECK, SF_SMOKE  # noqa: E402


# --- c63 BPE merge learning -------------------------------------------------


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference trainer (the c51 convention): plain
    Python dicts and lists, no shared code with the query under test.
    Returns (merge_table, final_seqs)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        # argmax with (count DESC, pair ASC) tie-break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((a, b, cnt))
        for w, syms in seqs.items():
            out: list[str] = []
            for s in syms:  # greedy left-to-right fold
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            seqs[w] = out
    return merges, seqs


@pytest.fixture(scope="module")
def c63_result(spark):
    return (
        registry.QUERIES["c63_bpe_merge_learn"](spark, SF_SMOKE)
        .orderBy("step")
        .collect()
    )


def test_c63_matches_independent_python_trainer(spark, c63_result):
    wc = {
        r["word"]: r["cnt"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    merges, seqs = _py_bpe(wc, len(c63_result))
    assert [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in c63_result] == merges
    # the re-tokenized corpus token count after ALL merges agrees
    final_tokens = sum(wc[w] * len(s) for w, s in seqs.items())
    assert c63_result[-1]["tokens_after"] == final_tokens


def test_c63_merge_table_shape(c63_result):
    assert [r["step"] for r in c63_result] == list(
        range(1, len(c63_result) + 1)
    )
    for r in c63_result:
        assert r["merged"] == r["left_sym"] + r["right_sym"]
        assert r["pair_count"] >= 1
    # each merge strictly shrinks the corpus (by pair_count applications
    # minus overlap losses — but always by at least one)
    toks = [r["tokens_after"] for r in c63_result]
    assert all(t2 < t1 for t1, t2 in zip(toks, toks[1:]))


def test_c63_later_merges_can_consume_earlier_ones(c63_result):
    # sanity that the trainer is really iterating (not re-picking the
    # same pair): all N picked pairs are distinct
    picked = [(r["left_sym"], r["right_sym"]) for r in c63_result]
    assert len(set(picked)) == len(picked)


# --- b157 snapshot cherry-pick ----------------------------------------------


def _scratch(spark, tmp_path, rows, name="t157"):
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", name, "k BIGINT, v STRING", drop_if_exists=True
    )
    for batch in rows:
        t.append(
            spark.createDataFrame(batch, "k BIGINT, v STRING")
        )
    return t


def test_b157_happy_path_reapplies_delta(spark, tmp_path):
    t = _scratch(
        spark, tmp_path, [[(1, "a")], [(2, "b")], [(3, "c")]]
    )  # v1..v3
    t.rollback(2)  # v4: content {1,2}
    v = t.cherrypick_snapshot(3)
    assert v == 5
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3]
    assert t.snapshot(5)["summary"] == {
        "operation": "cherry-pick", "source": 3, "added": 1,
    }


def test_b157_refuses_double_pick(spark, tmp_path):
    t = _scratch(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.rollback(1)
    t.cherrypick_snapshot(2)
    with pytest.raises(CommitConflict, match="already present"):
        t.cherrypick_snapshot(2)
    # and picking a snapshot that is simply still live refuses too
    with pytest.raises(CommitConflict, match="already present"):
        t.cherrypick_snapshot(1)


def test_b157_refuses_replace_snapshot(spark, tmp_path):
    t = _scratch(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.compact()  # v3: REPLACE
    t.rollback(2)  # v4
    with pytest.raises(CommitConflict, match="REPLACE"):
        t.cherrypick_snapshot(3)


def test_b157_refuses_delete_bearing_snapshot(spark, tmp_path):
    t = _scratch(spark, tmp_path, [[(1, "a"), (2, "b")]])
    t.delete_where("k = 1", ["k"])  # v2: carries a delete file
    t.rollback(1)  # v3
    with pytest.raises(CommitConflict, match="delete"):
        t.cherrypick_snapshot(2)


def test_b157_refused_picks_mint_no_version(spark, tmp_path):
    t = _scratch(spark, tmp_path, [[(1, "a")], [(2, "b")]])
    t.compact()
    t.rollback(2)
    head = t.current_version()
    for bad in (3, 2):  # replace, then already-present
        with pytest.raises((CommitConflict, ValueError)):
            t.cherrypick_snapshot(bad)
    with pytest.raises(ValueError):
        t.cherrypick_snapshot(0)
    assert t.current_version() == head


def test_b157_graded_history_shape(spark):
    registry.QUERIES["b157_cherrypick_snapshot"](spark, SF_CHECK)
    from iceberg_playground_spark.queries.lakehouse import _BUILT

    key = (spark.sparkContext.applicationId, SF_CHECK, "b157")
    t = _BUILT[key]
    assert t.versions() == [1, 2, 3, 4, 5, 6]
    ops = [t.snapshot(v)["summary"]["operation"] for v in t.versions()]
    assert ops == [
        "append", "append", "append", "compact", "rollback", "cherry-pick",
    ]
    # the pick was metadata-only: v6 extends v5's file list by exactly
    # the v3-vs-v2 delta, no rewrite
    d = {v: {e["path"] for e in t.snapshot(v)["data_files"]} for v in t.versions()}
    assert d[6] == d[5] | (d[3] - d[2])


# --- p32 leakage-safe split --------------------------------------------------


@pytest.fixture(scope="module")
def p32_doc_level(spark):
    """Re-derive the doc-level assignment the summary aggregates."""
    from iceberg_playground_spark.queries.round10 import (
        _P32_TRAIN, _P32_VAL,
    )
    from iceberg_playground_spark.queries._util import hash_bucket
    from pyspark.sql.window import Window as W

    d = spark.read.parquet(f"{SF_CHECK}/documents.parquet").select(
        "doc_id", F.md5("text").alias("fp")
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
    return s.collect()


def test_p32_clusters_never_straddle_splits(p32_doc_level):
    by_fp: dict[str, set] = {}
    for r in p32_doc_level:
        by_fp.setdefault(r["fp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_fp.values())


def test_p32_summary_consistent_with_doc_level(spark, p32_doc_level):
    out = {
        r["split"]: r
        for r in registry.QUERIES["p32_leakage_safe_split"](
            spark, SF_CHECK
        ).collect()
    }
    docs = collections.Counter(r["split"] for r in p32_doc_level)
    clusters: dict[str, set] = {}
    for r in p32_doc_level:
        clusters.setdefault(r["split"], set()).add(r["fp"])
    assert set(out) <= {"train", "validation", "test"}
    for split, row in out.items():
        assert row["n_docs"] == docs[split]
        assert row["n_clusters"] == len(clusters[split])
        assert row["leaky_clusters"] == 0
    assert sum(r["n_docs"] for r in out.values()) == len(p32_doc_level)
    # 80/10/10 intent: train strictly dominates
    assert out["train"]["n_docs"] > out.get(
        "validation", out["train"]
    )["n_docs"] or "validation" not in out


def test_p32_is_deterministic_across_runs(spark):
    q = registry.QUERIES["p32_leakage_safe_split"]
    a = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    assert a == b
