"""Semantic contracts of the round-3 pipeline operators (beyond the
oracle equivalence test_correctness already runs): invariants a corpus
build relies on, stated directly against the operator outputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402
from iceberg_playground_spark.session import load  # noqa: E402


def test_repetition_filter_bounds(spark):
    rows = registry.QUERIES["p01_repetition_filter"](spark, SF_CHECK).collect()
    assert rows
    for r in rows:
        assert 0 < r["top_word_share"] <= 0.2  # the filter's contract
        assert r["n_distinct"] <= r["n_words"]


def test_boilerplate_strip_preserves_untouched_docs(spark):
    # a doc that lost no chunks must read back exactly as written —
    # the order-preserving rebuild is the operator's whole point
    out = registry.QUERIES["p07_boilerplate_strip"](spark, SF_CHECK)
    docs = load(spark, SF_CHECK, "documents").select("doc_id", "text")
    j = out.filter(F.col("n_dropped") == 0).join(docs, "doc_id")
    mismatched = j.filter(F.col("cleaned") != F.col("text")).count()
    assert mismatched == 0
    assert j.count() > 0  # the invariant actually bites on this corpus


def test_boilerplate_strip_agrees_with_chunk_dedup(spark):
    # p07 keeps exactly the chunks p03 counts as non-duplicated
    strip = {
        r["doc_id"]: r
        for r in registry.QUERIES["p07_boilerplate_strip"](
            spark, SF_CHECK
        ).collect()
    }
    score = registry.QUERIES["p03_chunk_dedup"](spark, SF_CHECK).collect()
    for r in score:
        s = strip.get(r["doc_id"])
        if s is None:  # doc was pure boilerplate: every chunk dup'd
            assert r["n_dup_chunks"] == r["n_chunks"]
        else:
            assert s["n_kept"] == r["n_chunks"] - r["n_dup_chunks"]
            assert s["n_dropped"] == r["n_dup_chunks"]


def test_curriculum_bins_partition_each_language(spark):
    out = registry.QUERIES["p04_curriculum_bins"](spark, SF_CHECK).collect()
    docs = load(spark, SF_CHECK, "documents")
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    by_lang: dict[str, list] = {}
    for r in out:
        assert 1 <= r["bin"] <= 4
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        assert sum(r["n_docs"] for r in rows) == totals[lang]
        # quartiles are ordered: bin ranges must not interleave
        for a in rows:
            for b in rows:
                if a["bin"] < b["bin"]:
                    assert a["min_chars"] <= b["max_chars"]


def test_domain_rebalance_rates_and_counts(spark):
    out = registry.QUERIES["p05_domain_rebalance"](spark, SF_CHECK).collect()
    assert out
    for r in out:
        assert 0 <= r["keep_pct"] <= 100
        assert 0 < r["n_kept"] <= r["n_docs"]


def test_token_histogram_accounts_for_every_doc(spark):
    out = registry.QUERIES["p06_token_histogram"](spark, SF_CHECK).collect()
    n_docs = load(spark, SF_CHECK, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs
    for r in out:
        assert len(str(r["min_tokens"])) == r["magnitude"]
        assert len(str(r["max_tokens"])) == r["magnitude"]
