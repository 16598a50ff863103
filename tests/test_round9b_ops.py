"""Round-9b operator semantics: quantized Lloyd k-means (c54), the
vocab growth curve (c55), length-bucketed batch packing (c56), and the
hashed linear classifier (c57). Oracle parity is covered by
test_correctness's registry-wide parametrization; these pin the
algorithmic invariants an oracle diff alone would not localize —
Lloyd's monotone objective, Heaps'-curve monotonicity, batch-size and
padding bounds, and the classifier's score/label consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402


# --- c54 quantized Lloyd ----------------------------------------------------


def test_c54_all_vecs_assigned_valid_clusters(spark):
    df = registry.QUERIES["c54_kmeans_lloyd"](spark, SF_CHECK)
    rows = df.collect()
    assert len(rows) == 500  # every vector, exactly once
    assert all(0 <= r["cluster_id"] < 8 for r in rows)
    assert all(r["sq_dist"] >= 0 for r in rows)


def test_c54_lloyd_objective_never_increases(spark):
    # the defining Lloyd invariant: total within-cluster cost after
    # pass 3 (post two centroid updates) <= cost at pass 1 (seeds).
    # Quantization (floor on centroids) can only perturb by O(1) per
    # dim, far below the seed-vs-fitted gap.
    from iceberg_playground_spark.queries.round9b import (
        _C54_K,
        _c54_assign,
        _c54_quantized,
        _c54_update,
    )

    qdf = _c54_quantized(spark, SF_CHECK)
    seeds = sorted(
        qdf.filter(F.col("vec_id") < _C54_K).collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [(int(r["vec_id"]), [int(v) for v in r["q"]]) for r in seeds]
    a1 = _c54_assign(qdf, cents)
    cost1 = a1.agg(F.sum("sq_dist")).collect()[0][0]
    cents2 = _c54_update(a1)
    a2 = _c54_assign(qdf, cents2)
    cost2 = a2.agg(F.sum("sq_dist")).collect()[0][0]
    assert cost2 <= cost1
    # and the update actually moved the centroids off the seeds
    assert cents2 != cents


def test_c54_iterations_refine_not_noop(spark):
    # pass-3 assignment must differ from the seed assignment for at
    # least one vector (seeds are arbitrary corpus rows; if 3 Lloyd
    # passes change nothing, the iteration plumbing is dead code)
    from iceberg_playground_spark.queries.round9b import (
        _C54_K,
        _c54_assign,
        _c54_quantized,
    )

    qdf = _c54_quantized(spark, SF_CHECK)
    seeds = sorted(
        qdf.filter(F.col("vec_id") < _C54_K).collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [(int(r["vec_id"]), [int(v) for v in r["q"]]) for r in seeds]
    seed_assign = {
        r["vec_id"]: r["cluster_id"] for r in _c54_assign(qdf, cents).collect()
    }
    final = {
        r["vec_id"]: r["cluster_id"]
        for r in registry.QUERIES["c54_kmeans_lloyd"](
            spark, SF_CHECK
        ).collect()
    }
    assert final != seed_assign


# --- c55 vocab growth -------------------------------------------------------


@pytest.fixture(scope="module")
def c55_rows(spark):
    return registry.QUERIES["c55_vocab_growth"](spark, SF_CHECK).collect()


def test_c55_cumulative_columns_monotone(c55_rows):
    for a, b in zip(c55_rows, c55_rows[1:]):
        assert b["docs_cum"] > a["docs_cum"]
        assert b["tokens_cum"] > a["tokens_cum"]
        assert b["vocab_cum"] >= a["vocab_cum"]


def test_c55_totals_match_corpus(spark, c55_rows):
    docs = spark.read.parquet(f"{SF_CHECK}/documents.parquet")
    last = c55_rows[-1]
    assert last["docs_cum"] == docs.count()
    total_tok = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0]["t"]
    assert last["tokens_cum"] == total_tok
    vocab = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).distinct().count()
    assert last["vocab_cum"] == vocab


def test_c55_ttr_falls_as_corpus_grows(c55_rows):
    # Heaps' law on any natural-ish corpus: type/token ratio of the
    # prefix shrinks as the prefix grows (vocab saturates sublinearly)
    assert c55_rows[-1]["ttr_micro"] < c55_rows[0]["ttr_micro"]


# --- c56 length-bucketed batches -------------------------------------------


@pytest.fixture(scope="module")
def c56_rows(spark):
    return registry.QUERIES["c56_length_bucket_batches"](
        spark, SF_CHECK
    ).collect()


def test_c56_batch_and_padding_bounds(c56_rows):
    from iceberg_playground_spark.queries.round9b import _C56_BATCH

    for r in c56_rows:
        assert 1 <= r["n_docs"] <= _C56_BATCH
        assert r["max_tok"] <= r["bucket"]  # bucket is a capacity
        assert 0 <= r["pad_to_max"] <= r["pad_to_bucket"]
        assert (
            r["pad_to_bucket"]
            == r["bucket"] * r["n_docs"] - r["tok_sum"]
        )


def test_c56_covers_every_document(spark, c56_rows):
    docs = spark.read.parquet(f"{SF_CHECK}/documents.parquet")
    assert sum(r["n_docs"] for r in c56_rows) == docs.count()


def test_c56_longest_first_beats_naive_padding(spark, c56_rows):
    # the point of the operator: longest-first within (bucket, shard)
    # packs near-equal lengths together, so pad-to-max across all
    # batches undercuts what naive ingest-order batching would pay
    docs = spark.read.parquet(f"{SF_CHECK}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    from pyspark.sql.window import Window as W

    from iceberg_playground_spark.queries.round9b import _C56_BATCH

    naive = (
        docs.withColumn(
            "batch_id",
            F.floor(
                (F.row_number().over(W.orderBy("doc_id")) - 1) / _C56_BATCH
            ),
        )
        .groupBy("batch_id")
        .agg(
            (F.max("n_tok") * F.count("*") - F.sum("n_tok")).alias("pad")
        )
        .agg(F.sum("pad"))
        .collect()[0][0]
    )
    bucketed = sum(r["pad_to_max"] for r in c56_rows)
    assert bucketed < naive


# --- c57 hashed classifier --------------------------------------------------


def test_c57_score_label_consistent_and_weights_bounded(spark):
    rows = registry.QUERIES["c57_hashed_classifier_apply"](
        spark, SF_CHECK
    ).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["label"] == (1 if r["score_cc"] > 0 else 0)
        # |weight| <= 98 centi-units per token bounds the doc score
        assert abs(r["score_cc"]) <= 98 * r["n_tok"]


def test_c57_matches_python_reference_on_sample(spark):
    import hashlib

    from iceberg_playground_spark.queries.round9b import _C57_D, _C57_P

    docs = (
        spark.read.parquet(f"{SF_CHECK}/documents.parquet")
        .filter(F.col("doc_id") < 5)
        .collect()
    )
    got = {
        r["doc_id"]: r["score_cc"]
        for r in registry.QUERIES["c57_hashed_classifier_apply"](
            spark, SF_CHECK
        )
        .filter(F.col("doc_id") < 5)
        .collect()
    }
    for d in docs:
        want = sum(
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            % _C57_D
            % _C57_P
            - 98
            for t in d["text"].split(" ")
        )
        assert got[d["doc_id"]] == want
