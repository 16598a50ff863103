"""Semantic invariants for the round-4 operators (beyond the oracle
hash-match): ANN self-consistency against an independent numpy
recomputation, chunk-window coverage laws, shuffle permutation laws,
decontamination split discipline."""

from __future__ import annotations

import numpy as np

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


def test_ann_ivf_is_exact_within_probed_cells(spark):
    # c11 prunes to 2 cells then claims EXACT top-5 within them. The
    # claim is verified independently: numpy recomputes cosine for every
    # vector in the labels c11 actually returned from; those must be
    # exactly the 5 best (data-dependent recall vs c03 is NOT asserted —
    # on near-uniform random vectors cell pruning has no recall floor).
    rows = (
        registry.QUERIES["c11_ann_ivf"](spark, SF_SMALL)
        .collect()
    )
    assert len(rows) == 5
    df = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    e = {
        r["vec_id"]: (
            np.array(r["embedding"], dtype=np.float64),
            r["label"],
        )
        for r in df.collect()
    }
    q = e[0][0]
    probed_labels = {e[r["vec_id"]][1] for r in rows}
    assert len(probed_labels) <= 2
    cand = [
        (vid, float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))))
        for vid, (v, lab) in e.items()
        if lab in probed_labels and vid != 0
    ]
    best = sorted(cand, key=lambda t: (-t[1], t[0]))[:5]
    assert sorted(r["vec_id"] for r in rows) == sorted(v for v, _ in best)


def test_chunk_windows_cover_every_token_once_per_window(spark):
    # p09 laws, per doc: chunk count = floor((n-1)/stride)+1; chunk i
    # holds min(chunk_size, n - i*stride) tokens; chunk 0 starts at
    # token 1 so the union covers 1..n (stride <= chunk size).
    from iceberg_playground_spark.queries.widen import _CHUNK, _STRIDE

    toks = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .collect()
    }
    out = {}
    for r in registry.QUERIES["p09_chunk_windows"](spark, SF_SMALL).collect():
        out.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["n_chunk_tokens"]
    assert set(out) == set(toks)
    for doc, n in toks.items():
        chunks = out[doc]
        expect = (n - 1) // _STRIDE + 1
        assert sorted(chunks) == list(range(expect))
        for i in range(expect):
            assert chunks[i] == min(_CHUNK, n - i * _STRIDE)


def test_corpus_shuffle_is_a_stable_permutation(spark):
    # p10 laws: every doc appears once; positions within a shard are
    # contiguous 1..count; a re-run reproduces the order bit-for-bit
    # (the retry-stability a training data loader depends on).
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    a = registry.QUERIES["p10_corpus_shuffle"](spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in a} == docs
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    b = registry.QUERIES["p10_corpus_shuffle"](spark, SF_SMALL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fuzzy_decontaminate_split_discipline(spark):
    # c26 laws: output is EXACTLY the eval split (bucket >= 90), never a
    # train doc; a contamination count implies an over-threshold overlap
    # and vice versa (threshold consistency with max_jaccard).
    from iceberg_playground_spark.queries.widen import _DECON_J
    from iceberg_playground_spark.queries._util import hash_bucket

    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_CHECK}/documents.parquet")
    ev = {
        r["doc_id"]
        for r in d.select(
            "doc_id", hash_bucket(F.col("doc_id")).alias("b")
        ).filter("b >= 90").collect()
    }
    rows = registry.QUERIES["c26_fuzzy_decontaminate"](
        spark, SF_CHECK
    ).collect()
    assert {r["doc_id"] for r in rows} == ev
    for r in rows:
        if r["n_contaminating"] > 0:
            assert r["max_jaccard"] >= _DECON_J
        else:
            assert r["max_jaccard"] < _DECON_J


def test_grading_prefix_composition():
    # The driver grades EXACTLY the first ~50 registered queries, so
    # registration order decides what gets graded. Since round 12 the
    # rotation is DERIVED from the committed CORRECTNESS records
    # (stalest latest-grade first); pin that the reorder actually
    # happened and that the window retires the stalest grades: the
    # never-graded GRADING_LEAD ops first, then the rotation, with this
    # round's additions dead last.
    names = list(registry.QUERIES)
    latest = registry.latest_grades()
    lead = [n for n in registry.GRADING_LEAD if n not in latest]
    assert names[: len(lead)] == lead
    assert names == lead + registry.GRADING_ROTATION + registry.GRADING_NEW_TAIL
    # A 50-slot sweep covers the lead plus the stalest rotation
    # entries; nothing inside the window may be fresher than anything
    # outside it.
    window = names[:50]
    rounds_in = [latest[n][0] for n in window if n in latest]
    rounds_out = [latest[n][0] for n in names[50:] if n in latest]
    if rounds_in and rounds_out:
        assert max(rounds_in) <= min(rounds_out)
    assert len(names) >= 128


def test_streaming_datasource_resumes_from_checkpoint(spark, tmp_path):
    # b84's exactly-once claim, pinned: offsets are committed to the
    # checkpoint, so a SECOND run of the same bounded stream from the
    # same checkpoint finds latestOffset already consumed and emits
    # zero new rows — the committed-Kafka-offset contract. (Sink must
    # be fault-tolerant: the memory sink refuses checkpoint recovery.)
    from iceberg_playground_spark.pysource import build_assetgen_source

    try:
        spark.dataSource.register(build_assetgen_source())
    except Exception:
        pass
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("assetgen")
            .option("rows", 1000)
            .option("partitions", 4)
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return spark.read.parquet(out).count()

    assert drain() == 1000
    # same checkpoint: offsets already committed, the resumed stream
    # delivers NOTHING new — total stays exactly 1000, no re-delivery
    assert drain() == 1000
