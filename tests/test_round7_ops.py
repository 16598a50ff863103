"""Round-7 operator semantics: the incremental LSH dedup loop
(p17 report → c39 index maintenance → p18 streaming filter) and the
PQ shortlist→re-rank composition. Oracle parity is covered by
test_correctness's registry-wide parametrization; these pin the
invariants an oracle diff alone would not localize."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402


# --- p17 incremental near-dup report --------------------------------------


def test_p17_report_is_consistent_and_covers_delta(spark):
    rows = registry.QUERIES["p17_incremental_lsh_dedup"](
        spark, SF_CHECK
    ).collect()
    assert rows
    total_new = 0
    for r in rows:
        # the two classes partition the batch
        assert r["n_near_dup_vs_base"] + r["n_novel"] == r["n_new"]
        assert r["n_near_dup_vs_base"] >= 0 and r["n_novel"] >= 0
        total_new += r["n_new"]
    # the report covers exactly the 20%-bucket ingestion batch
    from iceberg_playground_spark.queries._util import hash_bucket, load

    n_delta = (
        load(spark, SF_CHECK, "documents")
        .filter(hash_bucket(F.col("doc_id")) >= 80)
        .count()
    )
    assert total_new == n_delta


def test_p17_self_duplicate_batch_is_all_near_dup(spark, tmp_path):
    # a batch that re-ingests EXACT copies of base docs must come back
    # 100% near-dup: identical text → identical signatures → every
    # band collides (the data-independent guarantee of the pipeline)
    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.round7 import _band_sigs

    d = (
        load(spark, SF_CHECK, "documents")
        .select("doc_id", "text")
        .limit(50)
    )
    base_idx = _band_sigs(d, "doc_id").select("band", "sig").distinct()
    probe = _band_sigs(d, "doc_id")
    misses = probe.join(base_idx, ["band", "sig"], "left_anti")
    assert misses.count() == 0


# --- c39 signature-index maintenance --------------------------------------


def test_c39_merge_masks_without_rewriting_untouched_files(spark):
    from iceberg_playground_spark.queries.lakehouse import _BUILT

    registry.QUERIES["c39_signature_index_merge"](spark, SF_CHECK)
    key = next(
        k for k in _BUILT if k[1] == SF_CHECK and k[2] == "c39"
    )
    idx = _BUILT[key]
    v1 = idx.snapshot(1)
    v2 = idx.snapshot(idx.current_version())
    # every v1 data dir survives into HEAD (masked, never rewritten)
    v1_paths = {f["path"] for f in v1["data_files"]}
    v2_paths = {f["path"] for f in v2["data_files"]}
    assert v1_paths <= v2_paths
    # the merge added exactly one equality-delete file keyed on doc_id
    assert len(v2["delete_files"]) == len(v1["delete_files"]) + 1


def test_c39_edited_docs_changed_new_docs_added(spark):
    # HEAD index vs v1 index: every 50th base doc re-signed (rows
    # present at both versions, at least one sig differs), batch docs
    # newly present
    from iceberg_playground_spark.queries.lakehouse import _BUILT

    registry.QUERIES["c39_signature_index_merge"](spark, SF_CHECK)
    key = next(
        k for k in _BUILT if k[1] == SF_CHECK and k[2] == "c39"
    )
    idx = _BUILT[key]
    old = {
        (r["doc_id"], r["band"]): r["sig"]
        for r in idx.read(version=1).collect()
    }
    new = {
        (r["doc_id"], r["band"]): r["sig"]
        for r in idx.read().collect()
    }
    assert set(new) > set(old)  # strictly grew (batch docs added)
    edited = {k for k in old if k[0] % 50 == 0}
    assert edited  # fixture guarantees some edited docs
    assert any(new[k] != old[k] for k in edited)
    untouched = {k for k in old if k[0] % 50 != 0}
    assert all(new[k] == old[k] for k in untouched)


# --- p18 streaming novelty filter -----------------------------------------


def test_p18_stream_matches_batch_novelty(spark):
    # stream/batch parity: the docs the stream lands == p17's novel
    # counts per language (same base index, same banding)
    stream_rows = {
        r["lang"]: r["n_novel"]
        for r in registry.QUERIES["p18_streaming_novelty_filter"](
            spark, SF_CHECK
        ).collect()
    }
    batch_rows = {
        r["lang"]: r["n_novel"]
        for r in registry.QUERIES["p17_incremental_lsh_dedup"](
            spark, SF_CHECK
        ).collect()
    }
    assert stream_rows == {
        lang: n for lang, n in batch_rows.items() if n > 0
    }


# --- c38 PQ shortlist → exact re-rank -------------------------------------


def test_c38_self_hit_and_shortlist_contract(spark):
    rows = registry.QUERIES["c38_pq_rerank"](spark, SF_CHECK).collect()
    assert len(rows) == 10
    # the probe's own vector encodes to its own codes → ADC est 0 for
    # its own subquantizers... it must survive the shortlist and top
    # the exact re-rank at cosine 1.0
    assert rows[0]["vec_id"] == 0
    assert abs(rows[0]["cosine"] - 1.0) < 1e-9
    # descending cosine, vec_id tie-break
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)


# --- c40 IVF + ADC + exact re-rank ----------------------------------------


def test_c40_self_hit_and_cell_membership(spark):
    rows = registry.QUERIES["c40_ivf_adc_rerank"](spark, SF_CHECK).collect()
    assert 0 < len(rows) <= 10
    # the probe's cell is probed by construction → self-hit at rank 1
    assert rows[0]["vec_id"] == 0
    assert abs(rows[0]["cosine"] - 1.0) < 1e-9
    # every result's cell is one of the coarse cells (0..15)
    assert all(0 <= r["cell"] < 16 for r in rows)
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)


# --- p19 contamination-safe split -----------------------------------------


def test_p19_counts_partition_and_eval_leaks_nothing(spark):
    rows = registry.QUERIES["p19_decontaminated_split"](
        spark, SF_CHECK
    ).collect()
    assert rows
    for r in rows:
        assert r["n_leaky_dropped"] + r["n_train_clean"] == r["n_train"]
        assert r["n_leaky_dropped"] >= 0
    # split fractions: the 90/10 hash rule over the whole corpus
    from iceberg_playground_spark.queries._util import load

    total = load(spark, SF_CHECK, "documents").count()
    assert sum(r["n_train"] + r["n_eval"] for r in rows) == total


# --- p20 corpus build v2 ---------------------------------------------------


def test_p20_accounting_is_exact(spark):
    rows = registry.QUERIES["p20_corpus_build_v2"](
        spark, SF_CHECK
    ).collect()
    assert rows
    for r in rows:
        assert (
            r["n_dedup_dropped"] + r["n_decon_dropped"] + r["n_final"]
            == r["n_docs_in"]
        )
        if r["split"] == "eval":
            # decontamination only ever drops TRAIN docs
            assert r["n_decon_dropped"] == 0
    from iceberg_playground_spark.queries._util import load

    total = load(spark, SF_CHECK, "documents").count()
    assert sum(r["n_docs_in"] for r in rows) == total
    # the pipeline actually dropped something at this sf (the corpus
    # carries near-dups by construction)
    assert sum(r["n_dedup_dropped"] for r in rows) > 0


# --- c41 / c42 mergeable sketches -----------------------------------------


def test_c41_theta_estimates_track_exact(spark):
    rows = registry.QUERIES["c41_theta_overlap"](spark, SF_CHECK).collect()
    assert rows
    saw_overlap = False
    for r in rows:
        # the slices overlap by construction (buckets [40,60))
        saw_overlap |= r["exact_overlap"] > 0
        for est, exact in (
            (r["est_union"], r["exact_union"]),
            (r["est_overlap"], r["exact_overlap"]),
            (r["est_a_only"], r["exact_a_only"]),
        ):
            assert abs(est - exact) <= max(0.05 * exact, 2), r
    assert saw_overlap


def test_c42_kll_ranks_track_exact_and_merge(spark):
    rows = {
        r["lang"]: r
        for r in registry.QUERIES["c42_kll_quantile_rollup"](
            spark, SF_CHECK
        ).collect()
    }
    assert "__corpus__" in rows  # the merged (not re-scanned) rollup
    total = sum(r["n_docs"] for k, r in rows.items() if k != "__corpus__")
    assert rows["__corpus__"]["n_docs"] == total
    for r in rows.values():
        for est, exact in (
            (r["est_p50"], r["exact_p50"]),
            (r["est_p90"], r["exact_p90"]),
            (r["est_p99"], r["exact_p99"]),
        ):
            # KLL rank error ~1.6% at default k; allow 5% of the value
            assert abs(est - exact) <= max(0.05 * exact, 2.0), r


# --- knn_join LSH path: recall on near-identical probes -------------------


def test_knn_lsh_path_recalls_perturbed_copies(spark):
    # probes = base vectors with one coordinate nudged by 1% — nearly
    # collinear, so sign-LSH keeps them in their source's buckets with
    # high probability and the approximate path must place the source
    # at rank 1 for the vast majority. Deterministic: the perturbation
    # is arithmetic on the vector itself, no randomness.
    from pyspark.sql import functions as F

    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.llm import knn_join

    e = load(spark, SF_CHECK, "embeddings").limit(200)
    base = e.select(
        F.col("vec_id").alias("base_id"), F.col("embedding").alias("be")
    )
    probes = e.select(
        F.col("vec_id").alias("probe_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * F.lit(1.01)).otherwise(x),
        ).alias("pe"),
    )
    out = knn_join(base, probes, k=1, brute_max=0, n_probes=200)
    hits = out.filter("probe_id = base_id").count()
    assert hits >= 180  # >=90% recall on near-identical probes


# --- b133 custom Python sink ----------------------------------------------


def test_b133_sink_commit_protocol(spark, tmp_path):
    # two-phase contract: committed files are exactly the manifest's,
    # the temp dir is gone after commit, and empty partitions (or an
    # empty frame) publish nothing
    import json
    import os

    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.round7 import _register_jsondirsink
    from tests.conftest import SF_CHECK

    _register_jsondirsink(spark)
    out = str(tmp_path / "sink")
    r = load(spark, SF_CHECK, "region").select("r_regionkey", "r_name")
    r.write.format("jsondirsink").option("path", out).mode("append").save()
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    listed = {f["file"] for f in man["files"]}
    on_disk = {
        f for f in os.listdir(out) if f != "_MANIFEST.json"
    }
    assert listed == on_disk  # no orphans, no missing
    assert sum(f["rows"] for f in man["files"]) == 5
    assert "_tmp" not in on_disk

    out2 = str(tmp_path / "empty")
    r.filter("r_regionkey < 0").write.format("jsondirsink").option(
        "path", out2
    ).mode("append").save()
    man2 = json.load(open(os.path.join(out2, "_MANIFEST.json")))
    assert man2["files"] == []
    assert os.listdir(out2) == ["_MANIFEST.json"]


def test_b133_sink_abort_publishes_nothing(spark, tmp_path):
    # the two-phase protocol's failure half: a write that dies mid-job
    # must publish NOTHING — no manifest, no VISIBLE part files. (The
    # _tmp dir itself may survive: a straggler task can still be
    # writing when abort's cleanup runs — its output is unlisted and
    # therefore invisible to every reader, the same orphan-until-swept
    # situation tables.py's orphan grace covers.)
    import os

    import pytest
    from pyspark.sql import functions as F

    from iceberg_playground_spark.queries.round7 import _register_jsondirsink

    _register_jsondirsink(spark)
    out = str(tmp_path / "abort")
    df = spark.range(100).select(
        F.when(
            F.col("id") == 97, F.expr("raise_error('boom')")
        )
        .otherwise(F.col("id").cast("string"))
        .alias("v")
    )
    with pytest.raises(Exception):
        df.write.format("jsondirsink").option("path", out).mode(
            "append"
        ).save()
    leftover = os.listdir(out) if os.path.exists(out) else []
    assert "_MANIFEST.json" not in leftover
    assert not [f for f in leftover if f.endswith(".jsonl")]


def test_alive_routes_path_tuples_to_filesystem_probe(spark, tmp_path):
    # p18 caches (src_dir, idx_dir) — a tuple of two filesystem path
    # strings. The all-strings branch used to treat any str tuple as
    # saved-table NAMES and call spark.table("/tmp/..."), which always
    # throws, so the cache never hit and p18 rebuilt (and leaked a tmp
    # dir) on every call. Path-looking strings must probe the
    # filesystem instead.
    from iceberg_playground_spark.queries.lakehouse import _alive

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    assert _alive(spark, (str(a), str(b)))
    assert not _alive(spark, (str(a), str(tmp_path / "gone")))


def test_p18_demo_warehouse_is_cached_across_calls(spark):
    # The artifact built on the first call must be REUSED on the
    # second — same (src, idx) paths back from the cache, no silent
    # rebuild into a fresh tmp dir.
    from iceberg_playground_spark.queries import lakehouse as lh
    from iceberg_playground_spark import registry

    registry.load_all()
    registry.QUERIES["p18_streaming_novelty_filter"](spark, SF_CHECK).count()
    key_art = {
        k: v for k, v in lh._BUILT.items() if k[2] == "p18"
    }
    assert key_art, "p18 never populated the build cache"
    registry.QUERIES["p18_streaming_novelty_filter"](spark, SF_CHECK).count()
    after = {k: v for k, v in lh._BUILT.items() if k[2] == "p18"}
    assert after == key_art, "p18 rebuilt its demo warehouse on reuse"


def test_p18_novelty_is_batch_boundary_invariant(spark):
    # p18's determinism claim: novelty is judged against the STATIC
    # base index only, so micro-batch boundaries cannot change the
    # answer — draining 4 one-file epochs and 1 four-file epoch must
    # produce identical per-lang counts. (This is also the throughput
    # story: the ~1.2 s/epoch fixed cost — plan compile + commit +
    # checkpoint — amortizes with batch size while the result stays
    # bit-identical; sweep at sf0.1: 4 epochs 5.6 s, 2 epochs 3.0 s,
    # 1 epoch 2.2 s, same rows. BASELINE.md r8 notes.)
    from iceberg_playground_spark.queries.round7 import (
        p18_streaming_novelty_filter as p18,
    )

    fine = sorted(
        (r["lang"], r["n_novel"])
        for r in p18(spark, SF_CHECK, files_per_trigger=1).collect()
    )
    coarse = sorted(
        (r["lang"], r["n_novel"])
        for r in p18(spark, SF_CHECK, files_per_trigger=4).collect()
    )
    assert fine == coarse


# --- p25 incremental card refresh ------------------------------------------


def test_p25_incremental_card_equals_full_rebuild(spark):
    # p25's contract: maintaining the card from batch deltas produces
    # EXACTLY p16's full-recompute card — metric for metric, duplicate
    # tails included (the b126 maintenance claim at card scope)
    card = sorted(
        map(
            tuple,
            registry.QUERIES["p16_dataset_card"](
                spark, SF_CHECK
            ).collect(),
        )
    )
    inc = sorted(
        map(
            tuple,
            registry.QUERIES["p25_incremental_card_refresh"](
                spark, SF_CHECK
            ).collect(),
        )
    )
    assert inc == card
