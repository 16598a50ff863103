"""Round-5b operator semantics: WAP branch grading, expiration
grading, files/metadata-count relations, BPE pair stats, canonical
selection, cluster histogram, stream-stream outer join. Cross-engine
value equality lives in test_correctness; these pin the invariants the
oracles cannot see (watermark-conditioned outer emission, canonical
choice optimality, histogram mass conservation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402


def test_outer_join_unmatched_is_watermark_conditioned(spark):
    # b95's contract: every matched pair of the inner join (b65)
    # appears, plus null rows ONLY for purchases older than the final
    # watermark — no purchase newer than min(max_p, max_c) - 30min may
    # emit unmatched (it is still in state when the drained run ends).
    out = {
        r["user_id"]: r
        for r in registry.QUERIES["b95_stream_outer_join"](
            spark, SF_CHECK
        ).collect()
    }
    inner = {
        r["user_id"]: r["n_pairs"]
        for r in registry.QUERIES["b65_stream_stream_join"](
            spark, SF_CHECK
        ).collect()
    }
    for uid, n_pairs in inner.items():
        assert out[uid]["n_matched"] == n_pairs
    assert sum(r["n_unmatched"] for r in out.values()) > 0  # outer adds rows


def test_canonical_selection_picks_best_member(spark):
    # the canonical doc must be a real cluster member with the
    # cluster's max n_chars (tie: min doc_id) — recompute membership
    # independently from fingerprints
    from iceberg_playground_spark.queries.llm import _shingles, _tokens
    from iceberg_playground_spark.session import load

    sel = registry.QUERIES["c33_canonical_selection"](spark, SF_CHECK)
    d = load(spark, SF_CHECK, "documents").select(
        "doc_id",
        "n_chars",
        F.array_min(F.transform(_shingles(_tokens()), F.md5)).alias("fp"),
    )
    members = {}
    for r in d.filter(F.col("fp").isNotNull()).collect():
        members.setdefault(r["fp"], []).append((r["n_chars"], r["doc_id"]))
    for r in sel.collect():
        club = members[r["fingerprint"]]
        assert len(club) == r["cluster_size"] >= 2
        best = max(club, key=lambda x: (x[0], -x[1]))
        assert (r["canonical_chars"], r["canonical_doc"]) == best


def test_cluster_histogram_mass_conservation(spark):
    # per method: sum(cluster_size * n_clusters) == docs carrying that
    # key; 'exact' covers every doc, 'fingerprint' only docs with >= 3
    # tokens
    from iceberg_playground_spark.session import load

    hist = registry.QUERIES["p13_cluster_histogram"](
        spark, SF_CHECK
    ).collect()
    docs = load(spark, SF_CHECK, "documents")
    n_all = docs.count()
    n_fp = docs.filter(F.size(F.split("text", " ")) >= 3).count()
    mass = {}
    for r in hist:
        mass[r["method"]] = mass.get(r["method"], 0) + r["n_docs"]
    assert mass["exact"] == n_all
    assert mass["fingerprint"] == n_fp
    # this corpus is near-dup-dominated: fingerprint must show real
    # clusters even where exact dedup sees none
    fp_multi = [
        r for r in hist
        if r["method"] == "fingerprint" and r["cluster_size"] >= 2
    ]
    assert fp_multi


def test_bpe_pair_counts_occurrences_not_presence(spark):
    # a pair repeated inside one doc must count once per occurrence
    rows = registry.QUERIES["c32_bpe_pair_stats"](spark, SF_CHECK)
    top = rows.filter("pair_rank = 1").collect()
    assert top and all(r["pair_count"] >= 2 for r in top)
    # exactly 5 ranks per language, ranks dense 1..5
    per_lang = {}
    for r in rows.collect():
        per_lang.setdefault(r["lang"], []).append(r["pair_rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_lang.values())


def test_metadata_count_grading_flags(spark):
    rows = {
        r["phase"]: r
        for r in registry.QUERIES["b93_metadata_count"](
            spark, SF_CHECK
        ).collect()
    }
    assert rows["append-only"]["from_metadata"] is True
    assert rows["after-delete"]["from_metadata"] is False
    assert rows["append-only"]["n_rows"] > rows["after-delete"]["n_rows"]


def test_ingest_dedup_report_finds_real_collisions(spark):
    # the corpus is near-dup-dominated: a random 20% ingest batch must
    # collide with the 80% base, and novel + dup must partition n_new
    rows = registry.QUERIES["p14_ingest_dedup_report"](
        spark, SF_CHECK
    ).collect()
    assert sum(r["n_dup_vs_base"] for r in rows) > 0
    for r in rows:
        assert r["n_dup_vs_base"] + r["n_novel"] == r["n_new"]
        assert r["new_tokens"] > 0


def test_rle_udtf_runs_are_maximal_and_repeated(spark):
    # every emitted run is >=2 long, and no two runs of the same token
    # in one doc are adjacent (maximality — a split run would mean the
    # UDTF's scan logic broke)
    rows = registry.QUERIES["b101_rle_udtf"](spark, SF_CHECK).collect()
    assert rows
    by_doc = {}
    for r in rows:
        assert r["run_len"] >= 2
        by_doc.setdefault((r["doc_id"], r["token"]), []).append(
            (r["start_pos"], r["run_len"])
        )
    for runs in by_doc.values():
        runs.sort()
        for (s1, l1), (s2, _) in zip(runs, runs[1:]):
            assert s1 + l1 < s2  # a gap separates same-token runs
