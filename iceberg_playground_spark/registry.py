"""Query registry: the driver-facing (queries, oracle_sql) catalog.

Every operator in SURVEY.md §2 registers here via the ``@query``
decorator. ``__spark_entry__.py`` re-exports ``QUERIES`` / ``ORACLES``.

Contract (driver): each query fn is ``(spark, sf_dir) -> DataFrame``;
the oracle is ANSI SQL DuckDB runs over the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings). Column names must match — alias everything on
both sides. Queries without an oracle get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named operator query, optionally with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Grading-order contract, round 9. The driver's correctness sweep
# grades the FIRST ~50 registered entries and stops, so registration
# order decides what gets graded. Round 8's sweep graded exactly 50
# slots ending WITH b140_sql_scripting (CORRECTNESS_r08.json: all
# green) — so the never-driver-graded set is c46_classifier_eval
# onward (10 entries; ADVICE r8 corrected round 8's off-by-one note
# here). Those LEAD round 9's window (VERDICT r8 item 1), then this
# round's new registrations (never graded either), then the stale-
# grade rotation: the r3 block, then the r4 block (VERDICT r8 item 3
# — no grade should go more than ~4 rounds stale). Entries past slot
# ~50 wait for round 10's rotation.
_R8_UNGRADED = [
    "c46_classifier_eval",
    "b141_tpch_q3",
    "b142_tpch_q6",
    "b143_tpch_q13",
    "c47_matryoshka_recall",
    "p27_dedup_audit_sample",
    "c48_semdedup",
    "c49_dedup_cluster_histogram",
    "p28_sft_pairs",
    "c50_zipf_audit",
]
# Round-9 additions: never graded, so they ride directly behind the
# round-8 stragglers; appended here as they land.
_R9_NEW: list[str] = [
    "b144_concurrent_commit",
    "b145_dict_layout_audit",
    "c51_tokenizer_apply",
    "b146_tpch_q15",
    "b147_tpch_q17",
    "b148_tpch_q22",
    "c52_bloom_decontaminate",
    "b149_tpch_q21",
    "b150_tpch_q9",
    "b151_tpch_q12",
    "b152_tpch_q16",
    "b153_tpch_q2",
    "b154_tpch_q11",
    "b155_tpch_q20",
    "c53_dsir_resample",
    "c54_kmeans_lloyd",
    "c55_vocab_growth",
    "c56_length_bucket_batches",
    "c57_hashed_classifier_apply",
    "p29_gopher_quality_rules",
    "c58_countmin_heavy_hitters",
    "p30_token_budget_fill",
    "b156_skyline",
    "c59_source_kl_divergence",
    "c60_good_turing_audit",
    "c61_token_entropy",
    "p31_ngram_leakage_audit",
    "c62_containment_detect",
]
# Stale-grade rotation, oldest first: the r3 block (last graded round
# 3), then the r4 block. The driver's budget cuts wherever it cuts;
# the remainder leads round 10.
_ROTATION_R9 = [
    # --- last graded round 3 ---
    "p01_repetition_filter", "p02_pii_scrub", "p03_chunk_dedup",
    "p04_curriculum_bins", "p05_domain_rebalance", "p06_token_histogram",
    "p07_boilerplate_strip", "p08_frame_sample", "b73_salted_join",
    "b75_grouping_sets", "b76_pivot",
    # --- last graded round 4 ---
    "b02_snapshot_scan", "b06_parquet_sink", "b60_bucketed_join",
    "b61_data_skipping", "c01_exact_dedup", "c03_cosine_topk",
    "c04_knn_join", "c05_text_analysis", "c06_multimodal_join",
    "c15_multimodal_decode", "c07_quality_filter", "c08_simhash",
    "c09_ngram_jaccard", "c10_embedding_near_dup", "c11_ann_ivf",
    "c12_lang_id", "c13_token_count", "c16_training_pipeline",
    "c14_fingerprint", "c17_train_split", "c18_stratified_sample",
    "c19_sequence_packing", "c20_corpus_build", "c21_embedding_quantize",
    "c22_decontaminate", "c23_lm_quality_score", "c25_tfidf_top_terms",
    "b62_upsert", "b67_partition_pruning", "b71_orc_roundtrip",
    "b72_incremental_scan", "b74_schema_evolution", "b68_tumbling_window",
    "b69_sliding_window", "b70_session_window", "b50_watermark_late_drop",
    "b51_streaming_dedup", "b52_stateful_per_key", "b53_stream_static_join",
    "b54_stream_lakehouse_sink", "b63_stream_upsert_sink",
    "b65_stream_stream_join", "b05_kafka_batch_source",
    "c26_fuzzy_decontaminate", "p09_chunk_windows", "p10_corpus_shuffle",
    "b77_unpivot", "b78_correlated_subquery",
]


def load_all() -> None:
    """Import every query module, then impose the round-9 grading order.

    ORDER IS A CONTRACT, not style (see the block comments above):
    after all modules register, QUERIES/ORACLES are rebuilt so the
    prefix is _R8_UNGRADED (the 10 entries round 8's 50-slot sweep
    never reached — it graded exactly 50 ending with b140) +
    _R9_NEW (this round's additions) + _ROTATION_R9 (stale grades,
    oldest first: the r3 block then the r4 block), then every
    remaining green query in module order. Import order no longer
    doubles as grading order — the explicit lists do. A name listed
    but never registered fails loudly here (typo guard).

    Round-10 note: the never-graded prefix is now 36 entries
    (_R8_UNGRADED 10 + _R9_NEW 26), leaving ~14 slots of a 50-slot
    sweep for the rotation — so if round 9's sweep grades exactly 50,
    the cut lands ~14 entries into _ROTATION_R9 (after
    p08_frame_sample, before b73_salted_join). READ
    CORRECTNESS_r09.json for the actual cut, do not guess: whatever
    it did not reach (the rotation remainder — there should be no
    ungraded b/c/p-new entries left if all 36 graded) must LEAD
    round 10's window, exactly as _R8_UNGRADED leads this one.
    """
    from iceberg_playground_spark.queries import (  # noqa: F401
        streaming,
        lakehouse,
        llm,
        kafka,
        widen,
        meta,
        udfs,
        pipeline,
        scale,
        extra,
        relational,
        round5,
        round5b,
        tpch,
        modern,
        round6,
        round7,
        round8,
        round9,
        round9b,
        round9c,
        round9d,
    )

    prefix = _R8_UNGRADED + _R9_NEW + _ROTATION_R9
    missing = [n for n in prefix if n not in QUERIES]
    if missing:
        raise RuntimeError(f"grading-order names not registered: {missing}")
    order = prefix + [n for n in QUERIES if n not in set(prefix)]
    for d in (QUERIES, ORACLES):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)
