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


# Grading-order contract, round 8. The driver's correctness sweep
# grades the FIRST ~50 registered entries and stops, so registration
# order decides what gets graded. Round 7's sweep graded 50 slots
# (_R6_TAIL 22 + _R7_NEW 2 + the rotation through b31 —
# CORRECTNESS_r07.json: all green), leaving the 11 late-round-7
# registrations never driver-graded. Those LEAD the round-8 window
# (VERDICT r7, "Next round" item 1), then the rotation remainder
# (b32-b66, ~20 entries, VERDICT r7 item 2), then round-8 additions
# fill the rest of the budget.
_R7_UNGRADED = [
    # hash-oracle entries first — these get the strong check.
    "c39_signature_index_merge",
    "c40_ivf_adc_rerank",
    "p18_streaming_novelty_filter",
    "p19_decontaminated_split",
    "p20_corpus_build_v2",
    "b132_statestore_read",
    "b133_python_datasource_writer",
    "b134_python_streaming_sink",
    "b135_retention_delete",
    # rows-only sketch pair (engine-native sketch state; error
    # contracts pinned in tests/test_round7_ops.py).
    "c41_theta_overlap",
    "c42_kll_quantile_rollup",
]
# Rotation remainder: b32-b66-band entries still carrying r2-era
# grades — byte-stable code, but never re-graded under the current
# session confs (ANSI-mode Spark 4, nanosAsLong).
_ROTATION_REMAINDER = [
    "b32_window_analytic", "b33_window_running", "b34_window_range_frame",
    "b35_global_sort_limit", "b36_limit_offset", "b37_topk_per_group",
    "b38_union", "b39_intersect_except", "b40_distinct",
    "b41_string_funcs", "b42_datetime_funcs", "b43_math_funcs",
    "b44_array_funcs", "b45_explode", "b46_map_funcs", "b47_json_funcs",
    "b48_hash_funcs", "b49_idgen", "b55_scalar_udf",
    "b56_pandas_udf_scalar", "b57_grouped_map", "b58_grouped_agg_udf",
    "b59_map_in_pandas", "b64_exact_percentile", "b66_raw_sql",
]
# Round-8 additions register behind the rotation so the never-graded
# block is never displaced; appended here as they land.
_R8_NEW: list[str] = [
    "c43_substring_dedup",
    "b136_binaryfile_scan",
    "p21_perplexity_buckets",
    "p22_epoch_upsample",
    "p23_quality_regression",
    "b137_listagg",
    "p24_substring_strip",
    "c44_cross_source_dup_matrix",
    "b138_union_by_name",
    "b139_transpose",
    "p25_incremental_card_refresh",
    "p26_span_corruption",
    "c45_ann_recall",
    "b140_sql_scripting",
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


def load_all() -> None:
    """Import every query module, then impose the round-8 grading order.

    ORDER IS A CONTRACT, not style (see the block comments above):
    after all modules register, QUERIES/ORACLES are rebuilt so the
    prefix is _R7_UNGRADED (the 11 late-round-7 registrations round
    7's 50-slot sweep never reached) + _ROTATION_REMAINDER (the last
    r2-era grades, re-graded on current session confs) + _R8_NEW
    (this round's additions), then every remaining green query in
    module order. Import order no longer doubles as grading order —
    the explicit lists do. A name listed but never registered fails
    loudly here (typo guard).

    Round-9 note: the 11 + 25 + len(_R8_NEW) prefix EXCEEDS a hard
    50-slot budget (36 + 24 = 60): under a 50-slot sweep the last ~10
    _R8_NEW entries (around b140_sql_scripting onward — b140, c46,
    b141-b143, c47, p27, c48, c49, p28, c50) fall past the cut. Whatever the
    round-8 sweep did not reach must LEAD round 9's window, exactly
    as _R7_UNGRADED leads this one.
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
    )

    prefix = _R7_UNGRADED + _ROTATION_REMAINDER + _R8_NEW
    missing = [n for n in prefix if n not in QUERIES]
    if missing:
        raise RuntimeError(f"grading-order names not registered: {missing}")
    order = prefix + [n for n in QUERIES if n not in set(prefix)]
    for d in (QUERIES, ORACLES):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)
