"""Plan-shape regression tests — the 100 TB scale contract.

Correctness tests prove the rows are right; these prove the PLAN is
the one that survives a 1000-executor cluster: filters reach the scan,
small dims broadcast, top-k never globally sorts, ranking windows push
group limits below the shuffle. A regression here is a performance bug
even while every oracle still matches.
"""

from __future__ import annotations

import pytest

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402


def _plan(spark, name: str) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df = registry.QUERIES[name](spark, SF_CHECK)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "b09_filter_predicates")
    assert "PushedFilters: [" in plan
    # at least the IN and range predicates must push
    pushed = plan.split("PushedFilters: [", 1)[1].splitlines()[0]
    assert "In(o_orderstatus" in pushed
    assert "GreaterThanOrEqual(o_totalprice" in pushed


def test_projection_prunes_scan_columns(spark):
    plan = _plan(spark, "b08_projection")
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_extendedprice" in read and "l_discount" in read
    # untouched wide columns must NOT be read
    assert "l_shipdate" not in read and "l_returnflag" not in read


def test_broadcast_join_broadcasts_dim(spark):
    assert "BroadcastExchange" in _plan(spark, "b14_broadcast_join")


def test_star_join_broadcasts_small_dims(spark):
    assert _plan(spark, "b20_star_join").count("BroadcastExchange") >= 2


def test_global_sort_limit_is_topk(spark):
    plan = _plan(spark, "b35_global_sort_limit")
    assert "TakeOrderedAndProject" in plan  # never a full global sort


def test_ranking_window_pushes_group_limit(spark):
    assert "WindowGroupLimit" in _plan(spark, "b31_window_ranking")


def test_exact_dedup_pushes_group_limit(spark):
    assert "WindowGroupLimit" in _plan(spark, "c01_exact_dedup")


def test_cosine_topk_broadcasts_query_and_topks(spark):
    plan = _plan(spark, "c03_cosine_topk")
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_count_distinct_has_no_expand(spark):
    # dedup-first formulation: no 3x Expand of the fact table
    assert "Expand" not in _plan(spark, "b22_count_distinct")


@pytest.mark.parametrize(
    "name",
    ["b21_pricing_summary", "b13_inner_join", "b20_star_join"],
)
def test_no_cartesian_on_facts(spark, name):
    assert "CartesianProduct" not in _plan(spark, name)


def test_minhash_reads_corpus_once(spark):
    # canon-per-bucket must be one aggregation chain, not groupBy +
    # join-back: the latter re-evaluates the shingle+minhash lineage
    # from a second scan (2x the dominant cost at 100 TB)
    assert _plan(spark, "c02_minhash_lsh_dedup").count("Scan parquet") == 1


def test_minhash_bucket_canon_partially_aggregates(spark):
    # the (band, sig) canon must be a groupBy (map-side partial_min
    # collapses a hot bucket before the exchange), never a window
    # (which ships every row of the hot bucket to one task)
    plan = _plan(spark, "c02_minhash_lsh_dedup")
    assert "partial_min" in plan
    assert "Window" not in plan


def test_embedding_near_dup_join_is_salted(spark):
    # the label self-join must carry the b73 salt in its equi-keys so
    # a hot label's pair work spreads across reducers at scale; the
    # build side must be the exploded (replicated) one
    plan = _plan(spark, "c10_embedding_near_dup")
    assert "a_salt" in plan and "b_salt" in plan
    assert plan.lower().count("explode") >= 1


@pytest.mark.parametrize(
    "name", ["c17_train_split", "c18_stratified_sample"]
)
def test_split_and_sample_are_shuffle_free(spark, name):
    # pure narrow maps: membership is per-row hash arithmetic; any
    # Exchange here means a 100 TB corpus gets reshuffled to be stamped
    assert "Exchange" not in _plan(spark, name)


def test_bucketed_join_needs_no_join_exchange(spark):
    # both sides bucketed on the key: the only Exchange allowed is the
    # final |segments|-row aggregation — the join itself reads bucket i
    # against bucket i straight off the files
    plan = _plan(spark, "b60_bucketed_join")
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount" in plan
    assert plan.count("Exchange") == 1


@pytest.mark.parametrize(
    "name", ["c23_lm_quality_score", "c25_tfidf_top_terms"]
)
def test_trained_models_broadcast(spark, name):
    # the vocab-sized model side must broadcast: a sort-merge join here
    # would shuffle the full token stream against a tiny relation
    assert "BroadcastExchange" in _plan(spark, name)


def test_repetition_filter_is_shuffle_free(spark):
    # per-row HOF arithmetic over one scan: an Exchange here means the
    # corpus is being reshuffled just to score each row against itself
    plan = _plan(spark, "p01_repetition_filter")
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_chunk_dedup_reads_corpus_once_no_join(spark):
    # window formulation: occurrence counts must come from ONE pass over
    # the exploded chunks, never a groupBy + join-back (second scan)
    plan = _plan(spark, "p03_chunk_dedup")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan


def test_curriculum_bins_broadcast_boundaries_no_window(spark):
    # quartile boundaries broadcast back as a tiny relation; an ntile
    # Window partitioned by lang would put a whole language in one task
    plan = _plan(spark, "p04_curriculum_bins")
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


def test_domain_rebalance_never_shuffles_corpus(spark):
    # rates join must broadcast (corpus side stays map-side) and the
    # counts aggregate must be evaluated once (lazy checkpoint), so at
    # most 2 corpus scans: one for counts, one for the rebalance pass
    plan = _plan(spark, "p05_domain_rebalance")
    assert plan.count("BroadcastExchange") >= 1
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") <= 2


@pytest.mark.parametrize(
    "name",
    [
        "c25_tfidf_top_terms",  # r2 audit: eager distinct().count() fixed
        "c05_text_analysis",
        "c09_ngram_jaccard",
        "c23_lm_quality_score",
        "p05_domain_rebalance",
        "b21_pricing_summary",
    ],
)
def test_query_construction_runs_no_data_job(spark, name):
    # Building the DataFrame must be pure plan construction: an eager
    # action here (a .count(), an eager checkpoint) runs a full cluster
    # job before the query ever executes — and a second at execution.
    # Parquet schema inference DOES run a footer-only single-stage job
    # per spark.read.parquet — that's metadata, tolerated; any job with
    # a shuffle (>= 2 stages: a distinct/count/agg over data) is the
    # r2-audit anti-pattern this pins against.
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    group = f"construction-{name}"
    sc.setJobGroup(group, "construction must be lazy")
    try:
        registry.QUERIES[name](spark, SF_CHECK)
    finally:
        sc.setJobGroup(None, None)
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        assert info is None or len(info.stageIds) < 2, (
            f"{name}: construction ran a {len(info.stageIds)}-stage job "
            "(eager action over data in the query path)"
        )


def test_boilerplate_strip_single_scan_two_exchanges(spark):
    # chunk window + doc window; the rebuild groupBy must reuse the doc
    # partitioning (no third exchange), and no join-back scan
    plan = _plan(spark, "p07_boilerplate_strip")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_salted_join_spreads_without_broadcast(spark):
    # the salted exchange shape must actually materialize (merge hint):
    # a broadcast would make the salt decorative at test SF
    plan = _plan(spark, "b73_salted_join")
    assert "SortMergeJoin" in plan
    assert "BroadcastExchange" not in plan


def test_chunk_windows_shuffle_free_single_scan(spark):
    # p09: chunking is a narrow map (sequence + explode + slice over one
    # tokenization); any Exchange means 100 TB gets reshuffled to be cut
    # into chunks, and a second scan means the text tokenized twice
    plan = _plan(spark, "p09_chunk_windows")
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_corpus_shuffle_one_sharded_exchange(spark):
    # p10: the ONLY shuffle is the rank window partitioned by shard —
    # a SinglePartition window (global row_number) is the anti-pattern
    # this query exists to replace
    plan = _plan(spark, "p10_corpus_shuffle")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_fuzzy_decontaminate_no_cartesian(spark):
    # c26: candidates come from the (lang, shingle) equi-join postings
    # index — an all-pairs nested-loop between splits must never appear
    plan = _plan(spark, "c26_fuzzy_decontaminate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unpivot_expands_one_scan(spark):
    # b77: unpivot lowers to Expand over ONE scan of part — the naive
    # UNION ALL (the oracle's text) would read the table once per metric
    plan = _plan(spark, "b77_unpivot")
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_correlated_subqueries_decorrelate(spark):
    # b78: both scalar subqueries and the EXISTS must lower to joins
    # (Catalyst decorrelation); per-row subquery execution at 100 TB
    # would be a nested loop over the whole customer table
    plan = _plan(spark, "b78_correlated_subquery")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_aqe_splits_skewed_join_partitions(spark):
    # The 100 TB skew story this repo documents (b73 static salting for
    # deterministic layouts, AQE skew-join for everything else) must
    # actually fire: a hot key 60x the median partition gets split at
    # runtime — the final adaptive plan carries the skew=true marker.
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(0, 9_900).select(
                (F.col("id") % 99 + 1).alias("k"), F.col("id").alias("v")
            )
        )
        small = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(small, "k")
        assert len(j.collect()) == 209_900
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_gap_fill_scans_facts_twice_only(spark):
    # b80: grid metadata (bounds + type set in ONE aggregate) + counts —
    # a third scan means the distinct-types pass came back
    plan = _plan(spark, "b80_gap_fill")
    assert plan.count("Scan parquet") == 2


def test_sessionize_reuses_user_partitioning(spark):
    # b81: the session aggregate keys (user_id, session_id) are
    # satisfied by the window's hashpartitioning(user_id) — a second
    # exchange means the stream is reshuffled between window and agg
    plan = _plan(spark, "b81_sessionize")
    assert plan.count("Exchange hashpartitioning") == 1


def test_edit_distance_dups_no_cartesian(spark):
    # c28: candidates come from the (lang, length-bucket) equi join —
    # an all-pairs nested loop must never appear
    plan = _plan(spark, "c28_edit_distance_dups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_group_sample_pushes_group_limit(spark):
    # c30: k-per-group must push below the exchange (map tasks forward
    # at most k rows per group, never the whole corpus to window tasks)
    assert "WindowGroupLimit" in _plan(spark, "c30_group_sample")


def test_hyperplane_lsh_single_scan_no_pairs(spark):
    # c29: one embeddings scan; candidate counts come from bucket
    # sizes — no join materializes a pair
    plan = _plan(spark, "c29_hyperplane_lsh")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_split_drift_no_second_corpus_scan(spark):
    # p12: the global token totals re-aggregate the per-lang frame
    # (lazily checkpointed) — a parquet scan in the plan means the
    # corpus is being re-read for the totals
    plan = _plan(spark, "p12_split_drift")
    assert plan.count("Scan parquet") == 0  # lineage behind checkpoint
    assert "BroadcastExchange" in plan  # totals broadcast back


def test_asset_pipeline_explode_stays_partition_parallel(spark):
    # b85: generation + JSON parse + explode are narrow per-row ops —
    # the ONLY exchange is the final bounded aggregate (+ its sort for
    # the orderBy); an exchange before Generate would mean the fanout
    # serialized through a shuffle
    plan = _plan(spark, "b85_asset_pipeline")
    gen_pos = plan.find("Generate explode")
    assert gen_pos != -1
    below = plan[gen_pos:]  # plan text is top-down; below = children
    assert "Exchange" not in below


def test_streaming_datasource_state_stays_bounded(spark):
    # b84: the streaming aggregate must group on the tiny category key
    # only — its state is |categories| rows regardless of input volume.
    # (availableNow drains in one epoch; the memory-sink table is the
    # finished aggregate, so its size IS the state bound.)
    from iceberg_playground_spark import registry as _r

    df = _r.QUERIES["b84_streaming_datasource"](spark, SF_CHECK)
    rows = df.collect()
    assert 0 < len(rows) <= 5  # one row per generated category


def test_bpe_pair_stats_group_limit_and_single_scan(spark):
    # c32: one corpus scan; the per-lang top-5 pushes below the
    # exchange so the full pair vocabulary never concentrates on the
    # window tasks
    plan = _plan(spark, "c32_bpe_pair_stats")
    assert plan.count("Scan parquet") == 1
    assert "WindowGroupLimit" in plan


def test_canonical_selection_one_exchange_two_windows(spark):
    # c33: cluster_size and the rank share the fingerprint
    # partitioning — a second shuffle BETWEEN the windows would double
    # the corpus exchange at 100 TB. The only other exchange is the
    # ONE deliberate doc_id repartition that spreads the fingerprint
    # map off the scan's single split (round 17).
    plan = _plan(spark, "c33_canonical_selection")
    assert plan.count("Scan parquet") == 1
    assert plan.count("REPARTITION_BY_NUM") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_cluster_histogram_single_scan_digests_only(spark):
    # p13: both dedup keys come from ONE scan (explode of per-row
    # structs); only 16-byte digests shuffle, never text
    plan = _plan(spark, "p13_cluster_histogram")
    assert plan.count("Scan parquet") == 1
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "text" in read and "doc_id" not in read


def test_tpch_q5_broadcasts_dims_no_cartesian(spark):
    # b97: the cyclic 6-way join must resolve to broadcast hash joins
    # on the dim chain with zero cartesian products
    plan = _plan(spark, "b97_tpch_q5")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2


def test_tpch_q10_topk_never_global_sorts(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "b98_tpch_q10")


def test_tpch_q4_exists_decorrelates_to_semi(spark):
    # b99: EXISTS must lower to a semi join on l_orderkey, not a
    # per-order re-scan of lineitem
    plan = _plan(spark, "b99_tpch_q4")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_lateral_topk_decorrelates_to_window(spark):
    # b102: the correlated ORDER BY/LIMIT subquery must rewrite to ONE
    # customer scan + a per-nation ranking window, never a per-row
    # re-execution or a cartesian
    plan = _plan(spark, "b102_lateral_topk")
    assert plan.count("Scan parquet") == 2  # nation + customer, once each
    assert "CartesianProduct" not in plan
    assert "row_number" in plan


def test_variant_shred_pushes_projection(spark):
    # b100: the scan must read only event_type + props
    plan = _plan(spark, "b100_variant_shred")
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "props" in read and "event_type" in read
    assert "value" not in read and "user_id" not in read


def test_knn_join_lsh_path_no_cartesian(spark):
    # knn_join past the brute threshold must meet candidates ONLY via
    # the (band, bval) equi-join — no cartesian, no nested loop (the
    # c04 de-weakening contract, VERDICT r6 item 3). Self-probes must
    # still hit themselves at cosine 1.0 (identical vectors agree on
    # every band), so the approximate path keeps the one guarantee
    # that is data-independent.
    from pyspark.sql import functions as F

    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.llm import knn_join

    e = load(spark, SF_CHECK, "embeddings")
    base = e.select(
        F.col("vec_id").alias("base_id"), F.col("embedding").alias("be")
    )
    probes = e.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    out = knn_join(base, probes, k=3, brute_max=0, n_probes=500)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    self_hits = out.filter("probe_id = base_id AND cosine = 1.0").count()
    assert self_hits == 500


def test_knn_join_small_probes_stay_brute(spark):
    # under the threshold the exact broadcast-nested-loop path (the
    # registered c04 hash contract) must be chosen — the switch must
    # not silently degrade small probe sets to approximate answers
    plan = _plan(spark, "c04_knn_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_p17_probe_is_digest_only_no_cartesian(spark):
    # p17: the near-dup probe is an equi-join of (band, sig) digests —
    # never a cartesian; the base index aggregates to DISTINCT sigs
    # before the join so the exchange carries digests, not documents
    plan = _plan(spark, "p17_incremental_lsh_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan


def test_c38_rerank_shortlist_bounded(spark):
    # c38: both the ADC shortlist and the final top-k must be
    # TakeOrderedAndProject (bounded, no global sort materializes),
    # and no pair join appears anywhere
    plan = _plan(spark, "c38_pq_rerank")
    assert "CartesianProduct" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2


def test_c39_maintained_index_never_rescans_corpus(spark):
    # c39: the graded aggregate reads the MAINTAINED index table only —
    # the documents corpus is signed once during the build and must
    # never appear in the query's own scan set (at 100 TB the index is
    # ~32 B/doc; a corpus rescan here would defeat the maintenance)
    plan = _plan(spark, "c39_signature_index_merge")
    assert "documents" not in plan
    assert "Scan parquet" in plan


def test_c40_prune_and_shortlist_bounded(spark):
    # c40: cell pruning + ADC shortlist + exact re-rank must stay
    # bounded (two TakeOrderedAndProject) with no pair join anywhere;
    # the cell filter must reach the candidate side as an equi-join
    # against a broadcast, never a cartesian
    plan = _plan(spark, "c40_ivf_adc_rerank")
    assert "CartesianProduct" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2


def test_p19_eval_index_broadcasts_no_cartesian(spark):
    # p19: the eval signature set must broadcast (the train side is
    # never shuffled for the leak probe) and no train x eval pair
    # comparison may materialize
    plan = _plan(spark, "p19_decontaminated_split")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_p20_single_sig_lineage_no_corpus_broadcast(spark):
    # p20: the signature lineage computes once (checkpoint reused by
    # dedup winners, eval index, leak probe — ExistingRDD scans in the
    # plan), the eval index broadcasts, and no pair join or corpus
    # broadcast appears
    plan = _plan(spark, "p20_corpus_build_v2")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "ExistingRDD" in plan  # checkpointed sigs, not recomputed


def _exchange_outputs(df) -> list[list[str]]:
    """Output-attribute names of every Exchange in the (pre-execution)
    physical plan, via the JVM plan tree — NOT the toString text, whose
    Exchange lines print partitioning keys, not outputs (ADVICE r8:
    grepping the first line can never see a column riding the shuffle)."""
    out: list[list[str]] = []

    def walk(node) -> None:
        if "Exchange" in node.nodeName():
            attrs = node.output()
            out.append(
                [attrs.apply(i).name() for i in range(attrs.length())]
            )
        kids = node.children()
        for i in range(kids.length()):
            walk(kids.apply(i))

    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.initialPlan()
    walk(plan)
    return out


def test_c43_shuffle_is_digest_only_never_text(spark):
    # the substring-dedup exchanges past the digest projection must
    # carry (doc_id, pos, digest) columns only — document text never
    # rides a data shuffle. The ONE exception is the explicit
    # demo-parallelism repartition BEFORE the digest projection
    # (_flagged_positions' spread-the-CPU move on a one-split corpus);
    # that exchange necessarily carries text and is excluded by
    # construction: it is the only exchange whose output includes the
    # raw text column AND whose outputs are exactly the scan columns.
    df = registry.QUERIES["c43_substring_dedup"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    exchanges = _exchange_outputs(df)
    assert exchanges, "expected shuffles in the digest pipeline"
    text_carrying = [out for out in exchanges if "text" in out]
    # only the pre-projection demo repartition may carry text, and its
    # shape is the bare (doc_id, text) scan projection — anything wider
    # means text leaked PAST the digest projection into the pipeline
    assert len(text_carrying) <= 1
    for out in text_carrying:
        assert set(out) <= {"doc_id", "text"}, f"text leaked: {out}"
    # the run-merge window and the final aggregate share the doc_id
    # partitioning: the parallelize-the-digest-pass repartition + the
    # digest exchange + one doc_id exchange, and nothing else
    assert plan.count("Exchange hashpartitioning") <= 3


def test_b136_decode_is_partition_parallel_over_binaryfile(spark):
    # the multimodal decode must be the Arrow-batched kernel running
    # directly over a multi-split binaryFile scan — no repartition-to-1
    # choke point, no driver-side payload hop.
    df = registry.QUERIES["b136_binaryfile_scan"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "binaryFile" in plan or "BinaryFile" in plan
    assert "Exchange" not in plan  # decode chains straight off the scan
    assert df.rdd.getNumPartitions() > 1  # listing bin-packs, stays parallel


def test_p21_lm_broadcasts_tercile_window_on_scores(spark):
    # p21: the unigram LM joins broadcast (c23's contract carries
    # through), and the tercile window runs over DOC-count score rows
    # — token rows must all be consumed below the ntile exchange, so
    # no token/microlog attribute appears in any exchange above it
    plan = _plan(spark, "p21_perplexity_buckets")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "ntile" in plan


def test_p22_recipe_plans_broadcast_corpus_never_shuffles_for_explode(spark):
    # p22: the |sources|-row recipe broadcasts back onto the corpus;
    # the epoch fan-out is a map-side explode (no exchange between the
    # running-sum window and the final per-(source, epoch) aggregate —
    # they share the source partitioning)
    plan = _plan(spark, "p22_epoch_upsample")
    assert plan.count("BroadcastExchange") >= 2  # budget + plan joins
    assert "CartesianProduct" not in plan
    assert "Scan parquet" in plan and plan.count("Scan parquet") == 1


def test_p23_model_broadcasts_corpus_never_shuffles(spark):
    # p23: fit is one integer aggregate (the only hash exchange in the
    # plan besides its partial pair); scoring is broadcast-join +
    # map-side arithmetic — the corpus rows must never hash-shuffle
    plan = _plan(spark, "p23_quality_regression")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # the only hashpartitioning exchange is the per-lang moment agg
    assert plan.count("Exchange hashpartitioning") <= 1


def test_b137_listagg_is_partial_aggregated(spark):
    # b137: bounded-domain listagg must still combine map-side
    # (partial_listagg below the exchange), not ship raw rows
    plan = _plan(spark, "b137_listagg")
    assert "partial_listagg" in plan or "partial" in plan
    assert "CartesianProduct" not in plan


def test_p24_strip_joins_intervals_never_ships_text(spark):
    # p24: the interval list (bounded per doc) joins back onto the
    # corpus; the only exchanges are the digest window, the doc_id
    # run/interval exchanges, and the corpus co-partition — and no
    # exchange carries the text column except the corpus-side
    # repartition that parallelizes the strip itself
    df = registry.QUERIES["p24_substring_strip"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # real output-attribute inspection (ADVICE r8 — the toString
    # Exchange line shows partitioning keys, not outputs): exchanges
    # carrying text must be corpus-side co-partitions whose output is
    # the bare scan projection; the digest/interval lineage shuffles
    # only (doc_id, pos, digest)-shaped rows
    for out in _exchange_outputs(df):
        if "text" in out:
            assert set(out) <= {"doc_id", "text"}, f"text leaked: {out}"


def test_c44_matrix_is_digest_join_bounded_output(spark):
    # c44: fingerprints are map-side; the pair join is a digest
    # equi-join (never cartesian); output bounded by |sources|^2
    plan = _plan(spark, "c44_cross_source_dup_matrix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    from tests.conftest import SF_CHECK
    n = registry.QUERIES["c44_cross_source_dup_matrix"](
        spark, SF_CHECK
    ).count()
    assert n <= 20 * 19 / 2


def test_b138_union_is_planwise_concat_filters_pushed(spark):
    # b138: union by name is plan concatenation — both generations'
    # bucket filters evaluate in their own scan stage and the NULL
    # fill is a projection; the only exchange is the final aggregate
    plan = _plan(spark, "b138_union_by_name")
    assert "Union" in plan
    assert "CartesianProduct" not in plan


def test_b139_transpose_is_driver_reshape_of_group_budget(spark):
    # b139: transpose executes its input eagerly and returns a
    # LocalTableScan — the flip is a driver-side reshape by
    # construction, legal only because the input is a |groups|-row
    # aggregate; pin the shape contract (metrics as rows, one column
    # per returnflag) so a fact-table transpose can never sneak in
    plan = _plan(spark, "b139_transpose")
    assert "LocalTableScan" in plan
    df = registry.QUERIES["b139_transpose"](spark, SF_CHECK)
    assert df.columns == ["key", "A", "N", "R"]
    assert df.count() == 2


def test_p26_span_corruption_is_pure_map(spark):
    # p26: one scan, zero exchanges — the denoising transform is
    # entirely map-side JVM array math; any exchange appearing here
    # means the span construction started shuffling token rows
    plan = _plan(spark, "p26_span_corruption")
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_c45_candidates_equi_join_truth_arm_bounded(spark):
    # c45: the LSH candidate arm must be a (band, bval) equi-join —
    # the ONLY nested-loop allowed is the exact-truth arm, which is
    # probe x corpus BY DEFINITION (20 broadcast probes, the eval-only
    # baseline); a second nested loop means the candidate arm
    # degenerated to all-pairs
    plan = _plan(spark, "c45_ann_recall")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_c46_eval_is_single_scan_single_exchange(spark):
    # c46: the confusion counts collapse map-side into one global
    # aggregate; the metric fan-out consumes the checkpointed one-row
    # result, so only one parquet scan appears
    plan = _plan(spark, "c46_classifier_eval")
    assert plan.count("Scan parquet") <= 1
    assert "CartesianProduct" not in plan


def test_q3_topk_and_pushed_filters(spark):
    plan = _plan(spark, "b141_tpch_q3")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the segment filter must reach the customer scan
    assert "PushedFilters" in plan


def test_q6_is_pure_scan_aggregate(spark):
    # Q6: no join anywhere — scan, filter, one global aggregate
    plan = _plan(spark, "b142_tpch_q6")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_q13_outer_join_preserves_left(spark):
    plan = _plan(spark, "b143_tpch_q13")
    assert "LeftOuter" in plan or "left_outer" in plan.lower()
    assert "CartesianProduct" not in plan


def test_q15_revenue_rollup_scalar_max_broadcasts(spark):
    # Q15: the per-supplier revenue rollup shuffles once; the scalar
    # max comes back as a broadcast/subquery result, never a global
    # sort; supplier joins without a cartesian
    plan = _plan(spark, "b146_tpch_q15")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters" in plan  # shipdate range reaches the scan


def test_q17_correlated_scalar_decorrelates_to_aggregate_join(spark):
    # Q17: the per-part avg subquery must rewrite into an aggregate
    # joined back to the fact scan — a surviving per-row subquery
    # would rescan lineitem per row; the join is equi, never nested
    plan = _plan(spark, "b147_tpch_q17")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # decorrelation leaves exactly the two lineitem scans (fact +
    # per-part aggregate), not |rows| rescans
    assert plan.count("Scan parquet") == 3


def test_q22_not_exists_decorrelates_to_anti_join(spark):
    # Q22: NOT EXISTS must lower to a left-anti join on custkey; the
    # only nested loop is the 1-row balance-threshold broadcast (the
    # sanctioned tiny-frame crossJoin shape)
    plan = _plan(spark, "b148_tpch_q22")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_c47_single_pair_scan_feeds_all_arms(spark):
    # c47: the probe x base pair frame is checkpointed once and feeds
    # the truth arm plus every truncation arm — no per-arm corpus
    # rescan; all rankings are group-limited windows
    plan = _plan(spark, "c47_matryoshka_recall")
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 0  # checkpoint replaces scans
    assert "ExistingRDD" in plan


def test_p27_audit_candidates_bucketed_never_all_pairs(spark):
    # p27: pairs come from the (band, sig) self-join of the
    # checkpointed signature pass — never a cartesian; the exact
    # Jaccard runs only on the pair-bounded audit relation
    plan = _plan(spark, "p27_dedup_audit_sample")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_c48_pairs_confined_to_cells(spark):
    # c48: the pair join's equi-key is the cell — the quadratic work
    # is sum(|cell|^2), never |corpus|^2. (The 16-seed broadcast sits
    # upstream of the checkpointed assignment, so it is not visible in
    # THIS plan; the graded plan must show the cell-keyed join and no
    # cartesian anywhere.)
    plan = _plan(spark, "c48_semdedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell" in plan


def test_c49_fixpoint_matches_c24_on_shared_family_structure(spark):
    # c49 is the iterative-algorithm class (c24's): supersteps
    # MATERIALIZE during construction by design (each checkpoint is a
    # data-parallel stage; the driver sees control flow only), so the
    # construction-laziness pin does not apply. Pin instead that the
    # final plan is cartesian-free and the histogram accounts for
    # every signed doc exactly once.
    df = registry.QUERIES["c49_dedup_cluster_histogram"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = df.collect()
    from iceberg_playground_spark.queries.round7 import _band_sigs
    from iceberg_playground_spark.queries._util import load

    n_signed = (
        _band_sigs(
            load(spark, SF_CHECK, "documents").select("doc_id", "text"),
            "doc_id",
        )
        .select("doc_id")
        .distinct()
        .count()
    )
    assert (
        sum(r["cluster_size"] * r["n_clusters"] for r in rows) == n_signed
    )


def test_p28_sft_pairs_is_pure_map(spark):
    # p28: split + digests are per-row hash/array math — one scan,
    # zero exchanges (the c17 stamp discipline)
    plan = _plan(spark, "p28_sft_pairs")
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_c50_regression_runs_over_vocab_not_corpus(spark):
    # c50: the rank window and regression consume the checkpointed
    # |vocab|-row frequency table — corpus-sized token rows must all
    # collapse in the first aggregate
    plan = _plan(spark, "c50_zipf_audit")
    assert "ExistingRDD" in plan  # checkpointed vocab table
    assert "CartesianProduct" not in plan


def test_q21_double_exists_decorrelates_to_semi_plus_anti(spark):
    # b149: THE self-join workout — EXISTS(other supplier) must lower
    # to a semi join and NOT EXISTS(other late supplier) to an anti
    # join, both equi on l_orderkey; a surviving correlated subquery
    # would rescan lineitem per line. 6 scans = s/l1/o/n + l2 + l3.
    plan = _plan(spark, "b149_tpch_q21")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") == 6
    assert "TakeOrderedAndProject" in plan  # LIMIT 100 never global-sorts


def test_q9_five_way_join_broadcasts_dims(spark):
    # b150: part/supplier/nation broadcast under the fact joins; the
    # name LIKE filter can't push as a parquet predicate but the scan
    # still prunes to the joined columns
    plan = _plan(spark, "b150_tpch_q9")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 3


def test_q12_case_pivot_single_join(spark):
    # b151: one orders-lineitem join, both date range predicates
    # pushed to the lineitem scan, CASE counts inside the aggregate
    plan = _plan(spark, "b151_tpch_q12")
    assert plan.count("Scan parquet") == 2
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_q16_not_in_plans_as_anti_join(spark):
    # b152: the supplier blacklist NOT IN (key column, null-safe)
    # must plan as an anti join, and the distinct supplier count
    # must not cartesian anything
    plan = _plan(spark, "b152_tpch_q16")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q2_correlated_min_decorrelates(spark):
    # b153: the per-part regional-min subquery must rewrite to an
    # aggregate joined back on p_partkey (the Q17 machinery under a
    # join tree) — equi joins only, top-100 via TakeOrdered
    plan = _plan(spark, "b153_tpch_q2")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q11_single_pass_window_over_aggregate(spark):
    # b154: the window-over-aggregate form must evaluate the scoped
    # relation ONCE (3 scans: lineitem + supplier + nation), with the
    # global total/count riding a window over |parts| grouped rows —
    # the scalar-subquery form triples the rollup under CTE inlining
    plan = _plan(spark, "b154_tpch_q11")
    assert plan.count("Scan parquet") == 3
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1


def test_q20_nested_in_flattens_to_semi_joins(spark):
    # b155: IN(subquery with IN(subquery) + correlated scalar agg)
    # must flatten to a chain of semi joins (3: supplier IN, part IN,
    # and the partsupp-side correlation) with zero nested loops
    plan = _plan(spark, "b155_tpch_q20")
    assert plan.count("LeftSemi") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_c53_dsir_two_scan_broadcast_model_topk(spark):
    # c53: the 256-row delta model must BROADCAST onto the scoring
    # pass (never shuffle the token stream on bucket); the Gumbel
    # top-k lowers to TakeOrderedAndProject; 3 corpus scans exactly
    # (model pass + scoring pass + source rollup), no cartesians
    plan = _plan(spark, "c53_dsir_resample")
    assert plan.count("Scan parquet") == 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_c54_assignment_pass_is_joinless_map(spark):
    # c54: the graded (final) pass scores every vector against LITERAL
    # centroids — one corpus scan, no join anywhere (a join on a
    # centroid table would shuffle the corpus per iteration; Lloyd's
    # Spark shape broadcasts k·d ints as an expression instead). The
    # graded pass reads the train loop's cached quantized frame (ONE
    # ExistingRDD scan — the round-17 repartition + cache live below
    # the checkpoint), so the only exchange left in the final plan is
    # the output sort's rangepartitioning.
    plan = _plan(spark, "c54_kmeans_lloyd")
    assert plan.count("Scan ExistingRDD") == 1
    assert "Scan parquet" not in plan
    assert "Join" not in plan
    assert "hashpartitioning" not in plan


def test_c55_single_token_shuffle_no_cartesian(spark):
    # c55: the corpus count is a driver-side scalar, NOT a broadcast
    # 1-row frame — the frame form replicates a nested-loop join into
    # every downstream branch (6 corpus scans); the token stream
    # shuffles on its own key for the first-decile min, never
    # cartesians
    plan = _plan(spark, "c55_vocab_growth")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") <= 3


def test_c56_windows_partition_by_bucket_shard(spark):
    # c56: batch numbering must run inside (bucket, shard) windows —
    # a global or bucket-only window serializes batch assembly at
    # scale; the md5 shard key is the parallelism contract
    plan = _plan(spark, "c56_length_bucket_batches")
    assert "hashpartitioning(bucket" in plan
    assert "shard" in plan.split("hashpartitioning(bucket", 1)[1][:40]
    assert "CartesianProduct" not in plan


def test_c57_scorer_is_pure_map(spark):
    # c57: the classifier apply is ONE scan + JVM expression — zero
    # joins, zero aggregation shuffles; only the output sort's
    # rangepartitioning exchange may appear
    plan = _plan(spark, "c57_hashed_classifier_apply")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan


def test_p29_two_level_aggregate_no_window_exchange(spark):
    # p29: rule inputs derive from (doc, token) counts — the second
    # exchange moves per-(doc, distinct-token) rows, strictly smaller
    # than the token stream; a Window here would mean the top-token
    # count regressed to the full-width two-exchange form
    plan = _plan(spark, "p29_gopher_quality_rules")
    assert plan.count("Scan parquet") == 1
    assert "Window" not in plan
    assert "Join" not in plan


def test_c58_sketch_is_bounded_and_probes_broadcast(spark):
    # c58: the sketch aggregate is 16 cells max (2 rows x 8); the
    # top-k exact arm lowers to TakeOrderedAndProject; the estimate
    # join must broadcast the 20-row (10 tokens x 2 rows) probe side,
    # never shuffle the cells wide
    plan = _plan(spark, "c58_countmin_heavy_hitters")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_p30_cumsum_window_partitions_by_source(spark):
    # p30: the prefix-cut cumsum must run per-source (independent
    # partition-local scans at 100 TB), with the |sources|-row budget
    # table broadcast onto the doc stream
    plan = _plan(spark, "p30_token_budget_fill")
    assert "hashpartitioning(source" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_b156_skyline_no_nested_loop_no_wide_window(spark):
    # b156: the corpus never self-joins (the textbook NOT EXISTS form
    # is quadratic); pruning is an aggregate + broadcast back, and
    # both exact-pass windows run over aggregate rows. Two scans only
    # (fringe is lazily checkpointed).
    plan = _plan(spark, "b156_skyline")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") <= 2


def test_c59_pair_join_runs_on_model_rows_only(spark):
    # c59: the |S|^2 pair join must key on bucket over the COMPLETED
    # |S|*B model table — never a corpus-row join; the only nested
    # loop allowed is the tiny grid cross (sources x 256 literals)
    plan = _plan(spark, "c59_source_kl_divergence")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert plan.count("Scan parquet") <= 2


def test_c60_two_level_aggregate_single_scan(spark):
    plan = _plan(spark, "c60_good_turing_audit")
    assert plan.count("Scan parquet") == 1
    assert "Window" not in plan
    assert "Join" not in plan


def test_c61_entropy_normalization_rides_counts_table(spark):
    # c61: the per-doc total must come from a window over the
    # (doc, token) COUNTS table, never a second corpus aggregate
    # joined back — one scan, no join
    plan = _plan(spark, "c61_token_entropy")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_p31_probe_join_is_digest_only(spark):
    # p31: shingle STRINGS never shuffle — the train set collapses to
    # distinct BIGINT digests and the probe is one digest equi-join
    # (c43's discipline); no cartesian, three corpus scans
    plan = _plan(spark, "p31_ngram_leakage_audit")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") <= 3


def test_c62_pair_stage_is_digest_equi_join(spark):
    # c62: the postings self-join must be a digest equi-join with the
    # df cap applied BEFORE pairing (sigma df^2 bound) — no cartesian,
    # no nested loop, shingle strings never shuffle
    plan = _plan(spark, "c62_containment_detect")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_c63_superstep_stages_are_bounded(spark):
    # c63: the per-step argmax must lower to TakeOrderedAndProject
    # (1-row driver state, never a wide sort) and the merge
    # application must be a joinless pure map — the 100 TB contract
    # is one pair aggregate + O(1) collect per superstep
    from pyspark.sql import functions as F

    from iceberg_playground_spark.queries.round10 import (
        _c63_fold, _c63_pairs,
    )

    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    words = (
        spark.read.parquet(f"{SF_CHECK}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("seq", F.rtrim(F.regexp_replace("word", "(.)", "$1 ")))
    )
    argmax = (
        _c63_pairs(words).orderBy(F.col("tot").desc(), "pair").limit(1)
    )
    p = argmax._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "Join" not in p
    fold = words.withColumn("seq", _c63_fold("t", "h"))
    p = fold._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p
    # only the word-table build's own aggregate exchange — the fold
    # itself adds none
    assert p.count("Exchange") <= 1


def test_p32_split_assignment_partitions_by_fingerprint(spark):
    # p32: one hash exchange on the content fingerprint serves the
    # representative window; the 1-row leak count broadcasts onto the
    # 3-row summary (never a cartesian on data); no sort-merge join
    plan = _plan(spark, "p32_leakage_safe_split")
    assert "hashpartitioning(fp" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_c64_fertility_is_single_scan_no_join(spark):
    # c64: the tokenizer expression runs inside the per-doc projection
    # (pure map) and the only exchange is the |langs|-key aggregate
    plan = _plan(spark, "c64_tokenizer_fertility")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_c65_model_broadcasts_into_score_join(spark):
    # c65: the B^2-bounded model side must broadcast; the corpus-sized
    # bigram stream never sort-merges or cartesians
    plan = _plan(spark, "c65_bigram_perplexity")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2


def test_c66_centroids_broadcast_and_topk_pushes_group_limit(spark):
    # c66: the |labels|-row centroid table broadcasts into the
    # distance map; the per-label top-5 pushes its group limit below
    # the exchange instead of ranking whole partitions
    plan = _plan(spark, "c66_embedding_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_p33_math_runs_on_the_cell_table(spark):
    # p33: one corpus aggregate to |cells| rows; no join anywhere —
    # the window sums run over the cell table
    plan = _plan(spark, "p33_epoch_budget_report")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_c67_anchor_side_broadcasts_and_topk_pushes(spark):
    # c67: the 10-row anchor table is the ONLY join (broadcast nested
    # loop — the sanctioned bounded eval-arm shape); per-(anchor,
    # same) bests push their group limit; never a cartesian on data
    plan = _plan(spark, "c67_triplet_mining")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_p34_one_fp_exchange_serves_both_windows(spark):
    # p34: the cluster-representative and passing-survivor windows
    # must share ONE fp exchange (same partitioning), and the corpus
    # text never shuffles — only doc-keyed stat rows
    plan = _plan(spark, "p34_release_report_v3")
    assert plan.count("hashpartitioning(fp") == 1
    assert "CartesianProduct" not in plan


def test_c69_topk_lowers_and_model_joins_never_touch_corpus(spark):
    # c69: the top-20 must lower to TakeOrderedAndProject and the PMI
    # joins run on checkpointed MODEL rows (no cartesian; at most 2
    # corpus scans feed the two model aggregates)
    plan = _plan(spark, "c69_pmi_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_p35_rounds_are_cell_table_window_math(spark):
    # p35: one corpus aggregate to |cells| rows; every water-filling
    # round is window arithmetic over the cell table — no join exists
    plan = _plan(spark, "p35_budget_rebalance")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_c70_superstep_pick_is_joinless_topk(spark):
    # c70: each D² draw must be ONE stateless map over the corpus
    # (min-distance folded against a LITERAL seed matrix, the c54
    # rule) ending in a 1-row TakeOrderedAndProject — a join against
    # a seed table would shuffle the corpus once per superstep
    from pyspark.sql import functions as F

    from iceberg_playground_spark.queries.round11 import (
        _c70_min_d2,
        _c70_noise_micro,
    )
    from iceberg_playground_spark.queries.round9b import _c54_quantized

    qdf = _c54_quantized(spark, SF_CHECK)
    key = (
        F.round(1e6 * F.log(F.col("m").cast("double"))).cast("bigint")
        + _c70_noise_micro(1)
    ).alias("key")
    pick = (
        qdf.select("vec_id", "q", _c70_min_d2([(0, [0] * 64)]).alias("m"))
        .filter(F.col("m") > 0)
        .select("vec_id", "q", key)
        .orderBy(F.col("key").desc(), "vec_id")
        .limit(1)
    )
    plan = pick._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_c70_final_assignment_is_joinless_map(spark):
    # c70: the graded assignment inherits c54's shape — one pass over
    # the train loop's cached quantized frame (ONE ExistingRDD scan;
    # the round-17 repartition + cache live below the checkpoint)
    # against the literal learned centroids, no join, no hash exchange
    # (driver state across the whole train step stays k·d ints)
    plan = _plan(spark, "c70_kmeanspp_seed")
    assert plan.count("Scan ExistingRDD") == 1
    assert "Scan parquet" not in plan
    assert "Join" not in plan
    assert "hashpartitioning" not in plan


def test_c71_audit_is_one_scan_one_aggregate(spark):
    # c71: assignment must stay a joinless map against the literal
    # seed matrix and the per-cell stats ONE |k|-key aggregate with
    # map-side partials — no join, no window, no second corpus pass
    plan = _plan(spark, "c71_ivf_index_drift")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_p37_schedule_is_cell_table_explode(spark):
    # p37: one corpus scan collapses to the cell table (p35's plan);
    # the schedule is a sequence-explode of cell rows — no join, no
    # second corpus pass; the only exchange past the cell aggregate
    # is the deliverable's global step order
    plan = _plan(spark, "p37_mixture_schedule")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Generate explode" in plan


def test_c72_eval_arm_is_bounded_broadcast(spark):
    # c72: the probe side must BROADCAST (10 bounded rows — the c67
    # sanctioned nested-loop shape); candidates never re-scan the
    # corpus (one scan feeds assignment + pair sweep) and the final
    # intersection joins two <=100-row top-k sets
    plan = _plan(spark, "c72_learned_ivf_recall")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_c73_calibration_is_pure_map_one_aggregate(spark):
    # c73: fixed-width binning must stay a pure map + one |bins|-key
    # aggregate — no window (quantile binning's global ntile would
    # single-partition the corpus), no join, one scan
    plan = _plan(spark, "c73_classifier_calibration")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_c74_train_superstep_shuffles_sums_never_vectors(spark):
    # c74: each Lloyd iteration's update aggregate must reduce
    # sub-vectors to per-(subspace, code, dim) integer sums MAP-SIDE —
    # the exchange carries 128-key partials, never a vector column —
    # and the assignment is a joinless literal-matrix map.
    from pyspark.sql import functions as F

    from iceberg_playground_spark.queries.round9b import _c54_quantized
    from iceberg_playground_spark.queries.round12 import (
        _C74_SDIM,
        _C74_SUB,
        _c74_code_col,
        _c74_seed,
        _c74_sub_col,
    )

    qdf = _c54_quantized(spark, SF_CHECK)
    cb = _c74_seed(qdf)
    pairs = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                _c74_code_col(cb, s).alias("j"),
                _c74_sub_col(s).alias("sub"),
            )
            for s in range(_C74_SUB)
        ]
    )
    agg = (
        qdf.select(F.explode(pairs).alias("e"))
        .select("e.s", "e.j", "e.sub")
        .groupBy("s", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.col("sub")[d]).alias(f"d{d}")
                for d in range(_C74_SDIM)
            ],
        )
    )
    # the only exchange allowed to carry the vector column is the ONE
    # deliberate vec_id repartition below the folds (round 17); the
    # aggregate's exchange still ships 128-key partials, never a
    # sub-vector
    vec_exchanges = [
        cols
        for cols in _exchange_outputs(agg)
        if "sub" in cols or "q" in cols
    ]
    assert len(vec_exchanges) <= 1, vec_exchanges
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_NUM") == 1
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_c74_rerank_is_bounded_broadcast_topk(spark):
    # c74's graded plan (post-training): ADC estimate is a pure map
    # against literal tables, the shortlist and final top-k are both
    # TakeOrderedAndProject (never a global sort), and the exact
    # re-rank joins the corpus against the BROADCAST 50-row shortlist
    # — no pair join, no shuffle join, anywhere.
    plan = _plan(spark, "c74_pq_train")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "BroadcastHashJoin" in plan


def test_c75_estep_is_joinless_fold_one_word_table_scan(spark):
    # c75: the E-step must be a pure-map Viterbi fold over the word
    # table against a LITERAL score map — no join anywhere, and the
    # usage aggregate's exchange carries (piece, count) partials,
    # never word rows (word/cnt/seg columns off the shuffle).
    from pyspark.sql import functions as F

    from iceberg_playground_spark.queries._util import load
    from iceberg_playground_spark.queries.round12 import (
        _c75_fw_col,
        _c75_seg_col,
    )

    words = (
        load(spark, SF_CHECK, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    m = F.create_map(F.lit("a"), F.lit(-100), F.lit("b"), F.lit(-200))
    counts = (
        words.withColumn("fw", _c75_fw_col(m))
        .withColumn("seg", _c75_seg_col(m))
        .select("cnt", F.explode(F.split("seg", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
    )
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    # the word-table build's own exchange carries (word, count) — the
    # corpus-collapse shuffle, paid once; past it nothing word-sized
    # may ride a shuffle: no segmentation, no DP state
    for cols in _exchange_outputs(counts):
        assert "seg" not in cols and "fw" not in cols, cols


def test_b161_entries_is_metadata_only(spark):
    # b161: the entries relation is answered from snapshot JSON — the
    # graded plan must contain NO parquet scan at all (local metadata
    # rows only; the demo-warehouse build runs once outside the plan)
    plan = _plan(spark, "b161_entries_metadata")
    assert "Scan parquet" not in plan
    assert "Join" not in plan


def test_b170_avro_roundtrip_is_metadata_only(spark):
    # b170: the graded frame rolls up the DECODED manifest entries —
    # local metadata rows only, like b161 (the Avro encode/decode is
    # bounded driver work; the corpus parquet is read once by the
    # cached demo build, never by the graded plan)
    plan = _plan(spark, "b170_avro_manifest_roundtrip")
    assert "Scan parquet" not in plan
    assert "Join" not in plan


def test_p40_model_broadcasts_two_corpus_passes(spark):
    # p40: all three cumulative proxy models and the reference are
    # conditional sums in ONE model aggregate; the scoring join must
    # BROADCAST the 4096-row grid (never shuffle the bigram stream
    # against it), and no pair join appears anywhere
    plan = _plan(spark, "p40_mixture_weight_learn")
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_b162_all_manifests_is_metadata_only(spark):
    # b162: the whole-lineage manifest inventory is answered from
    # snapshot JSON headers — no parquet scan in the graded plan
    plan = _plan(spark, "b162_all_manifests")
    assert "Scan parquet" not in plan
    assert "Join" not in plan


def test_c76_apply_never_shuffles_words(spark):
    # c76 (round-16 shape): the Viterbi DP runs once per DISTINCT
    # (lang, word) — the only exchange carrying a word is the
    # distinct-word aggregation (map-side partials make it vocab-
    # sized, never corpus-sized). The DP table and segmentation
    # columns still never cross an exchange, and no pair join between
    # corpus-sized frames appears
    df = registry.QUERIES["c76_unigram_apply_fertility"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    word_exchanges = 0
    for cols in _exchange_outputs(df):
        assert not {"fw", "seg"} & set(cols), cols
        if "word" in cols:
            word_exchanges += 1
    # exactly the distinct-(lang, word) aggregation's exchange (the
    # weighted rollup re-uses its partitioning)
    assert word_exchanges <= 1, word_exchanges


def test_c77_search_is_bounded_broadcast_topk(spark):
    # c77's graded plan (post-training): candidates are an IN filter
    # on the probed cells over the checkpointed residual frame, the
    # shortlist and final top-k are TakeOrderedAndProject, the exact
    # re-rank joins against the broadcast 50-row shortlist — no pair
    # join, no shuffle join anywhere
    plan = _plan(spark, "c77_trained_ivfadc")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "BroadcastHashJoin" in plan


def test_b163_metadata_log_is_metadata_only(spark):
    # b163: version log + per-version stats counts — no parquet scan
    plan = _plan(spark, "b163_metadata_log")
    assert "Scan parquet" not in plan


def test_c78_fusion_joins_lists_not_corpus(spark):
    # c78: both backends end in TakeOrderedAndProject top-100 lists;
    # the fusion join touches only those lists (broadcast/no
    # sort-merge over the corpus) and no pair join appears
    plan = _plan(spark, "c78_hybrid_rrf_search")
    assert plan.count("TakeOrderedAndProject") >= 3  # 2 lists + final
    assert "CartesianProduct" not in plan


def test_b164_all_files_is_metadata_only(spark):
    # b164: the file-grain lineage walk is answered from snapshot JSON
    # headers — no parquet scan, no join in the graded plan
    plan = _plan(spark, "b164_all_data_files")
    assert "Scan parquet" not in plan
    assert "Join" not in plan


def test_c79_gram_scan_shuffles_partials_not_vectors(spark):
    # c79: the Gram statistics pass is ONE corpus scan whose exchange
    # carries (i, j, v) partial-sum rows — no vector or embedding
    # column ever rides a shuffle, and nothing joins the corpus
    from iceberg_playground_spark.queries.round12b import _c79_stats

    df = _c79_stats(spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    for cols in _exchange_outputs(df):
        assert not {"q", "embedding"} & set(cols), cols


def test_c79_graded_output_is_model_sized_join(spark):
    # the graded frame joins the 64-row sums slice with the 64-row
    # literal component — broadcast, never sort-merge/cartesian
    plan = _plan(spark, "c79_pca_power_iteration")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_c81_prefilter_is_topk_not_corpus_join(spark):
    # c81: both arms end in TakeOrderedAndProject; the found-join
    # touches two 10-row frames (broadcast) — never sort-merge or
    # cartesian over the corpus
    plan = _plan(spark, "c81_pca_prefilter_recall")
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_c80_payloads_never_shuffle(spark):
    # c80: the signature kernel is one mapInPandas pass — no exchange
    # carries the payload or text column; the candidate stage is the
    # banded equi-join, never a cartesian
    df = registry.QUERIES["c80_phash_near_dup"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert not {"payload", "text"} & set(cols), cols


def test_p43_inherits_c49_bounded_shape(spark):
    # p43: no cartesian anywhere; corpus text never rides an exchange
    # (the closure works on digests, the tail on (doc_id, nt) rows)
    df = registry.QUERIES["p43_dedup_aware_epochs"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert "text" not in set(cols), cols


def test_b165_rewrite_manifests_is_metadata_only(spark):
    # b165: the consolidation rollup is answered from snapshot JSON
    # headers — no parquet scan, no join in the graded plan
    plan = _plan(spark, "b165_rewrite_manifests")
    assert "Scan parquet" not in plan
    assert "Join" not in plan


def test_c82_spectrum_costs_one_gram_scan(spark):
    # c82: the whole 3-component spectrum is driver arithmetic — the
    # graded plan pays exactly c79's shape (no corpus join, no
    # sort-merge/cartesian; the spectrum frame is a broadcast literal)
    plan = _plan(spark, "c82_pca_energy_spectrum")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_c83_audit_never_ships_text(spark):
    # c83: both heavy joins are the deployed operators' own bounded
    # plans — no cartesian, and no exchange carries text or a shingle
    # array (postings and signatures ride as scalar rows)
    df = registry.QUERIES["c83_lsh_scurve_audit"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert not {"text", "sh"} & set(cols), cols


def test_c84_model_broadcasts_into_score_join(spark):
    # c84: the |V|²-bounded NLL model broadcasts; no sort-merge join
    # over corpus-sized frames, no cartesian, and no exchange carries
    # the token array
    df = registry.QUERIES["c84_kneser_ney_bigram"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert "toks" not in set(cols), cols


def test_c85_is_two_aggregates_no_join(spark):
    # c85: one tokenize → (term, doc) aggregate → |V|-key rollup; the
    # dispersion algebra needs no join and no corpus window
    plan = _plan(spark, "c85_term_burstiness")
    assert "Join" not in plan


def test_b166_forecast_is_metadata_only(spark):
    # b166: the policy table is answered from snapshot JSON headers —
    # no parquet scan, no join in the graded plan
    plan = _plan(spark, "b166_retention_forecast")
    assert "Scan parquet" not in plan
    assert "Join" not in plan


def test_p46_drill_probes_digests_only(spark):
    # p46: the train side collapses to a distinct digest set and the
    # probe is a digest semi-join — text never rides an exchange
    df = registry.QUERIES["p46_canary_leakage_drill"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert not {"text", "sh"} & set(cols), cols


def test_c86_window_is_source_partitioned(spark):
    # c86: the ranking window partitions by source (no global sort of
    # the corpus) and the quartile table broadcasts back
    df = registry.QUERIES["c86_length_iqr_outliers"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_c87_rerank_touches_shortlist_only(spark):
    # c87: the graded plan reads the CHECKPOINTED 20-row shortlist
    # (its TakeOrderedAndProject ran once, at materialization) and
    # joins the 10-row broadcast pick — no sort-merge, no cartesian,
    # nothing corpus-sized past the checkpoint
    plan = _plan(spark, "c87_mmr_diversified_rerank")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Scan parquet" not in plan  # shortlist only, never the corpus


def test_c88_costs_two_gram_scans(spark):
    # c88: both arms are c79's shape; the graded join is the 64-row
    # broadcast — no corpus join, no sort-merge, no cartesian
    plan = _plan(spark, "c88_component_stability")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_p47_pair_join_is_sample_bounded(spark):
    # p47: the doc_id predicate reaches the scan and the pair join
    # touches only the 50-row sample (the sanctioned eval arm)
    df = registry.QUERIES["p47_signal_agreement_audit"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    for cols in _exchange_outputs(df):
        assert "text" not in set(cols), cols


def test_p48_is_one_corpus_pass(spark):
    # p48: one tokenize + per-doc aggregate + a checkpointed 1-row
    # rollup pivoted to 3 rows — no join over corpus rows
    df = registry.QUERIES["p48_gate_attribution"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert "text" not in set(cols), cols


def test_c89_audit_adds_no_corpus_work(spark):
    # c89: the graded plan reads the checkpointed 20-row shortlist and
    # a 2-row literal — never the corpus
    plan = _plan(spark, "c89_rerank_diversity_audit")
    assert "Scan parquet" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_b168_orphan_lifecycle_scans_survivor_only(spark):
    # b168: the verb itself is pure metadata (snapshot JSON + listdir +
    # unlink); the graded frame's only parquet work is the final
    # surviving read — one file, no join anywhere
    plan = _plan(spark, "b168_remove_orphan_files")
    assert plan.count("Scan parquet") <= 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_b169_rewrite_pos_deletes_broadcasts_masks(spark):
    # b169: both rollup arms assemble MoR reads through BROADCAST
    # anti-joins on KB-scale (file, pos) delete files — never a
    # sort-merge over data rows, never a cartesian (the 1-row
    # masked-count crossJoin is a broadcast of a literal aggregate)
    plan = _plan(spark, "b169_rewrite_position_deletes")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_c90_kernel_is_pure_integer_map(spark):
    # c90: the kernel chain is a per-row integer map — no join
    # anywhere; the only exchange bigger than the 512-row grid is the
    # |sources|-key count aggregate
    plan = _plan(spark, "c90_integer_ln_selfcheck")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_c91_graph_build_is_blocked_never_cartesian(spark):
    # c91: graph build joins on the label key (Σ|block|², the
    # c48/c66 discipline — co-locating vectors by block is the ONE
    # legitimate vector shuffle, paid once at build); the only
    # nested-loop is the bounded 10x10 hub ring broadcast; the search
    # (round 17) is driver-coordinated bounded lookups, so the result
    # frame is a local K-row table. Pin the BUILD plan directly (the
    # result plan no longer contains it) plus the result's shape: no
    # cartesian, no raw text/embedding on any exchange, and the pair
    # fold inherits the repartition's width (never the one-split
    # scan's).
    from iceberg_playground_spark.queries.round13 import _c91_graph

    q, alledges = _c91_graph(spark, SF_CHECK)
    plan = alledges._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(alledges):
        assert not {"text", "embedding"} & set(cols), cols
    assert q.rdd.getNumPartitions() > 1  # the pair fold parallelizes
    df = registry.QUERIES["c91_knn_graph_search"](spark, SF_CHECK)
    assert df.count() == 10
    rplan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rplan


def test_c92_recall_probe_table_is_one_broadcast_pass(spark):
    # c92: the all-probe distance table is one corpus pass against a
    # broadcast 5-row probe set (c04's brute contract); no cartesian;
    # raw embeddings never ride an exchange
    df = registry.QUERIES["c92_graph_ann_recall"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert not {"text", "embedding"} & set(cols), cols


def test_c93_assignment_broadcasts_centroids(spark):
    # c93: cell assignment is a broadcast 16-row centroid table per
    # batch; the graded rollup reads the maintained index — no
    # sort-merge over vectors, no cartesian beyond the sanctioned
    # bounded centroid broadcast
    df = registry.QUERIES["c93_vector_index_merge"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_c94_rerank_touches_shortlist_only(spark):
    # c94: the pairwise scorer reads exactly the 10 shortlist texts
    # (broadcast id semi-join) — no cartesian, no sort-merge over
    # corpus rows, text never rides an exchange
    df = registry.QUERIES["c94_cross_encoder_rerank"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert "text" not in set(cols), cols


def test_c95_hierarchy_is_blocked_never_cartesian(spark):
    # c95: both layers build with the blocked label-key join (the
    # c91 discipline); the only nested loops are the bounded hub
    # rings + the 1-row entry handoff broadcast; raw embeddings
    # never ride an exchange
    df = registry.QUERIES["c95_hierarchical_graph_search"](
        spark, SF_CHECK
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert not {"text", "embedding"} & set(cols), cols


def test_c96_ingest_is_blocked_never_cartesian(spark):
    # c96: the ONLY pair work touching arrivals is the label-key
    # Σ|A|·|B| join (computed once, ranked in both directions); the
    # back-edge tagging broadcasts the arrival id list; no cartesian
    # anywhere and raw embeddings never ride an exchange (the
    # quantized label-key co-location is the one sanctioned vector
    # shuffle, c91's discipline)
    df = registry.QUERIES["c96_graph_index_ingest"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert not {"text", "embedding"} & set(cols), cols


def test_c97_filter_pushes_into_exact_scan(spark):
    # c97: the exact arm's metadata predicate reaches the parquet
    # reader (PushedFilters: In(label, …)) so non-matching vectors
    # are never materialized, let alone scored — the filter prunes
    # BEFORE distance work; the graph arm stays never-cartesian and
    # raw embeddings never ride an exchange
    df = registry.QUERIES["c97_filtered_ann_search"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert any(
        "PushedFilters" in ln and "In(label, [2,5,7])" in ln
        for ln in plan.splitlines()
    ), "label predicate not pushed into the exact arm's scan"
    for cols in _exchange_outputs(df):
        assert not {"text", "embedding"} & set(cols), cols


def test_c98_delete_repair_is_blocked_never_cartesian(spark):
    # c98: the before-adjacency and the repair both rank the ONE
    # label-key pair job; the affected set and its repair prune ride
    # broadcast id joins; no cartesian anywhere and raw embeddings
    # never ride an exchange
    df = registry.QUERIES["c98_graph_index_delete"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for cols in _exchange_outputs(df):
        assert not {"text", "embedding"} & set(cols), cols


def test_c99_maintained_recall_is_blocked_never_cartesian(spark):
    # c99: the whole lifecycle (build + ingest retrim + delete
    # repair) ranks the ONE label-key candidacy pair job; the
    # affected-set prune, the 5-row probe distance table and the
    # per-hop candidate scoring all ride broadcast joins; the only
    # nested loops are the bounded hub ring and those broadcasts; no
    # cartesian anywhere and raw embeddings never ride an exchange
    df = registry.QUERIES["c99_maintained_graph_recall"](
        spark, SF_CHECK
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the report plan reads ONLY the lazily-checkpointed bases (q,
    # pairs, post, alledges, dqall) — the corpus parquet is scanned
    # while materializing those, never re-scanned per hop/arm
    assert "Scan parquet" not in plan
    for cols in _exchange_outputs(df):
        assert not {"text", "embedding"} & set(cols), cols


def test_c62_containment_scans_digests_once(spark):
    # round 16: the digest rows (doc_id, dg) feed three consumers (df
    # table, kept join side, per-doc size table); the lazy checkpoint
    # means the report plan reads ONLY the materialized digest RDD —
    # one shingle+md5 corpus pass instead of three
    df = registry.QUERIES["c62_containment_detect"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_c76_unigram_apply_segments_distinct_words(spark):
    # round 16: the Viterbi DP depends only on the word, so it must
    # run above the (lang, word) occurrence aggregate — |distinct
    # words| DP evaluations, never |occurrences| (sf0.1: 155 vs 270k)
    df = registry.QUERIES["c76_unigram_apply_fertility"](spark, SF_CHECK)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "occ" in plan, "occurrence-count aggregate missing"
    fw_at = plan.index("aggregate(sequence(length(word")
    # the DP projection consumes the aggregated (lang, word, occ) rows:
    # a partial_count over the exploded words appears BELOW it
    below = plan[fw_at:]
    assert "partial_count" in below, (
        "the word-occurrence aggregate is not below the DP projection"
    )


def test_int_ln_fold_is_compact(spark):
    # round 16: the kernel's 21 squaring steps run as ONE higher-order
    # aggregate, not 63 chained projections — the _il_s<k> scaffold
    # columns must never reappear (they cost ~1.3-1.7 s of
    # data-size-free Catalyst analysis per fold call site)
    plan = _plan(spark, "c65_bigram_perplexity")
    assert "_il_s1" not in plan
    assert "aggregate(" in plan
