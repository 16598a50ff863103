"""Round-6 operator semantics: recursive CTE, SQL UDFs, HLL rollup,
temperature resampling, and the TPC-H Q7-Q19 pack's plan shapes.
Oracle parity for the oracle-backed ones is covered by
test_correctness's registry-wide parametrization; these tests pin the
semantic invariants an oracle diff alone would not localize."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402


def _plan(spark, name: str) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df = registry.QUERIES[name](spark, SF_CHECK)
    return df._jdf.queryExecution().executedPlan().toString()


# --- b111 recursive CTE ---------------------------------------------------


def test_b111_depth_is_digit_count(spark):
    # parent(k) = floor(k/10): depth must equal len(str(k)) - 1 and
    # every chain must bottom out at a sub-10 root.
    rows = registry.QUERIES["b111_recursive_cte"](spark, SF_CHECK).collect()
    assert len(rows) == 1500
    for r in rows:
        assert r["depth"] == len(str(r["c_custkey"])) - 1
        assert r["root_key"] < 10


def test_b111_runs_as_union_loop(spark):
    # Spark 4 executes WITH RECURSIVE natively — the plan carries the
    # loop operator rather than a driver-side rewrite.
    assert "UnionLoop" in _plan(spark, "b111_recursive_cte")


# --- b112 SQL UDF ---------------------------------------------------------


def test_b112_sql_udf_inlines_no_python(spark):
    # SQL UDFs are Catalyst inlining: no Python eval operator, and the
    # session-variable cutoff folds into a pushed scan filter.
    plan = _plan(spark, "b112_sql_udf")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LessThanOrEqual(l_quantity,45.0)" in plan


def test_b112_bands_cover_and_sum(spark):
    rows = registry.QUERIES["b112_sql_udf"](spark, SF_CHECK).collect()
    bands = {r["band"] for r in rows}
    assert bands == {"low", "mid", "high"}
    # cutoff 45 keeps 45/50 of a uniform quantity domain
    n = sum(r["n_lines"] for r in rows)
    from iceberg_playground_spark.session import load

    total = load(spark, SF_CHECK, "lineitem").count()
    assert 0.85 * total <= n <= 0.95 * total


# --- c34 HLL rollup -------------------------------------------------------


def test_c34_estimates_within_5pct(spark):
    rows = registry.QUERIES["c34_hll_rollup"](spark, SF_CHECK).collect()
    langs = [r for r in rows if r["lang"] != "__ALL__"]
    glob = [r for r in rows if r["lang"] == "__ALL__"]
    assert len(glob) == 1 and len(langs) >= 3
    for r in rows:
        assert r["exact_distinct"] > 100  # shingles, not the 31-word vocab
        err = abs(r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
        assert err < 0.05, (r["lang"], err)
    # union of sketches can never estimate below its largest member
    assert glob[0]["est_distinct"] >= max(r["est_distinct"] for r in langs) * 0.95


# --- c35 temperature mix --------------------------------------------------


def test_c35_flattens_toward_sqrt_mix(spark):
    rows = {
        r["lang"]: r
        for r in registry.QUERIES["c35_temperature_mix"](
            spark, SF_CHECK
        ).collect()
    }
    n_in = {k: r["n_in"] for k, r in rows.items()}
    n_out = {k: r["n_out"] for k, r in rows.items()}
    # alpha=0.5 upsamples rare langs, downsamples the dominant one
    dominant = max(n_in, key=n_in.get)
    rare = min(n_in, key=n_in.get)
    assert n_out[dominant] < n_in[dominant]
    assert n_out[rare] > n_in[rare]
    # corpus size preserved within the percent-quantization slack
    assert abs(sum(n_out.values()) - sum(n_in.values())) <= 0.03 * sum(
        n_in.values()
    )
    # output share ordering follows sqrt(n_in) ordering
    import math

    sqrt_order = sorted(n_in, key=lambda k: math.sqrt(n_in[k]))
    out_order = sorted(n_out, key=n_out.get)
    assert sqrt_order == out_order


def test_c35_is_deterministic(spark):
    q = registry.QUERIES["c35_temperature_mix"]
    a = sorted(map(tuple, q(spark, SF_CHECK).collect()))
    b = sorted(map(tuple, q(spark, SF_CHECK).collect()))
    assert a == b


# --- TPC-H pack plan shapes ----------------------------------------------


def test_q18_uses_top_k(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "b109_tpch_q18")


def test_q7_q8_no_cartesian_and_broadcast_dims(spark):
    for name in ("b106_tpch_q7", "b107_tpch_q8"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastExchange" in plan, name


def test_q19_pushes_per_side_residuals(spark):
    # each side's OR residual must reach its own scan (brand/size
    # disjunction on part, quantity envelope on lineitem) — only the
    # cross-side conjunctions stay post-join
    plan = _plan(spark, "b110_tpch_q19")
    assert "EqualTo(p_brand,Brand#11" in plan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan


# --- b113 type widening ---------------------------------------------------


def test_widen_rules_and_time_travel(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "w", "id INT, qty INT, score FLOAT")
    t.append(spark.createDataFrame([(1, 10, 1.5)], "id INT, qty INT, score FLOAT"))
    v_narrow = t.current_version()
    t.widen_column("qty", "bigint")
    # old snapshot replays the narrow schema; HEAD serves the wide one
    assert dict(t.read(version=v_narrow).dtypes)["qty"] == "int"
    assert dict(t.read().dtypes)["qty"] == "bigint"
    t.append(spark.createDataFrame([(2, 6_000_000_000)], "id INT, qty BIGINT")
             .withColumn("score", F.lit(2.5).cast("float"))
             .select("id", "qty", "score"))
    got = {r["id"]: r["qty"] for r in t.read().collect()}
    assert got == {1: 10, 2: 6_000_000_000}
    # illegal promotions refuse
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.widen_column("qty", "int")  # narrowing
    with _pytest.raises(ValueError):
        t.widen_column("score", "string")
    with _pytest.raises(ValueError):
        t.widen_column("nope", "bigint")


def test_widen_partition_column_refused(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog
    import pytest as _pytest

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "wp", "id INT, k INT", partition_by=["k"])
    with _pytest.raises(ValueError):
        t.widen_column("k", "bigint")


def test_widen_changelog_conforms_to_window_end(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "wc", "id INT, qty INT")
    t.append(spark.createDataFrame([(1, 10)], "id INT, qty INT"))
    t.widen_column("qty", "bigint")
    t.append(spark.createDataFrame([(2, 7_000_000_000)], "id INT, qty BIGINT"))
    log = t.changelog(0, t.current_version())
    assert dict(log.dtypes)["qty"] == "bigint"
    rows = {(r["commit_version"], r["id"]): r["qty"] for r in log.collect()}
    assert rows[(1, 1)] == 10 and rows[(3, 2)] == 7_000_000_000


# --- b114 metadata-aligned delete ----------------------------------------


def test_delete_range_aligned_is_pure_metadata(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "md", "id INT, grp STRING", partition_by=["grp"])
    t.append(spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id INT, grp STRING"))
    v, s = t.delete_range("grp", "a", "a")
    assert s["metadata_only"] and s["files_dropped"] >= 1
    assert len(t.snapshot(v)["delete_files"]) == 0  # no delete file written
    assert sorted(r["id"] for r in t.read().collect()) == [3, 4]
    # time travel still serves the pre-delete rows
    assert t.read(version=v - 1).count() == 4
    # metadata-only count still works (no MoR state introduced)
    assert t.metadata_count() == 2


def test_delete_range_misaligned_degrades_to_positional(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "md2", "id INT, val INT")
    # two coarse files (vals 0-40 and 50-90) so the 25-55 range cuts
    # through both interiors instead of swallowing single-row files
    t.append(spark.createDataFrame([(i, i * 10) for i in range(10)],
                                   "id INT, val INT").coalesce(2))
    v, s = t.delete_range("val", 25, 55)  # cuts through file interiors
    assert not s["metadata_only"] and s["files_partial"] >= 1
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 2, 6, 7, 8, 9]
    # the changelog window emits exactly the deleted rows as deletes
    log = t.changelog(v - 1, v).collect()
    dels = sorted(r["id"] for r in log if r["change_type"] == "delete")
    assert dels == [3, 4, 5]


def test_delete_range_composes_with_later_append(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "md3", "id INT, grp STRING", partition_by=["grp"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id INT, grp STRING"))
    t.delete_range("grp", "a", "a")
    t.append(spark.createDataFrame([(9, "a")], "id INT, grp STRING"))
    # the dropped partition's key returns via the NEW file only
    assert sorted((r["id"], r["grp"]) for r in t.read().collect()) == [
        (2, "b"), (9, "a")]


# --- b115 drop column ----------------------------------------------------


def test_drop_column_full_lifecycle(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog
    import pytest as _pytest

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "dc", "id INT, name STRING, val INT")
    t.append(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id INT, name STRING, val INT"))
    t.delete_where("name = 'b'", ["name"])
    v_pre = t.current_version()
    t.drop_column("name")
    assert t.read().columns == ["id", "val"]
    assert sorted(tuple(r) for r in t.read().collect()) == [(1, 10)]
    # old snapshots replay the column
    assert t.read(version=v_pre).columns == ["id", "name", "val"]
    # re-add = fresh field: old rows NULL
    t.add_column("name", "string")
    t.append(spark.createDataFrame([(3, 30, "x")],
                                   "id INT, val INT, name STRING"))
    got = {r["id"]: r["name"] for r in t.read().collect()}
    assert got == {1: None, 3: "x"}
    # guards
    with _pytest.raises(ValueError):
        t.drop_column("missing")
    t.drop_column("val")
    t.drop_column("name")
    with _pytest.raises(ValueError):
        t.drop_column("id")  # last visible column


def test_drop_partition_column_refused(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog
    import pytest as _pytest

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "dcp", "id INT, k STRING", partition_by=["k"])
    with _pytest.raises(ValueError):
        t.drop_column("k")


def test_changelog_delete_keyed_on_nonfirst_column_not_transposed(
    spark, tmp_path
):
    # regression: the equality-delete join moves its key columns to the
    # front; a positional conform would transpose values into the wrong
    # columns. Name-aware conform must keep them straight.
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "clt", "id INT, name STRING, val INT")
    t.append(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id INT, name STRING, val INT"))
    v = t.delete_where("val = 20", ["val"])  # keyed on the LAST column
    log = t.changelog(v - 1, v).collect()
    dels = [(r["id"], r["name"], r["val"]) for r in log
            if r["change_type"] == "delete"]
    assert dels == [(2, "b", 20)]


# --- b116 schema-drift append --------------------------------------------


def test_merge_schema_append_atomic_and_null_fill(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog
    import pytest as _pytest

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "dr", "id BIGINT, n INT")
    t.append(spark.createDataFrame([(1, 5)], "id BIGINT, n INT"))
    # drift: n arrives wider AND a new col appears — ONE commit
    v0 = t.current_version()
    v1 = t.append(
        spark.createDataFrame([(2, 8_000_000_000, "x")],
                              "id BIGINT, n BIGINT, tag STRING"),
        merge_schema=True,
    )
    assert v1 == v0 + 1  # atomic: no separate ALTER commit
    assert dict(t.read().dtypes) == {
        "id": "bigint", "n": "bigint", "tag": "string"}
    got = {r["id"]: (r["n"], r["tag"]) for r in t.read().collect()}
    assert got == {1: (5, None), 2: (8_000_000_000, "x")}
    # missing column null-fills; irreconcilable type refuses
    t.append(spark.createDataFrame([(3,)], "id BIGINT"), merge_schema=True)
    assert {r["id"]: r["n"] for r in t.read().collect()}[3] is None
    with _pytest.raises(ValueError):
        t.append(spark.createDataFrame([("s", 1)], "id STRING, n INT"),
                 merge_schema=True)
    # plain append still refuses nothing but writes as-is (unchanged path)
    assert t.read(version=v0).columns == ["id", "n"]


# --- b117 XML / b118 observe ---------------------------------------------


def test_xml_file_source_roundtrip(spark, tmp_path):
    # the file-source half of b117: spark.read.format("xml") with a
    # rowTag recovers typed rows from an XML document
    p = tmp_path / "r.xml"
    p.write_text(
        "<rows>"
        + "".join(
            f"<row><k>{i}</k><name>n{i}</name></row>" for i in range(5)
        )
        + "</rows>"
    )
    df = (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema("k INT, name STRING")
        .load(str(tmp_path))
    )
    assert sorted((r["k"], r["name"]) for r in df.collect()) == [
        (i, f"n{i}") for i in range(5)
    ]


def test_observe_sees_every_row_once(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import Observation
    from iceberg_playground_spark.session import load

    li = load(spark, SF_CHECK, "lineitem")
    obs = Observation()
    li.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()
    assert obs.get["n"] == li.count()


# --- b119 pipe SQL / b120 parameterized SQL -------------------------------


def test_pipe_sql_pushes_filters(spark):
    plan = _plan(spark, "b119_pipe_sql")
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan


def test_parameterized_sql_binds_as_literals(spark):
    # bound parameters must reach the scan as ordinary pushed literals
    plan = _plan(spark, "b120_parameterized_sql")
    assert "EqualTo(o_orderstatus,O)" in plan
    assert "GreaterThanOrEqual(o_totalprice,100000.0)" in plan


# --- b121/b122/b123 -------------------------------------------------------


def test_regression_slope_is_sane(spark):
    # price and quantity are independent in the generator, so the
    # fitted slope must be near zero relative to the intercept (mean
    # price level); n must cover the whole table
    rows = registry.QUERIES["b121_regression_agg"](spark, SF_CHECK).collect()
    from iceberg_playground_spark.session import load

    assert sum(r["n_lines"] for r in rows) == load(
        spark, SF_CHECK, "lineitem"
    ).count()
    for r in rows:
        assert abs(r["slope_cents_per_qty"]) < 0.05 * r["intercept_cents"]


def test_try_arithmetic_null_placement(spark):
    rows = registry.QUERIES["b122_try_arithmetic"](spark, SF_CHECK).collect()
    for r in rows:
        assert r["n_div_null"] >= 0 and r["n_cast_ok"] < r["n_lines"]


def test_bitmap_distinct_equals_naive(spark):
    from iceberg_playground_spark.session import load
    import pyspark.sql.functions as F

    got = {
        r["l_returnflag"]: r["n_distinct_parts"]
        for r in registry.QUERIES["b123_bitmap_distinct"](
            spark, SF_CHECK
        ).collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in load(spark, SF_CHECK, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == want


# --- RocksDB state store -------------------------------------------------


def test_stateful_agg_on_rocksdb_state_store(spark, tmp_path):
    # the large-state scale path: RocksDB-backed state keeps streaming
    # aggregation state off-heap (100 TB streams outgrow the in-memory
    # HDFS-backed provider). Same drained result as batch GROUP BY.
    from iceberg_playground_spark.queries.streaming import _stream_events
    from iceberg_playground_spark.session import load

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = _stream_events(spark, SF_CHECK)
        agg = ev.groupBy("event_type").count()
        q = (
            agg.writeStream.format("memory")
            .queryName("rocks_agg")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["event_type"]: r["count"]
            for r in spark.sql("SELECT * FROM rocks_agg").collect()
        }
        want = {
            r["event_type"]: r["n"]
            for r in load(spark, SF_CHECK, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want and len(got) >= 3
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


# --- plan pins for round-6 ops -------------------------------------------


def test_c35_no_cartesian_and_bounded_scans(spark):
    plan = _plan(spark, "c35_temperature_mix")
    assert "CartesianProduct" not in plan
    # corpus is read at most twice (counts pass + replica pass); the
    # tiny rates frame joins broadcast
    assert plan.count("Scan parquet") <= 3
    assert "BroadcastExchange" in plan


def test_b123_aggregates_bitmaps_not_values(spark):
    # the exchange must move bitmaps, not key values: a map-side
    # PARTIAL bitmap aggregate runs below the shuffle (bitmap buffers
    # lower to SortAggregate — binary buffers can't hash-agg), with
    # the bucket-count sum stacked above
    plan = _plan(spark, "b123_bitmap_distinct")
    assert "partial_bitmap_construct_agg" in plan
    assert "bitmap_construct_agg" in plan
    assert plan.count("HashAggregate") >= 2  # the count-sum level


# --- p15 packing spans ---------------------------------------------------


def test_p15_spans_reconstruct_packs(spark):
    rows = registry.QUERIES["p15_packing_spans"](spark, SF_CHECK).collect()
    c19 = {
        (r["lang"], r["shard"], r["pack_id"]): (r["n_docs"], r["pack_tokens"])
        for r in registry.QUERIES["c19_sequence_packing"](
            spark, SF_CHECK
        ).collect()
    }
    for r in rows:
        spans = r["spans"].split(" ")
        assert len(spans) == r["n_docs"]
        tok_sum = spill = 0
        for sp in spans:
            doc, rest = sp.split(":")
            start, ln = map(int, rest.split("+"))
            assert 0 <= start < 512  # every doc STARTS inside its window
            tok_sum += ln
            spill += max(0, start + ln - 512)
        assert tok_sum == r["pack_tokens"]
        assert spill == r["spill_tokens"]
        # agrees with c19's packing (same order, same shards, same cuts)
        assert c19[(r["lang"], r["shard"], r["pack_id"])] == (
            r["n_docs"], r["pack_tokens"])


# --- b124 LOCF / b125 SCD2 ------------------------------------------------


def test_locf_purchase_rows_carry_own_price(spark):
    rows = {r["event_type"]: r for r in registry.QUERIES["b124_locf_fill"](
        spark, SF_CHECK).collect()}
    # every purchase row has a price (its own); click/view inherit one
    # unless they precede the user's first purchase
    p = rows["purchase"]
    assert p["n_with_price"] == p["n_events"]
    for t in ("click", "view"):
        assert 0 < rows[t]["n_with_price"] <= rows[t]["n_events"]


def test_scd2_join_is_equi_not_cartesian(spark):
    plan = _plan(spark, "b125_scd2_lookup")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the user_id equi key anchors the join; interval bounds are residual
    assert "user_id" in plan.split("Join")[1][:400]


def test_scd2_versions_partition_time(spark):
    # each fact matches AT MOST one dimension version (intervals are
    # disjoint per user), so n_facts never exceeds the fact count
    from iceberg_playground_spark.session import load

    rows = registry.QUERIES["b125_scd2_lookup"](spark, SF_CHECK).collect()
    n_facts = sum(r["n_facts"] for r in rows)
    total = (
        load(spark, SF_CHECK, "events")
        .filter("event_type IN ('click','view')")
        .count()
    )
    assert n_facts <= total


# --- b126 incremental aggregate maintenance -------------------------------


def test_incremental_agg_drops_emptied_group_and_matches(spark):
    rows = registry.QUERIES["b126_incremental_agg"](spark, SF_CHECK).collect()
    statuses = {r["status"] for r in rows}
    # the delete emptied 'P' entirely (non-upserted P rows deleted,
    # upserted ones moved to 'X'): the maintained view must DROP the
    # group, not keep an n=0 row
    assert "P" not in statuses and "X" in statuses
    assert all(r["matches_full_recompute"] for r in rows)
    assert all(r["n_orders"] > 0 for r in rows)


# --- p16 dataset card ----------------------------------------------------


def test_dataset_card_internally_consistent(spark):
    rows = registry.QUERIES["p16_dataset_card"](spark, SF_CHECK).collect()
    card = {(r["metric"], r["scope"]): r["value"] for r in rows}
    total = card[("docs", "__corpus__")]
    # split docs partition the corpus; lang docs partition it too
    assert sum(card[("docs", s)] for s in ("train", "val", "test")) == total
    langs = [k[1] for k in card if k[0] == "docs"
             and k[1] not in ("__corpus__", "train", "val", "test")]
    assert sum(card[("docs", l)] for l in langs) == total
    assert card[("langs", "__corpus__")] == len(langs)
    # near-dup mass can only exceed exact-dup mass; this corpus is
    # near-dup-dominated (p13's finding: a fingerprint tail where
    # exact hashing sees nothing)
    assert (card[("fingerprint_dup_docs", "__corpus__")]
            >= card[("exact_dup_docs", "__corpus__")] >= 0)
    assert card[("fingerprint_dup_docs", "__corpus__")] > 0


# --- c36 product quantization --------------------------------------------


def test_pq_contract(spark):
    rows = registry.QUERIES["c36_product_quantization"](
        spark, SF_CHECK
    ).collect()
    assert len(rows) == 10
    by_rank = {r["rank"]: r for r in rows}
    # the probe's own vector (exact distance 0) must survive
    # quantization to rank 1 on both sides
    assert by_rank[1]["pq_pick"] == 0 and by_rank[1]["exact_pick"] == 0
    assert by_rank[1]["hit"]
    # k-means trained: inertia strictly dropped from the seeded init
    r0 = rows[0]
    assert r0["inertia_final_micro"] < r0["inertia_init_micro"]
    assert r0["recall_hits_at_10"] >= 1
    assert r0["recall_hits_at_10"] == sum(1 for r in rows if r["hit"])


# --- b129 CTAS / RTAS -----------------------------------------------------


def test_rtas_keeps_history_and_changelog_shows_swap(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table_as(
        "ns", "ct",
        spark.createDataFrame([(1, "a"), (2, "b")], "id INT, tag STRING"),
    )
    v1 = t.current_version()
    v2 = t.replace_as(
        spark.createDataFrame([(10, 3.5)], "k BIGINT, score DOUBLE")
    )
    # new shape at HEAD; old snapshot reads under its own schema
    assert t.read().columns == ["k", "score"]
    assert sorted(tuple(r) for r in t.read().collect()) == [(10, 3.5)]
    assert t.read(version=v1).columns == ["id", "tag"]
    assert t.read(version=v1).count() == 2
    # the changelog renders the swap as full delete + full insert,
    # conformed to the window-end schema (old columns vanish)
    log = t.changelog(v1, v2).collect()
    kinds = sorted((r["change_type"], r["k"]) for r in log)
    assert kinds == [("delete", None), ("delete", None), ("insert", 10)]


def test_rtas_refuses_to_drop_partition_column(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog
    import pytest as _pytest

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("ns", "cp", "id INT, k STRING", partition_by=["k"])
    t.append(spark.createDataFrame([(1, "x")], "id INT, k STRING"))
    with _pytest.raises(ValueError):
        t.replace_as(spark.createDataFrame([(2,)], "id INT"))


# --- b130 join hints / b131 cache ----------------------------------------


def test_join_hints_change_strategy_not_rows(spark):
    from iceberg_playground_spark.session import register_views

    register_views(spark, SF_CHECK)
    base = "SELECT {h} count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    plans = {}
    for h, op in [
        ("/*+ BROADCAST(orders) */", "BroadcastHashJoin"),
        ("/*+ SHUFFLE_MERGE(orders) */", "SortMergeJoin"),
        ("/*+ SHUFFLE_HASH(orders) */", "ShuffledHashJoin"),
    ]:
        df = spark.sql(base.format(h=h))
        rows = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert op in plan, (h, plan[:600])
        plans[h] = rows[0]["n"]
    assert len(set(plans.values())) == 1  # strategy never changes rows


def test_cached_scan_uses_memory_store(spark):
    from iceberg_playground_spark.session import load
    li = load(spark, SF_CHECK, "lineitem").select("l_returnflag").cache()
    try:
        li.count()  # populate
        df = li.groupBy("l_returnflag").count()
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        li.unpersist()


# --- c37 bigram LM --------------------------------------------------------


def test_bigram_lm_invariants(spark):
    from iceberg_playground_spark.session import load

    rows = registry.QUERIES["c37_bigram_lm_score"](spark, SF_CHECK).collect()
    docs = load(spark, SF_CHECK, "documents")
    assert len(rows) == docs.count()  # every doc has >= 2 tokens here
    tok_counts = {
        r["doc_id"]: r["n"]
        for r in docs.selectExpr(
            "doc_id", "size(split(text, ' ')) AS n"
        ).collect()
    }
    for r in rows:
        assert r["avg_logprob"] < 0  # log-probabilities
        assert r["n_bigrams"] == tok_counts[r["doc_id"]] - 1
