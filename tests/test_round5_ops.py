"""Round-5 operator semantics: CDC changelog, z-order/partition-spec
grading, hyperplane LSH, deterministic sampling, minhash accuracy,
split drift. Cross-engine value equality lives in test_correctness
(every registered oracle); these pin the semantic invariants the
oracles cannot see (changelog vs compaction, pruning counts,
estimator error bounds, determinism under re-run)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_playground_spark import registry
from iceberg_playground_spark.tables import LakeCatalog

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402


def test_changelog_semantics(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "cdc", "k INT, v STRING")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"))
    t.upsert(
        spark.createDataFrame([(2, "B"), (3, "c")], "k INT, v STRING"),
        ["k"],
    )  # v2: delete old (2,b), insert (2,B),(3,c)
    t.delete_where("k = 1", ["k"])  # v3: delete (1,a)
    t.compact(target_files=1)  # v4: must not appear
    rows = {
        (r["commit_version"], r["change_type"], r["k"], r["v"])
        for r in t.changelog(1, t.current_version()).collect()
    }
    assert rows == {
        (2, "delete", 2, "b"),
        (2, "insert", 2, "B"),
        (2, "insert", 3, "c"),
        (3, "delete", 1, "a"),
    }
    # empty window and the full-from-zero window both behave
    assert t.changelog(3, 4).count() == 0  # only the compact in range
    full = t.changelog(0, 3)
    ins = full.filter("change_type = 'insert'").count()
    assert ins == 4  # v1: 2 appends; v2: 2 upsert appends


def test_changelog_empty_table_schema(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "cdc0", "k INT, v STRING")
    df = t.changelog(0, 0)
    assert df.columns == ["commit_version", "change_type", "k", "v"]
    assert df.count() == 0


def test_b88_prunes_both_dims(spark):
    out = registry.QUERIES["b88_zorder_skipping"](spark, SF_CHECK).collect()
    assert len(out) == 1
    r = out[0]
    assert r["x_pruned"] and r["y_pruned"]
    assert r["n_rows"] > 0


def test_b89_old_layout_prunes_by_footer(spark):
    rows = registry.QUERIES["b89_partition_evolution"](
        spark, SF_CHECK
    ).collect()
    assert {r["n_regionkey"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(r["old_layout_pruned"] for r in rows)
    assert all(r["pruned_to_one_partition"] for r in rows)


def test_c29_bucket_arithmetic(spark):
    rows = registry.QUERIES["c29_hyperplane_lsh"](spark, SF_CHECK).collect()
    assert {r["band"] for r in rows} == {0, 1, 2, 3}
    from iceberg_playground_spark.session import load

    n = load(spark, SF_CHECK, "embeddings").count()
    for r in rows:
        # bucket sizes partition the corpus within each band
        assert 1 <= r["n_buckets"] <= 16  # 4-bit band values
        assert r["max_bucket"] <= n
        # blocking must beat all-pairs by a wide margin
        assert r["n_candidate_pairs"] < n * (n - 1) // 2


def test_c30_deterministic_and_bounded(spark):
    q = registry.QUERIES["c30_group_sample"]
    a = q(spark, SF_CHECK).collect()
    b = q(spark, SF_CHECK).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # re-run stable
    per_lang: dict[str, int] = {}
    for r in a:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert 1 <= r["sample_rank"] <= 32
    assert all(v <= 32 for v in per_lang.values())


def test_c31_estimator_is_calibrated(spark):
    rows = registry.QUERIES["c31_minhash_estimate"](
        spark, SF_CHECK
    ).collect()
    assert rows, "corpus should contain >=0.3-jaccard pairs"
    # k=32 agreement: per-pair stderr is sqrt(j(1-j)/32) <= 0.09;
    # 4-sigma bound catches a broken permutation family without
    # flaking on legitimate sampling noise.
    for r in rows:
        assert abs(r["mh_est"] - r["jaccard"]) <= 0.36
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err <= 0.12


def test_c02_permutations_are_distinct(spark):
    # The arity-fix regression guard: 16 REAL permutations must
    # produce >1 distinct component for typical docs (the degenerate
    # index-seeded form made all 16 identical per doc).
    from iceberg_playground_spark.queries.llm import (
        _seeded_minhash_expr,
        _shingles,
        _tokens,
    )
    from iceberg_playground_spark.session import load

    d = load(spark, SF_CHECK, "documents").limit(50)
    sh = d.select(_shingles(_tokens()).alias("sh")).filter(F.size("sh") > 3)
    perms = ", ".join(_seeded_minhash_expr("sh", i) for i in range(16))
    sig = sh.select(F.expr(f"array({perms})").alias("sig"))
    distinct_counts = [
        len(set(r["sig"])) for r in sig.collect()
    ]
    assert all(c > 1 for c in distinct_counts)


def test_p12_shares_sum_to_thousand(spark):
    rows = registry.QUERIES["p12_split_drift"](spark, SF_CHECK).collect()
    langs = {r["lang"] for r in rows}
    assert len(langs) == len(rows) >= 2
    # integer floor division: per-side shares sum to 1000 - (#langs-1)..1000
    ts = sum(r["train_share_pm"] for r in rows)
    es = sum(r["eval_share_pm"] for r in rows)
    assert 1000 - len(rows) < ts <= 1000
    assert 1000 - len(rows) < es <= 1000
    for r in rows:
        assert r["drift_pm"] == abs(
            r["train_share_pm"] - r["eval_share_pm"]
        )
