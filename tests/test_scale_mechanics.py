"""Cluster-scale mechanics, proven at test scale: AQE skew-join
splitting and dynamic partition pruning. These are the runtime
behaviors the 100 TB story leans on beyond static plan shapes — the
repo's own ops rely on them (b73 documents AQE skew-split as the
dynamic counterpart of its static salting; b67/b61 cover STATIC
pruning, DPP is the runtime variant driven by a dim filter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_playground_spark.session import load
from tests.conftest import SF_CHECK


@pytest.fixture()
def restore_conf(spark):
    keys = [
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(restore_conf):
    spark = restore_conf
    # 90% of the fact lands on ONE key — the straggler that kills a
    # naive shuffle join at scale. With sort-merge forced (broadcast
    # off) and toy thresholds, AQE must mark and split the partition.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "100",
    )
    # the advisory size is the SPLIT target: it must sit well below the
    # hot partition's bytes or AQE has nothing to split into
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "800"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE splits a skewed REDUCE partition along MAP-output boundaries
    # (PartialReducerPartitionSpec), so an input that is one file = one
    # mapper can never split — the repartition(8) manufactures the
    # multi-mapper layout any real table has at scale. (Found the hard
    # way: without it the rule silently declines and only coalesces.)
    li = (
        load(spark, SF_CHECK, "lineitem")
        .repartition(8)
        .select(
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_extendedprice",
        )
    )
    dim = load(spark, SF_CHECK, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    joined = li.join(dim, "k")
    # materialize THIS frame's own execution: AQE finalizes the plan
    # per action, so a fresh count() would inspect an unexecuted copy
    rows = joined.collect()
    assert len(rows) > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    # runtime pruning: the fact is hive-partitioned on l_returnflag;
    # a selective dim filter must prune fact PARTITIONS via a runtime
    # subquery (b67 proves the static variant from a literal filter)
    fact_dir = str(tmp_path / "fact")
    load(spark, SF_CHECK, "lineitem").write.partitionBy(
        "l_returnflag"
    ).parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "none")],
        "flag STRING, label STRING",
    )
    q = fact.join(
        dim.filter(F.col("label") == "returned"),
        fact["l_returnflag"] == dim["flag"],
    ).agg(F.count("*").alias("n"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    n = q.collect()[0]["n"]
    want = (
        load(spark, SF_CHECK, "lineitem")
        .filter("l_returnflag = 'R'")
        .count()
    )
    assert n == want
