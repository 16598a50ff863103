"""Round-10 third-batch operator semantics (b158/c67/p34): the
partitions metadata table's zero-I/O contract, triplet mining against
a brute-force reference, and the composed release report against an
independent end-to-end Python replay."""

from __future__ import annotations

import collections
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from iceberg_playground_spark import registry
from iceberg_playground_spark.tables import LakeCatalog

registry.load_all()

from tests.conftest import SF_CHECK, SF_SMOKE  # noqa: E402


def _bucket100(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 100


# --- b158 partitions metadata -------------------------------------------------


def test_b158_partitions_counts_match_data(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", "pt", "k BIGINT, g STRING",
        drop_if_exists=True, partition_by=["g"],
    )
    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(20)], "k BIGINT, g STRING"
    )
    t.append(df.repartition("g"))
    got = {
        r["partition"]: (r["n_files"], r["n_rows"])
        for r in t.partitions().collect()
    }
    assert got == {"g=a": (1, 10), "g=b": (1, 10)}


def test_b158_unpartitioned_table_reports_one_row(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "up", "k BIGINT", drop_if_exists=True)
    t.append(spark.range(7).select(F.col("id").alias("k")).coalesce(1))
    rows = t.partitions().collect()
    assert len(rows) == 1
    assert rows[0]["partition"] == ""
    assert rows[0]["n_rows"] == 7


def test_b158_null_partition_reports_under_hive_sentinel(spark, tmp_path):
    # NULL partition values land in the __HIVE_DEFAULT_PARTITION__
    # directory; the partitions table must report them as their own
    # partition (Iceberg reports a null partition record the same way)
    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", "np", "k BIGINT, g STRING",
        drop_if_exists=True, partition_by=["g"],
    )
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, None)], "k BIGINT, g STRING"
        ).repartition("g")
    )
    got = {
        r["partition"]: (r["n_files"], r["n_rows"])
        for r in t.partitions().collect()
    }
    assert got == {
        "g=__HIVE_DEFAULT_PARTITION__": (1, 2),
        "g=a": (1, 1),
    }


def test_b158_partition_drop_is_metadata_only_and_reflected(spark):
    registry.QUERIES["b158_partitions_metadata"](spark, SF_CHECK)
    from iceberg_playground_spark.queries.lakehouse import _BUILT

    t = _BUILT[(spark.sparkContext.applicationId, SF_CHECK, "b158")]
    head = t.snapshot(t.current_version())
    # the aligned drop committed no delete files and rewrote nothing —
    # F's files simply left the snapshot's file list
    assert head["summary"]["operation"] == "delete-aligned"
    assert head["summary"]["metadata_only"] is True
    assert head["delete_files"] == []
    parts = {r["partition"] for r in t.partitions().collect()}
    assert parts == {"o_orderstatus=O", "o_orderstatus=P"}
    # time travel still serves the pre-drop partition
    before = {
        r["partition"]
        for r in t.partitions(version=2).collect()
    }
    assert "o_orderstatus=F" in before


# --- c67 triplet mining ---------------------------------------------------------


def test_c67_matches_brute_force(spark):
    from iceberg_playground_spark.queries.round10c import (
        _C67_ANCHORS, _C67_SCALE,
    )

    vecs = [
        (
            int(r["vec_id"]),
            r["label"],
            [math.floor(float(x) * _C67_SCALE) for x in r["embedding"]],
        )
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    ]
    want = []
    for aid, alabel, aq in vecs:
        if aid >= _C67_ANCHORS:
            continue
        best = {}
        for vid, label, q in vecs:
            if vid == aid:
                continue
            d = sum((x - y) ** 2 for x, y in zip(q, aq))
            key = label == alabel
            if key not in best or (d, vid) < best[key]:
                best[key] = (d, vid)
        want.append(
            (
                aid, alabel,
                best[True][1], best[True][0],
                best[False][1], best[False][0],
                best[False][0] - best[True][0],
            )
        )
    got = sorted(
        tuple(r) for r in registry.QUERIES["c67_triplet_mining"](
            spark, SF_SMOKE
        ).collect()
    )
    assert got == sorted(want)


# --- p34 release report ---------------------------------------------------------


def test_p34_matches_independent_pipeline_replay(spark):
    flags = {
        r["doc_id"]: r["pass"] == 1
        for r in registry.QUERIES["p29_gopher_quality_rules"](
            spark, SF_SMOKE
        ).collect()
    }
    docs = [
        (
            r["doc_id"], r["lang"],
            hashlib.md5(r["text"].encode()).hexdigest(),
            len(r["text"].split(" ")),
        )
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    rep: dict[str, int] = {}
    canon: dict[str, int] = {}
    for did, _, fp, _ in docs:
        rep[fp] = min(rep.get(fp, did), did)
        if flags[did]:
            canon[fp] = min(canon.get(fp, did), did)
    agg: dict[tuple, list] = {}
    for did, lang, fp, ntok in docs:
        b = _bucket100(f"p32:{rep[fp]}")
        split = "train" if b < 80 else "validation" if b < 90 else "test"
        row = agg.setdefault((split, lang), [0, 0, 0, 0, 0])
        row[0] += 1
        if not flags[did]:
            row[1] += 1
        elif did != canon[fp]:
            row[2] += 1
        else:
            row[3] += 1
            row[4] += ntok
    got = {
        (r["split"], r["lang"]): (
            r["docs_in"], r["quality_drops"], r["dup_drops"],
            r["kept_docs"], r["kept_tokens"],
        )
        for r in registry.QUERIES["p34_release_report_v3"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_p34_agrees_with_standalone_split_op(spark):
    # the release report and p32 share the split stamp: per-split doc
    # totals must agree exactly
    p32 = {
        r["split"]: r["n_docs"]
        for r in registry.QUERIES["p32_leakage_safe_split"](
            spark, SF_SMOKE
        ).collect()
    }
    p34 = collections.Counter()
    for r in registry.QUERIES["p34_release_report_v3"](
        spark, SF_SMOKE
    ).collect():
        p34[r["split"]] += r["docs_in"]
    assert dict(p34) == p32


def test_p34_fates_partition_docs_in(spark):
    for r in registry.QUERIES["p34_release_report_v3"](
        spark, SF_SMOKE
    ).collect():
        assert (
            r["quality_drops"] + r["dup_drops"] + r["kept_docs"]
            == r["docs_in"]
        )
        assert r["kept_docs"] > 0 or r["kept_tokens"] == 0
