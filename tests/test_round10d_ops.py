"""Round-10 fourth-batch semantics (c68): the batch-perceptron
training loop against an independent Python replay, plus the
perceptron-specific invariants an oracle diff would not localize."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_SMOKE  # noqa: E402


def _py_perceptron(docs, d, epochs, target, salt):
    """Independent batch-perceptron replay: plain dicts, no shared
    code with the query under test."""
    feats = []
    for did, source, text in docs:
        y = 1 if source == target else -1
        cnt: dict[int, int] = {}
        for tok in text.split(" "):
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % d
            cnt[b] = cnt.get(b, 0) + 1
        feats.append((did, y, cnt))
    w = [0] * d
    out = []
    for epoch in range(1, epochs + 1):
        mis = [
            (y, cnt)
            for _, y, cnt in feats
            if y * sum(w[b] * c for b, c in cnt.items()) <= 0
        ]
        for y, cnt in mis:
            for b, c in cnt.items():
                w[b] += y * c
        out.append(
            (
                epoch,
                len(mis),
                sum((b + salt) * v for b, v in enumerate(w)),
                sum(abs(v) for v in w),
                sum(1 for v in w if v != 0),
            )
        )
    return out


def test_c68_matches_independent_python_trainer(spark):
    from iceberg_playground_spark.queries.round10d import (
        _C68_D, _C68_EPOCHS, _C68_SALT, _C68_TARGET,
    )

    docs = [
        (r["doc_id"], r["source"], r["text"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    ]
    want = _py_perceptron(docs, _C68_D, _C68_EPOCHS, _C68_TARGET, _C68_SALT)
    got = [
        tuple(r)
        for r in registry.QUERIES["c68_perceptron_train"](
            spark, SF_SMOKE
        ).orderBy("epoch").collect()
    ]
    assert got == want


def test_c68_training_trajectory_invariants(spark):
    rows = (
        registry.QUERIES["c68_perceptron_train"](spark, SF_SMOKE)
        .orderBy("epoch")
        .collect()
    )
    n_docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    )
    # w_0 = 0 scores everything 0, and y*0 <= 0: epoch 1 must update on
    # the WHOLE corpus — the batch-perceptron cold-start contract
    assert rows[0]["n_errors"] == n_docs
    # the classifier must actually learn: the last epoch's error count
    # is strictly below the cold start (deterministic on this corpus)
    assert rows[-1]["n_errors"] < rows[0]["n_errors"]
    for r in rows:
        assert r["w_nnz"] <= 64
        assert r["w_abs"] >= abs(r["w_checksum"]) // (64 + 1001)


def test_c68_scoring_pass_is_joinless(spark):
    # the incoming weights enter as a literal array indexed by bucket —
    # no weight-table join may exist in the scoring aggregate
    from iceberg_playground_spark.queries.round10d import _C68_D

    feats = spark.createDataFrame(
        [(1, 1, 3, 2)], "doc_id LONG, y INT, bucket LONG, cnt LONG"
    )
    warr = F.array(*[F.lit(i).cast("bigint") for i in range(_C68_D)])
    contrib = F.element_at(warr, (F.col("bucket") + 1).cast("int"))
    scored = feats.groupBy("doc_id", "y").agg(
        F.sum(contrib * F.col("cnt")).alias("score")
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert scored.head()["score"] == 6  # w[3]=3 times cnt=2


# --- c69 PMI collocations ------------------------------------------------------


def test_c69_matches_independent_python_pmi(spark):
    import collections
    import math

    from iceberg_playground_spark.queries.round10d import (
        _C69_MIN_CNT, _C69_TOPK,
    )

    uni: collections.Counter = collections.Counter()
    bg: collections.Counter = collections.Counter()
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
    ):
        toks = r["text"].split(" ")
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    n_tok, n_pair = sum(uni.values()), sum(bg.values())
    scored = []
    for (a, b), c2 in bg.items():
        if c2 < _C69_MIN_CNT:
            continue
        pmi = round(
            1e6 * math.log(
                (float(c2) * n_tok * n_tok)
                / (float(n_pair) * uni[a] * uni[b])
            )
        )
        scored.append((-pmi, f"{a} {b}", c2, uni[a], uni[b]))
    want = [
        (pair, c2, ca, cb, -negp, rank)
        for rank, (negp, pair, c2, ca, cb) in enumerate(
            sorted(scored)[:_C69_TOPK], start=1
        )
    ]
    got = [
        (
            r["pair"], r["pair_count"], r["left_count"],
            r["right_count"], r["pmi_micro"], r["pmi_rank"],
        )
        for r in registry.QUERIES["c69_pmi_collocations"](
            spark, SF_SMOKE
        ).orderBy("pmi_rank").collect()
    ]
    assert got == want


def test_c69_count_floor_holds(spark):
    from iceberg_playground_spark.queries.round10d import _C69_MIN_CNT

    rows = registry.QUERIES["c69_pmi_collocations"](
        spark, SF_SMOKE
    ).collect()
    assert rows
    assert all(r["pair_count"] >= _C69_MIN_CNT for r in rows)
    # PMI is symmetric in scale: counts in the output must be the real
    # marginals (each >= the pair count)
    assert all(
        r["left_count"] >= r["pair_count"]
        and r["right_count"] >= r["pair_count"]
        for r in rows
    )


# --- p35 budget rebalance --------------------------------------------------------


def test_p35_matches_independent_waterfill(spark):
    import collections
    import math

    from iceberg_playground_spark.queries.round10d import (
        _P35_CAP_EPOCHS, _P35_MULT, _P35_ROUNDS,
    )

    cells: collections.Counter = collections.Counter()
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "lang", "text")
        .collect()
    ):
        cells[(r["source"], r["lang"])] += len(r["text"].split(" "))
    w = {k: math.floor(math.sqrt(float(v)) * 1e6) for k, v in cells.items()}
    cap = {k: _P35_CAP_EPOCHS * v for k, v in cells.items()}
    budget = _P35_MULT * sum(cells.values())
    capped = {k: False for k in cells}
    alloc = {k: 0 for k in cells}
    for _ in range(_P35_ROUNDS):
        free_w = sum(w[k] for k in cells if not capped[k])
        rem = budget - sum(cap[k] for k in cells if capped[k])
        for k in cells:
            if capped[k]:
                continue
            share = (rem * w[k]) // free_w if free_w > 0 else cap[k]
            alloc[k] = min(cap[k], share)
            if share > cap[k]:
                capped[k] = True
    out = {
        (r["source"], r["lang"]): r
        for r in registry.QUERIES["p35_budget_rebalance"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(out) == set(cells)
    for k, row in out.items():
        assert row["final_tok"] == alloc[k]
        assert row["capped"] == capped[k]
        assert row["cap_tok"] == cap[k]
        assert row["final_tok"] <= row["cap_tok"]
        assert row["final_epochs_micro"] <= _P35_CAP_EPOCHS * 1_000_000
    # the rebalance never over-spends the plan
    assert sum(r["final_tok"] for r in out.values()) <= budget
    # and the freed budget actually moved: on this corpus some cells
    # cap, and every capped cell sits exactly at its cap
    if any(r["capped"] for r in out.values()):
        for r in out.values():
            if r["capped"]:
                assert r["final_tok"] == r["cap_tok"]
