"""Round-10 tail operator semantics (c64/c65/c66/p33): each is pinned
against an independent Python reference at sf0.001 plus the invariant
an oracle diff alone would not localize (unk accounting, model
boundedness, fixed-point exactness, budget arithmetic)."""

from __future__ import annotations

import collections
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_SMOKE  # noqa: E402


def _md5_bucket(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


# --- c64 tokenizer fertility --------------------------------------------------


def test_c64_consistent_with_c51_per_doc_counts(spark):
    # the per-lang subtoken totals must equal c51's per-doc n_tokens
    # summed by language — same vocabulary, same greedy match
    per_doc = {
        r["doc_id"]: r["n_tokens"]
        for r in registry.QUERIES["c51_tokenizer_apply"](
            spark, SF_SMOKE
        ).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    want: collections.Counter = collections.Counter()
    for did, n in per_doc.items():
        want[langs[did]] += n
    out = registry.QUERIES["c64_tokenizer_fertility"](
        spark, SF_SMOKE
    ).collect()
    assert {r["lang"]: r["n_subtokens"] for r in out} == dict(want)
    for r in out:
        assert r["fertility_micro"] == (
            1_000_000 * r["n_subtokens"] // r["n_words"]
        )
        # this corpus' alphabet is fully covered by the vocabulary —
        # verified, not assumed
        assert r["n_unk"] == 0
        # a subword tokenizer never exceeds character count and never
        # beats one token per word
        assert r["n_words"] <= r["n_subtokens"]


def test_c64_unk_counting_actually_counts(spark):
    # prove the n_unk column carries signal: an out-of-alphabet char
    # must tokenize to id 0 and be counted
    from iceberg_playground_spark.queries.round9 import _c51_token_expr

    df = spark.createDataFrame([("café ok",)], "text string")
    ids = df.select(F.expr(_c51_token_expr()).alias("ids")).head()["ids"]
    assert 0 in ids  # the é fell back to <unk>


# --- c65 bigram perplexity ----------------------------------------------------


def test_c65_matches_independent_python_model(spark):
    from iceberg_playground_spark.queries.round10b import _C65_B

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    bigrams: dict[int, list] = {}
    model: collections.Counter = collections.Counter()
    prev_tot: collections.Counter = collections.Counter()
    for did, toks in docs.items():
        b = [_md5_bucket(t, _C65_B) for t in toks]
        pcs = list(zip(b, b[1:]))
        bigrams[did] = pcs
        for pc in pcs:
            model[pc] += 1
            prev_tot[pc[0]] += 1
    # the independent model evaluates ln through the SAME fixed-point
    # integer kernel the op deploys (round 13: libm left the graded
    # contract) — int_ln_micro_py is itself grid-tested against
    # math.log in tests/test_int_ln_kernel.py
    from iceberg_playground_spark.queries._util import int_ln_micro_py

    nll = {
        pc: int_ln_micro_py(c + 1, prev_tot[pc[0]] + _C65_B)
        for pc, c in model.items()
    }
    out = {
        r["doc_id"]: r
        for r in registry.QUERIES["c65_bigram_perplexity"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(out) == {d for d, pcs in bigrams.items() if pcs}
    for did, row in out.items():
        total = sum(nll[pc] for pc in bigrams[did])
        assert row["n_bigrams"] == len(bigrams[did])
        assert row["nll_total_micro"] == total
        assert row["avg_nll_micro"] == math.floor(total / len(bigrams[did]))


def test_c65_nll_respects_smoothed_probability_bounds(spark):
    # every per-doc average must be a genuine smoothed-probability
    # negative log-likelihood: positive (P < 1 everywhere once
    # smoothing spreads mass) and at most ln(N + B) micro-nats (the
    # rarest possible transition is (cnt+1)/(prev_tot+B) >= 1/(N+B))
    from iceberg_playground_spark.queries.round10b import _C65_B

    rows = registry.QUERIES["c65_bigram_perplexity"](
        spark, SF_SMOKE
    ).collect()
    assert rows
    n_total = sum(r["n_bigrams"] for r in rows)
    cap = 1e6 * math.log(n_total + _C65_B)
    assert all(0 < r["avg_nll_micro"] <= cap for r in rows)


# --- c66 embedding outliers ---------------------------------------------------


def test_c66_matches_brute_force(spark):
    from iceberg_playground_spark.queries.round10b import (
        _C66_SCALE, _C66_TOPK,
    )

    vecs = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    by_label: dict[str, list] = {}
    for r in vecs:
        q = [math.floor(float(x) * _C66_SCALE) for x in r["embedding"]]
        by_label.setdefault(r["label"], []).append((int(r["vec_id"]), q))
    want = []
    for label, members in by_label.items():
        n = len(members)
        dim = len(members[0][1])
        cent = [
            math.floor(sum(m[1][i] for m in members) / n)
            for i in range(dim)
        ]
        dists = sorted(
            (
                (-sum((qi - ci) ** 2 for qi, ci in zip(q, cent)), vid)
                for vid, q in members
            )
        )
        for rank, (negd, vid) in enumerate(dists[:_C66_TOPK], start=1):
            want.append((label, vid, -negd, rank))
    got = sorted(
        (r["label"], r["vec_id"], r["sq_dist"], r["outlier_rank"])
        for r in registry.QUERIES["c66_embedding_outliers"](
            spark, SF_SMOKE
        ).collect()
    )
    assert got == sorted(want)


# --- p33 epoch budget report ----------------------------------------------------


def test_p33_matches_independent_budget_math(spark):
    from iceberg_playground_spark.queries.round10b import _P33_MULT

    cells: collections.Counter = collections.Counter()
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "lang", "text")
        .collect()
    ):
        cells[(r["source"], r["lang"])] += len(r["text"].split(" "))
    w = {
        k: math.floor(math.sqrt(float(v)) * 1_000_000)
        for k, v in cells.items()
    }
    tot_w, tot_tok = sum(w.values()), sum(cells.values())
    out = {
        (r["source"], r["lang"]): r
        for r in registry.QUERIES["p33_epoch_budget_report"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(out) == set(cells)
    for k, row in out.items():
        budget = math.floor(w[k] / tot_w * _P33_MULT * tot_tok)
        epochs = 1_000_000 * budget // cells[k]
        assert row["cell_tok"] == cells[k]
        assert row["w_micro"] == w[k]
        assert row["budget_tok"] == budget
        assert row["epochs_micro"] == epochs
        assert row["over_replay"] == (epochs > 4_000_000)
    # temperature flattening: the allotted budgets must sum to ~the
    # 2x-corpus target (floors lose at most |cells| tokens)
    assert 0 <= _P33_MULT * tot_tok - sum(
        r["budget_tok"] for r in out.values()
    ) <= len(cells)
    # and sqrt-weighting must give SMALL cells more epochs than large
    smallest = min(out, key=lambda k: out[k]["cell_tok"])
    largest = max(out, key=lambda k: out[k]["cell_tok"])
    if out[smallest]["cell_tok"] < out[largest]["cell_tok"]:
        assert (
            out[smallest]["epochs_micro"] > out[largest]["epochs_micro"]
        )
