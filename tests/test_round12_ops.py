"""Round-12 operator semantics: the trained PQ codebook (c74).
Oracle parity is covered by test_correctness's registry-wide
parametrization; these pin the invariants an oracle diff alone would
not localize — the whole train→encode→ADC→re-rank pipeline against an
independent Python reference, that training actually moves the
codebook off its seeds, and that the floor-division idiom the oracle
uses equals Python's ``//`` on negative sums."""

from __future__ import annotations

import hashlib
import math

import duckdb

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_SMOKE  # noqa: E402


def _py_c74(sf_dir: str):
    """Independent reference: plain-Python per-subspace Lloyd on the
    integer grid + ADC shortlist + exact re-rank, no shared code with
    the query under test. Returns the top-10 (vec_id, est_d2,
    exact_d2) rows."""
    from iceberg_playground_spark.queries.round12 import (
        _C74_ITERS,
        _C74_K,
        _C74_SDIM,
        _C74_SHORT,
        _C74_SUB,
        _C74_TOPK,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    q = {
        int(vid): [int(math.floor(float(x) * 1000)) for x in emb]
        for vid, emb in rows
    }
    order = sorted(
        q, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )
    cb = [
        [
            [q[vid][s * _C74_SDIM + d] for d in range(_C74_SDIM)]
            for vid in order[:_C74_K]
        ]
        for s in range(_C74_SUB)
    ]

    def code(vec, s):
        sub = vec[s * _C74_SDIM : (s + 1) * _C74_SDIM]
        return min(
            range(_C74_K),
            key=lambda j: (
                sum(
                    (sub[d] - cb[s][j][d]) ** 2 for d in range(_C74_SDIM)
                ),
                j,
            ),
        )

    for _ in range(_C74_ITERS):
        sums: dict = {}
        cnt: dict = {}
        for vid, vec in q.items():
            for s in range(_C74_SUB):
                j = code(vec, s)
                cnt[(s, j)] = cnt.get((s, j), 0) + 1
                acc = sums.setdefault((s, j), [0] * _C74_SDIM)
                for d in range(_C74_SDIM):
                    acc[d] += vec[s * _C74_SDIM + d]
        cb = [
            [
                (
                    [
                        sums[(s, j)][d] // cnt[(s, j)]
                        for d in range(_C74_SDIM)
                    ]
                    if (s, j) in cnt
                    else cb[s][j]
                )
                for j in range(_C74_K)
            ]
            for s in range(_C74_SUB)
        ]
    qv = q[0]
    adc = [
        [
            sum(
                (qv[s * _C74_SDIM + d] - cb[s][j][d]) ** 2
                for d in range(_C74_SDIM)
            )
            for j in range(_C74_K)
        ]
        for s in range(_C74_SUB)
    ]
    est = {
        vid: sum(adc[s][code(vec, s)] for s in range(_C74_SUB))
        for vid, vec in q.items()
    }
    short = sorted(est, key=lambda v: (est[v], v))[:_C74_SHORT]
    ex = {
        vid: sum((q[vid][i] - qv[i]) ** 2 for i in range(len(qv)))
        for vid in short
    }
    top = sorted(short, key=lambda v: (ex[v], v))[:_C74_TOPK]
    return [(v, est[v], ex[v]) for v in top]


def test_c74_matches_python_reference(spark):
    got = [
        (int(r["vec_id"]), int(r["est_d2"]), int(r["exact_d2"]))
        for r in registry.QUERIES["c74_pq_train"](spark, SF_SMOKE).collect()
    ]
    assert got == _py_c74(SF_SMOKE)


def test_c74_training_moves_centroids(spark):
    # Lloyd must actually update the codebook — a no-op train would
    # leave every centroid at its md5 seed (c38's untrained geometry,
    # exactly what c74 exists to replace).
    from iceberg_playground_spark.queries.round9b import _c54_quantized
    from iceberg_playground_spark.queries.round12 import (
        _c74_seed,
        _c74_train,
    )

    qdf = _c54_quantized(spark, SF_SMOKE)
    seeded = _c74_seed(qdf)
    _, trained = _c74_train(spark, SF_SMOKE)
    moved = sum(
        1
        for s in range(len(seeded))
        for j in range(len(seeded[s]))
        if seeded[s][j] != trained[s][j]
    )
    assert moved > len(seeded) * len(seeded[0]) // 2


def test_c74_floor_division_idiom_matches_python():
    # The oracle's sign-safe-mod floor division must equal Python's
    # ``//`` (the driver-side update) for NEGATIVE sums too — Spark
    # DIV and DuckDB // both truncate toward zero, which is why the
    # oracle spells out (sv - ((sv % n + n) % n)) // n instead.
    cases = [(-17, 5), (-15, 5), (17, 5), (-1, 3), (0, 7), (-1000001, 8)]
    for sv, n in cases:
        got = duckdb.sql(
            f"SELECT ({sv} - (({sv} % {n} + {n}) % {n})) // {n}"
        ).fetchone()[0]
        assert int(got) == sv // n, (sv, n)


# --- c75 unigram-LM tokenizer trainer ---------------------------------------


def _py_c75(sf_dir: str):
    """Independent reference: plain-Python unigram-LM EM (seed →
    Viterbi E-step → smoothed M-step → prune, twice), no shared code
    with the query under test."""
    from iceberg_playground_spark.queries.round12 import (
        _C75_KEEP,
        _C75_LMAX,
        _C75_SEED_MULTI,
    )

    def score(c, t):
        x = 1e6 * math.log(c / t)
        return (
            int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))
        )

    texts = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    words: dict[str, int] = {}
    for (t,) in texts:
        for w in t.split(" "):
            if w:
                words[w] = words.get(w, 0) + 1

    subs: dict[str, int] = {}
    for w, cnt in words.items():
        for k in range(len(w)):
            for L in range(1, _C75_LMAX + 1):
                if k + L <= len(w):
                    p = w[k : k + L]
                    subs[p] = subs.get(p, 0) + cnt
    singles = {p for p in subs if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:_C75_SEED_MULTI]
    vocab = {p: subs[p] for p in singles} | dict(multi)
    tot = sum(vocab.values())
    scores = {p: score(c, tot) for p, c in vocab.items()}

    def viterbi(w):
        n = len(w)
        NEG = -(10**15)
        best = [0] + [None] * n
        for i in range(1, n + 1):
            cands = [NEG]
            for L in range(1, _C75_LMAX + 1):
                if i >= L and w[i - L : i] in scores:
                    cands.append(best[i - L] + scores[w[i - L : i]])
            best[i] = max(cands)
        seg, pos = [], n
        while pos > 0:
            for L in range(1, _C75_LMAX + 1):
                p = w[pos - L : pos]
                if (
                    pos >= L
                    and p in scores
                    and best[pos - L] + scores[p] == best[pos]
                ):
                    seg.append(p)
                    pos -= L
                    break
        return list(reversed(seg))

    counts: dict[str, int] = {}
    for keep in _C75_KEEP:
        counts = {}
        for w, cnt in words.items():
            for p in viterbi(w):
                counts[p] = counts.get(p, 0) + cnt
        kept_multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:keep]
        smoothed = {p: counts.get(p, 0) + 1 for p in singles}
        smoothed |= {p: c + 1 for p, c in kept_multi}
        t = sum(smoothed.values())
        scores = {p: score(c, t) for p, c in smoothed.items()}

    return sorted((p, counts.get(p, 0), scores[p]) for p in scores)


def test_c75_matches_python_reference(spark):
    got = [
        (r["piece"], int(r["cnt"]), int(r["score_micro"]))
        for r in registry.QUERIES["c75_unigram_lm_train"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == _py_c75(SF_SMOKE)


def test_c75_learns_multichar_pieces(spark):
    # EM must keep multi-char pieces that actually tile the corpus —
    # an all-singles vocabulary would mean the Viterbi/prune loop
    # degenerated to a character model.
    rows = registry.QUERIES["c75_unigram_lm_train"](
        spark, SF_SMOKE
    ).collect()
    multi = [r for r in rows if len(r["piece"]) > 1]
    assert len(multi) >= 8
    assert any(int(r["cnt"]) > 0 for r in multi)
    # multi-char pieces that survive pruning must outscore the raw
    # character path they replace at least once (fewer pieces => the
    # segmentation actually uses them)
    assert sum(int(r["cnt"]) for r in multi) > 0


# --- b161 entries metadata table ---------------------------------------------


def test_b161_entries_lifecycle(spark, tmp_path):
    # entries() must attribute every manifest entry to the snapshot
    # that WROTE it: appends read ADDED then EXISTING, an equality
    # delete retires NOTHING (MoR keeps the data files live), and a
    # replacing compaction reads its output ADDED with every input
    # DELETED under the compacting snapshot's version.
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", "entries_t", "k BIGINT, v STRING", drop_if_exists=True
    )
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING")
        .coalesce(1)
    )
    t.append(
        spark.createDataFrame([(3, "c")], "k BIGINT, v STRING").coalesce(1)
    )

    def snap(v):
        return sorted(
            (r["status"], r["snapshot_version"])
            for r in t.entries(v).collect()
        )

    assert snap(1) == [(1, 1)]
    assert snap(2) == [(0, 1), (1, 2)]

    t.delete_where("k = 2", ["k"])  # v3: MoR — no entry retired
    assert snap(3) == [(0, 1), (0, 2)]

    v4 = t.compact(target_files=1)
    assert v4 == 4
    got = sorted(
        (r["status"], r["snapshot_version"]) for r in t.entries(4).collect()
    )
    assert got == [(1, 4), (2, 4), (2, 4)]
    # record counts survive: the compacted file holds the MoR view
    # (delete applied), the deleted entries keep their original counts
    from pyspark.sql import functions as F

    by_status = {
        r["status"]: r["n_rows"]
        for r in t.entries(4)
        .groupBy("status")
        .agg(F.sum("n_rows").alias("n_rows"))
        .collect()
    }
    assert int(by_status[1]) == 2  # 3 rows minus the deleted k=2
    assert int(by_status[2]) == 3
