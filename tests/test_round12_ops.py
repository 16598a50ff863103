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
        # round 14: piece scores are the integer-ln kernel's values
        # (the kernel has its own independent fidelity/bit-identity
        # tests in test_int_ln_kernel.py; THIS reference stays
        # independent for the EM/Viterbi/prune loop)
        from iceberg_playground_spark.queries._util import int_ln_micro_py

        return int_ln_micro_py(t, c)

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


# --- p40 DoReMi-lite mixture-weight learning ----------------------------------


def _py_p40(sf_dir: str):
    """Independent reference: plain-Python bigram models + MWU, no
    shared code with the query under test."""
    from iceberg_playground_spark.queries.round12 import (
        _P40_B,
        _P40_CAP,
        _P40_E,
        _P40_ETA_DIV,
        _p40_nll0,
    )

    def h(s, mod):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod

    def rnd(x):
        return (
            int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))
        )

    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    bg = []  # (source, epoch, p, c)
    for doc_id, source, text in docs:
        ep = h(str(doc_id), 100) % _P40_E + 1
        b = [h(t, _P40_B) for t in text.split(" ")]
        for i in range(len(b) - 1):
            bg.append((source, ep, b[i], b[i + 1]))

    def model_nll(max_ep):
        cnt: dict = {}
        tot: dict = {}
        for _, ep, p, c in bg:
            if ep <= max_ep:
                cnt[(p, c)] = cnt.get((p, c), 0) + 1
                tot[p] = tot.get(p, 0) + 1
        # round 14: the grid NLL is the integer-ln kernel's value
        # (kernel fidelity/bit-identity proven in test_int_ln_kernel;
        # this reference stays independent for the MWU fold)
        from iceberg_playground_spark.queries._util import int_ln_micro_py

        return {
            (p, c): int_ln_micro_py(
                cnt.get((p, c), 0) + 1, tot.get(p, 0) + _P40_B
            )
            for p in range(_P40_B)
            for c in range(_P40_B)
        }

    nlls = {e: model_nll(e) for e in range(_P40_E)}  # proxy for ep e+1
    ref = model_nll(_P40_E)
    agg: dict = {}
    for source, ep, p, c in bg:
        a = agg.setdefault((source, ep), [0, 0, 0])
        a[0] += nlls[ep - 1][(p, c)] if ep > 1 else _p40_nll0()
        a[1] += ref[(p, c)]
        a[2] += 1
    sources = sorted({s for s, _, _, _ in bg})
    out = []
    for s in sources:
        exc = [
            (
                max(0, agg[(s, e)][0] - agg[(s, e)][1]) // agg[(s, e)][2]
                if (s, e) in agg
                else 0
            )
            for e in range(1, _P40_E + 1)
        ]
        w = 1_000_000
        for x in exc:
            w = w * (1_000_000 + min(x // _P40_ETA_DIV, _P40_CAP))
            w //= 1_000_000
        out.append((s, *exc, w))
    tw = sum(r[-1] for r in out)
    return [
        (s, e1, e2, e3, w, (w * 1_000_000) // tw)
        for s, e1, e2, e3, w in out
    ]


def test_p40_matches_python_reference(spark):
    got = [
        (
            r["source"],
            int(r["exc1_micro"]),
            int(r["exc2_micro"]),
            int(r["exc3_micro"]),
            int(r["w_final"]),
            int(r["weight_micro"]),
        )
        for r in registry.QUERIES["p40_mixture_weight_learn"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == _py_p40(SF_SMOKE)


def test_p40_excess_decays_as_proxy_learns(spark):
    # the DoReMi signal: epoch-1 excess (uniform proxy) must dominate
    # epoch-3 excess (proxy has seen 2/3 of the corpus) for every
    # source — if it doesn't, the cumulative models aren't cumulative
    rows = registry.QUERIES["p40_mixture_weight_learn"](
        spark, SF_SMOKE
    ).collect()
    assert len(rows) >= 3
    for r in rows:
        assert int(r["exc1_micro"]) > int(r["exc3_micro"])
        assert int(r["w_final"]) > 1_000_000  # learning moved weights


# --- b162 all_manifests metadata table ----------------------------------------


def test_b162_all_manifests_walks_every_snapshot(spark, tmp_path):
    # all_manifests must list one row per (manifest, referencing
    # snapshot): carried-forward manifests reappear under every later
    # snapshot with added_here = False, delete manifests appear from
    # the deleting snapshot on, and a replacing compaction retires
    # both the old data manifests and the delete manifest.
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", "am_t", "k BIGINT, v STRING", drop_if_exists=True
    )
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k BIGINT, v STRING"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame([(3, "c")], "k BIGINT, v STRING").coalesce(1)
    )
    t.delete_where("k = 1", ["k"])
    t.compact(target_files=1)

    rows = sorted(
        (
            r["ref_version"],
            r["content"],
            r["added_version"],
            r["added_here"],
        )
        for r in t.all_manifests().collect()
    )
    assert rows == [
        (1, "data", 1, True),
        (2, "data", 1, False),
        (2, "data", 2, True),
        (3, "data", 1, False),
        (3, "data", 2, False),
        (3, "delete", 3, True),
        (4, "data", 4, True),
    ]
    # record sums stay honest: NULL only for the delete manifest
    for r in t.all_manifests().collect():
        if r["content"] == "delete":
            assert r["n_rows"] is None
        else:
            assert r["n_rows"] is not None


# --- c76 unigram tokenizer apply / fertility ----------------------------------


def test_c76_matches_python_reference(spark):
    # fertility through the TRAINED vocab, recomputed independently:
    # reuse _py_c75's (independently derived) final scores, then
    # re-segment every word occurrence and roll up per language.
    from iceberg_playground_spark.queries.round12 import _C75_LMAX

    vocab = {p: s for p, _, s in _py_c75(SF_SMOKE)}

    def viterbi_n(w):
        n = len(w)
        NEG = -(10**15)
        best = [0] + [None] * n
        for i in range(1, n + 1):
            cands = [NEG]
            for L in range(1, _C75_LMAX + 1):
                if i >= L and w[i - L : i] in vocab:
                    cands.append(best[i - L] + vocab[w[i - L : i]])
            best[i] = max(cands)
        pieces, pos = 0, n
        while pos > 0:
            for L in range(1, _C75_LMAX + 1):
                p = w[pos - L : pos]
                if (
                    pos >= L
                    and p in vocab
                    and best[pos - L] + vocab[p] == best[pos]
                ):
                    pieces += 1
                    pos -= L
                    break
        return pieces

    docs = duckdb.sql(
        f"SELECT lang, text FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    agg: dict = {}
    for lang, text in docs:
        a = agg.setdefault(lang, [0, 0, 0, 0])  # docs words chars pieces
        a[0] += 1
        for w in text.split(" "):
            if w:
                a[1] += 1
                a[2] += len(w)
                a[3] += viterbi_n(w)
    exp = [
        (
            lang,
            a[0],
            a[1],
            a[3],
            int(math.floor(1e6 * a[3] / a[1])),
            int(math.floor(1e6 * a[2] / a[3])),
        )
        for lang, a in sorted(agg.items())
    ]
    got = [
        (
            r["lang"],
            int(r["n_docs"]),
            int(r["n_words"]),
            int(r["n_pieces"]),
            int(r["fertility_micro"]),
            int(r["chars_per_piece_micro"]),
        )
        for r in registry.QUERIES["c76_unigram_apply_fertility"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == exp


def test_c76_multichar_pieces_beat_char_segmentation(spark):
    # the trained vocab must actually compress: fertility strictly
    # below chars-per-word (the all-singles ceiling) for every lang
    rows = registry.QUERIES["c76_unigram_apply_fertility"](
        spark, SF_SMOKE
    ).collect()
    for r in rows:
        assert 1_000_000 <= int(r["fertility_micro"])
        assert int(r["chars_per_piece_micro"]) > 1_000_000


# --- c77 fully-trained IVFADC --------------------------------------------------


def _py_c77(sf_dir: str):
    """Independent reference: c70's independently-verified python
    k-means++ (imported from the round-11 tests) for the coarse
    stage, then plain-Python residual-PQ Lloyd + IVFADC search."""
    from tests.test_round11_ops import _py_kmeanspp

    from iceberg_playground_spark.queries.round12 import (
        _C74_ITERS,
        _C74_K,
        _C74_SDIM,
        _C74_SUB,
        _C77_NPROBE,
        _C77_SHORT,
        _C77_TOPK,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    q = {
        int(vid): [int(math.floor(float(x) * 1000)) for x in emb]
        for vid, emb in rows
    }
    seed_ids, assign = _py_kmeanspp(sf_dir)
    cent = {cid: q[cid] for cid in seed_ids}
    res = {
        vid: [v[i] - cent[assign[vid][0]][i] for i in range(len(v))]
        for vid, v in q.items()
    }
    # residual PQ: md5-ordered seeds, then Lloyd (the _py_c74 loop)
    order = sorted(
        q, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )
    cb = [
        [
            [res[vid][s * _C74_SDIM + d] for d in range(_C74_SDIM)]
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
        for vid, vec in res.items():
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
    # search: probe 2 nearest cells, per-cell residual ADC, re-rank
    qv = q[0]
    probed = sorted(
        seed_ids,
        key=lambda cid: (
            sum((qv[i] - cent[cid][i]) ** 2 for i in range(len(qv))),
            cid,
        ),
    )[:_C77_NPROBE]
    adc = {
        cid: [
            [
                sum(
                    (
                        (qv[s * _C74_SDIM + d] - cent[cid][s * _C74_SDIM + d])
                        - cb[s][j][d]
                    )
                    ** 2
                    for d in range(_C74_SDIM)
                )
                for j in range(_C74_K)
            ]
            for s in range(_C74_SUB)
        ]
        for cid in probed
    }
    est = {
        vid: sum(
            adc[assign[vid][0]][s][code(res[vid], s)]
            for s in range(_C74_SUB)
        )
        for vid in q
        if assign[vid][0] in set(probed)
    }
    short = sorted(est, key=lambda v: (est[v], v))[:_C77_SHORT]
    ex = {
        vid: sum((q[vid][i] - qv[i]) ** 2 for i in range(len(qv)))
        for vid in short
    }
    top = sorted(short, key=lambda v: (ex[v], v))[:_C77_TOPK]
    return [(v, est[v], ex[v]) for v in top]


def test_c77_matches_python_reference(spark):
    got = [
        (int(r["vec_id"]), int(r["est_d2"]), int(r["exact_d2"]))
        for r in registry.QUERIES["c77_trained_ivfadc"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == _py_c77(SF_SMOKE)


# --- p41 learned-weight schedule ------------------------------------------------


def test_p41_matches_python_reference(spark):
    # schedule recomputed from _py_p40's (independently derived)
    # weights + an independent token count and stride interleave
    from iceberg_playground_spark.queries.round12 import _P41_BATCH_TOK

    weights = {r[0]: r[4] for r in _py_p40(SF_SMOKE)}  # source -> w_final
    toks: dict = {}
    for source, text in duckdb.sql(
        f"SELECT source, text FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall():
        toks[source] = toks.get(source, 0) + len(text.split(" "))
    total, wsum = sum(toks.values()), sum(weights.values())
    rows = []
    for s, w in weights.items():
        alloc = (total * ((w * 1_000_000) // wsum)) // 1_000_000
        b = alloc // _P41_BATCH_TOK
        for j in range(1, b + 1):
            rows.append(
                (((2 * j - 1) * 1_000_000_000) // (2 * b), s, j)
            )
    rows.sort()
    exp = [
        (i + 1, s, j, k) for i, (k, s, j) in enumerate(rows)
    ]
    got = [
        (
            int(r["step"]),
            r["source"],
            int(r["batch_idx"]),
            int(r["key_micro"]),
        )
        for r in registry.QUERIES["p41_learned_schedule"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == exp


def test_p41_prefix_holds_learned_proportions(spark):
    # the stride property under LEARNED weights: in every sampled
    # prefix each source appears within ±1 batch of its share
    rows = registry.QUERIES["p41_learned_schedule"](
        spark, SF_SMOKE
    ).collect()
    n = len(rows)
    per_source = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    for cut in (n // 4, n // 2, (3 * n) // 4):
        seen: dict = {}
        for r in rows[:cut]:
            seen[r["source"]] = seen.get(r["source"], 0) + 1
        for s, tot in per_source.items():
            expect = tot * cut / n
            assert abs(seen.get(s, 0) - expect) <= 1.0 + 1e-9, (
                s,
                cut,
                seen.get(s, 0),
                expect,
            )


# --- p42 streaming mixture-weight learning --------------------------------------


def test_p42_stream_batch_parity(spark):
    # the graded contract: the drained streaming learner is row-for-row
    # identical to batch p40 on the same corpus — per-epoch prox
    # partials scored against the evolving count state reproduce the
    # batch pass's epoch-prefix models exactly
    batch = [
        tuple(r)
        for r in registry.QUERIES["p40_mixture_weight_learn"](
            spark, SF_SMOKE
        ).collect()
    ]
    streamed = [
        tuple(r)
        for r in registry.QUERIES["p42_streaming_mixture_learn"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert streamed == batch


# --- b163 metadata_log table ----------------------------------------------------


def test_b163_metadata_log_tracks_schema_evolution(spark, tmp_path):
    # the log must carry the schema each version SERVES: add/drop
    # move n_fields; only HEAD is current; parents chain linearly
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", "mlog_t", "k BIGINT, v STRING", drop_if_exists=True
    )
    t.append(
        spark.createDataFrame([(1, "a")], "k BIGINT, v STRING").coalesce(1)
    )
    t.add_column("w", "BIGINT")
    t.drop_column("v")
    rows = sorted(
        (
            r["version"],
            r["parent"],
            r["operation"],
            r["n_fields"],
            r["is_current"],
        )
        for r in t.metadata_log().collect()
    )
    assert rows == [
        (1, 0, "append", 2, False),
        (2, 1, "add-column", 3, False),
        (3, 2, "drop-column", 2, True),
    ]


# --- c78 hybrid RRF search -------------------------------------------------------


def _py_c78(sf_dir: str):
    """Independent reference: plain-Python dense cosine + integer
    BM25 + RRF, no shared code with the query under test."""
    from iceberg_playground_spark.queries.round12 import (
        _C78_B,
        _C78_K1,
        _C78_LIST,
        _C78_RRF_K,
        _C78_TERMS,
        _C78_TOPK,
    )

    def rnd(x):
        return (
            int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))
        )

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    embs = dict(
        duckdb.sql(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchall()
    )
    qe = [float(x) for x in embs[0]]
    cand = sorted(i for i in embs if i in docs and i != 0)

    def norm(v):
        s = 0.0
        for x in v:
            s += x * x
        return math.sqrt(s)

    dense_scores = {}
    for i in cand:
        v = [float(x) for x in embs[i]]
        dot = 0.0
        for a, b in zip(v, qe):
            dot += a * b
        dense_scores[i] = round(dot / (norm(v) * norm(qe)), 6)
    dlist = sorted(cand, key=lambda i: (-dense_scores[i], i))[:_C78_LIST]
    rn_d = {i: r + 1 for r, i in enumerate(dlist)}

    nd = len(cand)
    tl = sum(len(docs[i].split(" ")) for i in cand)
    cnt: dict = {}
    dfs: dict = {}
    for i in cand:
        seen = set()
        for t in docs[i].split(" "):
            if t:
                cnt[t] = cnt.get(t, 0) + 1
                seen.add(t)
        for t in seen:
            dfs[t] = dfs.get(t, 0) + 1
    terms = sorted(
        (t for t in cnt if dfs[t] * 4 <= nd),
        key=lambda t: (-cnt[t], t),
    )[:_C78_TERMS]
    # idf through the SAME integer-ln kernel the op deploys (round 13:
    # 1 + (N-df+0.5)/(df+0.5) = (2N+2)/(2df+1) exactly)
    from iceberg_playground_spark.queries._util import int_ln_micro_py

    idf = {
        t: int_ln_micro_py(2 * dfs[t] + 1, 2 * nd + 2) for t in terms
    }
    bm25 = {}
    for i in cand:
        ts = docs[i].split(" ")
        dl = len(ts)
        s = 0
        for t in terms:
            tf = sum(1 for x in ts if x == t)
            s += (idf[t] * (tf * (_C78_K1 + 1000))) // (
                tf * 1000
                + (
                    _C78_K1
                    * (1000 - _C78_B + (_C78_B * dl * nd) // tl)
                )
                // 1000
            )
        bm25[i] = s
    llist = sorted(cand, key=lambda i: (-bm25[i], i))[:_C78_LIST]
    rn_l = {i: r + 1 for r, i in enumerate(llist)}

    fused = {}
    for i in set(rn_d) | set(rn_l):
        fused[i] = (
            (1_000_000 // (_C78_RRF_K + rn_d[i]) if i in rn_d else 0)
            + (1_000_000 // (_C78_RRF_K + rn_l[i]) if i in rn_l else 0)
        )
    top = sorted(fused, key=lambda i: (-fused[i], i))[:_C78_TOPK]
    return [
        (i, fused[i], rn_d.get(i), rn_l.get(i)) for i in top
    ]


def test_c78_matches_python_reference(spark):
    got = [
        (
            int(r["doc_id"]),
            int(r["rrf_micro"]),
            None if r["rn_dense"] is None else int(r["rn_dense"]),
            None if r["rn_lex"] is None else int(r["rn_lex"]),
        )
        for r in registry.QUERIES["c78_hybrid_rrf_search"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == _py_c78(SF_SMOKE)


def test_c78_fusion_actually_fuses(spark):
    # the top-10 must draw on BOTH backends: at least one fused doc
    # carries both ranks, and the two backends' rank-1 docs differ
    # somewhere in the lists (otherwise the 'fusion' is one backend)
    rows = registry.QUERIES["c78_hybrid_rrf_search"](
        spark, SF_SMOKE
    ).collect()
    assert any(
        r["rn_dense"] is not None and r["rn_lex"] is not None
        for r in rows
    )
    assert any(r["rn_dense"] is not None for r in rows)
    assert any(r["rn_lex"] is not None for r in rows)
