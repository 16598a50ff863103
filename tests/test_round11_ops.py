"""Round-11 operator semantics: k-means++ seeding (c70), the
streaming release pipeline (p36), the IVF drift audit (c71) and its
streaming counterpart (p38), the refs/history metadata tables
(b159/b160), the mixture schedule (p37), and the learned-IVF recall
eval (c72). Oracle parity is covered by test_correctness's
registry-wide parametrization; these pin the invariants an oracle
diff alone would not localize — the full D²-draw chain, the drift
math, and the IVF search against independent Python references;
stream/batch parity (p36↔p34, p38↔c71); schedule prefix
proportionality; and the ref/ancestry lifecycles."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK, SF_SMOKE  # noqa: E402


# --- c70 k-means++ seeding ---------------------------------------------------


def _round_half_up(x: float) -> int:
    # Spark's F.round is HALF_UP; Python's round is banker's
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _py_kmeanspp(sf_dir: str, k: int = 8, scale: int = 1000):
    """Independent reference: plain-Python k-means++ with the md5
    Gumbel-max D² draw, no shared code with the query under test.
    Returns (seed_ids, {vec_id: (cell_id, sq_dist)})."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    q = {
        int(vid): [int(math.floor(float(x) * scale)) for x in emb]
        for vid, emb in rows
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seeds = [0]
    for t in range(1, k):
        best_key, best_vid = None, None
        for vid, vec in q.items():
            m = min(d2(vec, q[s]) for s in seeds)
            if m <= 0:
                continue
            u = (
                int(
                    hashlib.md5(f"c70:{t}:{vid}".encode()).hexdigest()[:8],
                    16,
                )
                % 1_000_000
                + 0.5
            ) / 1e6
            key = _round_half_up(1e6 * math.log(m)) + _round_half_up(
                -1e6 * math.log(-math.log(u))
            )
            # argmax key, ties to the LOWEST vec_id
            if best_key is None or key > best_key or (
                key == best_key and vid < best_vid
            ):
                best_key, best_vid = key, vid
        seeds.append(best_vid)
    assign = {}
    for vid, vec in q.items():
        dists = sorted((d2(vec, q[s]), s) for s in sorted(seeds))
        assign[vid] = (dists[0][1], dists[0][0])
    return seeds, assign


@pytest.fixture(scope="module")
def c70_rows(spark):
    return registry.QUERIES["c70_kmeanspp_seed"](spark, SF_SMOKE).collect()


def test_c70_matches_python_kmeanspp(c70_rows):
    seeds, ref = _py_kmeanspp(SF_SMOKE)
    got = {r["vec_id"]: (r["cell_id"], r["sq_dist"]) for r in c70_rows}
    assert got == ref
    # the learned index is real: 8 distinct seeds, seed 0 fixed
    assert len(set(seeds)) == 8 and seeds[0] == 0


def test_c70_cells_and_distances_are_consistent(c70_rows):
    # every seed anchors its own cell at distance 0, so all k cells
    # are nonempty; sq_dist is nonnegative and 0 exactly on (dups of)
    # the seed vectors
    cells = {}
    for r in c70_rows:
        cells.setdefault(r["cell_id"], []).append(r)
        assert r["sq_dist"] >= 0
    assert len(cells) == 8
    for cid, members in cells.items():
        assert any(m["vec_id"] == cid and m["sq_dist"] == 0 for m in members)


def test_c70_draws_are_scale_stable(spark):
    # the draw chain is deterministic per corpus — rerunning the
    # whole train step yields the identical index (no hidden RNG)
    a = registry.QUERIES["c70_kmeanspp_seed"](spark, SF_SMOKE).collect()
    b = registry.QUERIES["c70_kmeanspp_seed"](spark, SF_SMOKE).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --- p36 streaming release pipeline -----------------------------------------


def test_p36_drained_totals_match_batch_p34(spark):
    # THE contract: the availableNow drain over doc_id-ordered arrival
    # files reproduces batch p34 row-for-row (same gate, same dedup
    # winners, same split stamps) — late-arriving cluster members must
    # never flip a rep/canon fixed by an earlier epoch
    stream = {
        tuple(r)
        for r in registry.QUERIES["p36_streaming_release_report"](
            spark, SF_CHECK
        ).collect()
    }
    batch = {
        tuple(r)
        for r in registry.QUERIES["p34_release_report_v3"](
            spark, SF_CHECK
        ).collect()
    }
    assert stream == batch and len(stream) > 0


def test_p36_accounts_for_every_document(spark):
    rows = registry.QUERIES["p36_streaming_release_report"](
        spark, SF_SMOKE
    ).collect()
    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["docs_in"] for r in rows) == n_docs
    for r in rows:
        assert (
            r["quality_drops"] + r["dup_drops"] + r["kept_docs"]
            == r["docs_in"]
        )
        assert (r["kept_tokens"] > 0) == (r["kept_docs"] > 0)


# --- c71 IVF index drift audit -----------------------------------------------


def _py_ivf_drift(sf_dir: str, k: int = 8, scale: int = 1000):
    """Independent reference: assignment to the first-k seeds, per-cell
    conditional sums, floor'd means, exact drift."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    q = {
        int(vid): [int(math.floor(float(x) * scale)) for x in emb]
        for vid, emb in rows
    }
    cut = len(q) // 2
    seeds = {c: q[c] for c in range(k)}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cells = {c: {"nb": 0, "nn": 0, "sb": [0] * 64, "sa": [0] * 64}
             for c in range(k)}
    for vid, vec in q.items():
        cell = min(sorted(seeds), key=lambda c: (d2(vec, seeds[c]), c))
        st = cells[cell]
        is_new = vid >= cut
        st["nn" if is_new else "nb"] += 1
        for i, v in enumerate(vec):
            st["sa"][i] += v
            if not is_new:
                st["sb"][i] += v
    out = {}
    for c, st in cells.items():
        old = [int(math.floor(s / st["nb"])) for s in st["sb"]]
        new = [
            int(math.floor(s / (st["nb"] + st["nn"]))) for s in st["sa"]
        ]
        out[c] = (
            st["nb"],
            st["nn"],
            sum((o - n) * (o - n) for o, n in zip(old, new)),
        )
    return out


def test_c71_matches_python_drift_audit(spark):
    ref = _py_ivf_drift(SF_SMOKE)
    got = {
        r["cell_id"]: (r["n_base"], r["n_new"], r["drift_sq"], r["retrain"])
        for r in registry.QUERIES["c71_ivf_index_drift"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(ref)
    for c, (nb, nn, drift) in ref.items():
        gnb, gnn, gdrift, flag = got[c]
        assert (gnb, gnn, gdrift) == (nb, nn, drift)
        assert flag == (1 if drift > 12000 else 0)
    # the audit accounts for every vector exactly once
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(nb + nn for nb, nn, _, _ in got.values()) == n


# --- b159 refs metadata table ------------------------------------------------


def test_b159_refs_tracks_ref_lifecycle(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "refs_t", "k BIGINT", drop_if_exists=True)
    t.append(spark.range(5).selectExpr("id AS k"))

    def snap():
        return {
            r["ref_name"]: (r["ref_type"], r["version"], r["n_appends"])
            for r in t.refs().collect()
        }

    # a fresh table exposes exactly main, as a BRANCH at HEAD
    assert snap() == {"main": ("branch", 1, 0)}
    t.create_tag("rel")
    t.append(spark.range(3).selectExpr("id AS k"))
    # the tag PINNED version 1 while main moved on
    assert snap() == {"main": ("branch", 2, 0), "rel": ("tag", 1, 0)}
    t.create_branch("wip")
    t.append_to_branch("wip", spark.range(2).selectExpr("id AS k"))
    t.append_to_branch("wip", spark.range(2).selectExpr("id AS k"))
    assert snap()["wip"] == ("branch", 2, 2)
    # branch state is ref-local: main and the tag are untouched
    assert snap()["main"] == ("branch", 2, 0)
    t.drop_branch("wip")
    t.drop_tag("rel")
    assert snap() == {"main": ("branch", 2, 0)}


# --- p37 mixture schedule ------------------------------------------------


@pytest.fixture(scope="module")
def p37_rows(spark):
    return registry.QUERIES["p37_mixture_schedule"](
        spark, SF_SMOKE
    ).collect()


def test_p37_stride_schedule_matches_reference(spark, p37_rows):
    # independent scheduler over p35's (separately verified)
    # allocation: batches per cell, stride keys, global order
    alloc = registry.QUERIES["p35_budget_rebalance"](
        spark, SF_SMOKE
    ).collect()
    ref = []
    for r in alloc:
        b = r["final_tok"] // 128
        for j in range(1, b + 1):
            key = ((2 * j - 1) * 1_000_000_000) // (2 * b)
            ref.append((key, r["source"], r["lang"], j))
    ref.sort()
    got = [(r["key_micro"], r["source"], r["lang"], r["batch_idx"])
           for r in sorted(p37_rows, key=lambda r: r["step"])]
    assert got == ref
    assert [r["step"] for r in sorted(p37_rows, key=lambda r: r["step"])] \
        == list(range(1, len(ref) + 1))


def test_p37_every_prefix_holds_proportions(p37_rows):
    # the point of the stride interleave: any prefix of the schedule
    # contains each cell's batches in proportion to its allocation,
    # within one batch — no source fronts or starves
    total = {}
    for r in p37_rows:
        total[(r["source"], r["lang"])] = (
            total.get((r["source"], r["lang"]), 0) + 1
        )
    n = len(p37_rows)
    seen = {c: 0 for c in total}
    for i, r in enumerate(sorted(p37_rows, key=lambda r: r["step"]), 1):
        seen[(r["source"], r["lang"])] += 1
        if i % 50 == 0:  # sample prefixes
            for c, b in total.items():
                expected = b * i / n
                assert abs(seen[c] - expected) <= 1.0 + 1e-9, (
                    c, i, seen[c], expected
                )


# --- b160 history metadata table ----------------------------------------


def test_b160_history_ancestry_follows_rollbacks(spark, tmp_path):
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "hist_t", "k BIGINT", drop_if_exists=True)
    for _ in range(3):
        t.append(spark.range(2).selectExpr("id AS k"))  # v1 v2 v3
    t.rollback(1)                                       # v4 (state = v1)
    t.append(spark.range(1).selectExpr("id AS k"))      # v5
    t.rollback(2)                                       # v6 (state = v2)

    h = {r["version"]: r for r in t.history().collect()}
    assert set(h) == {1, 2, 3, 4, 5, 6}
    # commit parents stay linear
    assert all(h[v]["parent"] == v - 1 for v in h)
    # logical lineage: 6 → (rollback to) 2 → 1; everything the two
    # rollbacks skipped over (3, 4, 5) is abandoned history
    anc = {v for v in h if h[v]["is_current_ancestor"]}
    assert anc == {1, 2, 6}
    assert h[6]["operation"] == "rollback"
    assert h[3]["operation"] == "append"
    # abandoned versions stay time-travelable (the audit's evidence)
    assert t.read(version=5).count() == 3
    # and the restored state is v2's
    assert t.read().count() == 4


# --- c72 learned-IVF recall eval ------------------------------------------


def test_c72_matches_python_ivf_search(spark):
    # independent reference reusing the (independently verified)
    # reference k-means++ trainer: probe -> nprobe cells -> candidate
    # top-k vs brute top-k, all exact integers
    seeds, assign = _py_kmeanspp(SF_SMOKE)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    q = {
        int(vid): [int(math.floor(float(x) * 1000)) for x in emb]
        for vid, emb in rows
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    ref = {}
    for pid in range(10):
        pv = q[pid]
        cells = [
            c for _, c in sorted(
                (d2(pv, q[s]), s) for s in sorted(seeds)
            )[:2]
        ]
        others = [(d2(pv, q[v]), v) for v in q if v != pid]
        brute = {v for _, v in sorted(others)[:10]}
        cand = [
            (d, v) for d, v in others if assign[v][0] in cells
        ]
        ivf = {v for _, v in sorted(cand)[:10]}
        ref[pid] = (len(cand), len(ivf & brute))
    got = {
        r["probe_id"]: (r["cand_n"], r["hits"], r["recall_micro"])
        for r in registry.QUERIES["c72_learned_ivf_recall"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(ref)
    for pid, (cand_n, hits) in ref.items():
        assert got[pid] == (cand_n, hits, hits * 1_000_000 // 10)
    # the eval is discriminating on this corpus: candidates are a
    # strict subset of the corpus and recall is not vacuously 0
    n = len(q)
    assert all(c < n - 1 for c, _, _ in got.values())
    assert any(h > 0 for _, h, _ in got.values())


# --- p38 streaming drift audit ---------------------------------------------


def test_p38_merged_partials_match_batch_c71(spark):
    # THE contract: per-epoch partial sums merged by addition
    # reproduce the single-pass batch audit exactly — the mergeable-
    # state property c71's scale story claims; no ordering contract
    # is even needed (integer sums are associative+commutative)
    stream = {
        tuple(r)
        for r in registry.QUERIES["p38_streaming_drift_audit"](
            spark, SF_CHECK
        ).collect()
    }
    batch = {
        tuple(r)
        for r in registry.QUERIES["c71_ivf_index_drift"](
            spark, SF_CHECK
        ).collect()
    }
    assert stream == batch and len(stream) == 8


# --- c73 classifier calibration curve ---------------------------------------


def test_c73_matches_python_calibration(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, text FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    bins = {}
    for _, source, text in rows:
        s = sum(
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1024 % 197
            - 98
            for t in text.split(" ")
        )
        y = 1 if source == "src0" else 0
        b = (s - ((s % 50) + 50) % 50) // 50
        st = bins.setdefault(b, [0, 0, 0])
        st[0] += 1
        st[1] += y
        st[2] += s
    got = {
        r["bin"]: (
            r["score_lo_cc"], r["n"], r["n_pos"], r["sum_score_cc"],
            r["pos_rate_micro"],
        )
        for r in registry.QUERIES["c73_classifier_calibration"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(bins)
    for b, (n, npos, ssum) in bins.items():
        assert got[b] == (b * 50, n, npos, ssum, 1_000_000 * npos // n)
    # negative bins exist (scores straddle 0), so the pmod floor is
    # actually exercised; rates stay within [0, 1e6]
    assert any(b < 0 for b in got) and any(b >= 0 for b in got)
    assert all(0 <= v[4] <= 1_000_000 for v in got.values())


def test_b160_history_survives_expired_ancestors(spark, tmp_path):
    # expire_snapshots may reclaim any prefix of the lineage; the
    # ancestry walk must stop at the first expired version instead of
    # crashing the audit of the live ones (Iceberg's history table
    # likewise only reports snapshots that still exist)
    from iceberg_playground_spark.tables import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path))
    t = cat.create_table("demo", "hist_e", "k BIGINT", drop_if_exists=True)
    for _ in range(3):
        t.append(spark.range(2).selectExpr("id AS k"))
    t.expire_snapshots(keep_last=1, orphan_older_than_s=0)
    h = {r["version"]: r for r in t.history().collect()}
    assert set(h) == {3}
    assert h[3]["is_current_ancestor"]


# --- p39 release datacard ----------------------------------------------------


def test_p39_card_agrees_with_the_report_it_summarizes(spark):
    # the card can never disagree with p34 (it is a pure rollup) —
    # recompute every stat from the report and compare exactly
    report = registry.QUERIES["p34_release_report_v3"](
        spark, SF_SMOKE
    ).collect()
    card = {
        r["stat"]: r["value"]
        for r in registry.QUERIES["p39_release_datacard"](
            spark, SF_SMOKE
        ).collect()
    }
    total = sum(r["docs_in"] for r in report)
    kept = sum(r["kept_docs"] for r in report)
    qd = sum(r["quality_drops"] for r in report)
    dd = sum(r["dup_drops"] for r in report)
    assert card["docs_total"] == total
    assert card["docs_kept"] == kept
    assert card["tokens_kept"] == sum(r["kept_tokens"] for r in report)
    assert card["quality_drops"] == qd and card["dup_drops"] == dd
    assert card["langs_released"] == len(
        {r["lang"] for r in report if r["kept_docs"] > 0}
    )
    assert card["kept_rate_micro"] == 1_000_000 * kept // total
    assert card["quality_drop_rate_micro"] == 1_000_000 * qd // total
    assert card["dup_drop_rate_micro"] == 1_000_000 * dd // total
    for s in ("train", "validation", "test"):
        assert card[f"{s}_docs_kept"] == sum(
            r["kept_docs"] for r in report if r["split"] == s
        )
    # accounting closes: kept + drops = total, rates partition 1e6 ±2
    assert kept + qd + dd == total
    assert len(card) == 12
