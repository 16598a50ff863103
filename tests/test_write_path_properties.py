"""Property-based write-path check (hypothesis): random sequences of
append / equality-delete / compact / merge / rollback / branch-publish
must always read back exactly what a plain-Python model of
sequence-scoped merge-on-read predicts — and time travel must replay
every intermediate state.

The model: each data row remembers the sequence that appended it; an
equality delete captures the keys visible at delete time and masks only
rows with a strictly lower sequence (Iceberg's sequence-number rule,
mirroring /root/reference/src/bin/deletes.rs:94-110 where a same-txn
append is not masked by its own delete). Compaction freezes the current
view as new rows at the compact sequence. Merge masks every source key
and re-adds the non-delete-flagged rows at the merge sequence. Rollback
restores a prior version's rows WITH their original sequences (entries
copy verbatim — so a later delete still masks them). A branch publish
is equivalent to one append of everything staged on the branch.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_playground_spark.tables import LakeCatalog

# one-off deep soak: HYPOTHESIS_SOAK=1 python -m pytest ...properties.py
# (a profile would be overridden by the per-test @settings, so the
# example budget is read directly)
_MAX_EXAMPLES = 50 if os.environ.get("HYPOTHESIS_SOAK") else 12

DDL = "name STRING, count INT"

_NAMES = ["A", "B", "C", "D"]

_append = st.lists(
    st.tuples(st.sampled_from(_NAMES), st.integers(0, 3)),
    min_size=1,
    max_size=3,
).map(lambda rows: ("append", rows))
_delete = st.sampled_from(_NAMES).map(lambda n: ("delete", n))
# position deletes are observationally EQUIVALENT to equality deletes
# for key predicates (both remove exactly the currently-visible
# matching rows; the kinds differ only in how masking is stored), so
# they share the model's delete rule — the equivalence itself is what
# this op fuzzes.
_pdelete = st.sampled_from(_NAMES).map(lambda n: ("pdelete", n))
_compact = st.just(("compact", None))
_merge = st.lists(
    st.tuples(
        st.sampled_from(_NAMES), st.integers(0, 3), st.booleans()
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda r: r[0],  # one clause per key, like MERGE
).map(lambda rows: ("merge", rows))
_rollback = st.integers(0, 5).map(lambda i: ("rollback", i))
_wap = st.lists(
    st.tuples(st.sampled_from(_NAMES), st.integers(0, 3)),
    min_size=1,
    max_size=3,
).map(lambda rows: ("wap", rows))
# metadata-aligned range delete: drops whole files when bounds prove
# every row matches, positional residual for boundary files — the
# observable semantics are exactly "remove every currently-visible row
# with lo <= count <= hi" (later re-appends visible), which is what
# the model encodes; the file-drop/residual SPLIT is what this op
# fuzzes across every other operation.
_rdelete = st.tuples(st.integers(0, 3), st.integers(0, 3)).map(
    lambda b: ("rdelete", (min(b), max(b)))
)
# type widening (count int -> bigint) is value-preserving by the
# promotion rule, so the model state is unchanged — what the op
# fuzzes is that every OTHER op (deletes keyed before the widen,
# compaction folding mixed-width generations, rollback to a narrow
# schema, appends under the wide one) still reads back exactly.
_widen = st.just(("widen", None))

# round-13 maintenance verbs: both are REORGANIZATIONS — the visible
# row set must be bit-identical across them (rewrite_manifests merges
# same-seq manifest entries; rewrite_position_delete_files compacts
# positional delete files at max seq, pruning dangling rows) — so the
# model treats both as no-ops and the soak proves exactly that
# against every other operation's interleaving.
_rwm = st.just(("rwm", None))
_rpd = st.just(("rpd", None))

_ops = st.lists(
    st.one_of(
        _append, _append, _delete, _pdelete, _rdelete, _compact,
        _merge, _rollback, _wap, _widen, _rwm, _rpd
    ),
    min_size=1,
    max_size=6,
)


def _model_apply(
    state: list, seq: int, op: str, arg, history: dict
) -> list:
    """state: [(name, count, seq_added)]; returns the new state."""
    if op == "append" or op == "wap":
        return state + [(n, c, seq) for n, c in arg]
    if op == "delete" or op == "pdelete":
        # keys captured from the CURRENT view; masks strictly-older rows
        if any(n == arg for n, _, _ in state):
            return [r for r in state if r[0] != arg]
        return state
    if op == "rdelete":
        lo, hi = arg
        return [r for r in state if not (lo <= r[1] <= hi)]
    if op == "compact":
        return [(n, c, seq) for n, c, _ in state]
    if op == "merge":
        keys = {n for n, _, _ in arg}
        kept = [r for r in state if r[0] not in keys]
        return kept + [(n, c, seq) for n, c, d in arg if not d]
    if op == "rollback":
        return list(history[arg])  # verbatim, original seqs included
    if op == "widen":
        return state  # metadata-only; values reread exactly
    if op in ("rwm", "rpd"):
        return state  # reorganizations: the visible rows never change
    raise AssertionError(op)


@settings(
    max_examples=_MAX_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_random_op_sequences_match_model(spark, tmp_path_factory, ops):
    wh = str(tmp_path_factory.mktemp("prop_wh"))
    cat = LakeCatalog(spark, wh)
    t = cat.create_table("p", "t", DDL, drop_if_exists=True)

    state: list = []
    history: dict[int, list] = {0: []}
    for op, arg in ops:
        # appends/merges conform to the CURRENT declared schema (a
        # widen op may have promoted count to bigint mid-sequence)
        if op == "append":
            v = t.append(spark.createDataFrame(arg, t.ddl))
        elif op == "delete":
            v = t.delete_where(f"name = '{arg}'", ["name"])
        elif op == "pdelete":
            v = t.delete_where_positional(f"name = '{arg}'")
        elif op == "merge":
            v = t.merge(
                spark.createDataFrame(arg, t.ddl + ", is_del BOOLEAN"),
                ["name"],
                delete_col="is_del",
            )
        elif op == "rollback":
            arg = arg % (t.current_version() + 1)  # a committed version
            v = t.rollback(arg)
        elif op == "wap":
            t.create_branch("hb")
            for row in arg:  # one staged append per row
                t.append_to_branch(
                    "hb", spark.createDataFrame([row], t.ddl)
                )
            v = t.fast_forward("hb")
        elif op == "rdelete":
            v, _summary = t.delete_range("count", arg[0], arg[1])
        elif op == "widen":
            if dict(t._ddl_fields(t.ddl))["count"] != "int":
                continue  # already widened earlier in the sequence
            v = t.widen_column("count", "bigint")
        elif op == "rwm":
            v = t.rewrite_manifests()  # no-op returns head: history
        elif op == "rpd":  # entry overwritten with the same state
            v = t.rewrite_position_delete_files()
        else:
            v = t.compact()
        state = _model_apply(state, v, op, arg, history)
        history[v] = state

    def snap_rows(df):
        return sorted((r["name"], r["count"]) for r in df.collect())

    # HEAD matches the model
    assert snap_rows(t.read()) == sorted((n, c) for n, c, _ in state)
    # and every intermediate version replays its own state (VERSION AS OF)
    for v, st_v in history.items():
        assert snap_rows(t.read(version=v)) == sorted(
            (n, c) for n, c, _ in st_v
        ), f"version {v} diverged"


# ---------------------------------------------------------------------------
# cherry-pick under rollback/compaction churn vs an exact file-token
# model: the delta rule, the refusals, and the row multiset must all
# agree with plain-Python bookkeeping of which abstract file sets each
# version added (appends are the only delta-bearing ops here; deletes
# are excluded on purpose — their delete-file refusal is a unit test,
# while THIS fuzzes the subset/already-present logic across rollbacks)
# ---------------------------------------------------------------------------

_ck_ops = st.lists(
    st.one_of(
        st.lists(
            st.tuples(st.sampled_from(_NAMES), st.integers(0, 3)),
            min_size=1, max_size=2,
        ).map(lambda rows: ("append", rows)),
        st.just(("compact", None)),
        st.integers(0, 7).map(lambda i: ("rollback", i)),
        st.integers(0, 7).map(lambda i: ("pick", i)),
    ),
    min_size=2,
    max_size=7,
)


@settings(
    max_examples=_MAX_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ck_ops)
def test_cherrypick_sequences_match_file_token_model(
    spark, tmp_path_factory, ops
):
    from iceberg_playground_spark.tables import CommitConflict

    wh = str(tmp_path_factory.mktemp("ck_wh"))
    cat = LakeCatalog(spark, wh)
    t = cat.create_table("p", "ck", DDL, drop_if_exists=True)

    # model: files[v] = frozenset of tokens live at v; rows[token] =
    # the row list an append-token carries; parent chain is linear
    files: dict[int, frozenset] = {0: frozenset()}
    rows: dict[str, list] = {}
    parent: dict[int, int] = {}

    def head():
        return max(files)

    for op, arg in ops:
        h = head()
        if op == "append":
            v = t.append(spark.createDataFrame(arg, t.ddl))
            tok = f"a{v}"
            rows[tok] = list(arg)
            parent[v] = h
            files[v] = files[h] | {tok}
        elif op == "compact":
            v = t.compact()
            tok = f"c{v}"
            rows[tok] = [r for f in sorted(files[h]) for r in rows[f]]
            parent[v] = h
            files[v] = frozenset({tok})
        elif op == "rollback":
            tgt = arg % (h + 1)
            v = t.rollback(tgt)
            parent[v] = h
            files[v] = files[tgt]
        else:  # pick
            tgt = arg % (h + 1)
            if tgt == 0:
                try:
                    t.cherrypick_snapshot(0)
                    raise AssertionError("picked v0")
                except ValueError:
                    continue
            snap_f, par_f = files[tgt], files[parent[tgt]]
            delta = snap_f - par_f
            legal = par_f <= snap_f and not (delta & files[h])
            try:
                v = t.cherrypick_snapshot(tgt)
                assert legal, f"pick v{tgt} landed but model says refuse"
                parent[v] = h
                files[v] = files[h] | delta
            except CommitConflict:
                assert not legal, f"pick v{tgt} refused but model says ok"
                assert t.current_version() == h  # no version minted
    want = sorted(r for f in sorted(files[head()]) for r in rows[f])
    got = sorted((r["name"], r["count"]) for r in t.read().collect())
    assert got == [tuple(r) for r in want]


# ---------------------------------------------------------------------------
# strict JSON decode vs a plain-Python model of the reference's rules
# (kafka-bench.rs:261-334: missing required => violation; present but
# wrong-typed => null, no violation; unparseable => violation)
# ---------------------------------------------------------------------------

import json as _json

from iceberg_playground_spark.ingest import strict_json_decode

_scalar = st.one_of(
    st.integers(-10**6, 10**6),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=8,
    ),
    st.none(),
    st.booleans(),
)

_doc = st.one_of(
    # well-formed object with a random subset of keys / value types
    st.fixed_dictionaries(
        {},
        optional={"name": _scalar, "count": _scalar, "extra": _scalar},
    ).map(_json.dumps),
    st.just("{not json"),
    st.just(""),
)


def _model_violation(raw: str) -> bool:
    try:
        obj = _json.loads(raw) if raw else None
    except ValueError:
        return True  # unparseable
    if not isinstance(obj, dict):
        return True
    # reference asymmetry (kafka-bench.rs:277-299): only an ABSENT
    # required key errors; a present explicit null (or wrong-typed
    # value) decodes to silent NULL
    return "name" not in obj


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_strict_decode_matches_python_model(spark, docs):
    df = spark.createDataFrame([(d,) for d in docs], "raw STRING")
    decoded = strict_json_decode(
        df, "raw", "name STRING, count INT", required=["name"]
    ).select("raw", "_strict_violation")
    got = {
        r["raw"]: bool(r["_strict_violation"]) for r in decoded.collect()
    }
    for d in docs:
        assert got[d] == _model_violation(d), f"doc={d!r}"


# ---------------------------------------------------------------------------
# partitioned-table fuzz: NULL partition values (merge_schema appends
# missing the partition column land under __HIVE_DEFAULT_PARTITION__)
# interleaved with bounds-based planning — the ADVICE-r6 TypeError
# class: a sentinel recorded as a typed bound poisoned plan_files /
# delete_range. The model is count-based visibility with None never
# matching a range.
# ---------------------------------------------------------------------------

_pappend = st.lists(
    st.tuples(st.sampled_from(_NAMES), st.integers(0, 3)),
    min_size=1,
    max_size=3,
).map(lambda rows: ("append", rows))
# schema drift: rows WITHOUT the partition column (count lands NULL)
_pdrift = st.lists(
    st.sampled_from(_NAMES), min_size=1, max_size=2
).map(lambda names: ("drift", names))
_prdelete = st.tuples(st.integers(0, 3), st.integers(0, 3)).map(
    lambda b: ("rdelete", (min(b), max(b)))
)
_pdelete_name = st.sampled_from(_NAMES).map(lambda n: ("delete", n))
_pcompact = st.just(("compact", None))

_pops = st.lists(
    st.one_of(_pappend, _pdrift, _prdelete, _pdelete_name, _pcompact),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=_MAX_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_pops)
def test_partitioned_null_partition_sequences_match_model(
    spark, tmp_path_factory, ops
):
    wh = str(tmp_path_factory.mktemp("prop_pwh"))
    cat = LakeCatalog(spark, wh)
    t = cat.create_table(
        "p", "tp", DDL, partition_by=["count"], drop_if_exists=True
    )

    state: list = []  # [(name, count-or-None)]
    for op, arg in ops:
        if op == "append":
            t.append(spark.createDataFrame(arg, DDL))
            state = state + [(n, c) for n, c in arg]
        elif op == "drift":
            t.append(
                spark.createDataFrame([(n,) for n in arg], "name STRING"),
                merge_schema=True,
            )
            state = state + [(n, None) for n in arg]
        elif op == "rdelete":
            lo, hi = arg
            t.delete_range("count", lo, hi)
            # NULL count is outside every range
            state = [
                r for r in state
                if r[1] is None or not (lo <= r[1] <= hi)
            ]
        elif op == "delete":
            t.delete_where(f"name = '{arg}'", ["name"])
            state = [r for r in state if r[0] != arg]
        else:
            t.compact()

    got = sorted(
        [(r["name"], r["count"]) for r in t.read().collect()], key=str
    )
    assert got == sorted(state, key=str)
    # bounds planning stays alive across every state (the TypeError
    # class regression): planning must complete, sentinel files kept
    kept, _ = t.plan_files("count", 0, 3)
    assert isinstance(kept, list)
    # the partitions metadata table must be EXACTLY the files table
    # rolled up by partition path (same live file set, same committed
    # record counts — both answered from manifests alone), across
    # every randomized state this sequence reached
    parts = t.partitions().collect()
    files = t.files().collect()
    assert sum(p["n_files"] for p in parts) == len(files)
    assert sum(p["n_rows"] or 0 for p in parts) == sum(
        f["n_rows"] or 0 for f in files
    )
    # and after a compaction folds the MoR deletes in, the metadata
    # record counts equal the true row count again
    if state:
        t.compact()
        assert sum(
            p["n_rows"] or 0 for p in t.partitions().collect()
        ) == len(state)


# ---------------------------------------------------------------------------
# retention lifecycle under churn: expire_snapshots (dir grain) +
# remove_orphan_files (file grain) must never change the surviving
# reads — the HEAD matches the model, every SURVIVING version still
# replays, a second orphan sweep finds nothing, and no removed path
# is ever referenced again (the ADVICE-r12 data-loss class, fuzzed)
# ---------------------------------------------------------------------------

_ret_ops = st.lists(
    st.one_of(
        st.lists(
            st.tuples(st.sampled_from(_NAMES), st.integers(0, 3)),
            min_size=1,
            max_size=2,
        ).map(lambda rows: ("append", rows)),
        st.tuples(st.integers(0, 3), st.integers(0, 3)).map(
            lambda b: ("rdelete", (min(b), max(b)))
        ),
        st.sampled_from(_NAMES).map(lambda n: ("pdelete", n)),
        st.just(("compact", None)),
        st.just(("rwm", None)),
        st.just(("rpd", None)),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=_MAX_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ret_ops, keep=st.integers(1, 3))
def test_retention_lifecycle_preserves_surviving_reads(
    spark, tmp_path_factory, ops, keep
):
    wh = str(tmp_path_factory.mktemp("ret_wh"))
    cat = LakeCatalog(spark, wh)
    t = cat.create_table("p", "t", DDL, drop_if_exists=True)

    state: list = []
    history: dict[int, list] = {0: []}
    for op, arg in ops:
        if op == "append":
            v = t.append(spark.createDataFrame(arg, t.ddl))
        elif op == "rdelete":
            v, _s = t.delete_range("count", arg[0], arg[1])
        elif op == "pdelete":
            v = t.delete_where_positional(f"name = '{arg}'")
        elif op == "rwm":
            v = t.rewrite_manifests()
        elif op == "rpd":
            v = t.rewrite_position_delete_files()
        else:
            v = t.compact()
        state = _model_apply(state, v, op, arg, history)
        history[v] = state

    def snap_rows(df):
        return sorted((r["name"], r["count"]) for r in df.collect())

    expected_head = sorted((n, c) for n, c, _ in state)
    t.expire_snapshots(keep_last=keep)
    res = t.remove_orphan_files(older_than_s=0)
    # surviving reads are untouched by BOTH maintenance passes
    assert snap_rows(t.read()) == expected_head
    for v in t.versions():
        if v in history:
            assert snap_rows(t.read(version=v)) == sorted(
                (n, c) for n, c, _ in history[v]
            ), f"surviving version {v} diverged after retention"
    # idempotence: a second sweep has nothing left to reclaim
    again = t.remove_orphan_files(older_than_s=0)
    assert again["orphans_removed"] == 0, again["removed_paths"]
    assert snap_rows(t.read()) == expected_head
    # and nothing the sweep removed is referenced by a live snapshot
    refs = t._referenced_files()
    assert not (set(res["removed_paths"]) & refs)
