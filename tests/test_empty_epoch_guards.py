"""Round-16 ADVICE item: the p45/p49/p50/p51 foreachBatch sinks
early-return on an empty micro-batch (round-15's crash fix). That is
hash-correct ONLY while no STAGED epoch file is actually empty: their
closed-form oracles emit one report row per epoch unconditionally
(p49's ``range(0, EPOCHS)`` spine and p45/p50/p51's equivalents), so a
skipped real epoch would drop a row the oracle keeps. On the shipped
fixtures an empty batch can therefore only be the file source's
no-new-file trigger (which carries no epoch and owes no row).

This test pins that invariant at the fixture level: it replays each
query's exact staging arithmetic over the shipped parquet at all three
SFs and asserts every staged epoch is non-empty. A future testdata
drop that makes an epoch empty fails HERE, loudly, instead of as a
silent oracle mismatch.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
]

# constants mirrored from the query modules (import-checked below)
_P45_EPOCHS = 4
_P49_EPOCHS = 4
_P50_E = 3
_P51_MOD, _P51_DEL, _P51_E = 7, 3, 3


def test_constants_match_query_modules():
    from iceberg_playground_spark.queries import round12b, round13, round14

    assert round12b._P45_EPOCHS == _P45_EPOCHS
    assert round13._P49_EPOCHS == _P49_EPOCHS
    assert round14._P50_E == _P50_E
    assert (round14._P51_MOD, round14._P51_DEL, round14._P51_E) == (
        _P51_MOD,
        _P51_DEL,
        _P51_E,
    )


@pytest.mark.parametrize("sfd", SF_DIRS)
def test_no_staged_epoch_is_empty(sfd):
    if not os.path.isdir(sfd):
        pytest.skip(f"{sfd} not present")
    con = duckdb.connect()
    docs = f"read_parquet('{sfd}/documents.parquet')"
    emb = f"read_parquet('{sfd}/embeddings.parquet')"
    n_docs = con.execute(f"SELECT count(*) FROM {docs}").fetchone()[0]
    n_emb = con.execute(f"SELECT count(*) FROM {emb}").fetchone()[0]

    # p45: epoch i <- documents where (doc_id * EPOCHS) DIV n == i
    for i in range(_P45_EPOCHS):
        c = con.execute(
            f"SELECT count(*) FROM {docs} "
            f"WHERE (doc_id * {_P45_EPOCHS}) // {n_docs} = {i}"
        ).fetchone()[0]
        assert c > 0, f"p45 epoch {i} empty at {sfd}"

    # p49: epoch i = fresh(q == i) + edits(vec_id%25==0 AND q < i)
    for i in range(_P49_EPOCHS):
        c = con.execute(
            f"SELECT count(*) FROM {emb} "
            f"WHERE (vec_id * {_P49_EPOCHS}) // {n_emb} = {i}"
        ).fetchone()[0]
        assert c > 0, f"p49 epoch {i} fresh-half empty at {sfd}"

    # p50: epoch i <- embeddings where (vec_id * E) DIV n == i
    for i in range(_P50_E):
        c = con.execute(
            f"SELECT count(*) FROM {emb} "
            f"WHERE (vec_id * {_P50_E}) // {n_emb} = {i}"
        ).fetchone()[0]
        assert c > 0, f"p50 epoch {i} empty at {sfd}"

    # p51: epoch 0 = whole corpus; epochs 1..E-1 = tombstone halves
    assert n_emb > 0
    for i in range(1, _P51_E):
        c = con.execute(
            f"SELECT count(*) FROM {emb} "
            f"WHERE vec_id % {_P51_MOD} = {_P51_DEL} "
            f"AND 1 + (vec_id * {_P51_E - 1}) // {n_emb} = {i}"
        ).fetchone()[0]
        assert c > 0, f"p51 tombstone epoch {i} empty at {sfd}"
