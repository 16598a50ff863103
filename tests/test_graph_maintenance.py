"""The monotone top-M identities behind the graph maintenance oracles.

c96/p50 (ingest) and c98/p51 (delete) grade a Spark INCREMENTAL state
machine against a CLOSED-FORM oracle. The hash-match proves the two
engines agree — but both rest on the same mathematical identities, so
a flaw in the identity would make them agree on the WRONG answer, the
one error class a cross-engine hash cannot catch. This file verifies
the identities themselves by brute-force simulation, independent of
Spark, DuckDB, and the query code:

- INGEST (p50's closed form): for a candidate set that only GROWS,
  the incremental re-trim top-M(top-M(S1) ∪ S2) equals the one-shot
  prefix top-M(S1 ∪ S2) under the total (d, dst) order, with the
  candidacy rule "(both epoch 0) OR different epochs".
- DELETE (c98/p51's closed form): removing candidates that were NOT
  in a top-M list cannot change that top-M, so repairing ONLY the
  lists that lost a member (against current survivors) lands
  bit-for-bit on the full survivor rebuild — at every tombstone
  prefix.

Deterministic seeded trials with small integer grids so exact ties
occur and the (d, dst) tie-break is genuinely exercised.
"""

from __future__ import annotations

import random

M = 3  # small out-degree so displacement happens constantly


def _dist(a: tuple[int, ...], b: tuple[int, ...]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _topm(cands: list[tuple[int, int]], m: int = M) -> list[tuple[int, int]]:
    """cands: [(d, dst)] -> the top-m under the total (d, dst) order."""
    return sorted(cands)[:m]


def _mk_nodes(rng: random.Random, n: int, labels: int, dim: int = 3):
    """id -> (label, point); tiny coordinate range forces exact ties."""
    return {
        i: (rng.randrange(labels), tuple(rng.randrange(5) for _ in range(dim)))
        for i in range(n)
    }


def _rebuild(nodes: dict, alive: set[int]) -> dict[int, list]:
    """Full survivor rebuild: every alive node's top-M over alive
    same-label peers."""
    out = {}
    for u in alive:
        lu, pu = nodes[u]
        cands = [
            (_dist(pu, nodes[v][1]), v)
            for v in alive
            if v != u and nodes[v][0] == lu
        ]
        out[u] = _topm(cands)
    return out


def test_ingest_incremental_equals_prefix_topm():
    # p50's identity: simulate the epoch-by-epoch state machine
    # (epoch 0 builds among itself; each later epoch attaches arrivals
    # to the ACCUMULATED node set and re-trims existing lists), then
    # compare every epoch's state to the one-shot closed form.
    for seed in range(25):
        rng = random.Random(seed)
        nodes = _mk_nodes(rng, rng.randrange(12, 40), rng.randrange(1, 4))
        epochs = {i: rng.randrange(3) for i in nodes}

        # incremental state machine
        state: dict[int, list] = {}
        present: set[int] = set()
        for e in range(3):
            batch = {i for i in nodes if epochs[i] == e}
            if e == 0:
                present = set(batch)
                state = _rebuild(nodes, present)
                continue
            # arrivals: out-edges against EXISTING nodes only
            for a in batch:
                la, pa = nodes[a]
                state[a] = _topm(
                    [
                        (_dist(pa, nodes[b][1]), b)
                        for b in present
                        if nodes[b][0] == la
                    ]
                )
            # existing nodes: re-trim against arrival candidates
            for b in present:
                lb, pb = nodes[b]
                extra = [
                    (_dist(pb, nodes[a][1]), a)
                    for a in batch
                    if nodes[a][0] == lb
                ]
                state[b] = _topm(state[b] + extra)
            present |= batch

            # closed form at this prefix: candidates = same-label nodes
            # with epoch <= e and ((both 0) or different epochs)
            for u in present:
                lu, pu = nodes[u]
                cands = [
                    (_dist(pu, nodes[v][1]), v)
                    for v in present
                    if v != u
                    and nodes[v][0] == lu
                    and (
                        (epochs[u] == 0 and epochs[v] == 0)
                        or epochs[u] != epochs[v]
                    )
                ]
                assert state[u] == _topm(cands), (seed, e, u)


def test_delete_incremental_repair_equals_survivor_rebuild():
    # c98/p51's identity: simulate tombstone batches repairing ONLY
    # the affected lists, compare each prefix to the full rebuild.
    for seed in range(25):
        rng = random.Random(1000 + seed)
        nodes = _mk_nodes(rng, rng.randrange(12, 40), rng.randrange(1, 4))
        doomed = [i for i in nodes if rng.random() < 0.35]
        rng.shuffle(doomed)
        half = len(doomed) // 2
        batches = [set(doomed[:half]), set(doomed[half:])]

        alive = set(nodes)
        state = _rebuild(nodes, alive)
        for tomb in batches:
            alive -= tomb
            for t in tomb:
                state.pop(t, None)
            affected = {
                u
                for u, lst in state.items()
                if any(dst in tomb for _, dst in lst)
            }
            for u in affected:
                lu, pu = nodes[u]
                state[u] = _topm(
                    [
                        (_dist(pu, nodes[v][1]), v)
                        for v in alive
                        if v != u and nodes[v][0] == lu
                    ]
                )
            assert state == _rebuild(nodes, alive), (seed, len(alive))


def test_lifecycle_ingest_then_delete_equals_survivor_rebuild():
    # c99's composed identity: a c96 ingest (base/arrival candidacy —
    # base sees everyone, arrivals see base only) followed by a c98
    # delete with repair-only-affected RECOMPUTING WITHIN THE SAME
    # CANDIDACY SET must land on the survivor rebuild under candidacy
    # — the closed form c99's oracle searches.
    def _cands(nodes, u, peers, is_new):
        lu, pu = nodes[u]
        return [
            (_dist(pu, nodes[v][1]), v)
            for v in peers
            if v != u
            and nodes[v][0] == lu
            and not (is_new[u] and is_new[v])
        ]

    for seed in range(25):
        rng = random.Random(3000 + seed)
        nodes = _mk_nodes(rng, rng.randrange(12, 40), rng.randrange(1, 4))
        is_new = {i: rng.random() < 0.2 for i in nodes}
        base = {i for i in nodes if not is_new[i]}

        # ingest: build among base, arrivals attach to base, base
        # re-trims against arrival back-candidates
        state = {u: _topm(_cands(nodes, u, base, is_new)) for u in base}
        arrivals = set(nodes) - base
        for a in arrivals:
            state[a] = _topm(_cands(nodes, a, base, is_new))
        for b in base:
            lb, pb = nodes[b]
            extra = [
                (_dist(pb, nodes[a][1]), a)
                for a in arrivals
                if nodes[a][0] == lb
            ]
            state[b] = _topm(state[b] + extra)

        # delete + repair-only-affected, within candidacy
        tomb = {i for i in nodes if rng.random() < 0.25}
        alive = set(nodes) - tomb
        for t in tomb:
            state.pop(t, None)
        affected = {
            u
            for u, lst in state.items()
            if any(dst in tomb for _, dst in lst)
        }
        for u in affected:
            state[u] = _topm(_cands(nodes, u, alive, is_new))

        # survivor rebuild under candidacy (the oracle's closed form)
        want = {
            u: _topm(_cands(nodes, u, alive, is_new)) for u in alive
        }
        assert state == want, (seed, len(alive))


def test_untouched_lists_really_are_untouched():
    # the load-bearing half of the delete identity, isolated: if a
    # list lost NO member, the survivor rebuild must reproduce it
    # verbatim (removing non-list candidates cannot change a top-M)
    for seed in range(25):
        rng = random.Random(2000 + seed)
        nodes = _mk_nodes(rng, rng.randrange(12, 30), 2)
        state = _rebuild(nodes, set(nodes))
        tomb = {i for i in nodes if rng.random() < 0.3}
        alive = set(nodes) - tomb
        rebuilt = _rebuild(nodes, alive)
        for u in alive:
            if not any(dst in tomb for _, dst in state[u]):
                assert rebuilt[u] == state[u], (seed, u)
