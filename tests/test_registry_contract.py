"""Self-maintaining grading-order contract checks (VERDICT r10 item 8).

The registry's explicit prefix lists (_R11_LEAD / _ROTATION_R11 /
_R11_NEW_TAIL) ARE the driver grading order, so a stale or
overlapping list silently mis-aims the ~50-slot correctness window.
Instead of predicting counts in prose (the failure mode that recurred
in round 9's ADVICE note), these tests derive the ground truth from
the CORRECTNESS_r*.json records committed at the repo root:

- the lists are disjoint and every name is actually registered;
- every _R11_LEAD entry has NEVER been driver-graded;
- every _ROTATION_R11 entry's LATEST grade is exactly the stale round
  the rotation claims to retire (round 6);
- no registered-and-previously-graded query is older than the
  rotation's target round (i.e. the rotation has no omissions).

When a new round's CORRECTNESS JSON lands and the lists roll forward
(e.g. to _R12_*), update _LEAD/_ROTATION/_STALE_ROUND below — the
assertions then re-derive everything else.
"""

from __future__ import annotations

import glob
import json
import os
import re

from iceberg_playground_spark import registry

registry.load_all()

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEAD = registry._R11_LEAD
_ROTATION = registry._ROTATION_R11
_TAIL = registry._R11_NEW_TAIL
# The stale round this rotation retires (see registry.py block
# comment): after round 10's sweep the oldest surviving grades are
# round 6.
_STALE_ROUND = 6


def _latest_grades() -> dict[str, int]:
    """name -> latest round with a driver CORRECTNESS entry."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        with open(path) as f:
            for name in json.load(f):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_prefix_lists_disjoint_and_registered():
    combined = _LEAD + _ROTATION + _TAIL
    assert len(combined) == len(set(combined)), "overlap across prefix lists"
    missing = [n for n in combined if n not in registry.QUERIES]
    assert not missing, f"prefix names not registered: {missing}"


def test_lead_entries_never_graded():
    latest = _latest_grades()
    graded_leads = [n for n in _LEAD if n in latest]
    assert not graded_leads, (
        f"_R11_LEAD must contain only never-graded ops, but these have "
        f"driver grades: {graded_leads} — move them to the rotation"
    )


def test_tail_entries_never_graded():
    latest = _latest_grades()
    graded = [n for n in _TAIL if n in latest]
    assert not graded, (
        f"_R11_NEW_TAIL entries must be new this round (never graded): "
        f"{graded}"
    )


def test_rotation_is_exactly_the_stale_round():
    latest = _latest_grades()
    wrong = {n: latest.get(n) for n in _ROTATION if latest.get(n) != _STALE_ROUND}
    assert not wrong, (
        f"rotation entries whose latest grade is not round "
        f"{_STALE_ROUND}: {wrong}"
    )


def test_rotation_has_no_omissions():
    # Every registered query previously graded in the stale round (and
    # not since) must be IN the rotation — otherwise its grade ages
    # past the contract's "no grade older than round N" promise.
    latest = _latest_grades()
    stale = {
        n
        for n, rnd in latest.items()
        if rnd == _STALE_ROUND and n in registry.QUERIES
    }
    omitted = stale - set(_ROTATION)
    assert not omitted, f"round-{_STALE_ROUND}-stale queries missing from rotation: {omitted}"


def test_every_graded_name_is_still_registered():
    # A grade for a name no longer in the registry means a rename
    # silently orphaned its correctness history.
    latest = _latest_grades()
    orphans = [n for n in latest if n not in registry.QUERIES]
    assert not orphans, f"graded names no longer registered: {orphans}"
