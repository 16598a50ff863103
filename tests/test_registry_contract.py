"""Self-maintaining grading-order contract checks (VERDICT r10 item 8,
rebuilt per ADVICE r11 item 1).

The registry now DERIVES the rotation from the committed
CORRECTNESS_r*.json records at load time (registry.latest_grades),
so the old failure mode — hand-rolled lists going stale the moment a
new round's record lands — is structurally gone. What remains
explicit, and therefore checked here, are the two small seed lists:

- ``_R13_LEAD`` (last round's never-graded additions) must contain
  only never-graded ops — a graded entry is harmless (load_all drops
  it into the rotation) but means the list should be pruned;
- ``_R13_NEW_TAIL`` (this round's additions) must be never-graded and
  sit at the very end of the imposed order;
- the single ROLL TRIPWIRE: once ``CORRECTNESS_r{_NEW_TAIL_ROUND}.json``
  lands, ``test_roll_the_tail`` fails with the exact roll procedure,
  and nothing else in the suite goes red.

Everything about the rotation itself (stalest-first, complete, no
orphans) is asserted against the same ground truth the registry reads.
"""

from __future__ import annotations

import os

from iceberg_playground_spark import registry

registry.load_all()

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_roll_the_tail():
    rnd = registry._NEW_TAIL_ROUND
    record = os.path.join(_ROOT, f"CORRECTNESS_r{rnd:02d}.json")
    assert not os.path.exists(record), (
        f"CORRECTNESS_r{rnd:02d}.json landed — roll the grading seeds: "
        f"set _R{rnd + 1}_LEAD = _R{rnd}_NEW_TAIL verbatim, empty the "
        f"tail, bump _NEW_TAIL_ROUND to {rnd + 1}, and rename the "
        f"registry attributes + this test's references. The rotation "
        f"re-derives itself; nothing else changes."
    )


def test_seed_lists_disjoint_and_registered():
    combined = registry._R13_LEAD + registry._R13_NEW_TAIL
    assert len(combined) == len(set(combined)), "overlap across seed lists"
    missing = [n for n in combined if n not in registry.QUERIES]
    assert not missing, f"seed names not registered: {missing}"


def test_lead_entries_never_graded():
    # Grades from _NEW_TAIL_ROUND itself are the EXPECTED outcome of
    # the round's sweep (the roll tripwire above already fires then);
    # only a grade from an EARLIER round means the seed was wrong.
    latest = registry.latest_grades()
    graded_leads = [
        n
        for n in registry._R13_LEAD
        if n in latest and latest[n][0] < registry._NEW_TAIL_ROUND
    ]
    assert not graded_leads, (
        f"_R13_LEAD entries were already driver-graded before round "
        f"{registry._NEW_TAIL_ROUND} (prune the list; load_all already "
        f"routed them to the rotation): {graded_leads}"
    )


def test_tail_entries_never_graded():
    latest = registry.latest_grades()
    graded = [
        n
        for n in registry._R13_NEW_TAIL
        if n in latest and latest[n][0] < registry._NEW_TAIL_ROUND
    ]
    assert not graded, (
        f"_R13_NEW_TAIL entries must be new this round (never graded "
        f"before round {registry._NEW_TAIL_ROUND}): {graded}"
    )


def test_rotation_is_every_graded_query_stalest_first():
    latest = registry.latest_grades()
    rotation = registry.GRADING_ROTATION
    expected = sorted(
        (n for n in registry.QUERIES if n in latest), key=lambda n: latest[n]
    )
    assert rotation == expected, "rotation is not stalest-first/complete"
    keys = [latest[n] for n in rotation]
    assert keys == sorted(keys)


def test_imposed_order_is_lead_rotation_tail():
    names = list(registry.QUERIES)
    latest = registry.latest_grades()
    lead = [n for n in registry._R13_LEAD if n not in latest]
    assert names == lead + registry.GRADING_ROTATION + registry._R13_NEW_TAIL
    assert names == registry.GRADING_ORDER


def test_every_graded_name_is_still_registered():
    # A grade for a name no longer in the registry means a rename
    # silently orphaned its correctness history.
    latest = registry.latest_grades()
    orphans = [n for n in latest if n not in registry.QUERIES]
    assert not orphans, f"graded names no longer registered: {orphans}"
