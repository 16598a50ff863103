"""Self-maintaining grading-order contract checks (VERDICT r10 item 8,
rebuilt per ADVICE r11 item 1; made round-agnostic per VERDICT r12
item 7).

The registry DERIVES the rotation from the committed
CORRECTNESS_r*.json records at load time (registry.latest_grades) and
the current round from the newest record (registry.new_tail_round), so
nothing about the rotation or the round number is ever retyped. What
remains explicit, and therefore checked here, are the two seed lists:

- ``GRADING_LEAD`` (last round's never-graded additions) must contain
  only never-graded ops while the round is open;
- ``GRADING_NEW_TAIL`` (this round's additions) must be never-graded
  and sit at the very end of the imposed order;
- the single ROLL TRIPWIRE: the moment a driver grade lands on a lead
  entry (= this round's CORRECTNESS record arrived),
  ``test_roll_the_tail`` fails with the two-line roll procedure, and
  nothing else in the suite goes red.

Everything about the rotation itself (stalest-first, complete, no
orphans) is asserted against the same ground truth the registry reads.
"""

from __future__ import annotations

from iceberg_playground_spark import registry

registry.load_all()


def test_roll_the_tail():
    latest = registry.latest_grades()
    graded_leads = [n for n in registry.GRADING_LEAD if n in latest]
    assert not graded_leads, (
        f"{len(graded_leads)} GRADING_LEAD entries now carry a driver "
        f"grade — this round's CORRECTNESS record landed. Roll the "
        f"seeds (two lines in registry.py, nothing else): set "
        f"GRADING_LEAD = the current GRADING_NEW_TAIL contents "
        f"verbatim, then GRADING_NEW_TAIL = []. The rotation and the "
        f"round number re-derive from the committed records."
    )


def test_seed_lists_disjoint_and_registered():
    combined = registry.GRADING_LEAD + registry.GRADING_NEW_TAIL
    assert len(combined) == len(set(combined)), "overlap across seed lists"
    missing = [n for n in combined if n not in registry.QUERIES]
    assert not missing, f"seed names not registered: {missing}"


def test_tail_entries_never_graded():
    latest = registry.latest_grades()
    graded = [n for n in registry.GRADING_NEW_TAIL if n in latest]
    assert not graded, (
        f"GRADING_NEW_TAIL entries must be new this round (never "
        f"driver-graded): {graded}"
    )


def test_new_tail_round_is_one_past_newest_record():
    latest = registry.latest_grades()
    newest = max(rnd for rnd, _ in latest.values())
    assert registry.new_tail_round() == newest + 1


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
    lead = [n for n in registry.GRADING_LEAD if n not in latest]
    assert (
        names == lead + registry.GRADING_ROTATION + registry.GRADING_NEW_TAIL
    )
    assert names == registry.GRADING_ORDER


def test_every_graded_name_is_still_registered():
    # A grade for a name no longer in the registry means a rename
    # silently orphaned its correctness history.
    latest = registry.latest_grades()
    orphans = [n for n in latest if n not in registry.QUERIES]
    assert not orphans, f"graded names no longer registered: {orphans}"
