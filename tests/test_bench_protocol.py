"""Unit tests for bench.py's measurement protocol (no Spark needed).

The protocol is the thing standing between the judge and a stalled
host reading (BASELINE.md "Round-9 LATE HOST SHIFT"): pin each branch
so a future edit cannot silently change what a recorded cell means.
"""

from __future__ import annotations

from bench import MEDIAN_CUTOFF, NO_RETRY, STALL_RETRY, measured_seconds


def _seq(*values):
    """A run() stub that replays fixed readings and counts calls."""
    it = iter(values)
    calls = []

    def run():
        v = next(it)
        calls.append(v)
        return v

    run.calls = calls
    return run


def test_subsecond_cell_records_median_of_three():
    run = _seq(0.2, 0.9, 0.4)
    assert measured_seconds(run) == 0.4
    assert len(run.calls) == 3


def test_midrange_cell_records_single_run():
    # between MEDIAN_CUTOFF and STALL_RETRY: one reading stands
    run = _seq(1.7)
    assert measured_seconds(run) == 1.7
    assert len(run.calls) == 1


def test_heavy_consistent_cell_stops_after_two():
    # a genuinely heavy cell reproduces within 30% — no third run,
    # and the MIN of the pair is recorded
    run = _seq(4.2, 4.0)
    assert measured_seconds(run) == 4.0
    assert len(run.calls) == 2


def test_stall_then_normal_recovers_the_true_reading():
    # 25 s stall, then two honest readings: the min survives
    run = _seq(25.0, 3.1, 3.0)
    assert measured_seconds(run) == 3.0
    assert len(run.calls) == 3


def test_retry_stops_once_reading_drops_below_threshold():
    # second reading under STALL_RETRY ends the loop immediately
    run = _seq(25.0, 2.0)
    assert measured_seconds(run) == 2.0
    assert len(run.calls) == 2


def test_two_consistent_stalls_stand_documented_limitation():
    # two same-magnitude stalls read as "consistent" and stand —
    # BASELINE.md's cross-run minimum rule covers this case
    run = _seq(25.0, 26.0)
    assert measured_seconds(run) == 25.0
    assert len(run.calls) == 2


def test_no_retry_cell_keeps_first_reading():
    # cache-backed cells (c39/b135): a rerun would time a cache hit
    run = _seq(30.0)
    assert measured_seconds(run, retryable=False) == 30.0
    assert len(run.calls) == 1


def test_no_retry_cell_skips_repeat_median_too():
    # ADVICE r9: a NO_RETRY cell whose first reading lands under
    # MEDIAN_CUTOFF must NOT be rerun for the median either — the
    # rerun would time a cache-hit read of the (session, sf)-cached
    # build, exactly what NO_RETRY exists to prevent.
    run = _seq(0.4, 0.1, 0.1)
    assert measured_seconds(run, retryable=False) == 0.4
    assert len(run.calls) == 1


def test_protocol_constants_are_the_documented_ones():
    assert MEDIAN_CUTOFF == 1.0
    assert STALL_RETRY == 2.5
    assert NO_RETRY == {"c39_signature_index_merge", "b135_retention_delete"}
