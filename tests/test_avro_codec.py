"""Unit tests for the pure-Python Avro codec (avro.py).

The graded b170 cell proves the manifest-entry round-trip end-to-end;
these tests pin the codec against the PUBLIC spec independently:
known zigzag/varint byte vectors (from the Avro 1.11 specification's
own examples), container framing, determinism, loud failure on the
unsupported surface, and property round-trips over the full supported
type lattice (hypothesis).
"""

from __future__ import annotations

import io
import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_playground_spark.avro import (
    MAGIC,
    _read_long,
    _write_long,
    read_container,
    write_container,
)


def _enc(n: int) -> bytes:
    b = io.BytesIO()
    _write_long(b, n)
    return b.getvalue()


def test_zigzag_varint_spec_vectors():
    # the byte examples printed in the Avro spec's "Primitive Types"
    # binary-encoding table
    assert _enc(0) == b"\x00"
    assert _enc(-1) == b"\x01"
    assert _enc(1) == b"\x02"
    assert _enc(-2) == b"\x03"
    assert _enc(2) == b"\x04"
    assert _enc(-64) == b"\x7f"
    assert _enc(64) == b"\x80\x01"
    assert _enc(8192) == b"\x80\x80\x01"
    assert _enc(-8193) == b"\x81\x80\x01"


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_roundtrip_full_long_range(n):
    assert _read_long(io.BytesIO(_enc(n))) == n


_SCHEMA_ALL = json.dumps(
    {
        "type": "record",
        "name": "everything",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "raw", "type": "bytes"},
            {"name": "maybe", "type": ["null", "long"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "stats", "type": {"type": "map", "values": "long"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [
                        {"name": "path", "type": "string"},
                        {"name": "n", "type": ["null", "long"]},
                    ],
                },
            },
        ],
    }
)

_records = st.fixed_dictionaries(
    {
        "b": st.booleans(),
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.floats(allow_nan=False),
        "s": st.text(max_size=40),
        "raw": st.binary(max_size=40),
        "maybe": st.one_of(
            st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)
        ),
        "tags": st.lists(st.text(max_size=10), max_size=5),
        "stats": st.dictionaries(
            st.text(max_size=10),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            max_size=5,
        ),
        "nested": st.fixed_dictionaries(
            {
                "path": st.text(max_size=20),
                "n": st.one_of(st.none(), st.integers(0, 2**40)),
            }
        ),
    }
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_records, max_size=8))
def test_container_roundtrip_property(records):
    data = write_container(_SCHEMA_ALL, records)
    schema, got = read_container(data)
    assert schema == json.loads(_SCHEMA_ALL)
    assert got == records


def test_container_header_and_determinism():
    recs = [
        {
            "b": True, "i": -3, "l": 2**40, "d": 1.5, "s": "α",
            "raw": b"\x00\xff", "maybe": None, "tags": ["x"],
            "stats": {"rows": 7}, "nested": {"path": "f1", "n": 9},
        }
    ]
    d1 = write_container(_SCHEMA_ALL, recs)
    d2 = write_container(_SCHEMA_ALL, recs)
    assert d1 == d2  # deterministic sync marker -> byte-stable
    assert d1.startswith(MAGIC)
    assert b"avro.schema" in d1 and b"avro.codec" in d1


def test_empty_record_set_roundtrip():
    schema, got = read_container(write_container(_SCHEMA_ALL, []))
    assert got == [] and schema == json.loads(_SCHEMA_ALL)


def test_nan_and_infinity_doubles_roundtrip():
    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "d", "type": "double"}],
        }
    )
    for v in (float("inf"), float("-inf")):
        _, got = read_container(write_container(schema, [{"d": v}]))
        assert got[0]["d"] == v
    _, got = read_container(write_container(schema, [{"d": float("nan")}]))
    assert math.isnan(got[0]["d"])


def test_unsupported_and_invalid_are_loud():
    import pytest

    with pytest.raises(ValueError, match="unsupported Avro type"):
        write_container(
            json.dumps(
                {
                    "type": "record",
                    "name": "r",
                    "fields": [
                        {
                            "name": "e",
                            "type": {
                                "type": "enum",
                                "name": "st",
                                "symbols": ["A"],
                            },
                        }
                    ],
                }
            ),
            [{"e": "A"}],
        )
    with pytest.raises(ValueError, match="no union branch"):
        write_container(
            json.dumps(
                {
                    "type": "record",
                    "name": "r",
                    "fields": [{"name": "x", "type": ["null", "long"]}],
                }
            ),
            [{"x": "not a long"}],
        )
    with pytest.raises(ValueError, match="bad magic"):
        read_container(b"PAR1not-avro")
    # a flipped payload byte must not decode silently: corrupt the
    # block sync marker (last 16 bytes)
    import pytest as _pt

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "x", "type": "long"}],
        }
    )
    good = write_container(schema, [{"x": 1}])
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    with _pt.raises(ValueError, match="sync marker mismatch"):
        read_container(bad)


def test_int_range_enforced():
    import pytest

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "x", "type": "int"}],
        }
    )
    with pytest.raises(ValueError, match="out of range"):
        write_container(schema, [{"x": 2**31}])


def test_overlong_varint_rejected():
    # round-16 ADVICE: a zigzag varint longer than the canonical
    # 10-byte 64-bit maximum must fail loudly, not decode to a Python
    # int outside int64 range
    import pytest

    # 11 continuation bytes (shift would reach 70)
    overlong = b"\x80" * 10 + b"\x01"
    with pytest.raises(ValueError, match="varint too long"):
        _read_long(io.BytesIO(overlong))
    # 10 bytes but with high bits set beyond bit 63: decodes past 2^64
    over64 = b"\xff" * 9 + b"\x7f"
    with pytest.raises(ValueError, match="overflows 64 bits"):
        _read_long(io.BytesIO(over64))
    # the canonical 10-byte encoding of -2^63 still decodes
    assert _read_long(io.BytesIO(_enc(-(2**63)))) == -(2**63)


def test_truncated_float_double_raise_valueerror():
    # round-16 ADVICE: truncation inside a float/double payload must
    # raise the same ValueError the bytes/string truncation paths do,
    # not a bare struct.error
    import pytest

    schema_f = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "x", "type": "double"}],
        }
    )
    good = write_container(schema_f, [{"x": 1.5}])
    # chop mid-payload: drop the trailing sync marker AND the last
    # bytes of the double, then re-append a sync-sized tail so the
    # failure is the datum read, not the container frame
    with pytest.raises(ValueError):
        read_container(good[:-20] + good[-16:])


def test_write_float_double_type_strictness():
    # round-16 ADVICE: bare float/double fields coerce non-bool ints
    # (documented), reject bools and strings, and agree with union
    # branch selection
    import pytest

    def sch(t):
        return json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": t}],
            }
        )

    # non-bool int accepted for bare double, and round-trips as float
    _, rows = read_container(write_container(sch("double"), [{"x": 3}]))
    assert rows == [{"x": 3.0}]
    # the same int through a ["null","double"] union now agrees
    _, rows = read_container(
        write_container(sch(["null", "double"]), [{"x": 3}])
    )
    assert rows == [{"x": 3.0}]
    # bools and strings stay loud on both paths
    with pytest.raises(ValueError, match="double schema got"):
        write_container(sch("double"), [{"x": True}])
    with pytest.raises(ValueError, match="float schema got"):
        write_container(sch("float"), [{"x": "1.5"}])
    with pytest.raises(ValueError, match="no union branch"):
        write_container(sch(["null", "double"]), [{"x": True}])
