"""Strict schema-directed JSON ingest (SURVEY.md §1.2 / §2 A12).

The reference's `json_to_arrow` coerces JSON into a declared Arrow
schema with a deliberate asymmetry (/root/reference/src/bin/
kafka-bench.rs:261-334):

- a **missing non-nullable field** is an ERROR (`:277-284`);
- a **present but wrong-typed value** silently becomes NULL via
  `as_i64()`-style extraction (`:295-299`);
- an unsupported declared type is an ERROR (`:326`).

Spark's `from_json` is null-on-anything, so strictness is re-imposed
post-decode: the decode marks rows whose *required* fields came back
null while the raw text actually contained the key (wrong type ⇒ fine,
null) or didn't (missing ⇒ violation). Wholly malformed JSON rows are
violations too. `validate()` forces the check distributedly (an
aggregate, not a collect) and raises like the reference's bail-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VIOLATION_COL = "_strict_violation"


def strict_json_decode(
    df: DataFrame,
    json_col: str,
    ddl_schema: str,
    required: list[str],
) -> DataFrame:
    """Decode ``json_col`` against ``ddl_schema``; flag strictness
    violations per row (missing required key / unparseable document).

    Returns the decoded columns plus a boolean ``_strict_violation``.
    The whole check is column expressions — JVM-side, no UDF."""
    parsed = F.from_json(F.col(json_col), ddl_schema)
    checks: list[Column] = [
        # document didn't parse at all
        parsed.isNull() & F.col(json_col).isNotNull()
    ]
    for field in required:
        # required field decoded to null AND the key is absent from the
        # raw text: the reference's missing-field error. Wrong-typed
        # values (key present) stay null without violating (:295-299).
        checks.append(
            parsed.getField(field).isNull()
            & F.get_json_object(F.col(json_col), f"$.{field}").isNull()
        )
    violation = checks[0]
    for c in checks[1:]:
        violation = violation | c
    return df.select(
        "*", parsed.alias("_decoded"), violation.alias(_VIOLATION_COL)
    )


def validate(decoded: DataFrame) -> DataFrame:
    """Raise if any row violated strictness (distributed count — the
    reference errors on first bad message, kafka-bench.rs:277-284; a
    batch engine reports the total)."""
    bad = decoded.filter(F.col(_VIOLATION_COL)).count()
    if bad:
        raise ValueError(
            f"strict JSON decode: {bad} row(s) missing required fields "
            "or unparseable"
        )
    return decoded
