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


def kafka_stream(
    spark,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    sasl: dict | None = None,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """A9/A11/A16: Kafka streaming source — config-only parity with the
    reference's consumer (subscribe + earliest offsets,
    /root/reference/src/bin/kafka-bench.rs:43-55; micro-batch bound ≈
    `ready_chunks`, `:191-195`; SASL/TLS options mirror
    kafka-load-gen/main.go:339-352 — pass credentials via `sasl`, NEVER
    hardcode them as the reference does at main.go:351-352).

    Partition-parallel by construction: one Spark task per topic
    partition (A10 is built in). No broker exists in this sandbox, so
    this is exercised only by config; the file-source queries in
    queries/streaming.py cover the engine behind it."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (sasl or {}).items():
        r = r.option(f"kafka.{k}", v)
    return r.load()


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
