"""Strict schema-directed JSON ingest (SURVEY.md §1.2 / §2 A12).

The reference's `json_to_arrow` coerces JSON into a declared Arrow
schema with a deliberate asymmetry (/root/reference/src/bin/
kafka-bench.rs:261-334):

- a **missing non-nullable field** is an ERROR (`:277-284`);
- a **present but wrong-typed value** silently becomes NULL via
  `as_i64()`-style extraction (`:295-299`) — and a present explicit
  JSON ``null`` goes the same way (the `as_i64` path returns None for
  it; it is NOT a missing-field error);
- an unsupported declared type is an ERROR (`:326`).

Spark's `from_json` is null-on-anything, so strictness is re-imposed
post-decode: the decode marks rows whose *required* fields came back
null while the raw object actually lacks the key (absent ⇒ violation;
present-but-null or wrong-typed ⇒ silent NULL, per the asymmetry
above). Wholly malformed JSON rows are violations too.

Two ways to enforce:

- ``validated(df)`` — the scale path: attaches an ``Observation`` so
  the violation count rides along the caller's own sink/aggregate pass
  (zero extra reads at 100 TB); call the returned ``check()`` after the
  first action.
- ``validate(df)`` — eager convenience for tests/small batches: forces
  one distributed pass and raises immediately, like the reference's
  bail-out.
"""

from __future__ import annotations

from collections.abc import Callable

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
    The whole check is column expressions — JVM-side, no UDF.

    Required fields are top-level keys (the reference's schemas are
    flat, kafka-bench.rs:37-40). Key presence is tested against
    ``json_object_keys`` — not ``get_json_object``, which returns NULL
    for both an absent key and a present explicit ``null`` and would
    wrongly flag ``{"k": null}`` as missing (the reference treats a
    present null like a wrong-typed value: silent NULL, not an error).
    """
    raw = F.col(json_col)
    parsed = F.from_json(raw, ddl_schema)
    # top-level keys of the raw object; NULL when the document is not
    # valid JSON (that case is already violation #1)
    keys = F.json_object_keys(raw)
    checks: list[Column] = [
        # document didn't parse at all
        parsed.isNull() & raw.isNotNull()
    ]
    for field in required:
        # required field decoded to null AND the key is absent from the
        # raw object: the reference's missing-field error. Wrong-typed
        # or explicitly-null values (key present) stay null without
        # violating (:295-299).
        checks.append(
            parsed.getField(field).isNull()
            & ~F.coalesce(
                F.array_contains(keys, F.lit(field)), F.lit(False)
            )
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
    r = spark.readStream.format("kafka")
    for k, v in kafka_options(
        bootstrap_servers,
        topic,
        starting_offsets=starting_offsets,
        sasl=sasl,
        max_offsets_per_trigger=max_offsets_per_trigger,
    ).items():
        r = r.option(k, v)
    return r.load()


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    sasl: dict | None = None,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The Kafka source option map (factored out so the consumer config
    is assertable without a broker: the reference pins
    bootstrap.servers / subscribe / auto.offset.reset=earliest at
    kafka-bench.rs:43-52; SASL/TLS client props ride under Spark's
    ``kafka.`` prefix, kafka-load-gen/main.go:339-350)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    for k, v in (sasl or {}).items():
        opts[f"kafka.{k}"] = v
    return opts


def validated(decoded: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    """Single-pass strictness enforcement for pipelines: returns the
    DataFrame with an attached ``Observation`` plus a ``check()`` to
    call after the caller's first action on it (write, aggregate, …).

    The violation count is collected as a side-metric of that action —
    no dedicated validation pass, so at 100 TB the input is read once,
    not twice (the round-2 audit's flagged anti-pattern)."""
    from pyspark.sql import Observation

    obs = Observation()
    out = decoded.observe(
        obs, F.sum(F.col(_VIOLATION_COL).cast("long")).alias("bad")
    )

    def check() -> None:
        bad = obs.get["bad"] or 0
        if bad:
            raise ValueError(
                f"strict JSON decode: {bad} row(s) missing required "
                "fields or unparseable"
            )

    return out, check


def validate(decoded: DataFrame) -> DataFrame:
    """Eager strictness check (tests / small batches): raises like the
    reference's bail-out (kafka-bench.rs:277-284) after exactly ONE
    scan of the input, total — including the caller's subsequent use.

    The input is persisted, the validating action populates the cache,
    and the *returned* DataFrame reads from that cache — so unlike the
    old shape (count() pass + caller's pass = two input scans), the
    source is never re-read. The round-3 audit flagged the double scan;
    the reference errors *during* its single conversion pass
    (kafka-bench.rs:277-284), and so does this now.

    This eager form is for bounded batches, where caching the batch is
    free; unbounded pipelines use ``validated()``, which piggybacks the
    same Observation on the caller's own sink pass with no cache at
    all."""
    observed, check = validated(decoded)
    # Persist BEFORE the validating action: the one pass that drives
    # the CollectMetrics node also fills the cache, and every caller
    # action on the returned DF is an InMemoryTableScan, not a re-read
    # of the source (tests/test_loadgen_ingest.py pins this plan).
    observed.persist()
    try:
        observed.count()
        check()
    except Exception:
        observed.unpersist()
        raise
    return observed
