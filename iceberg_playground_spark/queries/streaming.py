"""Layer B streaming surface (SURVEY.md §2 B47-B54, + B63 CDC upsert
sink and B65 stream-stream join).

The reference is, at heart, a streaming-ingest playground: Kafka JSON →
typed columns → parquet files → interval-batched snapshot commits
(/root/reference/src/bin/kafka-bench.rs:173-256, src/bin/
decouple.rs:211-299). No Kafka broker exists in this environment
(SURVEY §7 risk register), so every query here streams the `events`
table through Spark's FILE source with an `availableNow` trigger and a
memory sink — the same Structured Streaming engine, watermarks, state
store, and sink-commit machinery a Kafka deployment would use; only the
source format string differs (`kafka` ⇄ `parquet`, A9's config-only
delta).

Determinism: `availableNow` drains the bounded input and terminates, so
windowed/sessionized/deduped results equal their batch equivalents —
those get DuckDB oracles (B47/B48/B49/B51/B53/B54 hash-match; B50/B52
rows-only: watermark drops depend on batch boundaries, and stateful
output is engine-native).

Money-exactness: `value` is a 2-dp double; aggregates sum
`round(value*100)` as BIGINT cents — order-proof integer addition on
both engines.

Stateful API choice: B52 uses ``applyInPandasWithState``.
``transformWithStateInPandas`` (Spark 4's successor) was evaluated and
is environmentally blocked here — its driver worker needs a working
``google.protobuf`` (ImportError in this container, and installs are
out of scope). The operator shape is identical; swapping the API is a
mechanical port once the dependency exists.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_playground_spark.registry import query
from iceberg_playground_spark.session import table_path

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _scratch(prefix: str) -> str:
    """Throwaway checkpoint/sink dir for the demo streams, on tmpfs
    when the host has one (/dev/shm): these fixtures are drained and
    discarded inside one query call, and the shared sandbox disk is
    the known source of b54's 2.5x run-to-run swing. A PRODUCTION
    stream's checkpoint must live on durable shared storage (S3/HDFS —
    it is the exactly-once contract across driver restarts); only the
    within-call demo artifacts belong in memory.

    Unlike /tmp, tmpfs has no OS reaper — stale dirs would pin RAM
    across a long session — so each call sweeps siblings of this
    module's prefixes older than an hour (best-effort; in-flight runs
    are minutes old at most)."""
    shm = "/dev/shm"
    if not (os.path.isdir(shm) and os.access(shm, os.W_OK)):
        return tempfile.mkdtemp(prefix=prefix)
    import shutil
    import time

    cutoff = time.time() - 3600
    try:
        for d in os.listdir(shm):
            if d.startswith("ips_stream"):
                p = os.path.join(shm, d)
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    return tempfile.mkdtemp(prefix=prefix, dir=shm)


def _stream_events(spark: SparkSession, sf: str) -> DataFrame:
    """`events` as an unbounded stream (file source stands in for the
    reference's Kafka consumer, kafka-bench.rs:43-55). The declared
    schema comes from the batch reader — explicit, never inferred
    mid-stream — and the ns→µs timestamp conversion matches load()."""
    path = table_path(sf, "events")
    # The file source streams a DIRECTORY (new files appear = new data —
    # the Kafka-partition analogue); testdata is a single file, so
    # expose it through a stable per-sf symlink dir.
    src_dir = os.path.join(
        tempfile.gettempdir(),
        f"ips_stream_src_{hashlib.sha1(path.encode()).hexdigest()[:12]}",
    )
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    df = spark.readStream.schema(schema).parquet(src_dir)
    # Event-time columns must be TIMESTAMP (withWatermark rejects NTZ:
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The session timezone is
    # pinned UTC, so either conversion below preserves wall values and
    # matches the batch/oracle ntz reading exactly.
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":  # epoch-ns encoding
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp")
        )
    elif ts_type == "timestamp_ntz":  # parquet timestamp[us] w/o tz
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _run_to_memory(df: DataFrame, mode: str = "append") -> DataFrame:
    """Drain a bounded stream through a memory sink (availableNow — the
    count-bounded test harness the reference uses at
    bench-kafka.rs:66-108) and return the sink table."""
    name = f"mem_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return df.sparkSession.table(name)


_CENTS = "CAST(round(value * 100) AS BIGINT)"


@query(
    "b68_tumbling_window",  # SURVEY B47; renamed: b47 = json_funcs pack
    oracle=f"""
    SELECT strftime(to_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
                                 // 600 * 600), '{_TS_FMT_DUCK}') AS win_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS value_cents
    FROM events
    GROUP BY win_start
    """,
)
def b68_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """B47: tumbling 10-minute window aggregation on the stream.
    Stateful hash agg keyed by (window): partial aggregation happens
    per micro-batch map-side; the state store holds one row per open
    window, not per event — constant memory at any throughput."""
    ev = _stream_events(spark, sf)
    agg = ev.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.count("*").alias("n"),
        F.sum(F.expr(_CENTS)).alias("value_cents"),
    )
    out = agg.select(
        F.date_format("w.start", _TS_FMT).alias("win_start"),
        "n",
        "value_cents",
    )
    return _run_to_memory(out, mode="complete")


@query(
    "b69_sliding_window",  # SURVEY B48; renamed: b48 = hash_funcs pack
    oracle=f"""
    WITH starts AS (
      SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 300 * 300 AS s1,
             {_CENTS} AS cents
      FROM events),
    expanded AS (
      SELECT unnest([s1, s1 - 300]) AS win_s, cents FROM starts)
    SELECT strftime(to_timestamp(win_s), '{_TS_FMT_DUCK}') AS win_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS value_cents
    FROM expanded GROUP BY win_s
    """,
)
def b69_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """B48: sliding window (10 min length, 5 min slide) — every event
    lands in exactly 2 windows; Spark expands then aggregates, state =
    one row per open window. The oracle mirrors the expansion
    arithmetically (each event's two slide-aligned window starts)."""
    ev = _stream_events(spark, sf)
    agg = ev.groupBy(
        F.window("ts", "10 minutes", "5 minutes").alias("w")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.expr(_CENTS)).alias("value_cents"),
    )
    out = agg.select(
        F.date_format("w.start", _TS_FMT).alias("win_start"),
        "n",
        "value_cents",
    )
    return _run_to_memory(out, mode="complete")


@query(
    "b70_session_window",  # SURVEY B49; renamed: b49 = idgen
    oracle=f"""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    OR CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER w
                       >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    g AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS grp
      FROM o)
    SELECT user_id,
           strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(max(ts) + INTERVAL 5 MINUTE, '{_TS_FMT_DUCK}')
             AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, grp
    """,
)
def b70_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """B49: session windows (5-minute inactivity gap) per user. Spark
    merges events into [first, last+gap) sessions in the state store —
    state is per OPEN session and closes as the watermark passes, so
    memory is bounded by concurrent sessions, not history. On bounded
    input the result equals the classic gaps-and-islands SQL, which is
    the oracle (an event exactly gap-distant starts a new session —
    half-open interval semantics on both sides)."""
    ev = _stream_events(spark, sf)
    agg = ev.groupBy(
        F.session_window("ts", "5 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    out = agg.select(
        "user_id",
        F.date_format("w.start", _TS_FMT).alias("session_start"),
        F.date_format("w.end", _TS_FMT).alias("session_end"),
        "n_events",
    )
    return _run_to_memory(out, mode="complete")


@query("b50_watermark_late_drop")  # batch-boundary-dependent → rows-only
def b50_watermark_late_drop(spark: SparkSession, sf: str) -> DataFrame:
    """B50: watermark + late-data handling. The stream declares
    `withWatermark("ts", "10 minutes")`: windows older than
    max(event-time)-10min finalize, emit once (append mode), and evict
    from the state store; late rows for an ALREADY-EMITTED window are
    dropped to preserve the append invariant. The guarantee is
    one-directional — within-delay rows are never dropped, beyond-delay
    drops are best-effort (tests/test_streaming_semantics.py pins the
    exact contract with a 3-batch reproduction). Which rows count as
    late depends on micro-batch boundaries ⇒ rows-only by nature."""
    ev = _stream_events(spark, sf).withWatermark("ts", "10 minutes")
    agg = ev.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.count("*").alias("n")
    )
    out = agg.select(
        F.date_format("w.start", _TS_FMT).alias("win_start"), "n"
    )
    # append mode emits a window only once its watermark passes — the
    # late-drop contract, observable as: every emitted window is final.
    return _run_to_memory(out, mode="append")


@query(
    "b51_streaming_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def b51_streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """B51: streaming dedup via ``dropDuplicatesWithinWatermark`` —
    plain ``dropDuplicates`` only evicts state when the event-time
    column is part of the dedup key, so on keys (user_id, event_type)
    its state grows forever on an unbounded stream (the 100 TB failure
    mode). The WithinWatermark variant evicts each key once the
    watermark passes its first-seen time + delay, bounding state while
    guaranteeing dedup for duplicates arriving within the delay. The
    31-day delay covers the fixture's full 30-day span, so no key ever
    re-emits and the drained result is exactly SELECT DISTINCT."""
    ev = _stream_events(spark, sf).withWatermark("ts", "31 days")
    deduped = ev.dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    ).select("user_id", "event_type")
    return _run_to_memory(deduped, mode="append")


@query(
    "b52_stateful_per_key",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum({_CENTS}) AS BIGINT) AS value_cents,
           strftime(min(CAST(ts AS TIMESTAMP)), '{_TS_FMT_DUCK}')
             AS first_seen,
           strftime(max(CAST(ts AS TIMESTAMP)), '{_TS_FMT_DUCK}')
             AS last_seen
    FROM events GROUP BY user_id
    """,
)
def b52_stateful_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """B52: arbitrary stateful per-key processing via
    applyInPandasWithState — the custom-operator escape hatch (user
    code owns the per-key state dict; Spark owns sharding, state
    storage, and recovery). The kernel keeps per-user running
    (count, cents, min_ts, max_ts); Arrow-batched, one Python call per
    key-batch. On one availableNow pass the state equals a per-key
    aggregate, so a plain GROUP BY oracles it (integer cents: no float
    accumulation order anywhere)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _stream_events(spark, sf).select(
        "user_id", "ts", F.expr(_CENTS).alias("cents")
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("value_cents", LongType()),
            StructField("first_seen", StringType()),
            StructField("last_seen", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("cents", LongType()),
            StructField("mn", LongType()),  # µs epochs: exact ints
            StructField("mx", LongType()),
        ]
    )

    def track(key, pdfs, state: GroupState):
        n = cents = 0
        mn = mx = None
        if state.exists:
            n, cents, mn, mx = state.get
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
            us = pdf["ts"].astype("int64") // 1000  # ns → µs
            lo, hi = int(us.min()), int(us.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        state.update((n, cents, mn, mx))
        fmt = lambda us: pd.Timestamp(us, unit="us").strftime(  # noqa: E731
            "%Y-%m-%d %H:%M:%S"
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_cents": [cents],
                "first_seen": [fmt(mn)],
                "last_seen": [fmt(mx)],
            }
        )

    stateful = ev.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(stateful, mode="update")


@query(
    "b53_stream_static_join",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum({_CENTS}) AS BIGINT) AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def b53_stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """B53: stream ⋈ static dimension — the event stream enriched
    against the customer table (a batch DataFrame). Spark broadcasts /
    re-reads the static side per micro-batch; no stream-side state.
    This is the reference's asset-enrichment shape (events carry ids,
    dimensions live in the lake)."""
    from iceberg_playground_spark.queries._util import load

    ev = _stream_events(spark, sf)
    cust = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(cust, ev.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr(_CENTS)).alias("value_cents"),
    )
    return _run_to_memory(agg, mode="complete")


@query(
    "b54_stream_lakehouse_sink",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE TRY_CAST(props->>'$.k' AS INT)
                                 IS NOT NULL) AS BIGINT) AS n_with_k,
           1 AS n_commits
    FROM events
    """,
)
def b54_stream_lakehouse_sink(spark: SparkSession, sf: str) -> DataFrame:
    """B54/A8: the reference's whole pipeline — stream → schema-directed
    JSON decode → parquet files → batched snapshot commit — as
    foreachBatch into the lakehouse table layer. Executors write each
    micro-batch's files in parallel (the writer fleet,
    decouple.rs:158-208); the driver's BatchedCommitter makes ONE
    snapshot per epoch (the single committer + 5 s coalescing,
    decouple.rs:211-299 — epoch boundaries replace wall-clock ticks
    under availableNow). Result: rows landed, rows with a decoded
    props.k, snapshots committed — the end-count check the reference
    prints at decouple.rs:274-298."""
    import shutil
    import tempfile

    from iceberg_playground_spark.tables import BatchedCommitter, LakeCatalog

    ev = _stream_events(spark, sf).select(
        "event_id",
        "user_id",
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )

    tmp = _scratch("ips_stream_sink_")
    try:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "stream", "events_sink",
            "event_id BIGINT, user_id BIGINT, event_type STRING, k INT",
            drop_if_exists=True,
        )
        committer = BatchedCommitter(t, interval_s=0.0)  # commit per epoch

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            committer.add(t.stage_append(batch_df))

        q = (
            ev.writeStream.foreachBatch(sink_batch)
            .option(
                "checkpointLocation",
                _scratch("ips_stream_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        committer.flush()

        # one read-back job: both counts in a single aggregation pass
        n_rows, n_with_k = t.read().agg(
            F.count("*"), F.count("k")
        ).first()
        return spark.createDataFrame(
            [(n_rows, n_with_k, t.current_version())],
            "n_rows BIGINT, n_with_k BIGINT, n_commits INT",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "b63_stream_upsert_sink",
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
           CAST(count(*) AS BIGINT) AS n_events_seen
    FROM events
    """,
)
def b63_stream_upsert_sink(spark: SparkSession, sf: str) -> DataFrame:
    """B63/A5: CDC-shaped streaming sink — each micro-batch UPSERTS its
    last-event-per-user into the lakehouse table (foreachBatch →
    tables.upsert, the same-txn delete+append of deletes.rs:94-110), so
    the table converges to exactly one row per user regardless of how
    the stream is chopped into batches. The per-user VALUES depend on
    batch order (engine-native), but the key-set does not: n_keys
    hash-matches count(DISTINCT user_id) and total events processed
    equals the table's row count upstream."""
    import shutil
    import tempfile

    from pyspark.sql import Window as W

    from iceberg_playground_spark.tables import LakeCatalog

    ev = _stream_events(spark, sf).select("event_id", "user_id", "event_type")

    tmp = _scratch("ips_stream_upsert_")
    try:
        cat = LakeCatalog(spark, tmp)
        t = cat.create_table(
            "stream", "user_state",
            "event_id BIGINT, user_id BIGINT, event_type STRING",
            drop_if_exists=True,
        )
        seen = spark.sparkContext.accumulator(0)

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            # cache: the count and the window+upsert below share ONE
            # evaluation of the micro-batch source (uncached, the upsert
            # would recompute the batch from scratch — an extra full
            # pass per epoch, the round-2 audit's flagged anti-pattern)
            batch_df.persist()
            try:
                n = batch_df.count()
                seen.add(n)
                if n == 0:
                    return
                w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
                last = (
                    batch_df.withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") == 1)
                    .drop("rn")
                )
                t.upsert(last, ["user_id"])
            finally:
                batch_df.unpersist()

        q = (
            ev.writeStream.foreachBatch(sink_batch)
            .option(
                "checkpointLocation",
                _scratch("ips_stream_upsert_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_keys = t.read().count()
        return spark.createDataFrame(
            [(n_keys, seen.value)], "n_keys BIGINT, n_events_seen BIGINT"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "b65_stream_stream_join",
    oracle=f"""
    WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, {_CENTS} AS cents
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click')
    SELECT p.user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(p.cents) AS BIGINT) AS purchase_cents
    FROM p JOIN c ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
    GROUP BY p.user_id
    """,
)
def b65_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """B65: stream-STREAM inner join — purchases joined to the same
    user's clicks in the preceding 30 minutes, both sides unbounded
    streams with watermarks. Spark buffers each side in the state
    store and emits a match the moment both rows exist; the time-bound
    condition + watermarks let it EVICT state older than the band (the
    unbounded-state hazard every stream-stream join must solve — state
    is the 30-minute band per user, not history). On a drained
    availableNow run every match is emitted, so the batch time-band
    join is the exact oracle; the per-user rollup runs batch-side on
    the sink table."""
    p = (
        _stream_events(spark, sf)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.expr(_CENTS).alias("cents"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    c = (
        _stream_events(spark, sf)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "30 minutes")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    sink = _run_to_memory(joined.select("user_id", "cents", "p_ts", "c_ts"))
    return sink.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum("cents").alias("purchase_cents"),
    )
