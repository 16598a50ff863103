"""Watermark late-data semantics (B50), tested to Spark's actual
contract — which is one-directional: rows within the watermark delay
are NEVER dropped; rows beyond it are dropped on a best-effort basis.
The hard guarantee append mode adds: once a window finalizes and emits,
it NEVER re-emits — late rows for an already-emitted window are
discarded to preserve the append invariant.

Reproduced deterministically with a three-file source and
maxFilesPerTrigger=1 (files batch in modification-time order):

  batch 0: oldA  — half the old rows; their windows open as state
  batch 1: new   — far-future rows; watermark jumps, every old window
                   finalizes and EMITS
  batch 2: oldB  — the other half of the old rows, landing in windows
                   that already emitted ⇒ MUST be dropped

(An experiment with just [new, old] showed old rows creating brand-new
state below the watermark and emitting at the final flush — that drop
is not guaranteed and must not be asserted.)
"""

from __future__ import annotations

import datetime as dt
import os
import time
import uuid

from pyspark.sql import functions as F

from iceberg_playground_spark.session import load

_CUT = "timestamp'2024-01-06'"


def test_finalized_windows_drop_late_rows(spark, tmp_path):
    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    old = ev.filter(F.col("ts") < F.expr(_CUT))
    new = ev.filter(F.col("ts") >= F.expr(_CUT))
    old_a = old.filter(F.col("event_id") % 2 == 0)
    old_b = old.filter(F.col("event_id") % 2 == 1)
    n_a, n_b, n_new = old_a.count(), old_b.count(), new.count()
    assert n_a > 0 and n_b > 0 and n_new > 0

    base = tmp_path / "src"
    os.makedirs(base)
    order = [("f0_oldA", old_a), ("f1_new", new), ("f2_oldB", old_b)]
    for name, df in order:
        df.coalesce(1).write.parquet(str(base / name))
    now = time.time()
    for i, (name, _) in enumerate(order):
        for f in os.listdir(base / name):
            os.utime(base / name / f, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(old_a.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(base))
        .withWatermark("ts", "10 minutes")
    )
    agg = stream.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.count("*").alias("n")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    rows = spark.table(name).select("w.start", "n").collect()
    starts = [r["start"] for r in rows]
    # append invariant: each window emits exactly once
    assert len(starts) == len(set(starts))
    old_region = sum(
        r["n"] for r in rows if r["start"] < dt.datetime(2024, 1, 6)
    )
    # the already-finalized windows kept ONLY batch-0's rows: every
    # late oldB row was dropped
    assert old_region == n_a
    # ...and nothing within the watermark was lost. Windows whose end
    # is above the final watermark (max event time - 10 min) are still
    # OPEN when availableNow terminates and correctly never emit.
    max_ts = new.agg(F.max("ts")).first()[0]
    wm = max_ts - dt.timedelta(minutes=10)
    n_tail = new.filter(
        (F.floor(F.col("ts").cast("long") / 600) + 1) * 600
        > int(wm.timestamp())
    ).count()
    assert sum(r["n"] for r in rows) == n_a + n_new - n_tail
    assert n_tail >= 1  # the max-ts row itself is always unfinalized
