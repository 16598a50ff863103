"""A15 as a first-class Spark SOURCE: the Python Data Source API.

The reference's load generator is an external Go program pushing
synthetic messages through Kafka (`kafka-load-gen/main.go:317-399` —
10 partitions × worker fleet, deterministic schema). ``loadgen.py``
re-expresses its *schema* as column functions; this module goes one
step further and makes synthetic load a real **data source**: Spark 4's
Python Data Source API (``pyspark.sql.datasource``), registered as
``format("assetgen")`` and read like any table.

Why it matters for parity: a user of the reference starts load with an
external binary; a user here writes
``spark.read.format("assetgen").option("rows", n).load()`` — and the
generator inherits Spark's execution model for free: one InputPartition
per topic-partition-analogue (A10), generation running ON the
executors (A15's worker fleet), content a pure function of the row id
(retry-safe, like every sampling stamp in this repo).

Determinism contract: row ``i`` derives every field from md5 of a
seeded key string — reproducible across runs, partitions, and engines
(DuckDB mirrors the arithmetic with its own md5 for the b83 oracle).

Packaging note: the classes are built INSIDE ``build_assetgen_source``
(the ``_make_bounds_task`` rule, tables.py): cloudpickle serializes
locally-defined classes BY VALUE, while a module-level class ships as
an import-by-reference — and executor Python workers don't inherit the
driver's sys.path insert, so a by-reference source dies with
ModuleNotFoundError on the first task.
"""

from __future__ import annotations

SCHEMA = (
    "event_id BIGINT, partition_id INT, user_id BIGINT, "
    "category STRING, amount_cents BIGINT"
)


def build_assetgen_source():
    """Construct the ``assetgen`` DataSource class (self-contained
    closure — see module docstring). Register once per session:
    ``spark.dataSource.register(build_assetgen_source())``."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    schema = SCHEMA
    categories = ["compute", "storage", "network", "identity", "edge"]

    class _Partition(InputPartition):
        def __init__(self, pid: int, lo: int, hi: int):
            self.pid, self.lo, self.hi = pid, lo, hi

    def _gen(lo: int, hi: int):
        """Rows [lo, hi) — pure function of the row id (executor-side)."""
        import hashlib

        for i in range(lo, hi):
            def h(tag: str) -> int:
                return int(
                    hashlib.md5(f"{tag}{i}".encode()).hexdigest()[:8], 16
                )

            yield (
                i,
                i % 10,  # round-robin topic assignment (main.go:378-386)
                h("u") % 1000,
                categories[h("c") % 5],
                h("a") % 100_000,
            )

    class AssetGenReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", 10_000))
            self.parts = int(options.get("partitions", 10))

        def partitions(self):
            # contiguous row ranges, one per partition — the Kafka
            # partition analogue; each generates independently on an
            # executor core (A10/A15)
            per = -(-self.rows // self.parts)
            return [
                _Partition(p, p * per, min((p + 1) * per, self.rows))
                for p in range(self.parts)
                if p * per < self.rows
            ]

        def read(self, partition):
            return _gen(partition.lo, partition.hi)

    from pyspark.sql.datasource import DataSourceStreamReader

    class AssetGenStreamReader(DataSourceStreamReader):
        """Streaming face of the generator (A9/A11 as a custom source):
        offsets are row counts — JSON dicts, checkpointed by the engine,
        so a restarted query resumes exactly where it committed
        (exactly-once, the property the reference's Kafka consumer gets
        from committed offsets). ``latestOffset`` exposes the full
        bounded run up front, so ``availableNow`` drains it in one
        epoch; partitions() still splits the range for executor-parallel
        generation."""

        def __init__(self, options):
            self.rows = int(options.get("rows", 10_000))
            self.parts = int(options.get("partitions", 10))

        def initialOffset(self) -> dict:
            return {"i": 0}

        def latestOffset(self) -> dict:
            return {"i": self.rows}

        def partitions(self, start: dict, end: dict):
            lo, hi = start["i"], end["i"]
            per = max(1, -(-(hi - lo) // self.parts))
            return [
                _Partition(p, lo + p * per, min(lo + (p + 1) * per, hi))
                for p in range(self.parts)
                if lo + p * per < hi
            ]

        def read(self, partition):
            return _gen(partition.lo, partition.hi)

        def commit(self, end: dict) -> None:
            pass  # nothing external to acknowledge

    class AssetGenSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "assetgen"

        def schema(self) -> str:
            return schema

        def reader(self, schema) -> AssetGenReader:
            return AssetGenReader(self.options)

        def streamReader(self, schema) -> AssetGenStreamReader:
            return AssetGenStreamReader(self.options)

    return AssetGenSource


def build_jsondirsink_source():
    """Construct the ``jsondirsink`` DataSource class — the WRITE side
    of the Python Data Source API, completing the custom-source story
    (``assetgen`` reads, this sinks): executors serialize their
    partitions to JSON-lines temp files and return commit messages;
    the DRIVER's commit publishes them with a manifest (rename +
    ``_MANIFEST.json``), abort discards the temp dir — the
    two-phase write/commit protocol of the reference's decoupled
    writer fleet + single committer
    (/root/reference/src/bin/decouple.rs:112-156, 211-299) expressed
    through the public API. Tasks that receive no rows return an
    empty message and publish nothing.

    On a real cluster ``path`` must be shared storage (the driver
    renames what executors wrote) — same contract as every file sink.
    Classes are closure-local for the cloudpickle by-value rule (see
    module docstring)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Msg(WriterCommitMessage):
        def __init__(self, fn, n):
            self.fn, self.n = fn, n

    class _JsonDirWriter(DataSourceWriter):
        def __init__(self, path: str):
            if not path:
                raise ValueError("jsondirsink requires option 'path'")
            self.path = path

        def write(self, iterator):
            import json as _json
            import os as _os
            import uuid as _uuid

            fn, n, f = None, 0, None
            tmp_dir = _os.path.join(self.path, "_tmp")
            try:
                for row in iterator:
                    if f is None:  # lazily: empty tasks publish nothing
                        _os.makedirs(tmp_dir, exist_ok=True)
                        fn = f"part-{_uuid.uuid4().hex}.jsonl"
                        f = open(_os.path.join(tmp_dir, fn), "w")
                    f.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            finally:
                if f is not None:
                    f.close()
            return _Msg(fn, n)

        def commit(self, messages):
            import json as _json
            import os as _os
            import shutil as _shutil

            # an all-empty write never created the dir on the driver's
            # filesystem — the manifest must still publish (files: [])
            _os.makedirs(self.path, exist_ok=True)
            files = []
            for m in messages:
                if m is None or m.fn is None:
                    continue
                _os.replace(
                    _os.path.join(self.path, "_tmp", m.fn),
                    _os.path.join(self.path, m.fn),
                )
                files.append({"file": m.fn, "rows": m.n})
            with open(
                _os.path.join(self.path, "_MANIFEST.json"), "w"
            ) as fh:
                _json.dump({"files": files}, fh)
            _shutil.rmtree(
                _os.path.join(self.path, "_tmp"), ignore_errors=True
            )

        def abort(self, messages):
            import os as _os
            import shutil as _shutil

            _shutil.rmtree(
                _os.path.join(self.path, "_tmp"), ignore_errors=True
            )

    from pyspark.sql.datasource import DataSourceStreamWriter

    class _JsonDirStreamWriter(DataSourceStreamWriter):
        """Per-EPOCH two-phase commit: same executor write path, but
        the driver publishes one ``_MANIFEST-<batchId>.json`` per
        micro-batch — the interval-committed manifest stream of the
        reference's committer loop (decouple.rs:224-267). A replayed
        epoch (failure recovery) overwrites its own manifest
        idempotently; uncommitted temp files are never listed."""

        def __init__(self, path: str):
            self._w = _JsonDirWriter(path)
            self.path = path

        def write(self, iterator):
            return self._w.write(iterator)

        def commit(self, messages, batchId: int):
            import json as _json
            import os as _os

            _os.makedirs(self.path, exist_ok=True)
            files = []
            for m in messages:
                if m is None or m.fn is None:
                    continue
                _os.replace(
                    _os.path.join(self.path, "_tmp", m.fn),
                    _os.path.join(self.path, m.fn),
                )
                files.append({"file": m.fn, "rows": m.n})
            with open(
                _os.path.join(self.path, f"_MANIFEST-{batchId}.json"), "w"
            ) as fh:
                _json.dump({"batch": batchId, "files": files}, fh)

        def abort(self, messages, batchId: int):
            self._w.abort(messages)

    class JsonDirSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "jsondirsink"

        def writer(self, schema, overwrite: bool):
            return _JsonDirWriter(self.options.get("path"))

        def streamWriter(self, schema, overwrite: bool):
            return _JsonDirStreamWriter(self.options.get("path"))

    return JsonDirSink
