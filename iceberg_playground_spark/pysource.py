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
