"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator registry (SURVEY.md §2) for
the driver's DuckDB cross-check at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from iceberg_playground_spark import registry  # noqa: E402

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the session settings the registry queries rely on (the driver
    may hand us a session built elsewhere)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores timestamp[ns]; Spark's reader rejects NANOS
    # unless they're read as LONG (session.load converts to µs TIMESTAMP).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Stateful streaming instantiates one state store per shuffle
    # partition and AQE cannot coalesce them — at the untouched default
    # of 200 the windowed/stateful queries spend ~6x their wall time on
    # store setup (measured 13.8s -> 2.4s at sf0.01). Right-size only
    # when the session still carries the default; an explicit setting
    # is respected. 16 is the sweet spot for the correctness-sweep
    # scale this path serves (sf0.001-0.01): measured per-query,
    # 64 partitions nearly DOUBLES the stateful queries vs 16
    # (b52 17.0->11.1 s, b65 13.4->6.0 s, b50 5.1->2.8 s) while batch
    # queries at that scale are indifferent. bench.py and production
    # sessions set shuffle partitions explicitly and never hit this.
    import os as _os

    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(16, 2 * (_os.cpu_count() or 8))),
        )
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-shaped pricing summary: parquet scan → pushed filter →
    hash aggregate (6 aggregates, 2 group keys) — the canonical
    scan→filter→agg slice (SURVEY.md §7 milestone 0).
    """
    _configure(spark)
    return registry.QUERIES["b21_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(registry.ORACLES)
