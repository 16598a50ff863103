"""Shared helpers for operator queries.

Determinism conventions (the driver hash-compares our DataFrame against
a DuckDB oracle cell-for-cell, so floating point must be bit-identical):

- **Money/quantity aggregates** run in DECIMAL: the test data's doubles
  are exact 2-dp values, so ``CAST(x AS DECIMAL(18,4))`` is lossless and
  decimal addition is associative — any shuffle/partial-agg order gives
  the same bits in Spark and DuckDB. Final results are cast to an
  explicit DECIMAL(38,s) so both engines agree on the output type.
- **Derived doubles** (averages, stddev, correlations) are computed from
  those exact decimal sums with a fixed sequence of IEEE double ops
  (cast → divide → sqrt), which both engines evaluate identically.
- **Per-row doubles** (a single multiply/compare per row) are already
  deterministic; only multi-row float accumulation is rewritten.
- **Timestamps** are compared as `timestamp_ntz` (µs) or formatted
  strings; the session timezone is pinned to UTC.
- Every computed column is aliased identically in the Spark query and
  the oracle SQL (driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from iceberg_playground_spark.session import load  # noqa: F401  (re-export)


def dec(col: str | Column, scale: int = 4, precision: int = 18) -> Column:
    """Lossless decimal view of an exact-2dp double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-insensitive exact SUM of a 2-dp double column."""
    return F.sum(dec(col, scale)).cast(f"decimal(38,{scale})").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum → double → / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(dec(c, scale)).cast("double") / F.count(c)
    ).alias(alias)
