"""Shared helpers for operator queries.

Determinism conventions (the driver hash-compares our DataFrame against
a DuckDB oracle cell-for-cell, so floating point must be bit-identical):

- **Money/quantity aggregates** run in DECIMAL: the test data's doubles
  are exact 2-dp values, so ``CAST(x AS DECIMAL(18,4))`` is lossless and
  decimal addition is associative — any shuffle/partial-agg order gives
  the same bits in Spark and DuckDB. Final results are cast to DOUBLE
  (one correctly-rounded conversion, identical bits in both engines);
  DECIMAL must never appear in driver-facing output — the comparator
  canonicalizes via pandas, where DuckDB decimals become float64 while
  Spark decimals stay ``decimal.Decimal`` objects and never match.
- **Rescale before the double cast.** DuckDB converts DECIMAL→DOUBLE as
  int128→double then ÷10^scale — TWO roundings when the unscaled value
  exceeds 2^53, which can land 1 ulp away from Spark's single-step
  conversion (observed on a scale-12 sum at sf0.001). Cast the final
  decimal down to the smallest semantically-exact scale (products of
  2-dp inputs: 4 or 6) so the unscaled integer stays below 2^53, then
  cast to double — both engines then round identically. Keep factor
  types tight (DECIMAL(5,4)/(6,4)) so products never hit precision 38,
  where Spark truncates scale (allowPrecisionLoss) and DuckDB falls
  back to float.
- **Array/map columns must never appear in driver-facing output** —
  they become numpy ndarrays in pandas and crash the comparator
  (unhashable). Serialize with ``concat_ws``/``to_json`` instead
  (oracle side: ``array_to_string``).
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


# Flagship (b21) oracle SQL — shared by relational.b21_pricing_summary and
# lakehouse.b06_parquet_sink (the sink round-trip must reproduce the
# flagship bit-for-bit), kept here so neither module imports the other:
# registration order is a driver-facing contract (registry.load_all).
B21_ORACLE = """
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        AS sum_base_price,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - CAST(l_discount AS DECIMAL(5,4)) AS DECIMAL(6,4)))
           AS DECIMAL(30,4)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - CAST(l_discount AS DECIMAL(5,4)) AS DECIMAL(6,4))
               * CAST(1 + CAST(l_tax AS DECIMAL(5,4)) AS DECIMAL(6,4)))
           AS DECIMAL(30,6)) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity)
        AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        / count(l_extendedprice) AS avg_price,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """


# Deterministic engine-neutral hash bucket in [0, 100): first 8 hex
# chars of md5(key) as an integer. Spark's conv(hex,16,10) and DuckDB's
# CAST('0x…' AS BIGINT) agree bit-for-bit, so split/sample/rebalance
# membership is reproducible across engines AND across runs — the
# property a training pipeline needs (re-running the corpus build must
# not reshuffle splits). Shared by c17/c18/c19 (llm.py) and p05
# (pipeline.py) so every sampling decision composes off the SAME stamp;
# keep the Spark and SQL forms together or they drift.
def hash_bucket(col: Column) -> Column:
    return (
        F.conv(F.md5(col.cast("string")).substr(1, 8), 16, 10)
        .cast("bigint") % 100
    )


def bucket_sql(col: str) -> str:
    return (
        f"CAST('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % 100"
    )


def dec(col: str | Column, scale: int = 4, precision: int = 18) -> Column:
    """Lossless decimal view of an exact-2dp double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: str | Column, alias: str, scale: int = 4) -> Column:
    """Order-insensitive exact SUM of a 2-dp double column.

    The sum runs in DECIMAL (associative, shuffle-order-proof) and is
    cast to DOUBLE exactly once at the output boundary: decimal→double
    is correctly rounded in both Spark and DuckDB, so the bits match,
    and the driver's pandas-based comparator sees float64 on both sides
    (DuckDB renders DECIMAL as float64; Spark's Arrow toPandas would
    otherwise yield decimal.Decimal objects that can never hash-match).
    """
    return F.sum(dec(col, scale)).cast("double").alias(alias)


