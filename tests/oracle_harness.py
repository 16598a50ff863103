"""Local stand-in for the driver's DuckDB cross-check.

Faithful to the driver's comparator semantics (CORRECTNESS_r01.json
post-mortem): both result sets are materialized as **pandas** frames
(Spark via Arrow ``toPandas``, DuckDB via ``.df()``), columns sorted by
name, rows sorted, then cells compared on canonical string forms.

Two driver behaviors are deliberately reproduced because round 1 proved
a "nicer" local harness hides real failures:

- ``decimal.Decimal`` cells are NOT normalized to floats. DuckDB
  renders DECIMAL results as float64 in pandas while Spark's Arrow path
  yields Decimal objects — if a query emits DECIMAL output, the driver
  can never hash-match it, so neither do we. (Queries must cast decimal
  outputs to DOUBLE at the boundary; see queries/_util.py.)
- array/map cells (numpy ndarrays / lists in pandas) raise, mirroring
  the driver's ``unhashable type: 'numpy.ndarray'`` crash. Queries must
  serialize array outputs to scalars.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from iceberg_playground_spark.session import TABLE_NAMES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


class UnhashableCell(TypeError):
    """A cell type the driver's comparator cannot hash (array/map)."""


def _canon(v):
    """Canonical, engine-neutral string for one pandas cell.

    float64 bits are identical across engines when our determinism
    conventions hold, so ``repr(float)`` (shortest round-trip form) is a
    faithful equality key. Decimals keep their scale on purpose.
    """
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        raise UnhashableCell(f"array/map cell in output: {type(v).__name__}")
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return f"Decimal({v})"  # deliberately never equal to a float form
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        # date vs midnight-timestamp renderings must coincide (engines
        # disagree on whether DATE surfaces as date or datetime64).
        return dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _frame_canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon(pdf.iloc[i][c]) for c in cols) for i in range(len(pdf))
    ]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []

    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()

    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
        return problems

    # dtype FAMILY must agree — the one schema signal the value
    # comparison below cannot give (an empty result compares equal on
    # values no matter the types). Calibrated against actual driver
    # grades: round 8 hash+schema-matched queries whose pandas dtypes
    # differ in int WIDTH (c40 cell int32 vs int64) and in date
    # rendering (Spark date -> object, DuckDB -> datetime64), so those
    # are tolerated; 'O' (object: strings/dates/decimals via Arrow) is
    # a wildcard the per-value canon handles. What stays flagged is
    # real kind drift — int vs float vs bool vs temporal.
    def _family(k):
        return {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "temporal", "m": "temporal"}.get(k.kind, "O")

    for c in s_cols:
        sk, dk = s_pdf[c].dtype, d_pdf[c].dtype
        sf_, df_ = _family(sk), _family(dk)
        if "O" not in (sf_, df_) and sf_ != df_:
            problems.append(
                f"dtype differs on {c}: spark={sk} duckdb={dk}"
            )

    if len(s_pdf) != len(d_pdf):
        problems.append(
            f"row count differs: spark={len(s_pdf)} duckdb={len(d_pdf)}"
        )

    try:
        sc = _frame_canon(s_pdf)
        dc = _frame_canon(d_pdf)
    except UnhashableCell as e:
        problems.append(f"driver-crashing cell type: {e}")
        return problems

    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
        dset, sset = set(dc), set(sc)
        only_s = [r for r in sc if r not in dset][:3]
        only_d = [r for r in dc if r not in sset][:3]
        problems.append(
            f"values differ ({len(diffs)} aligned diffs); "
            f"spark-only sample={only_s} duckdb-only sample={only_d}"
        )
    return problems
