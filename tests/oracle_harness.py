"""Local stand-in for the driver's DuckDB cross-check.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and order-insensitive
cell values (exact — our determinism conventions aim for bit-identical
floats; see queries/_util.py).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from iceberg_playground_spark.session import TABLE_NAMES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon(v):
    """Canonical, engine-neutral representation of one cell."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bool):
        return str(v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return _canon(list(v))
        if isinstance(v, np.floating):
            return _canon(float(v))
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.bool_):
            return str(bool(v))
    except ImportError:
        pass
    return str(v)


def _rows_canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []

    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)

    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems

    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")

    sc = _rows_canon(s_cols, s_rows)
    dc = _rows_canon(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
        only_s = [r for r in sc if r not in set(dc)][:3]
        only_d = [r for r in dc if r not in set(sc)][:3]
        problems.append(
            f"values differ ({len(diffs)} aligned diffs); "
            f"spark-only sample={only_s} duckdb-only sample={only_d}"
        )
    return problems
