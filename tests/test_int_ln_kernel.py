"""The deterministic integer-ln kernel (ADVICE r12: remove the
cross-libm dependency from micro-nat graded columns).

The contract is THREE bit-identical implementations of one fixed-point
algorithm — pure Python (``int_ln_micro_py``), the DuckDB MATERIALIZED
CTE chain (``int_ln_micro_cte_sql``), and the Spark withColumn fold
(``int_ln_micro_col``) — so graded NLL columns stop depending on JVM
Math.log and libm std::log agreeing to the last ulp near .5 rounding
boundaries. Fidelity to true ln is bounded separately (≤ 20 micro-nats
over the grid; the ln2 truncation at 693147 dominates).
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from iceberg_playground_spark.queries._util import (
    int_ln_micro_col,
    int_ln_micro_cte_sql,
    int_ln_micro_py,
)

EDGES = [
    (1, 1),
    (1, 2),
    (2, 1),
    (1, 2**47),
    (2**47, 1),
    (2**47, 2**47),
    (3, 7),
    (999999, 1000000),
    (2**46 + 1, 2**46 - 1),
]


def _grid(n: int, seed: int = 11) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return EDGES + [
        (rng.randrange(1, 2**47), rng.randrange(1, 2**47)) for _ in range(n)
    ]


def test_python_reference_tracks_true_ln():
    worst = 0
    for num, den in _grid(5000):
        got = int_ln_micro_py(num, den)
        true = round(1e6 * math.log(den / num))
        worst = max(worst, abs(got - true))
    assert worst <= 20, worst


def test_python_reference_signs_and_zero():
    assert int_ln_micro_py(5, 5) == 0
    assert int_ln_micro_py(1, 2) > 0  # nll of p=1/2 is +ln 2
    assert int_ln_micro_py(2, 1) == -int_ln_micro_py(1, 2)
    assert abs(int_ln_micro_py(1, 2) - 693147) <= 2


def test_duckdb_chain_is_bit_identical_to_python():
    rows = _grid(4000)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, num BIGINT, den BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, n, d) for i, (n, d) in enumerate(rows)],
    )
    sql = (
        "WITH "
        + int_ln_micro_cte_sql("t", "id", "out")
        + " SELECT num, den, out FROM _il_fin"
    )
    bad = [
        (n, d, o, int_ln_micro_py(n, d))
        for n, d, o in con.execute(sql).fetchall()
        if o != int_ln_micro_py(n, d)
    ]
    assert not bad, bad[:5]


OUT_OF_DOMAIN = [(0, 5), (5, 0), (-3, 7), (2**47 + 1, 1), (1, 2**50)]


def test_python_reference_raises_out_of_domain():
    # ADVICE r13 medium: the 2^47 bound must be guarded, not just
    # documented — Spark wraps int64 overflow silently, DuckDB raises.
    for num, den in OUT_OF_DOMAIN:
        with pytest.raises(ValueError):
            int_ln_micro_py(num, den)


def test_duckdb_chain_nulls_out_of_domain():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, num BIGINT, den BIGINT)")
    rows = OUT_OF_DOMAIN + [(None, 4), (4, None), (3, 7)]
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, n, d) for i, (n, d) in enumerate(rows)],
    )
    sql = (
        "WITH "
        + int_ln_micro_cte_sql("t", "id", "out")
        + " SELECT id, out FROM _il_fin ORDER BY id"
    )
    got = dict(con.execute(sql).fetchall())
    for i in range(len(rows) - 1):
        assert got[i] is None, (rows[i], got[i])
    assert got[len(rows) - 1] == int_ln_micro_py(3, 7)  # in-domain row


@pytest.mark.usefixtures("spark")
def test_spark_fold_nulls_out_of_domain(spark):
    rows = OUT_OF_DOMAIN + [(None, 4), (4, None), (3, 7)]
    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(rows)],
        "id BIGINT, num BIGINT, den BIGINT",
    )
    got = {
        r["id"]: r["out"]
        for r in int_ln_micro_col(df, "num", "den", "out").collect()
    }
    for i in range(len(rows) - 1):
        assert got[i] is None, (rows[i], got[i])
    assert got[len(rows) - 1] == int_ln_micro_py(3, 7)


@pytest.mark.usefixtures("spark")
def test_spark_fold_is_bit_identical_to_python(spark):
    rows = _grid(1500)
    df = spark.createDataFrame(
        [(n, d) for n, d in rows], "num BIGINT, den BIGINT"
    )
    got = int_ln_micro_col(df, "num", "den", "out").collect()
    bad = [
        (r["num"], r["den"], r["out"], int_ln_micro_py(r["num"], r["den"]))
        for r in got
        if r["out"] != int_ln_micro_py(r["num"], r["den"])
    ]
    assert not bad, bad[:5]
