"""Raw-SQL TPC-H pack (b97-b99) — same text, two engines.

b66 established the contract: a reference user's SQL strings run
UNCHANGED (the reference delegates all querying to its bundled Spark
SQL service, docker-compose.yml:58-81), and the driver's oracle is the
IDENTICAL string on DuckDB — hash-matched answers prove both parsers,
optimizers, and runtimes agree bit-for-bit. This module widens that
single Q3 shape to the classic optimizer workouts: Q5 (6-way
snowflake join with a cycle — customer and supplier must share a
nation), Q10 (scatter-gather top-k over a 4-way join), and a Q4-shaped
EXISTS (semi-join decorrelation; adapted to this schema's columns —
lineitem carries no commit/receipt dates, so "late" = shipped >30 days
after the order date).

Money arithmetic follows _util's decimal rules (B21_ORACLE pattern):
sums run in DECIMAL (associative, shuffle-order-proof), rescale to
(30,4) BEFORE the double cast so the unscaled value stays under 2^53
and both engines round once, identically.

Scale notes: all three are pure Catalyst territory — dims broadcast
(region/nation/supplier/customer under AQE thresholds at any sf where
they are dim-sized), the fact scans carry pushed filters, Q10's
LIMIT lowers to TakeOrderedAndProject, and the EXISTS decorrelates to
a left-semi join (pinned for b78; same machinery here). No custom code:
the queries() entries just register views and run the string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_playground_spark.registry import query
from iceberg_playground_spark.session import register_views

_Q5_SQL = """
    SELECT n_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(6,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""

_Q10_SQL = """
    SELECT c_custkey, c_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(6,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""

_Q4_SQL = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("b97_tpch_q5", oracle=_Q5_SQL)
def b97_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """B97: TPC-H Q5 (local supplier volume), same-text-two-engines.
    The optimizer workout: a 6-way snowflake join whose join graph has
    a CYCLE (customer and supplier must resolve to the same nation),
    forcing a join order no greedy left-deep heuristic gets for free,
    plus a selective region filter that must transit two dims before
    touching the facts. Revenue in exact decimals per the B21 rule."""
    register_views(spark, sf)
    return spark.sql(_Q5_SQL)


@query("b98_tpch_q10", oracle=_Q10_SQL)
def b98_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """B98: TPC-H Q10 (returned-item reporting), same-text-two-engines.
    Scatter-gather shape: a quarter's returned lineitems roll up per
    customer across a 4-way join, then a global top-20 by revenue —
    Catalyst lowers the ORDER BY + LIMIT to TakeOrderedAndProject
    (per-partition top-k, never a global sort). Deterministic via the
    c_custkey tie-break."""
    register_views(spark, sf)
    return spark.sql(_Q10_SQL)


@query("b99_tpch_q4", oracle=_Q4_SQL)
def b99_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """B99: TPC-H Q4 shape (order priority checking),
    same-text-two-engines. The EXISTS subquery must DECORRELATE to a
    left-semi join on l_orderkey (b78's machinery on a fact-sized
    probe): the naive plan re-scans lineitem per order. Adapted to
    this schema: lineitem has no commit/receipt dates, so a "late"
    order has any line shipped more than 30 days after the order date
    — same correlated-predicate structure, same decorrelation."""
    register_views(spark, sf)
    return spark.sql(_Q4_SQL)
