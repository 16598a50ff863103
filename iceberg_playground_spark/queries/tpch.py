"""Raw-SQL TPC-H pack — all 22 query shapes, same text, two engines.

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

As of round 9 the pack covers every one of the 22 TPC-H query shapes
(Q1 is b21's flagship adaptation in relational.py; the rest live
here). Queries blocked on absent columns run documented adaptations —
see the round-9b section comment for the two conventions (60-day
lateness; derived-partsupp CTE) that unblocked the final seven.
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


# ---------------------------------------------------------------------------
# Round 6: Q7 / Q8 / Q14 / Q18 / Q19 — the rest of the schema-expressible
# TPC-H set (partsupp does not exist in the driver tables, so Q2/Q9/Q11/
# Q16/Q20 cannot be posed; lineitem has no shipmode/commit/receipt dates,
# so Q12/Q21 lose their defining columns — Q19 below keeps its OR-of-ANDs
# shape on the columns that do exist).
# ---------------------------------------------------------------------------

_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(sum(volume) AS DECIMAL(30,4)) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l_discount AS DECIMAL(6,4)) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""

_Q8_SQL = """
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(25,8)) END)
                AS DECIMAL(30,4)) AS DOUBLE)
             / CAST(CAST(sum(volume) AS DECIMAL(30,4)) AS DOUBLE)
             AS mkt_share,
           CAST(CAST(sum(volume) AS DECIMAL(30,4)) AS DOUBLE)
             AS total_volume
    FROM (
      SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l_discount AS DECIMAL(6,4)) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""

_Q14_SQL = """
    SELECT CAST(100 AS DOUBLE) * promo_revenue / total_revenue
             AS promo_pct,
           promo_revenue, total_revenue
    FROM (
      SELECT
        CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                * CAST(1 - l_discount AS DECIMAL(6,4)) END)
             AS DECIMAL(30,4)) AS DOUBLE) AS promo_revenue,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l_discount AS DECIMAL(6,4)))
             AS DECIMAL(30,4)) AS DOUBLE) AS total_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-03-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
    ) t
"""

_Q18_SQL = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""

_Q19_SQL = """
    SELECT p_brand,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(6,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    GROUP BY p_brand
    ORDER BY p_brand
"""


@query("b106_tpch_q7", oracle=_Q7_SQL)
def b106_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """B106: TPC-H Q7 (volume shipping), same-text-two-engines.
    Two nation dimensions join the SAME fact through different foreign
    keys (supplier's nation vs customer's nation) under a symmetric
    OR pair filter — the optimizer must keep the two nation aliases
    distinct while still broadcasting both, and the shipdate band
    pushes into the fact scan. Nations 3/8 exist in the supplier
    table at every sf (sf0.001 carries only 10 suppliers).

    Scale: nation/supplier/customer broadcast at any realistic sf;
    lineitem is the only shuffled relation, and only after its pushed
    date filter. Reference parity: the raw-SQL surface of the bundled
    spark-iceberg service (docker-compose.yml:58-81)."""
    register_views(spark, sf)
    return spark.sql(_Q7_SQL)


@query("b107_tpch_q8", oracle=_Q8_SQL)
def b107_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """B107: TPC-H Q8 (national market share), same-text-two-engines.
    The deepest join in the schema-expressible set: an 8-relation tree
    (part, lineitem, supplier, orders, customer, nation x2, region)
    with a conditional-aggregate ratio on top. The NATION_3 share and
    the total run over the SAME grouped rows — one aggregate, two
    sums, then one exactly-rounded double division per year (the
    decimal→double boundary rule keeps both engines bit-identical).

    Scale: every dimension broadcasts; the two facts (lineitem,
    orders) meet in one shuffle keyed on l_orderkey after both carry
    pushed filters (p_type via the part join's dynamic filter at real
    scale, o_orderdate pushed into the orders scan)."""
    register_views(spark, sf)
    return spark.sql(_Q8_SQL)


@query("b108_tpch_q14", oracle=_Q14_SQL)
def b108_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """B108: TPC-H Q14 (promotion effect), same-text-two-engines.
    Global conditional-aggregate ratio: promo revenue share of one
    ship month. The classic CASE-inside-SUM rewrite (b27's filtered
    aggregate) on a broadcast part join; the month band prunes the
    fact scan. Output is one row — the ratio plus both operands, so
    a mismatch localizes to numerator or denominator."""
    register_views(spark, sf)
    return spark.sql(_Q14_SQL)


@query("b109_tpch_q18", oracle=_Q18_SQL)
def b109_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """B109: TPC-H Q18 (large-volume customers), same-text-two-engines.
    The IN-subquery over a grouped HAVING on the SAME fact table:
    Catalyst plans lineitem twice — once aggregated to find >150-qty
    orders, once re-joined for detail — then a global top-100 via
    TakeOrderedAndProject. Quantity sums run in DECIMAL (doubles would
    be shuffle-order-dependent); o_orderkey tie-breaks the sort."""
    register_views(spark, sf)
    return spark.sql(_Q18_SQL)


@query("b110_tpch_q19", oracle=_Q19_SQL)
def b110_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """B110: TPC-H Q19 shape (discounted revenue), same-text-two-
    engines. The OR-of-ANDs predicate workout: three brand/size/
    quantity bands where every disjunct mixes columns from BOTH join
    sides, so the optimizer can push only the per-side residuals
    (p_brand IN (...) to part, quantity bounds to lineitem) and must
    evaluate the cross-side disjunction post-join. Adapted to this
    schema: no p_container/l_shipmode columns exist, so the bands run
    on p_size — same structure, same pushdown challenge. Grouped by
    brand so a mismatch localizes to a disjunct."""
    register_views(spark, sf)
    return spark.sql(_Q19_SQL)


# --- round 8: the remaining schema-expressible classics --------------------

_Q3_SQL = """
    SELECT l_orderkey,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(6,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""

_Q6_SQL = """
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                   * CAST(l_discount AS DECIMAL(5,4)))
               AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND CAST(l_discount AS DECIMAL(5,4))
          BETWEEN CAST(0.05 AS DECIMAL(5,4)) AND CAST(0.07 AS DECIMAL(5,4))
      AND l_quantity < 24
"""

_Q13_SQL = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@query("b141_tpch_q3", oracle=_Q3_SQL)
def b141_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """B141: TPC-H Q3 (shipping priority), same-text-two-engines —
    the classic urgent-backlog probe: BUILDING-segment orders placed
    before the cutoff whose lineitems ship after it, top-10 open
    orders by discounted revenue. (Adapted to this schema: no
    o_shippriority column exists, so the output carries the grouping
    keys that do.) Selective filters push to BOTH fact scans; the
    top-10 lowers to TakeOrderedAndProject; revenue per the B21
    decimal rule with the (o_orderdate, l_orderkey) tie-break."""
    register_views(spark, sf)
    return spark.sql(_Q3_SQL)


@query("b142_tpch_q6", oracle=_Q6_SQL)
def b142_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """B142: TPC-H Q6 (forecasting revenue change), same-text —
    the pure-scan benchmark: one fact table, three pushable range
    predicates, one global aggregate; the whole query is a
    WholeStageCodegen scan-filter-aggregate with no exchange beyond
    the final partial merge — the cell that measures raw scan
    throughput. Discount compared in DECIMAL (0.05-0.07 as 2-dp
    doubles are exact, but the decimal compare keeps the same-text
    oracle honest under each engine's literal typing)."""
    register_views(spark, sf)
    return spark.sql(_Q6_SQL)


@query("b143_tpch_q13", oracle=_Q13_SQL)
def b143_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """B143: TPC-H Q13 (customer order distribution), same-text —
    the OUTER-join aggregate the rest of the pack lacks: every
    customer kept (orderless customers count 0 via count(o_orderkey)
    skipping NULLs), then the distribution of order counts — a
    two-level aggregate whose first level preserves the left side.
    (Adapted: no o_comment column, so the classic NOT LIKE filter is
    dropped.) Shape: one shuffle per aggregate level; the outer join
    broadcasts nothing at scale (both sides fact-sized) and shuffles
    on the join key — the c_count histogram is |distinct counts|
    rows."""
    register_views(spark, sf)
    return spark.sql(_Q13_SQL)


# --- round 9: the last schema-expressible classics -------------------------

_Q15_SQL = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l_discount AS DECIMAL(6,4)))
                  AS DECIMAL(30,4)) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""

_Q17_SQL = """
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DECIMAL(30,4)) AS DOUBLE) / 7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
"""

_Q22_SQL = """
    WITH pos AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
               AS DECIMAL(30,4)) AS bal_total,
             CAST(count(*) AS BIGINT) AS bal_n
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey < 13)
    SELECT c_nationkey AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE c_nationkey < 13
      AND CAST(c_acctbal AS DECIMAL(18,4)) * bal_n > bal_total
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND CAST(o_orderdate AS DATE) >= DATE '1997-06-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
"""


@query("b146_tpch_q15", oracle=_Q15_SQL)
def b146_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """B146: TPC-H Q15 (top supplier), same-text-two-engines — the
    view-reuse workout: a quarterly per-supplier revenue rollup
    consumed TWICE (once joined to supplier, once under max()) from
    one CTE. (Adapted: supplier carries no address/phone columns, so
    the projection keeps the keys that exist; the classic's CREATE
    VIEW is the CTE, as modern TPC-H kits also write it.) Revenue per
    the B21 decimal rule BEFORE the double cast, so the max-equality
    predicate compares bit-identical doubles on both engines. Shape:
    one shuffle for the rollup; the scalar max is a 1-row broadcast
    back onto the |suppliers|-row rollup."""
    register_views(spark, sf)
    return spark.sql(_Q15_SQL)


@query("b147_tpch_q17", oracle=_Q17_SQL)
def b147_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """B147: TPC-H Q17 (small-quantity-order revenue), same-text —
    THE correlated-scalar-aggregate decorrelation benchmark:
    ``l_quantity < 0.2 * (SELECT avg(l_quantity) ... WHERE l2.l_partkey
    = p_partkey)`` must rewrite into a per-part aggregate joined back
    to the fact scan (Catalyst's RewriteCorrelatedScalarSubquery; a
    naive per-row execution is |lineitem| rescans). (Adapted:
    p_container does not exist, so brand alone selects the part
    family; the avg threshold is exact cross-engine — quantities are
    whole-number doubles, so the distributed sum is representable and
    order-independent.) The /7.0 runs in DOUBLE after the exact
    decimal sum, per the B21 rescale-before-cast rule."""
    register_views(spark, sf)
    return spark.sql(_Q17_SQL)


@query("b148_tpch_q22", oracle=_Q22_SQL)
def b148_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """B148: TPC-H Q22 (global sales opportunity), same-text — the
    anti-join + uncorrelated-scalar workout: above-average-balance
    customers in selected segments with NO recent orders
    (NOT EXISTS decorrelates to a left-anti join). Adapted twice to
    this schema/data: c_nationkey stands in for the phone country
    code (no c_phone column), and "never ordered" becomes "no order
    since 1997-06-01" (the synthetic data gives every customer at
    least one order, which would make the classic predicate
    vacuous). The average-balance threshold avoids engine-specific
    decimal-division typing by cross-multiplying: ``bal * n > total``
    in exact DECIMAL, the same trick both engines evaluate
    identically. Shape: the 1-row pos aggregate broadcasts; the
    anti-join shuffles on custkey; output is |segments| rows."""
    register_views(spark, sf)
    return spark.sql(_Q22_SQL)


# --- round 9b: completing the 22 — derived-partsupp + self-join classics ---
#
# The remaining classics were blocked on columns this schema lacks:
# Q21/Q12 on commit/receipt dates and shipmode, Q9/Q16 on partsupp's
# existence, Q2/Q11/Q20 on ps_supplycost/ps_availqty. Two documented
# adaptations unblock all seven while keeping each query's optimizer
# workout intact:
#   1. "late" = shipped more than 60 days after the order date (the
#      same stand-in b99's Q4 established with 30 days);
#   2. partsupp is DERIVED as a CTE over lineitem — the observed
#      part-supplier relationships, with ps_availqty = line count and
#      ps_supplycost = the cheapest observed line price in exact
#      DECIMAL (a min, so total-order-safe and bit-identical across
#      engines; a division would hit the cross-engine decimal-division
#      trap). The CTE text is part of the query, so the same string
#      still runs UNCHANGED on both engines — the contract b66 set.
# At 100 TB the derived partsupp is one |lineitem| group-by producing
# a |part|x|supp-per-part| dimension — the shuffle a real partsupp
# table would have paid at ingest instead.

_PARTSUPP_CTE = """
    WITH partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(count(*) AS BIGINT) AS ps_availqty,
             min(CAST(l_extendedprice AS DECIMAL(18,4))) AS ps_supplycost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey)
"""

_Q21_SQL = """
    SELECT s_suppkey, s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND CAST(l3.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60)
    GROUP BY s_suppkey, s_name, n_name
    ORDER BY numwait DESC, s_suppkey
    LIMIT 100
"""

_Q9_SQL = """
    SELECT n_name AS nation,
           CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(6,4)))
                AS DECIMAL(30,4)) AS DOUBLE) AS profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
"""

_Q12_SQL = """
    SELECT l_linestatus AS shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
    GROUP BY l_linestatus
    ORDER BY l_linestatus
"""

_Q16_SQL = """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

_Q2_SQL = _PARTSUPP_CTE + """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM part
    JOIN partsupp ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size < 8
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey
          AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

_Q11_SQL = _PARTSUPP_CTE + """
       , scoped AS (
      SELECT ps_partkey,
             ps_supplycost * CAST(ps_availqty AS DECIMAL(10,0)) AS v
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = 3)
    SELECT ps_partkey,
           CAST(CAST(sv AS DECIMAL(30,4)) AS DOUBLE) AS value
    FROM (
      SELECT ps_partkey, sum(v) AS sv,
             sum(sum(v)) OVER () AS total,
             count(*) OVER () AS nparts
      FROM scoped
      GROUP BY ps_partkey) per_part
    WHERE CAST(CAST(sv AS DECIMAL(24,4))
             * CAST(nparts AS DECIMAL(10,0)) AS DECIMAL(35,4)) >
          CAST(CAST(total AS DECIMAL(24,4))
             * CAST(2 AS DECIMAL(2,0)) AS DECIMAL(35,4))
    ORDER BY value DESC, ps_partkey
"""

_Q20_SQL = _PARTSUPP_CTE + """
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND ps_availqty > (
          SELECT 0.5 * sum(l_quantity) FROM lineitem
          WHERE l_partkey = ps_partkey
            AND l_suppkey = ps_suppkey
            AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'))
    ORDER BY s_suppkey
"""


@query("b149_tpch_q21", oracle=_Q21_SQL)
def b149_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """B149: TPC-H Q21 (suppliers who kept orders waiting), same-text
    — the notorious double-correlated self-join: for each late line,
    EXISTS another supplier on the same order AND NOT EXISTS another
    LATE supplier on it — two correlated lineitem rescans that must
    decorrelate to one semi- and one anti-join on l_orderkey (a naive
    plan is |lineitem|² per order). Adapted: "late" = shipped >60
    days after the order date (no commit/receipt dates exist), and
    the single-nation filter is dropped (10 suppliers at the smallest
    SF would leave 0-1 in any one nation) — n_name rides in the
    output instead. Deterministic via the (numwait DESC, s_suppkey)
    total order."""
    register_views(spark, sf)
    return spark.sql(_Q21_SQL)


@query("b150_tpch_q9", oracle=_Q9_SQL)
def b150_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """B150: TPC-H Q9 (product-type profit), same-text — the widest
    join tree of the suite that this schema can express: part filters
    by name substring (unpushable LIKE '%widget%' — the scan must
    still prune columns), then lineitem x supplier x orders x nation
    roll up to nation x order-year. Adapted: no partsupp, so profit
    is discounted revenue without the supplycost rebate term — the
    join graph and rollup (the workout) are unchanged. Year extracted
    as BIGINT on both engines (Spark year() is INT, DuckDB's BIGINT —
    the cast is the same-text bridge)."""
    register_views(spark, sf)
    return spark.sql(_Q9_SQL)


@query("b151_tpch_q12", oracle=_Q12_SQL)
def b151_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """B151: TPC-H Q12 (shipping modes and order priority), same-text
    — the CASE-inside-aggregate pivot: one join, one group, two
    conditional counts splitting urgent from routine priorities.
    Adapted: l_linestatus stands in for the absent l_shipmode, and
    the commit/receipt lateness window is the Q4/Q21 60-day stand-in.
    Both range predicates push to the lineitem scan; the join
    shuffles on orderkey; output is |linestatus| rows."""
    register_views(spark, sf)
    return spark.sql(_Q12_SQL)


@query("b152_tpch_q16", oracle=_Q16_SQL)
def b152_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """B152: TPC-H Q16 (part/supplier relationship), same-text — the
    COUNT(DISTINCT) + NOT IN workout: how many distinct suppliers
    ship each surviving (brand, type, size) part family, excluding
    blacklisted suppliers (adapted: negative account balance stands
    in for the absent complaint-comment scan; lineitem is the
    part-supplier association in place of partsupp). The NOT IN
    subquery is null-safe here (s_suppkey is a key) and plans as a
    broadcast anti-join; the distinct count shuffles once on the
    group key after an Expand."""
    register_views(spark, sf)
    return spark.sql(_Q16_SQL)


@query("b153_tpch_q2", oracle=_Q2_SQL)
def b153_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """B153: TPC-H Q2 (minimum-cost supplier), same-text over the
    derived-partsupp CTE — the correlated-scalar-min classic: for
    each small European-sourced part, keep exactly the suppliers
    matching the per-part regional minimum cost. The correlated
    subquery repeats the 4-way dim join and must decorrelate to a
    per-part min aggregate joined back (Catalyst's
    RewriteCorrelatedScalarSubquery — the same machinery b147's Q17
    pins, here under a join tree instead of a bare fact). Cost
    equality compares exact DECIMALs (a min over lossless 2-dp casts
    — never a division), so the cross-engine match is bit-for-bit."""
    register_views(spark, sf)
    return spark.sql(_Q2_SQL)


@query("b154_tpch_q11", oracle=_Q11_SQL)
def b154_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """B154: TPC-H Q11 (important stock identification), same-text
    over the derived-partsupp CTE — the HAVING-vs-global-scalar
    shape: per-part inventory value within region 3 (EUROPE),
    keeping parts worth more than 2x the mean part value (the
    classic's fixed 0.0001/SF fraction is scale-dependent; the
    mean-relative form selects a stable tail at every SF). ONE pass
    computes all three aggregates — window-over-aggregate
    (sum(sum(v)) OVER (), count(*) OVER ()) rides the per-part
    rollup, so Spark's CTE inlining cannot triple the |lineitem|
    group-by the scalar-subquery formulation would pay (the window
    is unpartitioned but carries only |parts| skinny rows). The
    threshold compares exact DECIMALs cross-multiplied (sum*count >
    total*2) to dodge both engines' decimal-division typing, per the
    c52/b148 discipline — operand casts keep every product under
    precision 38 on both engines. Output doubles rescale to (30,4)
    before the cast; (value DESC, ps_partkey) totals the order."""
    register_views(spark, sf)
    return spark.sql(_Q11_SQL)


@query("b155_tpch_q20", oracle=_Q20_SQL)
def b155_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """B155: TPC-H Q20 (potential part promotion), same-text over the
    derived-partsupp CTE — the nested-IN workout: suppliers whose
    stock of small-named parts exceeds half of what they actually
    shipped in 1997, as IN(subquery with IN(subquery) + correlated
    scalar agg) — three levels that must flatten to semi-joins with
    one per-(part,supplier) aggregate (no per-row rescans). The
    quantity comparison is exact: quantities are whole-number
    doubles, the sum is order-independent, and BIGINT ps_availqty
    widens to double identically on both engines."""
    register_views(spark, sf)
    return spark.sql(_Q20_SQL)
