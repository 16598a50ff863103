"""Scale-technique operators: patterns that exist purely to survive
100 TB, demonstrated with hash-match oracles so the technique is proven
result-neutral.

Registered after the pipeline extensions and before the relational
surface — see registry.load_all for why order matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import query

_SALT = 8


@query(
    "b73_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def b73_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-salted join — the static remedy when one join key carries a
    disproportionate share of a 100 TB fact table (AQE's skew-join
    split is the adaptive remedy; salting is the plan-shape one that
    also works pre-AQE and under extreme single-key skew). The fact
    side gets a deterministic per-ROW salt (hash of its unique key —
    never rand(), which breaks retry idempotence); the dim side is
    exploded x SALT so every (key, salt) bucket finds its dim row.
    A hot key's rows now spread across SALT reducers instead of
    melting one. The join result is bit-identical to the unsalted
    join — the oracle is the PLAIN join, which is the whole point:
    salting must be invisible in the answer.
    """
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    salted_fact = o.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(_SALT)).cast("int")
    )
    salted_dim = c.withColumn(
        "salt",
        F.explode(F.array(*[F.lit(i) for i in range(_SALT)])),
    )
    # merge hint: at test SF the exploded dim still fits a broadcast,
    # which would hide the salted-exchange shape this operator exists
    # to demonstrate; at 100 TB neither side broadcasts and the hint is
    # what the planner picks anyway (b60's rationale)
    j = salted_fact.join(
        salted_dim.hint("merge"),
        (salted_fact.o_custkey == salted_dim.c_custkey)
        & (salted_fact.salt == salted_dim.salt),
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("total_cents"),
    )
