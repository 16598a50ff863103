"""Layer B UDF/UDAF/UDTF surface (SURVEY.md §2 B55-B59).

UDFs are the engine's escape hatch, and its slow path — the rules these
five operators demonstrate (patterns per the retrieved pandas-UDF
corpus, SNIPPETS.md):

1. Row-at-a-time ``@udf`` (B55) exists for completeness; it
   round-trips every value through pickled Python — keep it OUT of hot
   paths (b55 is the only one here, on a 25-row-group demo).
2. Everything else is Arrow-batched: ``pandas_udf`` scalar (B56),
   ``applyInPandas`` grouped-map (B57), ``pandas_udf`` grouped-agg
   (B58), ``mapInPandas`` iterator (B59) — one Python invocation per
   columnar batch, 10-100× the row-at-a-time throughput, and the
   executor streams batches so memory stays bounded at 100 TB.
3. Kernels are written order-insensitively (integer sums, per-row
   float ops, group min) so results hash-match plain-SQL oracles —
   proof that the Python path computes exactly what the declarative
   path would.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import query


@query(
    "b55_scalar_udf",
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN o_orderpriority LIKE '1-%'
                  OR o_orderpriority LIKE '2-%' THEN 'expedite'
                WHEN o_orderpriority LIKE '5-%' THEN 'relaxed'
                ELSE 'standard' END AS tier,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def b55_scalar_udf(spark: SparkSession, sf: str) -> DataFrame:
    """B55: row-at-a-time Python UDF — the demo of the SLOW path (each
    value crosses JVM→Python pickled). Applied post-aggregation to
    |priorities| rows, never to the fact table; the oracle's CASE shows
    what Catalyst would have run natively."""

    @udf("string")
    def tier_of(priority: str) -> str:
        if priority.startswith(("1-", "2-")):
            return "expedite"
        if priority.startswith("5-"):
            return "relaxed"
        return "standard"

    o = load(spark, sf, "orders")
    per_priority = o.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    return per_priority.select(
        "o_orderpriority",
        tier_of(F.col("o_orderpriority")).alias("tier"),
        "n",
    )


@query(
    "b56_pandas_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def b56_pandas_udf_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """B56: vectorized Series→Series pandas UDF — Arrow ships columnar
    batches, numpy does the arithmetic. Per-row double ops are
    bit-deterministic (no accumulation), so the result hash-matches the
    plain SQL expression: the vectorized Python path is exact, just
    ~10-100× the row-UDF speed and still below built-in codegen."""

    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "b57_grouped_map",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           l_extendedprice - min(l_extendedprice)
             OVER (PARTITION BY l_returnflag) AS price_over_min
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def b57_grouped_map(spark: SparkSession, sf: str) -> DataFrame:
    """B57: grouped-map applyInPandas — each group arrives as one
    pandas frame (shuffle on the group key; a group must fit an
    executor, so key cardinality/skew is the 100 TB design concern —
    same constraint as any window over the key). Kernel: per-group
    min-subtraction; min and per-row subtraction are order-exact, so a
    window-SQL oracle reproduces it bit-for-bit."""

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["l_returnflag", "l_orderkey", "l_linenumber"]].copy()
        out["price_over_min"] = (
            pdf["l_extendedprice"] - pdf["l_extendedprice"].min()
        )
        return out

    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.groupBy("l_returnflag").applyInPandas(
        demean,
        schema=(
            "l_returnflag string, l_orderkey bigint, "
            "l_linenumber int, price_over_min double"
        ),
    )


@query(
    "b58_grouped_agg_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b58_grouped_agg_udf(spark: SparkSession, sf: str) -> DataFrame:
    """B58: grouped-aggregate pandas UDF (a UDAF): Series in, scalar
    out, usable inside agg()/over(). The kernel sums exact integer
    cents — order-proof, so it hash-matches SQL. (Spark evaluates
    grouped-agg UDFs WITHOUT partial aggregation — all rows of a group
    shuffle to one task — so at 100 TB prefer built-in partial-agg
    forms unless the kernel genuinely can't be expressed; that
    trade-off is the point of this pair of queries.)"""

    @pandas_udf("bigint")
    def cents_sum(price: pd.Series) -> int:
        return int(price.mul(100).round().astype("int64").sum())

    @pandas_udf("bigint")
    def n_rows(price: pd.Series) -> int:
        # grouped-agg UDFs can't mix with built-in aggs in one agg() —
        # the row count is a second kernel for that reason
        return int(len(price))

    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        cents_sum("l_extendedprice").alias("revenue_cents"),
        n_rows("l_extendedprice").alias("n"),
    )


@query(
    "b59_map_in_pandas",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           upper(string_split(text, ' ')[1]) AS first_token,
           CAST(length(text) AS BIGINT) AS n_chars_checked
    FROM documents
    """,
)
def b59_map_in_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """B59: mapInPandas iterator UDF (UDTF-like: arbitrary rows out per
    batch in). The iterator signature is the streaming contract — the
    kernel never sees the whole partition, just successive Arrow
    batches, which is what keeps Python memory flat when a partition
    holds gigabytes. Kernel mirrors c15's decode shape on text:
    tokenize + count (exact string ops ⇒ SQL oracle)."""

    def tokenize(batches):
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": toks.map(len).astype("int64"),
                    "first_token": toks.map(lambda t: t[0].upper()),
                    "n_chars_checked": pdf["text"].str.len().astype("int64"),
                }
            )

    d = load(spark, sf, "documents").select("doc_id", "text")
    return d.mapInPandas(
        tokenize,
        schema=(
            "doc_id long, n_tokens long, first_token string, "
            "n_chars_checked long"
        ),
    )
