"""Spark-4 API surface (b100-b102): VARIANT, Python UDTF, LATERAL.

The reference's query layer is "whatever its bundled Spark SQL service
exposes" (docker-compose.yml:58-81) — a user on a current Spark gets
these three surfaces, so the rebuild grades them: the VARIANT type
(Spark 4's open-ended semi-structured path — from_json without the
up-front schema, the modern answer to the reference's JSON-in-string
columns, kafka-load-gen/main.go:61,67), Python table functions
(@udtf — the row-to-rows API that closes SURVEY B59's "UDTF-like"
note), and LATERAL correlated subqueries (same-text-two-engines, the
b66 contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_playground_spark.queries._util import load
from iceberg_playground_spark.registry import query
from iceberg_playground_spark.session import register_views


# ---------------------------------------------------------------------------
# b100 — VARIANT-typed semi-structured processing
# ---------------------------------------------------------------------------


@query(
    "b100_variant_shred",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(TRY_CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
           CAST(count(DISTINCT TRY_CAST(props->>'$.k' AS INT)) AS BIGINT)
             AS n_distinct_k
    FROM events
    GROUP BY event_type
    """,
)
def b100_variant_shred(spark: SparkSession, sf: str) -> DataFrame:
    """B100: VARIANT-typed semi-structured processing — Spark 4's
    answer to JSON-in-string columns (the reference's networkInterface
    / assetTypes pattern and the events.props field): ``parse_json``
    ingests WITHOUT an up-front schema (b03/b47's ``from_json``
    requires one), storing a binary-encoded variant; ``variant_get``
    shreds typed values out by path at query time. The aggregate
    proves the typed extraction: per event_type, count + sum +
    distinct-count of the integer at ``$.k``.

    Scale shape: variant encode/decode is per-row JVM work inside the
    scan stage; the aggregate is the usual partial+final hash agg on a
    tiny key. The win at 100 TB is schema-drift tolerance: a new JSON
    field tomorrow needs no reload and no ALTER — paths that miss
    return NULL (exactly DuckDB's ->> semantics, so the oracle
    agrees). Variant columns never reach driver-facing output (binary
    — the comparator rule); only shredded typed values do."""
    e = load(spark, sf, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )


# ---------------------------------------------------------------------------
# b101 — Python UDTF (table function)
# ---------------------------------------------------------------------------


def _register_rle_udtf(spark: SparkSession) -> None:
    """Register the run-length UDTF once per session (idempotent)."""
    if getattr(spark, "_rle_udtf_registered", False):
        return
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string, start_pos int, run_len int")
    class RleRuns:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = text.split(" ")
            i, n = 0, len(toks)
            while i < n:
                j = i
                while j + 1 < n and toks[j + 1] == toks[i]:
                    j += 1
                if j > i:  # only repeated runs — the stutter signal
                    yield (doc_id, toks[i], i, j - i + 1)
                i = j + 1

    spark.udtf.register("rle_runs", RleRuns)
    spark._rle_udtf_registered = True


@query(
    "b101_rle_udtf",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (
      SELECT doc_id, unnest(toks) AS token,
             unnest(range(len(toks))) AS pos
      FROM t),
    isl AS (
      SELECT doc_id, token, pos,
             pos - row_number() OVER (
               PARTITION BY doc_id, token ORDER BY pos) AS grp
      FROM pos)
    SELECT doc_id, token, CAST(min(pos) AS INT) AS start_pos,
           CAST(count(*) AS INT) AS run_len
    FROM isl GROUP BY doc_id, token, grp
    HAVING count(*) >= 2
    """,
)
def b101_rle_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """B101: Python UDTF — the row-to-rows table function (SURVEY
    B59's "Spark 3.5+ @udtf" note made a graded operator). The UDTF
    run-length-encodes each document's token stream and emits only
    repeated runs ("the the") — the stutter signal a text-quality
    pipeline thresholds (p01 measures repetition statistically; this
    pinpoints WHERE). RLE is inherently sequential per row — the
    honest UDTF use case, awkward as set-based SQL — yet the oracle
    proves the same relation falls out of the gaps-and-islands window
    trick, so both engines hash-match.

    Scale shape: the UDTF is a narrow per-row fanout (no shuffle, no
    state across rows) running partition-parallel like mapInPandas;
    per-row Python iteration is the cost — for hot paths prefer the
    set-based form (p01/p03), and keep UDTFs for logic that won't
    flatten. Invoked via SQL LATERAL, the TVF join form."""
    _register_rle_udtf(spark)
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT r.doc_id, r.token, r.start_pos, r.run_len
        FROM documents, LATERAL rle_runs(doc_id, text) r
        """
    )


# ---------------------------------------------------------------------------
# b102 — LATERAL correlated subquery (same text, two engines)
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT n_name, t.c_name, t.c_acctbal
    FROM nation, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) t
"""


@query("b102_lateral_topk", oracle=_LATERAL_SQL)
def b102_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    """B102: LATERAL correlated subquery, same-text-two-engines (the
    b66 contract) — per nation, the top-2 customers by account
    balance, written as the per-row subquery a SQL user reaches for.
    Catalyst decorrelates the correlated ORDER BY/LIMIT into a
    windowed group-limit over ONE customer scan (b37's shape) instead
    of re-running the subquery per nation — the rewrite that makes
    LATERAL survive a dimension with millions of rows. Deterministic
    via the c_custkey tie-break."""
    register_views(spark, sf)
    return spark.sql(_LATERAL_SQL)
