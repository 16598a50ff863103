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


# --- One-parse literal arrays/maps (round 16) ------------------------
# Building a literal array via F.array(*[F.lit(v) for v in ...]) pays
# one py4j round-trip PER ELEMENT at DataFrame-construction time —
# measured ~2.3 s just to CONSTRUCT an 8x16x8 codebook expression,
# re-paid on every train superstep, vs 0.15 s to execute it. Rendering
# the same literal as ONE SQL string parses in a single round-trip and
# yields the identical literal tree: a decimal int in int32 range
# parses as INT exactly like F.lit(int); the L suffix renders BIGINT
# for sites that cast per element. Values are int()-coerced, so no
# untrusted text can reach the SQL string.


def lit_int_array(vals) -> Column:
    """array(1,2,...) as one parsed expression (INT elements, BIGINT
    for values beyond int32 — F.lit's own promotion rule)."""
    return F.expr("array(" + ",".join(str(int(v)) for v in vals) + ")")


def lit_bigint_array(vals) -> Column:
    """array(1L,2L,...) — the F.lit(v).cast('bigint') per-element
    shape as one parse."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def lit_double_array(vals) -> Column:
    """array(0.25D, ...) — the F.lit(float(v)) per-element shape as
    one parse (the D suffix keeps every element a DOUBLE literal,
    never DECIMAL; repr() round-trips the exact IEEE value)."""
    return F.expr(
        "array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")"
    )


def lit_int_matrix(rows) -> Column:
    """array(array(...), ...) — a 2-D integer literal in one parse."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(str(int(v)) for v in r) + ")"
            for r in rows
        )
        + ")"
    )


def lit_str_int_map(items) -> Column:
    """map('k', v, ...) as one parse — F.create_map's per-entry py4j
    shape (string keys, INT-typed values) without the per-literal
    round-trips. Keys are quote/backslash-escaped; values are
    int()-coerced."""
    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    return F.expr(
        "map(" + ",".join(f"{q(k)},{int(v)}" for k, v in items) + ")"
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



# --- Deterministic integer logarithm (the cross-libm fix, ADVICE r12) ----
#
# round(-1e6 * ln(num/den)) computed by libm is a LATENT cross-engine
# hazard: JVM Math.log and DuckDB's std::log must produce bitwise-equal
# doubles or a value near a .5 rounding boundary flips the oracle hash
# (flagged twice, on c65 then c84). The kernel below removes libm from
# the contract entirely: ln is evaluated as a FIXED-POINT INTEGER
# algorithm — binary-logarithm digit extraction by repeated squaring —
# written as one chain of +,*,integer-division,CASE steps that both
# engines execute verbatim, so the result is a deterministic function
# of the integer inputs with no float anywhere. The graded value is BY
# DEFINITION the algorithm's output; its distance from true
# 1e6*ln(den/num) is bounded and tested (< 20 micro-nats over the test
# grid — the truncation of ln2 at 693147 dominates, ~0.19 micro per
# integer bit of magnitude).
#
# Algorithm, for integer num >= 1, den >= 1, both <= 2^47 (documented
# input bound: every intermediate then fits in ONE signed int64, so
# DuckDB never needs HUGEINT and Spark never leaves BIGINT). The bound
# is GUARDED, not just documented (ADVICE r13 medium): Spark with ANSI
# off wraps int64 overflow silently while DuckDB raises Out of Range,
# so an un-guarded out-of-domain input silently corrupts one side or
# hard-errors the other — an invisible cross-engine divergence. Every
# renderer therefore evaluates the SAME domain check first; a
# violating (or NULL) input clamps the chain's operands to 1 so no
# engine can overflow mid-chain, and emits NULL as the output in BOTH
# engines (the Python reference raises, being driver-side).
#   hi, lo = max/min(num, den); sign = +1 if den >= num (nll of a
#     probability) else -1
#   e-search (6 unrolled halving steps): the largest e with
#     lo * 2^e <= hi, tracked as d = lo * 2^e  (tests divide hi, never
#     multiply d, so nothing overflows)
#   m = floor(hi * 2^30 / d) in [2^30, 2^31), computed EXACTLY in two
#     15-bit stages (quotient then remainder refinement)
#   21 squaring steps: m <- m^2 / 2^30, emitting one binary fraction
#     digit of log2(hi/d) per step into acc
#   result = sign * round((e * 2^21 + acc) * 693147 / 2^21)
# All divisions act on non-negative operands, so DuckDB // (truncate)
# and Spark DIV (truncate) and Python // (floor) agree everywhere.

_LN_FRAC = 30  # m's fixed-point scale (m*m just fits int64)
_LN_BITS = 21  # fraction digits of log2 extracted (~0.33 micro-nat)
_LN2_MICRO_Q21 = 693147  # floor(ln(2) * 1e6), applied at scale 2^21
_LN_MAX_IN = 2**47  # guarded input bound (hi * 2^15 must fit int64)


def int_ln_micro_steps(
    num: str, den: str, div: str, prefix: str = "_il"
) -> list[tuple[str, str]]:
    """The shared step chain: [(column_name, sql_expr)], each expr
    referencing prior names — splice into a lateral-alias SELECT
    (DuckDB) or fold as withColumn calls (Spark). ``div`` is the
    dialect's integer-division token ('DIV' for Spark, '//' for
    DuckDB). The last step, ``{prefix}_out``, is
    sign * round(1e6 * ln(den/num)) under the fixed-point contract."""
    p = prefix
    steps: list[tuple[str, str]] = [
        # domain guard first: a violating input clamps hi/lo to 1 (so
        # no later step can overflow int64 in either engine) and NULLs
        # the sign, which the final multiply propagates to the output
        (
            f"{p}_ok",
            f"CASE WHEN {num} IS NULL OR {den} IS NULL"
            f" OR least({num}, {den}) < 1"
            f" OR greatest({num}, {den}) > {_LN_MAX_IN}"
            f" THEN 0 ELSE 1 END",
        ),
        (
            f"{p}_hi",
            f"CAST(CASE WHEN {p}_ok = 1 THEN greatest({num}, {den})"
            f" ELSE 1 END AS BIGINT)",
        ),
        (
            f"{p}_lo",
            f"CAST(CASE WHEN {p}_ok = 1 THEN least({num}, {den})"
            f" ELSE 1 END AS BIGINT)",
        ),
        (
            f"{p}_sg",
            f"CASE WHEN {p}_ok = 0 THEN NULL"
            f" WHEN {den} >= {num} THEN 1 ELSE -1 END",
        ),
    ]
    d, e = f"{p}_lo", "0"
    for s in (32, 16, 8, 4, 2, 1):
        t = f"{p}_t{s}"
        steps.append(
            (t, f"CASE WHEN {d} <= {p}_hi {div} {2 ** s} THEN 1 ELSE 0 END")
        )
        nd = f"{p}_d{s}"
        steps.append((nd, f"{d} * CASE WHEN {t} = 1 THEN {2 ** s} ELSE 1 END"))
        e = f"({e} + {t} * {s})"
        d = nd
    steps.append((f"{p}_e", f"CAST({e} AS BIGINT)"))
    steps.append((f"{p}_q", f"({p}_hi * {2 ** 15}) {div} {d}"))
    steps.append((f"{p}_r", f"({p}_hi * {2 ** 15}) % {d}"))
    steps.append(
        (f"{p}_m0", f"{p}_q * {2 ** 15} + ({p}_r * {2 ** 15}) {div} {d}")
    )
    m, acc = f"{p}_m0", "0"
    for k in range(1, _LN_BITS + 1):
        sq = f"{p}_s{k}"
        steps.append((sq, f"({m} * {m}) {div} {2 ** _LN_FRAC}"))
        b = f"{p}_b{k}"
        steps.append(
            (b, f"CASE WHEN {sq} >= {2 ** (_LN_FRAC + 1)} THEN 1 ELSE 0 END")
        )
        nm = f"{p}_m{k}"
        steps.append((nm, f"{sq} {div} (1 + {b})"))
        acc = f"({acc} * 2 + {b})"
        m = nm
    steps.append((f"{p}_a", f"CAST({acc} AS BIGINT)"))
    steps.append(
        (
            f"{p}_out",
            f"{p}_sg * ((({p}_e * {2 ** _LN_BITS} + {p}_a) * {_LN2_MICRO_Q21}"
            f" + {2 ** (_LN_BITS - 1)}) {div} {2 ** _LN_BITS})",
        )
    )
    return steps


def int_ln_micro_cte_sql(
    src: str, cols: str, out: str, prefix: str = "_il"
) -> str:
    """DuckDB renderer: the chain as MATERIALIZED CTE stages over
    ``src`` (a prior CTE whose rows carry integer columns ``num`` and
    ``den`` plus the passthrough columns in ``cols``). Returns the
    CTE-list fragment "name AS MATERIALIZED (...), ..." ending in a
    CTE called ``{prefix}_fin`` with columns (cols, num, den, {out}).

    One MATERIALIZED stage PER SQUARING STEP is load-bearing, not
    style: DuckDB inlines lateral aliases and plain CTEs by
    substitution, and each squaring references its input twice
    (m * m) — the tree doubles per step, a 2^21 blow-up for the full
    chain (the c87 MATERIALIZED hazard, reproduced here as a hang).
    The prefix steps (hi/lo/sign, the 6-step e-search, the two-stage
    exact division) inline safely — their substitution growth is a
    small constant — so they share one stage, and every stage carries
    only (cols, num, den, sg, e, m, acc): ~25 narrow materializations
    instead of 90 widening ones."""
    p = prefix
    carry = f"{cols}, num, den"
    # stage 0: normalize + e-search + exact 2^30 fixed-point mantissa,
    # all via lateral aliases (bounded substitution)
    items = [
        # same domain guard as the Spark fold: clamp-then-NULL
        f"CASE WHEN num IS NULL OR den IS NULL OR least(num, den) < 1"
        f" OR greatest(num, den) > {_LN_MAX_IN} THEN 0 ELSE 1 END AS ok",
        "CAST(CASE WHEN ok = 1 THEN greatest(num, den)"
        " ELSE 1 END AS BIGINT) AS hi",
        "CAST(CASE WHEN ok = 1 THEN least(num, den)"
        " ELSE 1 END AS BIGINT) AS lo",
        "CASE WHEN ok = 0 THEN NULL"
        " WHEN den >= num THEN 1 ELSE -1 END AS sg",
    ]
    d, e = "lo", "0"
    for s in (32, 16, 8, 4, 2, 1):
        items.append(
            f"CASE WHEN {d} <= hi // {2 ** s} THEN 1 ELSE 0 END AS t{s}"
        )
        items.append(
            f"{d} * CASE WHEN t{s} = 1 THEN {2 ** s} ELSE 1 END AS d{s}"
        )
        d, e = f"d{s}", f"({e} + t{s} * {s})"
    items += [
        f"CAST({e} AS BIGINT) AS e",
        f"(hi * {2 ** 15}) // {d} AS q",
        f"(hi * {2 ** 15}) % {d} AS r",
        f"q * {2 ** 15} + (r * {2 ** 15}) // {d} AS m",
    ]
    ctes = [
        f"{p}_c0 AS MATERIALIZED (SELECT {carry}, "
        + ", ".join(items)
        + f", CAST(0 AS BIGINT) AS acc FROM {src})"
    ]
    prev = f"{p}_c0"
    # one narrow stage per squaring step: m is a materialized column,
    # so (m * m) is two column refs, never a doubling substitution
    for k in range(1, _LN_BITS + 1):
        sq = f"(m * m) // {2 ** _LN_FRAC}"
        b = f"CASE WHEN {sq} >= {2 ** (_LN_FRAC + 1)} THEN 1 ELSE 0 END"
        cte = f"{p}_c{k}"
        ctes.append(
            f"{cte} AS MATERIALIZED (SELECT {carry}, sg, e, "
            f"({sq}) // (1 + {b}) AS m, acc * 2 + {b} AS acc FROM {prev})"
        )
        prev = cte
    ctes.append(
        f"{p}_fin AS (SELECT {carry}, sg * (((e * {2 ** _LN_BITS} + acc)"
        f" * {_LN2_MICRO_Q21} + {2 ** (_LN_BITS - 1)}) // {2 ** _LN_BITS})"
        f" AS {out} FROM {prev})"
    )
    return ", ".join(ctes)


def int_ln_micro_col(df, num: str, den: str, out: str, prefix: str = "_il"):
    """Spark renderer. Stage 0 (domain guard, hi/lo/sign, e-search,
    exact 2^30 mantissa) folds as withColumn steps off the shared step
    chain; the 21 squaring steps then run as ONE higher-order
    ``aggregate`` over a constant 21-element sequence with a
    (m, acc) struct accumulator — the same non-negative integer ops
    bit for bit (``shiftright`` on a non-negative BIGINT IS the
    chain's truncating power-of-two division; the ``1 + b`` divisor is
    a conditional 1-bit shift since b ∈ {0, 1}), but ~20 projections
    instead of ~90, which cuts the fold's data-size-free Catalyst
    analysis cost ~4x per call site (round 16; the graded values are
    unchanged — tests/test_int_ln_kernel.py pins bit-equality against
    the Python reference and the DuckDB chain)."""
    steps = int_ln_micro_steps(num, den, "DIV", prefix)
    m0 = f"{prefix}_m0"
    stage0 = steps[: next(i for i, (n, _) in enumerate(steps) if n == m0) + 1]
    scaffold = [name for name, _ in stage0]
    for name, expr in stage0:
        df = df.withColumn(name, F.expr(expr))

    two_f1 = 1 << (_LN_FRAC + 1)  # 2^31: the emitted-digit threshold

    def _sq(acc, _x):
        sq = F.shiftright(acc["m"] * acc["m"], _LN_FRAC)
        b = (
            F.when(sq >= F.lit(two_f1), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        return F.struct(
            F.when(b == 1, F.shiftright(sq, 1)).otherwise(sq).alias("m"),
            (acc["acc"] * F.lit(2) + b).alias("acc"),
        )

    acc = F.aggregate(
        F.sequence(F.lit(1), F.lit(_LN_BITS)),
        F.struct(
            F.col(m0).alias("m"), F.lit(0).cast("bigint").alias("acc")
        ),
        _sq,
        lambda a: a["acc"],
    )
    out_col = F.col(f"{prefix}_sg").cast("bigint") * F.shiftright(
        (
            F.col(f"{prefix}_e") * F.lit(1 << _LN_BITS).cast("bigint")
            + acc
        )
        * F.lit(_LN2_MICRO_Q21)
        + F.lit(1 << (_LN_BITS - 1)).cast("bigint"),
        _LN_BITS,
    )
    return df.withColumn(out, out_col).drop(*scaffold)


def int_ln_micro_py(num: int, den: int) -> int:
    """Pure-Python reference of the same algorithm (tests + driver-side
    literal computation). Bit-identical to the SQL chain by
    construction: every op is the same non-negative integer op. The
    domain guard RAISES here (driver-side code should fail loudly)
    where the SQL renderers emit NULL."""
    if not (1 <= num <= _LN_MAX_IN and 1 <= den <= _LN_MAX_IN):
        raise ValueError(
            f"int_ln_micro domain is 1 <= num, den <= 2^47; "
            f"got num={num}, den={den}"
        )
    hi, lo = max(num, den), min(num, den)
    sg = 1 if den >= num else -1
    d, e = lo, 0
    for s in (32, 16, 8, 4, 2, 1):
        if d <= hi // (1 << s):
            d, e = d * (1 << s), e + s
    q, r = (hi << 15) // d, (hi << 15) % d
    m = q * (1 << 15) + (r << 15) // d
    acc = 0
    for _ in range(_LN_BITS):
        m = (m * m) >> _LN_FRAC
        b = 1 if m >= 1 << (_LN_FRAC + 1) else 0
        acc = acc * 2 + b
        m >>= b
    t = e * (1 << _LN_BITS) + acc
    return sg * ((t * _LN2_MICRO_Q21 + (1 << (_LN_BITS - 1))) >> _LN_BITS)
