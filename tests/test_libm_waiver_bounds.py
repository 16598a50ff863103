"""Bound tests for the dated libm-ln waivers (VERDICT r14 item 7).

b43 aside (ln IS the surface item under test there), the remaining
libm waivers — c69 PMI and the c53/c70/c72/c77 Gumbel quartet — rest
on latent-only risk: both engines evaluate the same double expression
through their own libm, and a grade could flip only if a value lands
within cross-libm error of a round()-to-micro boundary. These tests
turn "latent" into "checked":

- The Gumbel noise term round(-1e6 * ln(-ln(u))) has a FINITE input
  domain: u = (md5_prefix % 1e6 + 0.5) / 1e6, exactly one million
  values, independent of data. Checked exhaustively — this clears the
  noise term for every corpus forever, not just shipped testdata.
- c69's PMI ln and c53's per-bucket delta ln run on model-sized
  tables; their actual operand sets at every shipped scale factor are
  recomputed here via DuckDB and each pre-round value's distance to
  the nearest .5 boundary is asserted above the cross-libm bound.
- c70/c72/c77's remaining data term, round(1e6 * ln(m)) over the
  superstep D-squared minima, is NOT re-enumerated here: extracting
  the per-superstep m sets means replaying the whole train chain.
  Its check is the existing full-registry 3-sf sweeps — end-to-end
  hash equality on exactly those inputs IS the agreement test
  (re-affirmed clean 2026-08-16, round 14).

Error model for the bound: each libm ln is faithfully rounded within
~1 ulp, so two engines differ by <= ~2 ulps of the result; with
|ln(.)| <= ~30 and the 1e6 micro scale (plus one chained ln for the
Gumbel form) the cross-engine discrepancy of the pre-round value is
< 1e-7... no: < 30 * 2 * 1.1e-16 * 1e6 ~= 7e-9, call it 2e-8 with
chaining headroom. Any boundary distance above that cannot flip.
"""

import math
import os

import duckdb
import numpy as np

# cross-libm discrepancy ceiling for one (or one chained) micro-scaled
# ln — see the error model in the module docstring
_CROSS_LIBM_BOUND = 2e-8

_SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


def _boundary_dist(x: np.ndarray) -> np.ndarray:
    """Distance of each pre-round value to its nearest half-away
    rounding boundary (both engines round half away from zero, so the
    boundary grid is |x| mod 1 == 0.5)."""
    y = np.abs(x)
    return np.abs((y - np.floor(y)) - 0.5)


def test_gumbel_noise_domain_cleared_of_rounding_boundaries():
    # the full input domain of the c53/c70/c72/c77 Gumbel noise term:
    # u = (k + 0.5) / 1e6 for k in [0, 1e6)
    k = np.arange(1_000_000, dtype=np.float64)
    u = (k + 0.5) / 1_000_000.0
    x = -1_000_000.0 * np.log(-np.log(u))
    mind = float(_boundary_dist(x).min())
    # observed min is 1.265e-7 (k=302979) — 6x the cross-libm bound
    assert mind > _CROSS_LIBM_BOUND, mind


def test_c69_pmi_operands_cleared_at_shipped_data():
    for sf in _SF_DIRS:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        rows = con.execute(
            """
WITH tok AS (SELECT string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT token, count(*) AS c1 FROM (
    SELECT unnest(toks) AS token FROM tok) GROUP BY token),
bg AS (SELECT a, b, count(*) AS c2 FROM (
    SELECT toks[i] AS a, toks[i+1] AS b
    FROM tok, UNNEST(range(1, len(toks))) AS u(i)) GROUP BY a, b),
n AS (SELECT (SELECT sum(c1) FROM uni) AS n_tok,
             (SELECT sum(c2) FROM bg) AS n_pair)
SELECT g.c2, ua.c1 AS ca, ub.c1 AS cb, n.n_tok, n.n_pair
FROM bg g JOIN uni ua ON g.a = ua.token
          JOIN uni ub ON g.b = ub.token CROSS JOIN n
WHERE g.c2 >= 5
"""
        ).fetchall()
        con.close()
        assert rows  # the count floor must leave survivors to grade
        x = np.array(
            [
                1_000_000.0
                * math.log(
                    (float(c2) * ntok * ntok)
                    / (float(npair) * ca * cb)
                )
                for c2, ca, cb, ntok, npair in rows
            ]
        )
        mind = float(_boundary_dist(x).min())
        # observed: 4.8e-5 (sf0.001) / 6.1e-4 (sf0.01) / 2.4e-3 (sf0.1)
        assert mind > _CROSS_LIBM_BOUND, (sf, mind)


def test_c53_bucket_deltas_cleared_at_shipped_data():
    from iceberg_playground_spark.queries.round9 import (
        _C53_B,
        _C53_TARGET,
    )

    for sf in _SF_DIRS:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        rows = con.execute(
            f"""
WITH feat AS (
  SELECT CAST('0x' || substring(md5(unnest(string_split(text, ' '))),
              1, 8) AS BIGINT) % {_C53_B} AS bucket, source
  FROM documents),
model AS (
  SELECT bucket, count(*) AS cnt_raw,
         sum(CASE WHEN source = '{_C53_TARGET}' THEN 1 ELSE 0 END)
           AS cnt_tgt
  FROM feat GROUP BY bucket)
SELECT cnt_tgt, sum(cnt_tgt) OVER () AS tot_tgt,
       cnt_raw, sum(cnt_raw) OVER () AS tot_raw
FROM model
"""
        ).fetchall()
        con.close()
        assert rows
        x = np.array(
            [
                1_000_000.0
                * (
                    math.log((float(ct) + 1) / (tt + _C53_B))
                    - math.log((float(cr) + 1) / (tr + _C53_B))
                )
                for ct, tt, cr, tr in rows
            ]
        )
        mind = float(_boundary_dist(x).min())
        assert mind > _CROSS_LIBM_BOUND, (sf, mind)
