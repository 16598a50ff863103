"""Every registered query with an oracle must match DuckDB at sf0.01 —
the local mirror of the driver's t2 gate. Queries without an oracle get
a rows-run smoke check."""

from __future__ import annotations

import pytest

from iceberg_playground_spark import registry

registry.load_all()

from tests.conftest import SF_CHECK  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_CHECK)
    yield con
    con.close()


_WITH_ORACLE = sorted(n for n in registry.QUERIES if n in registry.ORACLES)
_ROWS_ONLY = sorted(n for n in registry.QUERIES if n not in registry.ORACLES)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_CHECK)
    problems = compare(df, duck, registry.ORACLES[name])
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    # The driver's smoke contract for oracle-less queries is rows > 0.
    df = registry.QUERIES[name](spark, SF_CHECK)
    assert df.count() > 0


def test_dedup_cluster_mapping_is_closed(spark):
    # c24's contract: rep mapping transitively closed, and its
    # canonical set is exactly c02's survivor set
    rows = registry.QUERIES["c24_dedup_clusters"](spark, SF_CHECK).collect()
    rep = {r["doc_id"]: r["rep"] for r in rows}
    assert all(rep[v] == rep[rep[v]] for v in rep if rep[v] in rep)
    canonical = {r["doc_id"] for r in rows if r["canonical"]}
    kept = {
        r["doc_id"]
        for r in registry.QUERIES["c02_minhash_lsh_dedup"](
            spark, SF_CHECK
        ).collect()
    }
    assert canonical == kept
