"""Every declared query must exactly match the DuckDB oracle at sf0.01.

This mirrors the driver's t2 correctness gate (BASELINE.md). Queries
without an oracle get a rows-run smoke check instead.
"""

from __future__ import annotations

import pytest

from quackspark.oracle import compare
from quackspark.queries import all_oracles, all_queries

SF = "/root/testdata/sf0.01"

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    df = _QUERIES[name](spark, SF)
    sql = _ORACLES.get(name)
    if sql is None:
        assert df.count() >= 0  # rows-only smoke (non-SQL-expressible op)
        return
    problems = compare(df, sql, SF)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_every_oracle_has_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing


# --- bounded-error oracles for the approximate family (VERDICT r1 #7):
# sketches are engine-specific so no value-hash match is possible, but the
# estimates must land within published error bounds of DuckDB's EXACT values.


@pytest.fixture(scope="module")
def _duck_exact():
    import duckdb

    d = duckdb.connect()
    d.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    return d


def test_approx_count_distinct_within_5pct(spark, _duck_exact):
    got = {
        r["l_returnflag"]: r["approx_parts"]
        for r in _QUERIES["agg_approx_distinct"](spark, SF).collect()
    }
    exact = dict(
        _duck_exact.sql(
            "SELECT l_returnflag, count(DISTINCT l_partkey) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert got.keys() == exact.keys()
    for k in exact:
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel <= 0.05, f"{k}: approx {got[k]} vs exact {exact[k]} ({rel:.1%})"


def test_approx_quantile_within_1pct(spark, _duck_exact):
    got = {
        r["l_returnflag"]: r["approx_median"]
        for r in _QUERIES["agg_approx_quantile"](spark, SF).collect()
    }
    exact = dict(
        _duck_exact.sql(
            "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert got.keys() == exact.keys()
    for k in exact:
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel <= 0.01, f"{k}: approx {got[k]} vs exact {exact[k]} ({rel:.1%})"
