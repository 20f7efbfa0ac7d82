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
