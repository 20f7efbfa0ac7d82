"""Corpus-driven SQL frontend parity (VERDICT r1 #4).

Every oracle SQL string in ``__spark_entry__.oracle_sql()`` is known-good
DuckDB dialect (reference grammar duckdb-libpg_query.cpp); each must either
transpile through ``Connection.sql`` and value-match DuckDB executing the
identical text, or raise ``UnsupportedSQL`` honestly (the allowlist below —
kept in ONE place so growth is visible).

Runs at sf0.001 so the 157-query double-engine sweep stays fast; the
sf0.01 sweep lives in tools/sqlfront_corpus_sweep.py.
"""

from __future__ import annotations

import importlib.util

import pytest

from quackspark.oracle import compare
from quackspark.relation import Connection
from quackspark.session import register_testdata_views
from quackspark.sqlfront import UnsupportedSQL

SF_DIR = "/root/testdata/sf0.001"

#: the complete honest-failure list — anything else must MATCH.
#: (Was empty in round 3; the two r4 type-carrier oracles deliberately
#: use native TIMETZ/ENUM constructions so the differential check pins
#: carrier semantics to the engine's — the frontend refuses those types
#: with pointed carrier guidance instead of mistranslating: TIMETZ's
#: offset-DESCENDING tiebreak can't ride a struct compare, and an inline
#: ENUM cast is label-or-index depending on context.)
#: ddl_time_column (r7) joins them for the same reason: its oracle
#: deliberately uses native TIME/TIMETZ VALUES + datepart('timezone',…)
#: to pin the DDL carriers against the real types. r8: bare
#: CAST(x AS TIME) and the inline anonymous ENUM cast are now SUPPORTED
#: (µs carrier resp. ordered struct<code,label> carrier) —
#: enum_insertion_order left this set and must now exactly MATCH through
#: the frontend; only the TIMETZ-native oracles keep their refusals.
#: r10: dt_timetz_cast joins the TIMETZ-native refusals — its oracle
#: extracts offsets with datepart('timezone', …), which is
#: type-dependent (TIMETZ carrier .offset_s vs TIMESTAMPTZ 0) and now
#: refuses with pointed guidance instead of dying downstream with an
#: opaque INVALID_EXTRACT_FIELD (a latent red the r9 TIMETZ-cast close
#: left: these three oracles previously refused at the type-name pass).
#: The dt_timetz_cast PARITY entry (Spark query vs DuckDB oracle)
#: is unaffected and stays green.
EXPECTED_UNSUPPORTED: set[str] = {
    "dt_time_tz",
    "ddl_time_column",
    "dt_timetz_cast",
}


def _corpus() -> dict[str, str]:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.oracle_sql()


_CORPUS = _corpus()


@pytest.fixture(scope="module")
def con(spark):
    register_testdata_views(spark, SF_DIR)
    return Connection(spark)


@pytest.mark.parametrize("name", sorted(_CORPUS))
def test_sqlfront_oracle_corpus(con, name):
    sql = _CORPUS[name]
    if name in EXPECTED_UNSUPPORTED:
        with pytest.raises(UnsupportedSQL):
            con.sql(sql)
        return
    df = con.sql(sql).df
    probs = compare(df, sql, SF_DIR)
    assert not probs, probs
