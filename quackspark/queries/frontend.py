"""Frontend-path corpus queries: the Spark side runs the EXACT oracle
text through the SQL frontend (sqlfront.sql), so the differential check
verifies the transpiler's round-3 surface end-to-end — ASOF JOIN,
UNION BY NAME, window frame EXCLUDE, the Postgres operator family,
bitstring_agg, damerau_levenshtein — on driver-sampled fixtures, not
just in the local test suite.

(Reference grammar: duckdb-libpg_query.cpp; each construct's rewrite is
documented at its sqlfront handler.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _run(sql_text: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from quackspark.relation import Connection
        from quackspark.session import register_testdata_views

        register_testdata_views(spark, sf_dir)
        return Connection(spark).sql(sql_text).df

    return fn


ORACLES = {
    "fe_asof_join": """
        SELECT e.event_id, o.ok FROM events e
        ASOF JOIN (SELECT o_orderdate, max(o_orderkey) AS ok
                   FROM orders GROUP BY o_orderdate) o
        ON e.ts >= o.o_orderdate
        WHERE e.event_id < 500 ORDER BY e.event_id
    """,
    "fe_union_by_name": """
        SELECT n_nationkey AS a, n_regionkey AS b FROM nation
        WHERE n_nationkey < 10
        UNION ALL BY NAME
        SELECT n_regionkey AS b, n_nationkey AS a FROM nation
        WHERE n_nationkey >= 10 AND n_nationkey < 20
        ORDER BY a
    """,
    "fe_window_exclude": """
        SELECT n_nationkey,
               sum(n_nationkey) OVER (ORDER BY n_nationkey
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                   EXCLUDE CURRENT ROW) AS s
        FROM nation ORDER BY n_nationkey
    """,
    "fe_pg_operators": """
        SELECT n_nationkey,
               n_nationkey ** 2 AS sq,
               CAST(3! AS BIGINT) AS fact,
               n_name ~~ '%IA%' AS has_ia,
               n_name ~ '^[A-C]' AS abc_start,
               n_name ^@ 'AL' AS al_prefix
        FROM nation ORDER BY n_nationkey
    """,
    "fe_bitstring_agg": """
        SELECT n_regionkey,
               CAST(bitstring_agg(n_nationkey % 8, 0, 7) AS VARCHAR) AS bits
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    "fe_damerau": """
        SELECT n_nationkey,
               CAST(damerau_levenshtein(n_name, reverse(n_name)) AS BIGINT) AS d
        FROM nation ORDER BY n_nationkey
    """,
}

QUERIES = {name: _run(sql_text) for name, sql_text in ORACLES.items()}
