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
    # --- third wave: comprehension / slice / method / regex sugar ---
    # (array outputs serialized with to_json on both engines: the driver
    # canonicalizer cannot hash raw list cells, VERDICT r2 #2)
    "fe_list_comprehension": """
        SELECT n_nationkey,
               to_json([upper(w) FOR w IN string_split(n_name, '_')
                        IF length(w) > 3]) AS l
        FROM nation ORDER BY n_nationkey
    """,
    "fe_slice_forms": """
        SELECT n_nationkey,
               to_json((string_split(n_name, '_'))[2:]) AS tail,
               to_json(([1,2,3,4,5])[2:-1]) AS mid,
               to_json(([1,2,3,4,5])[:-2]) AS head
        FROM nation ORDER BY n_nationkey
    """,
    "fe_method_chain": """
        SELECT n_nationkey, n_name.lower().trim() AS l,
               ('x' || n_name).upper() AS u
        FROM nation ORDER BY n_nationkey
    """,
    "fe_similar_to": """
        SELECT n_nationkey,
               n_name SIMILAR TO 'NATION_1.' AS m,
               n_name NOT SIMILAR TO '.*2' AS nm
        FROM nation ORDER BY n_nationkey
    """,
    "fe_at_time_zone": """
        SELECT event_id,
               CAST(floor(extract(epoch FROM ts AT TIME ZONE 'Asia/Tokyo'))
                    AS BIGINT) AS e
        FROM events WHERE event_id < 300 ORDER BY event_id
    """,
    "fe_list_functions": """
        SELECT n_nationkey,
               list_sum([n_nationkey, n_regionkey, NULL]) AS s,
               list_avg([n_nationkey, 4]) AS a,
               list_count([n_nationkey, NULL]) AS c,
               list_indexof([10, n_nationkey, 30], n_nationkey) AS i
        FROM nation ORDER BY n_nationkey
    """,
    "fe_json_construction": """
        SELECT n_nationkey,
               json_object('name', n_name,
                           'region', CAST(n_regionkey AS VARCHAR)) AS o,
               json_array(n_nationkey, n_regionkey) AS a,
               json_quote(n_name) AS q
        FROM nation ORDER BY n_nationkey
    """,
    "fe_numeric_literals": """
        SELECT 1_000_000 AS n, 1e3 AS e, .5 AS f, 2. AS g,
               count(*) AS c FROM nation
    """,
    # --- r8: TIME casts in expression position (VERDICT r7 directive 7;
    # LogicalTypeId TIME duckdb.hpp:914) — the µs-since-midnight carrier
    # in filters, comparisons, typed literals, and TRY_CAST NULLing ---
    "dt_time_cast": """
        SELECT event_id,
               epoch_us(CAST(ts AS TIME)) AS tod_us,
               CAST(ts AS TIME) >= TIME '12:00:00' AS is_pm,
               epoch_us('07:45:30.5'::TIME) AS lit_us,
               epoch_us(TRY_CAST('not a time' AS TIME)) AS bad_us
        FROM events
        WHERE CAST(ts AS TIME) BETWEEN TIME '06:00:00' AND TIME '21:00:00'
          AND event_id <= 4000
        ORDER BY event_id
    """,
    # --- r8: anonymous ENUM cast (duckdb.hpp:944; VERDICT r7 missing #2)
    # — ordered struct<code,label> carrier: comparison and ORDER BY follow
    # dictionary INSERTION order (deliberately non-alphabetical here),
    # TRY_CAST of a non-member is NULL ---
    "fe_enum_anon_cast": """
        SELECT c_custkey, c_mktsegment AS seg,
               CAST(c_mktsegment AS
                    ENUM('MACHINERY', 'AUTOMOBILE', 'HOUSEHOLD',
                         'BUILDING', 'FURNITURE'))
                 < CAST('HOUSEHOLD' AS
                        ENUM('MACHINERY', 'AUTOMOBILE', 'HOUSEHOLD',
                             'BUILDING', 'FURNITURE')) AS before_household,
               TRY_CAST('nope' AS ENUM('a', 'b')) IS NULL AS bad_is_null
        FROM customer WHERE c_custkey <= 500
        ORDER BY CAST(c_mktsegment AS
                      ENUM('MACHINERY', 'AUTOMOBILE', 'HOUSEHOLD',
                           'BUILDING', 'FURNITURE')), c_custkey
    """,
}

QUERIES = {name: _run(sql_text) for name, sql_text in ORACLES.items()}
