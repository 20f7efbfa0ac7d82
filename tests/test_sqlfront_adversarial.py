"""Adversarial SQL-frontend shapes (VERDICT r2 item 3).

The corpus in __spark_entry__.oracle_sql() is written by the same author
as the frontend, so it never exercises grammar shapes real DuckDB users
paste: named WINDOW clauses, set-ops inside FROM subqueries, nested CTE
chains, LATERAL joins, parenthesized set-op arms, VALUES in FROM, derived
column aliases. Each statement here must either value-match DuckDB
executing the identical text (reference grammar duckdb-libpg_query.cpp)
or raise a precise UnsupportedSQL — never silently mis-translate.
"""

from __future__ import annotations

import pytest

from quackspark.oracle import compare
from quackspark.relation import Connection
from quackspark.session import register_testdata_views

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con(spark):
    register_testdata_views(spark, SF)
    return Connection(spark)


CASES = {
    # --- named WINDOW clause (grammar: window_clause) ---
    "window_named": """
        SELECT n_nationkey, sum(n_regionkey) OVER w AS s
        FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey)
        ORDER BY n_nationkey
    """,
    "window_named_two": """
        SELECT n_nationkey,
               rank() OVER w AS r,
               count(*) OVER w2 AS c
        FROM nation
        WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey),
               w2 AS (PARTITION BY n_regionkey)
        ORDER BY n_nationkey
    """,
    "window_named_with_frame": """
        SELECT n_nationkey, sum(n_nationkey) OVER w AS run
        FROM nation
        WINDOW w AS (ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
        ORDER BY n_nationkey
    """,
    # --- set operations inside FROM subqueries ---
    "setop_in_from": """
        SELECT k, count(*) AS c
        FROM (SELECT n_regionkey AS k FROM nation
              UNION ALL
              SELECT r_regionkey AS k FROM region) t
        GROUP BY k ORDER BY k
    """,
    "intersect_in_from": """
        SELECT k FROM (SELECT n_regionkey AS k FROM nation
                       INTERSECT
                       SELECT r_regionkey AS k FROM region) t
        ORDER BY k
    """,
    "except_in_from_nested": """
        SELECT k FROM (
            SELECT k FROM (SELECT n_nationkey AS k FROM nation
                           EXCEPT
                           SELECT r_regionkey AS k FROM region) inner_t
            WHERE k < 20
        ) outer_t ORDER BY k
    """,
    "setop_arms_parenthesized": """
        (SELECT n_nationkey AS k FROM nation ORDER BY n_nationkey LIMIT 3)
        UNION ALL
        (SELECT r_regionkey AS k FROM region ORDER BY r_regionkey DESC LIMIT 2)
        ORDER BY k
    """,
    "setop_mixed_precedence": """
        SELECT n_regionkey AS k FROM nation
        UNION
        SELECT r_regionkey AS k FROM region
        INTERSECT
        SELECT r_regionkey AS k FROM region WHERE r_regionkey < 2
        ORDER BY k
    """,
    # --- nested CTE chains ---
    "cte_chain": """
        WITH a AS (SELECT n_nationkey, n_regionkey FROM nation),
             b AS (SELECT n_regionkey, count(*) AS n FROM a GROUP BY n_regionkey),
             c AS (SELECT b.n_regionkey, b.n, a.n_nationkey
                   FROM b JOIN a ON a.n_regionkey = b.n_regionkey)
        SELECT n_regionkey, n, count(*) AS members
        FROM c GROUP BY n_regionkey, n ORDER BY n_regionkey
    """,
    "cte_in_subquery": """
        SELECT t.k, t.c FROM (
            WITH x AS (SELECT n_regionkey AS k FROM nation)
            SELECT k, count(*) AS c FROM x GROUP BY k
        ) t ORDER BY t.k
    """,
    "cte_shadows_table": """
        WITH nation AS (SELECT 99 AS n_nationkey)
        SELECT n_nationkey FROM nation
    """,
    "cte_referenced_twice": """
        WITH r AS (SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey)
        SELECT a.n_regionkey, a.n + b.n AS doubled
        FROM r a JOIN r b ON a.n_regionkey = b.n_regionkey
        ORDER BY a.n_regionkey
    """,
    # --- LATERAL ---
    "lateral_comma": """
        SELECT n.n_nationkey, l.c
        FROM nation n, LATERAL (SELECT count(*) AS c FROM region r
                                 WHERE r.r_regionkey = n.n_regionkey) l
        ORDER BY n.n_nationkey
    """,
    "lateral_join_on_true": """
        SELECT n.n_nationkey, l.rname
        FROM nation n JOIN LATERAL (SELECT r_name AS rname FROM region r
                                     WHERE r.r_regionkey = n.n_regionkey) l
             ON true
        ORDER BY n.n_nationkey
    """,
    # --- subquery shapes ---
    "scalar_subquery_select": """
        SELECT n_nationkey,
               (SELECT r_name FROM region WHERE r_regionkey = n_regionkey) AS rname
        FROM nation ORDER BY n_nationkey
    """,
    "exists_correlated": """
        SELECT r_regionkey FROM region
        WHERE EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey
                      AND n_nationkey > 20)
        ORDER BY r_regionkey
    """,
    "not_in_subquery": """
        SELECT n_nationkey FROM nation
        WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region
                                  WHERE r_regionkey >= 3)
        ORDER BY n_nationkey
    """,
    "scalar_agg_where": """
        SELECT n_nationkey FROM nation
        WHERE n_nationkey > (SELECT avg(n_nationkey) FROM nation)
        ORDER BY n_nationkey
    """,
    # --- misc grammar shapes ---
    "values_in_from": """
        SELECT i, s FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(i, s)
        ORDER BY i
    """,
    "derived_column_alias": """
        SELECT a, b FROM (SELECT n_nationkey, n_name FROM nation) AS t(a, b)
        WHERE a < 5 ORDER BY a
    """,
    "case_with_window": """
        SELECT n_nationkey,
               CASE WHEN row_number() OVER (ORDER BY n_nationkey) % 2 = 0
                    THEN 'even' ELSE 'odd' END AS pos
        FROM nation ORDER BY n_nationkey
    """,
    "grouping_sets_direct": """
        SELECT n_regionkey, count(*) AS c
        FROM nation
        GROUP BY GROUPING SETS ((n_regionkey), ())
        ORDER BY n_regionkey NULLS FIRST
    """,
    "order_by_ordinal_offset": """
        SELECT n_nationkey, n_name FROM nation
        ORDER BY 2 DESC LIMIT 5 OFFSET 3
    """,
    "full_join_using": """
        SELECT coalesce(a.n_regionkey, b.r_regionkey) AS k, a.cnt, b.r_name
        FROM (SELECT n_regionkey, count(*) AS cnt FROM nation
              WHERE n_regionkey < 3 GROUP BY n_regionkey) a
        FULL JOIN (SELECT r_regionkey, r_name FROM region
                   WHERE r_regionkey > 1) b
        ON a.n_regionkey = b.r_regionkey
        ORDER BY k
    """,
    "distinct_expr_order": """
        SELECT DISTINCT n_regionkey % 3 AS m FROM nation ORDER BY m
    """,
}


CASES.update(
    {
        # --- DuckDB friendly-SQL extensions (round-3 frontend additions) ---
        "from_first": "FROM nation SELECT n_name ORDER BY n_name LIMIT 3",
        "from_only": "FROM region",
        "star_exclude": """
            SELECT * EXCLUDE (n_name) FROM nation ORDER BY n_nationkey
        """,
        "star_replace": """
            SELECT * REPLACE (n_nationkey * 2 AS n_nationkey) FROM nation
            ORDER BY n_nationkey
        """,
        "trailing_comma": """
            SELECT n_nationkey, n_name, FROM nation ORDER BY n_nationkey
        """,
        "union_by_name_reordered": """
            SELECT n_nationkey AS a, n_regionkey AS b FROM nation
            WHERE n_nationkey < 3
            UNION ALL BY NAME
            SELECT n_regionkey AS b, n_nationkey AS a FROM nation
            WHERE n_nationkey >= 3 AND n_nationkey < 5
            ORDER BY a
        """,
        "union_by_name_missing_cols": """
            SELECT n_nationkey AS a FROM nation WHERE n_nationkey < 2
            UNION BY NAME
            SELECT r_regionkey AS b FROM region WHERE r_regionkey < 2
            ORDER BY a NULLS FIRST, b NULLS FIRST
        """,
        "columns_regex": """
            SELECT COLUMNS('n_.*key') FROM nation ORDER BY n_nationkey
        """,
        "columns_regex_partial_match": """
            SELECT COLUMNS('key') FROM nation ORDER BY n_nationkey
        """,
        "limit_percent": """
            SELECT o_orderkey, o_totalprice FROM
              (SELECT o_orderkey, o_totalprice FROM orders
               ORDER BY o_orderkey LIMIT 0.1 PERCENT)
            ORDER BY o_orderkey
        """,
        "bit_emulation": """
            WITH b AS (SELECT n_nationkey,
                              lpad(bin(n_nationkey + 37), 8, '0') AS bstr
                       FROM nation)
            SELECT n_nationkey, bstr,
                   CAST(get_bit(CAST(bstr AS BIT), 2) AS INT) AS get2,
                   CAST(set_bit(CAST(bstr AS BIT), 3, 1) AS VARCHAR) AS set3
            FROM b ORDER BY n_nationkey
        """,
        "is_distinct_from": """
            SELECT n_nationkey FROM nation
            WHERE n_regionkey IS DISTINCT FROM 2 ORDER BY n_nationkey
        """,
        "tuple_in_list": """
            SELECT n_nationkey FROM nation
            WHERE (n_nationkey, n_regionkey) IN ((1, 1), (2, 1))
            ORDER BY n_nationkey
        """,
        # --- friendly PIVOT / UNPIVOT (sqlfront._run_pivot/_run_unpivot) ---
        "pivot_count": """
            PIVOT orders ON o_orderpriority USING count(*)
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "pivot_two_aggs_aliased": """
            PIVOT orders ON o_orderstatus USING sum(o_totalprice) AS s, count(*) AS c
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "pivot_subquery_source": """
            PIVOT (SELECT o_orderstatus, o_orderpriority FROM orders
                   WHERE o_orderkey < 5000)
            ON o_orderpriority USING count(*)
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "pivot_implicit_group": """
            PIVOT (SELECT o_orderstatus, o_orderpriority FROM orders)
            ON o_orderpriority USING count(*) ORDER BY o_orderstatus
        """,
        "pivot_sparse_cells_null": """
            PIVOT (SELECT o_orderstatus, o_orderpriority, o_totalprice
                   FROM orders WHERE o_orderkey < 30)
            ON o_orderpriority USING sum(o_totalprice)
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "unpivot_into_long": """
            UNPIVOT (SELECT o_orderkey, o_totalprice AS a, o_totalprice * 2 AS b
                     FROM orders WHERE o_orderkey < 100)
            ON a, b INTO NAME metric VALUE val
            ORDER BY o_orderkey, metric
        """,
        # --- ASOF JOIN (rewritten to join + per-left-row window; right
        # side deduped to unique ts so best-match ties can't differ) ---
        "asof_backward": """
            SELECT e.event_id, o.ok FROM events e
            ASOF JOIN (SELECT o_orderdate, max(o_orderkey) AS ok
                       FROM orders GROUP BY o_orderdate) o
            ON e.ts >= o.o_orderdate
            WHERE e.event_id < 200 ORDER BY e.event_id
        """,
        "asof_left": """
            SELECT e.event_id, o.ok FROM events e
            ASOF LEFT JOIN (SELECT o_orderdate, max(o_orderkey) AS ok
                            FROM orders GROUP BY o_orderdate) o
            ON e.ts >= o.o_orderdate
            WHERE e.event_id < 200 ORDER BY e.event_id
        """,
        "asof_forward": """
            SELECT e.event_id, o.ok FROM events e
            ASOF JOIN (SELECT o_orderdate, max(o_orderkey) AS ok
                       FROM orders GROUP BY o_orderdate) o
            ON e.ts <= o.o_orderdate
            WHERE e.event_id < 200 ORDER BY e.event_id
        """,
        "asof_with_equality": """
            SELECT e.event_id, o.ok FROM events e
            ASOF JOIN (SELECT o_custkey, o_orderdate, max(o_orderkey) AS ok
                       FROM orders GROUP BY o_custkey, o_orderdate) o
            ON o.o_custkey = e.user_id AND e.ts >= o.o_orderdate
            WHERE e.event_id < 2000 ORDER BY e.event_id
        """,
    }
)


CASES.update(
    {
        # --- list comprehensions (friendly-SQL sugar over list lambdas) ---
        "list_comp_basic": "SELECT [x*2 FOR x IN [1,2,3]] AS l",
        "list_comp_if": "SELECT [x*2 FOR x IN [1,2,3,4] IF x%2=0] AS l",
        "list_comp_over_column": """
            SELECT n_nationkey,
                   [upper(w) FOR w IN string_split(n_name, '_') IF length(w) > 3] AS l
            FROM nation ORDER BY n_nationkey
        """,
        "list_comp_nested": "SELECT [y*10 FOR y IN [x FOR x IN [1,2,3] IF x>1]] AS l",
        # --- negative / open-ended list slices ---
        "slice_negative_end": "SELECT ([1,2,3,4,5])[2:-1] AS s",
        "slice_negative_both": "SELECT ([1,2,3,4,5])[-3:-1] AS s",
        "slice_open_start": "SELECT ([1,2,3,4,5])[:-2] AS s",
        "slice_open_end": "SELECT ([1,2,3,4,5])[2:] AS s",
        "slice_zero_start": "SELECT ([1,2,3,4,5])[0:3] AS s",
        "slice_inverted_empty": "SELECT ([1,2,3,4,5])[4:2] AS s",
        "slice_overshoot": "SELECT ([1,2,3,4,5])[3:99] AS s",
        "slice_undershoot": "SELECT ([1,2,3,4,5])[-99:2] AS s",
        "slice_on_column": """
            SELECT n_nationkey, (string_split(n_name, '_'))[2:] AS tail
            FROM nation ORDER BY n_nationkey
        """,
        # --- AT TIME ZONE (NTZ → instant, and the roundtrip idiom) ---
        "at_time_zone_instant": """
            SELECT CAST(extract(epoch FROM TIMESTAMP '2020-06-01 12:00:00'
                        AT TIME ZONE 'America/New_York') AS BIGINT) AS e
        """,
        "at_time_zone_roundtrip": """
            SELECT CAST((TIMESTAMP '2020-06-01 12:00:00' AT TIME ZONE 'UTC')
                        AT TIME ZONE 'America/New_York' AS VARCHAR) AS t
        """,
        "at_time_zone_column": """
            SELECT event_id,
                   CAST(floor(extract(epoch FROM ts AT TIME ZONE 'Asia/Tokyo'))
                        AS BIGINT) AS e
            FROM events WHERE event_id < 50 ORDER BY event_id
        """,
    }
)


CASES.update(
    {
        # --- function-chaining ("method") syntax ---
        "method_on_literal": "SELECT ('abc').upper() AS u",
        "method_on_list": "SELECT ([3,1,2]).list_sort() AS s",
        "method_on_column": """
            SELECT n_name.lower() AS l FROM nation ORDER BY n_nationkey LIMIT 5
        """,
        "method_chained": """
            SELECT n_name.lower().trim() AS l FROM nation ORDER BY 1 LIMIT 5
        """,
        # --- zero-arg count() ---
        "count_no_args": "SELECT count() AS c FROM nation",
        # --- dollar-quoted strings ---
        "dollar_quoted": "SELECT $$it's here$$ AS s",
        "dollar_quoted_tagged": "SELECT $tag$double $$ inside$tag$ AS s",
        # --- ORDER BY ALL direction applies to every column ---
        "order_by_all_desc": """
            SELECT n_regionkey, count(*) AS c FROM nation
            GROUP BY ALL ORDER BY ALL DESC
        """,
        # --- SIMILAR TO = anchored regex (no %-wildcard layer) ---
        "similar_to_regex": """
            SELECT 'abc' SIMILAR TO 'a.c' AS a, 'abc' SIMILAR TO '%bc' AS b,
                   'abc' NOT SIMILAR TO 'x.*' AS c
        """,
        "similar_to_column": """
            SELECT n_name SIMILAR TO 'NATION_1.' AS m
            FROM nation ORDER BY n_nationkey
        """,
        # --- ORDER BY inside array_agg ---
        "array_agg_ordered": """
            SELECT array_agg(n_name ORDER BY n_nationkey DESC) AS l
            FROM nation WHERE n_nationkey < 3
        """,
    }
)


CASES.update(
    {
        # --- overloads / base discrepancies the rewriter must resolve ---
        "log_is_base10": """
            SELECT log(100) AS l, log(4, 16) AS b, ln(1) AS n,
                   log2(8) AS l2, log10(1000) AS l10
        """,
        "sign_integer_result": "SELECT sign(-2) AS s, sign(2.5) AS p, sign(0) AS z",
        "fdiv_fmod": """
            SELECT fdiv(7, 2) AS d, fdiv(7.5, 2) AS fd, fmod(7.5, 2) AS fm
        """,
        "date_add_overloads": """
            SELECT date_add(DATE '2020-01-01', INTERVAL 3 MONTH) AS d,
                   date_add(DATE '2020-01-01', 3) AS e
        """,
        "epoch_ms_overloads": """
            SELECT epoch_ms(1704067200000) AS t,
                   epoch_ms(TIMESTAMP '2024-01-01') AS ms
        """,
        # --- MAP literal / extraction returns list-of-matches ---
        "map_literal_single_pair": """
            SELECT map_keys(MAP {'a': 1}) AS k, map_values(MAP {'a': 1}) AS v
        """,
        "map_subscript_list": """
            SELECT MAP {'x': 10}['x'] AS m, MAP {'x': 10}['z'] AS n,
                   MAP(['k1','k2'], [5, 6])['k2'] AS p
        """,
    }
)


CASES.update(
    {
        # --- list function surface ---
        "list_sum_avg_count": """
            SELECT list_sum([1,2,3]) AS s, list_sum([1.5,2.0]) AS f,
                   list_sum([NULL]::INT[]) AS n, list_sum([]::INT[]) AS e,
                   list_sum([1,NULL,3]) AS m, list_avg([1,2,4]) AS a,
                   list_count([1,NULL,3]) AS c
        """,
        "list_aggregate_names": """
            SELECT list_aggregate([1,2,3], 'sum') AS s,
                   list_aggregate([1,2], 'avg') AS a,
                   list_aggregate([1,NULL], 'count') AS c,
                   list_aggregate([3,1], 'min') AS mn
        """,
        "list_resize_slice": """
            SELECT list_resize([1,2], 4, 0) AS r, list_resize([1,2,3], 2, 0) AS c,
                   list_resize([1,2], 4) AS n, list_slice([1,2,3,4], 2, 3) AS s,
                   list_slice([1,2,3,4], 2, -1) AS t, list_reverse([1,2,3]) AS v
        """,
        "list_indexof_missing": """
            SELECT list_indexof([10,20,30], 20) AS i, list_indexof([10,20], 99) AS m
        """,
        "quantile_is_disc": "SELECT quantile(n_nationkey, 0.5) AS q FROM nation",
        "like_escape_family": """
            SELECT like_escape('a_c', 'a$_c', '$') AS m,
                   ilike_escape('A_C', 'a$_c', '$') AS i,
                   not_like_escape('abc', 'a$_c', '$') AS n
        """,
        "string_affix_tests": """
            SELECT starts_with('abc', 'ab') AS s, ends_with('abc', 'bc') AS e,
                   from_base64(to_base64('hi'::BLOB))::VARCHAR AS b
        """,
        # --- temporal series & date_trunc result types ---
        "generate_series_dates": """
            SELECT generate_series(DATE '2020-01-01', DATE '2020-01-05',
                                   INTERVAL 1 DAY) AS g,
                   range(DATE '2020-01-01', DATE '2020-01-05',
                         INTERVAL 1 DAY) AS r
        """,
        "date_trunc_result_types": """
            SELECT date_trunc('week', DATE '2024-03-14') AS w,
                   date_trunc('quarter', TIMESTAMP '2024-05-14 10:00:00') AS q,
                   date_trunc('hour', TIMESTAMP '2024-03-14 10:30:00') AS h
        """,
        # --- array-type suffix casts ---
        "array_type_suffix": """
            SELECT CAST([1,2] AS INT[]) AS c, [[1],[2]]::INT[][] AS n,
                   []::VARCHAR[] AS e
        """,
    }
)


CASES.update(
    {
        # --- numeric literal forms ---
        "numeric_underscores": "SELECT 1_000_000 AS n, 1_0.5_0 AS d",
        "numeric_dot_forms": "SELECT 1e3 AS e, .5 AS f, 2. AS g, 1.5e-3 AS x",
        # --- JSON construction / extraction ---
        "json_arrow_chain": """
            SELECT '{"a":{"b":2}}'::JSON->'a'->>'b' AS j
        """,
        "json_construction": """
            SELECT json_object('k', 7) AS o, json_array(1, 2) AS a,
                   json_quote('hi') AS q, json_quote(42) AS n
        """,
        "json_group_object_agg": """
            SELECT json_group_object(n_name, n_nationkey) AS g
            FROM (SELECT * FROM nation WHERE n_nationkey < 2) t
        """,
        "json_transform_template": """
            SELECT json_transform('{"a":1,"b":"x"}',
                                  '{"a":"INTEGER","b":"VARCHAR"}') AS t,
                   json_transform('{"l":[1,2]}', '{"l":["BIGINT"]}') AS l
        """,
    }
)

CASES.update(
    {
        # --- 2-arg trim family: Spark's argument order is REVERSED ---
        "trim_two_arg": """
            SELECT ltrim('xxabc', 'x') AS l, rtrim('abcyy', 'y') AS r,
                   trim('xaxbx', 'x') AS t
        """,
        # --- aggregate FILTER shorthand / ORDER BY / DISTINCT modifiers ---
        "filter_no_where": """
            SELECT count(*) FILTER (n_regionkey = 1) AS f,
                   sum(n_nationkey) FILTER (WHERE n_regionkey = 2) AS s
            FROM nation
        """,
        "agg_order_by_stripped": """
            SELECT sum(n_nationkey ORDER BY n_nationkey) AS s,
                   min(n_name ORDER BY n_nationkey DESC) AS m
            FROM nation
        """,
        "agg_distinct_ordered": """
            SELECT to_json(array_agg(DISTINCT n_regionkey
                                     ORDER BY n_regionkey)) AS a,
                   to_json(array_agg(DISTINCT n_regionkey
                                     ORDER BY n_regionkey DESC)) AS d,
                   string_agg(DISTINCT n_regionkey::VARCHAR, ','
                              ORDER BY n_regionkey::VARCHAR) AS s
            FROM nation
        """,
        # --- date function aliases and day-number conventions ---
        "weekday_sunday_zero": """
            SELECT weekday(DATE '2024-03-17') AS sun,
                   weekday(DATE '2024-03-18') AS mon
        """,
        "julian_day": """
            SELECT julian(DATE '2024-01-01') AS j,
                   julian(TIMESTAMP '2024-01-01 12:00:00') AS h
        """,
        "datetrunc_alias": "SELECT datetrunc('month', DATE '2020-03-15') AS d",
        "strlen_bytes": "SELECT strlen('héllo') AS b, len('héllo') AS c",
        "array_length_dim": "SELECT array_length([[1],[2,3]], 1) AS l",
    }
)

CASES.update(
    {
        # --- container ::JSON casts render as JSON, not brace-notation ---
        "struct_json_cast": """
            SELECT {'a': 1}::JSON::VARCHAR AS j, ['p','q']::JSON AS l
        """,
        # --- parenthesized single-param lambdas; list_apply alias ---
        "lambda_paren_param": """
            SELECT to_json(list_transform([1,2], (x) -> x + 1)) AS t,
                   to_json(list_apply([1,2], x -> x * x)) AS a
        """,
        # --- date − date yields integer days in every typed shape ---
        "date_minus_date_forms": """
            SELECT (DATE '2020-03-01' - DATE '2020-02-01') AS a,
                   ('2020-03-01'::DATE - '2020-02-01'::DATE) AS b,
                   (DATE '2020-03-01' - '2020-02-01'::DATE) AS c,
                   DATE '2020-01-05' - 3 AS d
        """,
    }
)

CASES.update(
    {
        # --- list-overlap operator; DISTINCT ON with non-projected keys ---
        "array_overlap_op": "SELECT [1,2] && [2,3] AS o, [1,2] && [3,4] AS n",
        "distinct_on_hidden_key": """
            SELECT DISTINCT ON (n_regionkey) n_nationkey FROM nation
            ORDER BY n_regionkey, n_nationkey DESC
        """,
        "columns_lambda": """
            SELECT COLUMNS(c -> c LIKE 'n_n%') FROM nation ORDER BY 1
        """,
        "table_statement": "TABLE region",
        "nested_agg_in_window": """
            SELECT n_regionkey, sum(count(*)) OVER () AS tot
            FROM nation GROUP BY n_regionkey ORDER BY 1
        """,
    }
)

CASES.update(
    {
        # --- function-catalog alias batch (duckdb_functions() diff) ---
        "word_arithmetic": "SELECT add(1,2) AS a, multiply(3,4) AS m, subtract(5,1) AS s",
        "subsecond_parts": """
            SELECT microsecond(TIMESTAMP '2020-01-01 12:30:01.5') AS a,
                   millisecond(TIMESTAMP '2020-01-01 12:30:01.5') AS b,
                   millennium(DATE '2024-01-01') AS c,
                   epoch_ns(TIMESTAMP '2024-01-01') AS n
        """,
        "json_type_all": """
            SELECT json_type('{"a":1}') AS a, json_type('[1]') AS b,
                   json_type('"x"') AS c, json_type('1') AS d,
                   json_type('-2') AS e, json_type('1.5') AS f,
                   json_type('true') AS g, json_type('null') AS h
        """,
        "parse_path_family": """
            SELECT parse_filename('/a/b/c.txt') AS a,
                   parse_filename('/a/b/c.txt', true) AS b,
                   parse_dirpath('/a/b/c.txt') AS c,
                   parse_dirname('/a/b/c.txt') AS d,
                   to_json(parse_path('/a/b/c.txt')) AS e,
                   parse_dirname('rel/x.csv') AS f
        """,
        "to_interval_units": """
            SELECT (TIMESTAMP '2020-01-01' + to_weeks(2))::VARCHAR AS a,
                   (TIMESTAMP '2020-01-01' + to_quarters(3))::VARCHAR AS b,
                   (TIMESTAMP '2020-01-01' + to_milliseconds(1500))::VARCHAR AS c,
                   (TIMESTAMP '2020-01-01' + to_decades(1))::VARCHAR AS d
        """,
        "misc_catalog_aliases": """
            SELECT regexp_escape('a.b*c') AS r, signbit(-0.5) AS sb,
                   signbit(0.5) AS sp, count_star() AS c,
                   formatReadableSize(1536) AS fs,
                   formatReadableDecimalSize(1500) AS fd,
                   from_hex('6869')::VARCHAR AS fh
            FROM nation LIMIT 1
        """,
        "kurtosis_pop_moments": """
            SELECT round(kurtosis_pop(n_nationkey), 9) AS k FROM nation
        """,
        "mad_rewrite": """
            SELECT n_regionkey, mad(n_nationkey) AS m FROM nation
            GROUP BY n_regionkey ORDER BY 1
        """,
        "mad_ungrouped_filtered": """
            SELECT mad(n_nationkey) AS m FROM nation WHERE n_regionkey = 1
        """,
        "try_strptime_null": """
            SELECT try_strptime('zzz', '%Y-%m-%d') AS a,
                   try_strptime('2020-01-02', '%Y-%m-%d') AS b
        """,
    }
)

CASES.update(
    {
        # --- double-quoted identifiers (SQL standard; Spark would read
        # them as STRING LITERALS — silent wrongness before the fix) ---
        "quoted_identifiers": """
            SELECT "n_name" AS "UPPER case", 1 AS "select",
                   2 AS "with ""escaped"" quotes"
            FROM "nation" ORDER BY "UPPER case" LIMIT 3
        """,
        "quoted_identifier_qualified": """
            SELECT t."n_name" FROM nation t ORDER BY 1 LIMIT 2
        """,
    }
)

CASES.update(
    {
        # --- escape strings, composite type syntax, mixed intervals ---
        "escape_strings": r"SELECT E'a\nb' AS s, e'\t' = chr(9) AS t",
        "composite_type_casts": """
            SELECT CAST({'a': 1} AS STRUCT(a BIGINT)).a AS s,
                   CAST({'o': {'i': 2}} AS STRUCT(o STRUCT(i BIGINT))).o.i AS n,
                   CAST(MAP {'k': [1,2]} AS MAP(VARCHAR, BIGINT[]))['k'] AS m
        """,
        "timestamptz_type": """
            SELECT '2020-01-01 10:00:00'::TIMESTAMPTZ IS NOT NULL AS a,
                   TIMESTAMP WITH TIME ZONE '2020-01-01 10:00:00'
                       = TIMESTAMP '2020-01-01 10:00:00' AS b
        """,
        "mixed_interval_literal": """
            SELECT (DATE '2020-01-01' + INTERVAL '1 year 2 months 3 days')::VARCHAR AS a,
                   (TIMESTAMP '2020-01-01' + INTERVAL '1 day 2 hours 30 minutes')::VARCHAR AS b,
                   (TIMESTAMP '2020-01-01' + INTERVAL '1 second 500 milliseconds')::VARCHAR AS c
        """,
    }
)

CASES.update(
    {
        # --- default NULL placement: DuckDB orders NULLS LAST both ways;
        # Spark's ascending default is NULLS FIRST (row-selection drift
        # under LIMIT and wrong rank() numbering without the rewrite) ---
        "null_ordering_defaults": """
            SELECT x FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY x LIMIT 1
        """,
        "null_ordering_window": """
            SELECT x, rank() OVER (ORDER BY x) AS r
            FROM (VALUES (1),(NULL),(2)) t(x) ORDER BY r
        """,
        "null_ordering_mixed_dirs": """
            SELECT x, y FROM (VALUES (1, NULL),(1, 2),(2, 1)) t(x,y)
            ORDER BY x ASC, y DESC
        """,
        # --- POSIX regex classes (RE2) → Java \p classes; the Java
        # parser reads [[:digit:]] as a literal char set — silent
        # non-match before the translation ---
        "posix_regex_classes": r"""
            SELECT regexp_matches('abc123', '[[:digit:]]+') AS d,
                   regexp_extract('a1b22', '[[:digit:]]+') AS e,
                   regexp_replace('a1b2', '[[:digit:]]', 'X', 'g') AS r,
                   '!!' ~ '[[:alnum:]]' AS n,
                   'Abc' SIMILAR TO '[[:upper:]][[:lower:]]+' AS s
        """,
        "regexp_extract_group_default": r"""
            SELECT regexp_extract('a1b22', '[0-9]+') AS whole,
                   regexp_extract('ab12', '([a-z]+)([0-9]+)', 2) AS grp
        """,
        # --- 1-based lambda index params; step slices; format specs ---
        "lambda_index_one_based": """
            SELECT to_json(list_transform([10,20,30], (x, i) -> x + i)) AS t,
                   to_json(list_filter([10,20,30], (x, i) -> i > 1)) AS f
        """,
        "step_slice": """
            SELECT to_json(([1,2,3,4,5])[1:5:2]) AS a,
                   to_json(([1,2,3,4,5])[2:4:2]) AS b
        """,
        "list_sort_null_orders": """
            SELECT to_json(list_sort([3,NULL,1], 'ASC')) AS a,
                   to_json(list_sort([3,NULL,1], 'DESC')) AS d,
                   to_json(list_sort([3,NULL,1], 'ASC', 'NULLS FIRST')) AS nf
        """,
        "format_specs": """
            SELECT format('{:.2f}', 3.25) AS f, format('{} = {:d}', 'x', 42) AS g,
                   format('{1} then {0}', 'a', 'b') AS p
        """,
        # --- date-part numbering fixups and date_diff units ---
        "extract_dow_numbering": """
            SELECT extract(dow FROM DATE '2024-03-17') AS dow,
                   extract(isodow FROM DATE '2024-03-17') AS iso,
                   extract(microseconds FROM TIMESTAMP '2024-01-01 00:00:01.5') AS us,
                   date_part('dow', DATE '2024-03-18') AS mon
        """,
        "date_diff_week_quarter": """
            SELECT date_diff('week', DATE '2024-01-01', DATE '2024-02-01') AS w,
                   date_diff('quarter', DATE '2024-01-15', DATE '2024-08-01') AS q
        """,
        "date_part_list_form": """
            SELECT date_part(['year','month','day'], DATE '2024-03-14').year AS y
        """,
        "time_bucket_quoted_interval": """
            SELECT time_bucket(INTERVAL '15 minutes',
                               TIMESTAMP '2024-01-01 10:20:00')::VARCHAR AS b
        """,
        # --- multi-key ORDER BY inside aggregates (arg-split commas) ---
        "agg_multikey_order": """
            SELECT to_json(array_agg(x ORDER BY y, z)) AS a,
                   to_json(array_agg(x ORDER BY y DESC, z DESC)) AS d,
                   string_agg(CAST(x AS VARCHAR), '-' ORDER BY y, x) AS s,
                   first(x ORDER BY y, z) AS f, last(x ORDER BY y, z) AS l
            FROM (VALUES (1, 2, 3),(2, 2, 1),(3, 1, 9)) t(x,y,z)
        """,
        # --- parallel unnest zips positionally, NULL-padded ---
        "parallel_unnest": """
            SELECT unnest([1,2,3]) AS a, unnest(['x','y']) AS b
        """,
        "parallel_unnest_expr": """
            SELECT unnest([1,2]) + unnest([10,20]) AS s
        """,
        # --- named-window inheritance ---
        "window_inheritance": """
            SELECT n_nationkey, rank() OVER w2 AS r, count(*) OVER w AS c
            FROM nation
            WINDOW w AS (PARTITION BY n_regionkey),
                   w2 AS (w ORDER BY n_nationkey DESC)
            ORDER BY n_nationkey
        """,
    }
)

REFUSALS_EXTRA = {
    "json_merge_patch": """SELECT json_merge_patch('{"a":1}', '{"b":2}') AS m""",
    "json_terminal_arrow": """SELECT '{"a":"x"}'::JSON->'a' AS j""",
}


@pytest.mark.parametrize("name", sorted(REFUSALS_EXTRA))
def test_honest_refusal_extra(con, name):
    from quackspark.sqlfront import UnsupportedSQL

    with pytest.raises(UnsupportedSQL):
        con.sql(REFUSALS_EXTRA[name])


def test_tablesample_percent_rows_only(con):
    """`TABLESAMPLE 10%` (bare-percent DuckDB form) — sampling is
    nondeterministic across engines, so assert cardinality bounds only."""
    c = con.sql("SELECT count(*) AS c FROM orders TABLESAMPLE 10%").df.collect()[0][0]
    total = con.sql("SELECT count(*) AS c FROM orders").df.collect()[0][0]
    assert 0 < c < total / 2


#: cases that SUM raw doubles (no dsum routing — they are verbatim user
#: SQL): partial-aggregation order differs between engines, and since the
#: derived storage layout (sources/derived.py) bucketed `orders`, Spark's
#: accumulation order no longer accidentally matches DuckDB's file order.
#: Allow last-ulp drift only — the driver's 12-significant-digit hash
#: canon (FIXTURES.md §6) accepts the same.
FLOAT_ORDER_REL = {
    "pivot_sparse_cells_null": 1e-12,
    "pivot_two_aggs_aliased": 1e-12,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_adversarial_shape(con, name):
    sql = CASES[name]
    df = con.sql(sql).df
    probs = compare(df, sql, SF, rel=FLOAT_ORDER_REL.get(name, 0.0))
    assert not probs, f"{name}:\n" + "\n".join(probs)


# --- honest-refusal posture: shapes we cannot faithfully translate must
# raise a precise UnsupportedSQL, never silently drift ---

from quackspark.sqlfront import UnsupportedSQL  # noqa: E402

REFUSALS = {
    "bit_position_alignment": """
        SELECT bit_position('01'::BIT, '00100101'::BIT)
    """,
    "asof_star": """
        SELECT * FROM events e ASOF JOIN orders o ON e.ts >= o.o_orderdate
    """,
    "mixed_setops_by_name": """
        SELECT 1 AS a UNION BY NAME SELECT 2 AS b UNION SELECT 3 AS c
    """,
}


@pytest.mark.parametrize("name", sorted(REFUSALS))
def test_honest_refusal(con, name):
    with pytest.raises(UnsupportedSQL):
        con.sql(REFUSALS[name])


def test_multi_statement_script(con, spark):
    """Semicolon-separated scripts run sequentially, last result returned
    (Connection::Query parity, duckdb-7.cpp:3375)."""
    df = con.sql(
        "CREATE OR REPLACE TEMP VIEW __qs_script_v AS "
        "SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey < 5; "
        "SELECT n_regionkey, count(*) AS c FROM __qs_script_v "
        "GROUP BY 1 ORDER BY 1;"
    ).df
    got = [tuple(r) for r in df.collect()]
    import duckdb

    d = duckdb.connect()
    d.execute(
        "CREATE VIEW nation AS SELECT * FROM "
        f"'{SF}/nation.parquet'"
    )
    d.execute(
        "CREATE TEMP VIEW __qs_script_v AS "
        "SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey < 5"
    )
    want = d.execute(
        "SELECT n_regionkey, count(*) AS c FROM __qs_script_v "
        "GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert got == want


def test_semicolon_inside_string_not_split(con):
    df = con.sql("SELECT 'a;b' AS s; SELECT 'x;y' AS s").df
    assert [tuple(r) for r in df.collect()] == [("x;y",)]
