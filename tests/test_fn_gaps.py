"""Function-surface differential tests (round-3 gap sweep): each statement
runs through the SQL frontend AND DuckDB executing identical text — the
long tail of DuckDB functions a migrating user calls (reference catalog
registration duckdb-6.cpp:5993-6040).
"""

from __future__ import annotations

import pytest

from quackspark.oracle import compare
from quackspark.relation import Connection
from quackspark.session import register_testdata_views
from quackspark.sqlfront import UnsupportedSQL

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con(spark):
    register_testdata_views(spark, SF)
    return Connection(spark)


CASES = {
    "list_append": "SELECT n_nationkey, list_append([1,2], n_nationkey) AS l "
                   "FROM nation ORDER BY n_nationkey LIMIT 5",
    "list_prepend": "SELECT list_prepend(0, [1,2]) AS l",
    "array_length": "SELECT array_length([1,2,3]) AS n",
    "list_unique": "SELECT list_unique([1,1,2,3,3]) AS n",
    "list_value": "SELECT list_value(1, 2, 3) AS l",
    "list_reverse_sort": "SELECT list_reverse_sort([3,1,2]) AS l",
    "array_slice_3arg": "SELECT array_slice([1,2,3,4], 2, 3) AS l",
    "regexp_extract_all": "SELECT n_nationkey, regexp_extract_all(n_name, '[AEIOU]') AS vs "
                          "FROM nation ORDER BY n_nationkey LIMIT 5",
    # literal-separator splits: '.'/'|' are the regression cases — Spark
    # split() is regex, DuckDB splits literally (\\Q quoting in the emit)
    "string_split_dot": "SELECT string_split('a.b.c', '.') AS l",
    "string_split_pipe": "SELECT string_split('a|b|c', '|') AS l",
    "string_to_array": "SELECT string_to_array('a,b,c', ',') AS l",
    "str_split_regex": "SELECT str_split_regex('a1b22c', '[0-9]+') AS l",
    "damerau_levenshtein": "SELECT damerau_levenshtein('abc', 'acb') AS d",
    "damerau_transposition": "SELECT damerau_levenshtein('ca', 'abc') AS d",
    "editdist3": "SELECT editdist3('kitten', 'sitting') AS d",
    "hamming": "SELECT hamming('karolin', 'kathrin') AS h",
    "mismatches": "SELECT mismatches('abcd', 'abdd') AS h",
    "jaccard": "SELECT round(jaccard('abc', 'abd'), 4) AS j",
    "format_auto": "SELECT format('{}-{}', 1, 'x') AS s",
    "format_positional": "SELECT format('{1} then {0}', 'a', 'b') AS s",
    "printf": "SELECT printf('%d/%s', 7, 'y') AS s",
    "to_base": "SELECT to_base(255, 16) AS h",
    "from_base64": "SELECT from_base64('YWJj') AS b",
    "left_right_negative": "SELECT left(n_name, -3) AS l, right(n_name, -3) AS r "
                           "FROM nation ORDER BY n_nationkey LIMIT 5",
    "md5_number_halves": "SELECT CAST(md5_number_lower('abc') AS VARCHAR) AS lo, "
                         "CAST(md5_number_upper('abc') AS VARCHAR) AS hi",
    "century": "SELECT century(DATE '1999-06-01') AS c",
    "epoch_ms": "SELECT epoch_ms(TIMESTAMP '2020-01-01 00:00:01') AS ms",
    "make_timestamp": "SELECT make_timestamp(2020, 2, 29, 12, 30, 15.5) AS t",
    "last_day": "SELECT last_day(DATE '2020-02-10') AS d",
    "monthname": "SELECT monthname(DATE '2020-02-10') AS m",
    "dayname": "SELECT dayname(DATE '2020-02-10') AS m",
    "weekofyear": "SELECT weekofyear(DATE '2020-02-10') AS w",
    # --- Postgres-operator family (round-3 batch 4) ---
    "power_doublestar": "SELECT 2 ** 10 AS p",
    "power_caret": "SELECT 3 ^ 4 AS p",
    "factorial_postfix": "SELECT 5! AS f",
    "like_tilde2": "SELECT n_nationkey FROM nation WHERE n_name ~~ '%IA%' ORDER BY 1",
    "ilike_tilde2star": "SELECT n_nationkey FROM nation WHERE n_name ~~* '%ia%' ORDER BY 1",
    "not_like_tilde": "SELECT n_nationkey FROM nation WHERE n_name !~~ '%IA%' ORDER BY 1",
    "regex_tilde": "SELECT n_nationkey FROM nation WHERE n_name ~ '^A' ORDER BY 1",
    # (`~*` case-insensitive regex is Postgres-only — this DuckDB build
    # lacks it; the frontend still translates it for pasted PG queries)
    "not_regex_tilde": "SELECT n_nationkey FROM nation WHERE n_name !~ '^A' ORDER BY 1",
    "startswith_caret_at": "SELECT n_nationkey FROM nation WHERE n_name ^@ 'AL' ORDER BY 1",
    "bitwise_not_prefix": "SELECT ~5 AS x, xor(5, 3) AS y",
    "len_string_literal": "SELECT len('abc') AS l",
    "empty_sep_split": "SELECT string_split('abc', '') AS l",
    "list_any_value": "SELECT list_any_value([NULL, 3, 4]) AS v",
    "list_where": "SELECT list_where([1,2,3], [true,false,true]) AS l",
    "list_select": "SELECT list_select([10,20,30], [1,3]) AS l",
    "list_reduce": "SELECT list_reduce([1,2,3,4], (a, b) -> a + b) AS s",
    "cbrt": "SELECT round(cbrt(27.0), 6) AS c",
    "gamma": "SELECT round(gamma(5), 6) AS g",
    "lgamma": "SELECT round(lgamma(5), 6) AS g",
    # --- MAP constructors (round-3 batch 5) ---
    "map_literal": "SELECT MAP {'a': 1, 'b': 2} AS m",
    "map_from_lists": "SELECT map(['a','b'], [1,2]) AS m",
    "map_keys_values": "SELECT map_keys(map(['a','b'], [1,2])) AS ks, "
                       "map_values(map(['a','b'], [1,2])) AS vs",
    "map_cardinality": "SELECT cardinality(map(['a','b'], [1,2])) AS n",
    "struct_literal_unchanged": "SELECT {'x': 1, 'y': 'z'} AS s",
    "offset_without_limit": "SELECT n_nationkey FROM nation "
                            "ORDER BY n_nationkey OFFSET 20",
    "in_list_null_semantics": "SELECT 3 IN (1, 2, NULL) AS a, 1 IN (1, NULL) AS b",
    "interval_string_form": "SELECT TIMESTAMP '2020-01-01' + INTERVAL '3 days' AS t",
    "concat_number_coercion": "SELECT 'x' || 5 AS s, 5 || 'x' AS s2",
    # --- aggregate family (round-3 batch 2) ---
    "first_ordered": "SELECT n_regionkey, first(n_name ORDER BY n_nationkey) AS f "
                     "FROM nation GROUP BY 1 ORDER BY 1",
    "last_ordered": "SELECT n_regionkey, last(n_name ORDER BY n_nationkey) AS f "
                    "FROM nation GROUP BY 1 ORDER BY 1",
    "bitstring_agg_full": "SELECT CAST(bitstring_agg(n_nationkey % 8, 0, 7) AS VARCHAR) "
                          "AS b FROM nation",
    "bitstring_agg_sparse": "SELECT CAST(bitstring_agg(n_nationkey % 5, 0, 9) AS VARCHAR) "
                            "AS b FROM nation",
    "fsum": "SELECT round(fsum(c_acctbal), 4) AS s FROM customer",
    "favg": "SELECT round(favg(c_acctbal), 4) AS a FROM customer",
    "listagg_ordered": "SELECT n_regionkey, listagg(n_name, ',' ORDER BY n_nationkey) "
                       "AS s FROM nation GROUP BY 1 ORDER BY 1",
    "group_concat_default_sep": "SELECT n_regionkey, "
                                "group_concat(n_name ORDER BY n_nationkey) AS s "
                                "FROM nation GROUP BY 1 ORDER BY 1",
    "quantile_cont_list": "SELECT l_returnflag, "
                          "list_transform(quantile_cont(l_quantity, [0.25, 0.5, 0.75]), "
                          "x -> round(x, 6)) AS qs FROM lineitem GROUP BY 1 ORDER BY 1",
    # --- datetime / type batch (round-3 batch 3) ---
    "date_diff_us": "SELECT date_diff('microseconds', TIMESTAMP '2020-01-01 00:00:00', "
                    "TIMESTAMP '2020-01-01 00:00:01.5') AS d",
    "date_diff_hour": "SELECT date_diff('hour', TIMESTAMP '2020-01-01 03:59:00', "
                      "TIMESTAMP '2020-01-01 05:01:00') AS d",
    "date_sub_month": "SELECT date_sub('month', DATE '2020-01-15', DATE '2020-03-01') AS d",
    "date_sub_day": "SELECT date_sub('day', DATE '2020-01-15', DATE '2020-03-01') AS d",
    "date_plus_interval": "SELECT DATE '2020-01-31' + INTERVAL 1 MONTH AS d",
    "isoyear": "SELECT isoyear(DATE '2021-01-01') AS y",
    "timezone_convert": "SELECT timezone('America/New_York', "
                        "TIMESTAMP '2020-01-01 05:00:00') AS t",
    "generate_series_timestamps": "SELECT * FROM generate_series("
                                  "TIMESTAMP '2020-01-01', TIMESTAMP '2020-01-02', "
                                  "INTERVAL 6 HOUR)",
    "uuid_cast": "SELECT 'A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11'::UUID AS u",
    "hugeint_mod": "SELECT 12345678901234567890123::HUGEINT % 97 AS h",
    "utinyint_cast": "SELECT 200::UTINYINT AS u",
    # --- window frame EXCLUDE (arithmetic rewrite) ---
    "window_exclude_sum": "SELECT n_nationkey, sum(n_nationkey) OVER (ORDER BY n_nationkey "
                          "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) "
                          "AS s FROM nation ORDER BY n_nationkey",
    "window_exclude_count": "SELECT n_nationkey, count(*) OVER (ORDER BY n_nationkey "
                            "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) "
                            "AS c FROM nation ORDER BY n_nationkey",
    "window_exclude_avg": "SELECT n_nationkey, round(avg(n_regionkey) OVER "
                          "(ORDER BY n_nationkey ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING "
                          "EXCLUDE CURRENT ROW), 6) AS a FROM nation ORDER BY n_nationkey",
    "window_exclude_no_others": "SELECT n_nationkey, sum(n_nationkey) OVER "
                                "(ORDER BY n_nationkey ROWS BETWEEN 1 PRECEDING AND "
                                "1 FOLLOWING EXCLUDE NO OTHERS) AS s "
                                "FROM nation ORDER BY n_nationkey",
    # --- round-3 batch 5: gcd/lcm, jaro, unicode, vector fns, format_bytes ---
    "gcd": "SELECT gcd(12, 18) AS a, gcd(-12, 18) AS b, gcd(0, 5) AS c",
    "gcd_alias": "SELECT greatest_common_divisor(n_nationkey + 6, 9) AS g "
                 "FROM nation ORDER BY n_nationkey LIMIT 6",
    "lcm": "SELECT lcm(4, 6) AS a, least_common_multiple(3, 7) AS b",
    "jaro_similarity": "SELECT round(jaro_similarity('martha', 'marhta'), 6) AS j, "
                       "round(jaro_similarity('abc', 'xyz'), 6) AS z",
    "unicode_fn": "SELECT unicode('abc') AS a, unicode('é') AS e, "
                  "unicode('€x') AS u, unicode('') AS z",
    "ord_fn": "SELECT ord('A') AS o",
    "list_dot_product": "SELECT round(list_dot_product([1.0, 2.0], [3.0, 4.0]), 6) AS d, "
                        "round(list_inner_product([1.0, 2.0], [3.0, 4.0]), 6) AS i",
    "list_cosine_similarity": "SELECT round(list_cosine_similarity([1.0, 2.0], "
                              "[2.0, 4.0]), 6) AS c",
    "list_distance": "SELECT round(list_distance([0.0, 0.0], [3.0, 4.0]), 6) AS d",
    "format_bytes_units": "SELECT format_bytes(0) AS z, format_bytes(1) AS one, "
                          "format_bytes(999) AS b, format_bytes(1024) AS k, "
                          "format_bytes(1536) AS k2, format_bytes(1945) AS trunc1, "
                          "format_bytes(1048575) AS trunc2, format_bytes(1048576) AS m, "
                          "format_bytes(1073741824) AS g, format_bytes(-2048) AS neg, "
                          "format_bytes(1125899906842624) AS p",
    "format_bytes_col": "SELECT n_nationkey, format_bytes(n_nationkey * 700) AS fb "
                        "FROM nation ORDER BY n_nationkey LIMIT 8",
    "list_grade_up": "SELECT list_grade_up([30, 10, 20]) AS g",
    "list_grade_up_col": "SELECT n_nationkey, "
                         "list_grade_up([n_nationkey % 3, 5, 1]) AS g "
                         "FROM nation ORDER BY n_nationkey LIMIT 5",
    "list_has_any": "SELECT list_has_any([1, 2], [2, 3]) AS a, "
                    "list_has_any([1, 2], [5]) AS b",
    "list_has_all": "SELECT list_has_all([1, 2, 3], [2, 3]) AS a, "
                    "list_has_all([1, 2], [2, 5]) AS b",
    "histogram_agg": "SELECT histogram(n_nationkey % 4) AS h FROM nation",
    "histogram_grouped": "SELECT n_regionkey, histogram(n_nationkey % 3) AS h "
                         "FROM nation GROUP BY 1 ORDER BY 1",
    "quantile_disc": "SELECT quantile_disc(n_nationkey, 0.5) AS q FROM nation",
    "regexp_split_to_table": "SELECT regexp_split_to_table('a,b;c', '[,;]') AS t",
    # FROM-position unnest (PG/DuckDB table-function form)
    "from_unnest_joined": "SELECT n_nationkey, u FROM nation, unnest([1,2]) AS t(u) "
                          "WHERE n_nationkey < 3 ORDER BY 1, 2",
    "from_unnest_solo": "SELECT u * 2 AS d FROM unnest([1,2,3]) AS t(u) ORDER BY 1",
    # DuckDB sampling methods in TABLESAMPLE position (cardinality-only —
    # count shape is deterministic, rows are not)
    "tablesample_reservoir": "SELECT count(*) > 0 AS ok FROM nation "
                             "TABLESAMPLE reservoir(5 ROWS)",
    # round-3 batch 7: ANY/ALL subqueries, DESC agg order, numeric trunc,
    # date-minus-date days
    "eq_any_subquery": "SELECT r_name FROM region WHERE r_regionkey = ANY "
                       "(SELECT n_regionkey FROM nation WHERE n_nationkey < 3) "
                       "ORDER BY 1",
    "neq_all_subquery": "SELECT r_name FROM region WHERE r_regionkey <> ALL "
                        "(SELECT n_regionkey FROM nation WHERE n_nationkey < 3) "
                        "ORDER BY 1",
    "string_agg_desc": "SELECT n_regionkey, "
                       "string_agg(n_name, '; ' ORDER BY n_name DESC) AS names "
                       "FROM nation GROUP BY 1 ORDER BY 1",
    "list_order_desc": "SELECT n_regionkey, "
                       "list(n_nationkey ORDER BY n_nationkey DESC) AS l "
                       "FROM nation GROUP BY 1 ORDER BY 1",
    "trunc_numeric": "SELECT CAST(trunc(4.7) AS INT) AS a, "
                     "CAST(trunc(-4.7) AS INT) AS b",
    "date_minus_date": "SELECT CAST('2020-03-01' AS DATE) "
                       "- CAST('2020-02-01' AS DATE) AS dd",
    "date_col_minus_date": "SELECT o_orderkey, CAST(o_orderdate AS DATE) "
                           "- CAST('1995-01-01' AS DATE) AS dd "
                           "FROM orders ORDER BY o_orderkey LIMIT 5",
    # round-3 batch 8: JSON text extraction, list/map long tail, printf
    # conversion-directed casts, epoch extract
    "json_extract_string_path": 'SELECT json_extract_string(\'{"a": {"b": 7}}\','
                                " '$.a.b') AS x",
    "json_cast_arrow": 'SELECT \'{"a": 1}\'::JSON ->> \'a\' AS v',
    "json_cast_arrow_path": 'SELECT (\'{"a": {"b": "x"}}\')::JSON ->> \'$.a.b\' AS v',
    "list_sort_desc": "SELECT list_sort([3,1,2], 'DESC') AS l",
    "map_extract_hit_miss": "SELECT map_extract(map(['k'],[42]), 'k') AS v, "
                            "map_extract(map(['k'],[42]), 'zz') AS v2",
    "extract_epoch": "SELECT extract(epoch FROM TIMESTAMP "
                     "'2020-01-01 00:00:30') AS e",
    "array_concat_cat": "SELECT array_concat([1], [2]) AS l2, "
                        "array_cat([3], [4]) AS l3",
    "printf_conversions": "SELECT printf('%5.2f|%03d', 3.14159, 7) AS s",
    "array_unique_list_count": "SELECT array_unique([1,1,2]) AS u, "
                               "list_count([1,NULL,2]) AS c",
    "to_hex_sha256": "SELECT to_hex(255) AS h, to_hex(-1) AS hneg, "
                     "sha256('abc') AS s",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_fn_differential(con, name):
    sql = CASES[name]
    probs = compare(con.sql(sql).df, sql, SF)
    assert not probs, f"{name}:\n" + "\n".join(probs)


def test_md5_number_refused(con):
    with pytest.raises(UnsupportedSQL):
        con.sql("SELECT md5_number('abc')")


def test_window_exclude_group_refused(con):
    with pytest.raises(UnsupportedSQL):
        con.sql(
            "SELECT sum(n_nationkey) OVER (ORDER BY n_regionkey "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) FROM nation"
        )


def test_mad_simple_shapes_supported(con):
    """mad() now rewrites to the two-round median join for single-table
    blocks (sqlfront._rewrite_mad); value-matches DuckDB."""
    from quackspark.oracle import duck_connection

    q = "SELECT round(mad(CAST(c_acctbal AS DOUBLE)), 6) AS m FROM customer"
    got = con.sql(q).df.collect()[0][0]
    dcon = duck_connection(SF)
    exp = dcon.sql(q).fetchall()[0][0]
    dcon.close()
    assert got == exp


def test_mad_complex_shape_refused(con):
    """Outside the single-table block (two mads), the honest refusal
    stays — never a silent mis-translation."""
    with pytest.raises(UnsupportedSQL):
        con.sql(
            "SELECT mad(c_acctbal) + mad(c_custkey) FROM customer"
        )
