"""r12 function-surface sweep fixes (tools/fn_surface_sweep.py), pinned
differentially against live DuckDB — every case here was a silent
MISMATCH or a confusing ERR before the fix:

- gamma/lgamma: real-valued Γ (was integer-factorial, silently wrong on
  fractional inputs)
- strptime/strftime: literal letters quoted in the Java pattern; the
  reversed strftime(format, ts) overload; the C 1900 base year when the
  format has no year directive
- to_binary/bin/from_binary: bit-string semantics (was hex decode)
- parse_dirname/parse_dirpath: '' when the path has no separator
- json_object: named_struct so values keep their types; 0-arg form
- json_array_length: 0 for non-array JSON (was NULL)
- json_contains: recursive containment kernel
- json_extract_string: list-of-paths overload; struct-literal inputs
- regexp_replace: DuckDB's first-match-only default (qs_regexp_once)
- TIME carrier extraction overloads (hour/…/microsecond count within
  the minute); make_time; make_timestamp(µs); TIMESTAMPTZ typed literals
- BIT length family over the '0'/'1' carrier
- timezone() function spelling of AT TIME ZONE; era(); unary
  add/subtract; 1-arg greatest/least; string-subscript list_element
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from quackspark.relation import Connection


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.fixture(scope="module")
def con(spark):
    return Connection(spark)


BOTH = [
    "SELECT gamma(2.5) AS v",
    "SELECT lgamma(2.5) AS v",
    "SELECT gamma(5) AS v",
    "SELECT gamma(-0.5) AS v",
    "SELECT strptime('05/03/2024 at 12', '%d/%m/%Y at %H') AS v",
    "SELECT strptime('03', '%m') AS v",          # 1900 base year
    "SELECT try_strptime('05 3', '%d %m') AS v",
    "SELECT strftime(TIMESTAMP '2024-03-05 12:30:45', 'year %Y day %d') AS v",
    "SELECT strftime('%Y-%m', TIMESTAMP '2024-03-05 12:30:45') AS v",
    "SELECT to_binary('ab') AS v",
    "SELECT to_binary(7) AS v",
    "SELECT bin('abc') AS v",
    "SELECT bin(7) AS v",
    "SELECT from_binary('0110000101100010') AS v",
    "SELECT parse_dirname('abc') AS v",
    "SELECT parse_dirpath('abc') AS v",
    "SELECT parse_dirname('a/b/c.txt') AS v",
    "SELECT parse_dirpath('/x/y.z') AS v",
    "SELECT json_object() AS v",
    "SELECT json_object('a', 1, 'b', 'x') AS v",
    "SELECT json_array_length('[1,2,3]') AS v",
    "SELECT json_array_length('{\"a\":1}') AS v",
    "SELECT json_contains('{\"a\":{\"b\":7}}', '{\"b\":7}') AS v",
    "SELECT json_contains('[1,2,3]', '[3,1]') AS v",
    "SELECT json_contains('{\"a\":1}', '\"a\"') AS v",
    "SELECT json_extract_path_text('{\"a\":1,\"b\":[1,2]}'::JSON,"
    " ['a','b']) AS v",
    "SELECT regexp_replace('aXbXc', 'X', '-') AS v",
    "SELECT regexp_replace('aXbXc', 'X', '-', 'g') AS v",
    "SELECT regexp_replace('aXbXc', 'x', '-', 'i') AS v",
    "SELECT microsecond(TIME '12:30:45.123456') AS v",
    "SELECT millisecond(TIME '12:30:45.123456') AS v",
    "SELECT second(TIME '12:30:45.123456') AS v",
    "SELECT hour(TIME '12:30:45') AS v",
    "SELECT minute(TIME '12:30:45') AS v",
    "SELECT hour(CAST('12:30:45' AS TIME)) AS v",
    "SELECT make_timestamp(1700000000000000) AS v",
    "SELECT TIMESTAMPTZ '2024-03-05 12:30:45' AS v",
    "SELECT year(TIMESTAMPTZ '2024-03-05 12:30:45+00') AS v",
    "SELECT timezone('America/New_York', TIMESTAMP '2024-03-05 12:00:00') AS v",
    "SELECT timezone('America/New_York',"
    " TIMESTAMPTZ '2024-03-05 12:00:00+00') AS v",
    "SELECT timezone(TIMESTAMP '2024-03-05 12:30:45') AS v",
    "SELECT era(DATE '2024-03-05') AS v",
    "SELECT add(3, 4) AS v",
    "SELECT subtract(10, 3) AS v",
    "SELECT add(2.5) AS v",
    "SELECT subtract(2.5) AS v",
    "SELECT greatest(5) AS v",
    "SELECT least(5) AS v",
    "SELECT list_element('abc', 2) AS v",
    "SELECT list_element('abc', -1) AS v",
    "SELECT list_element('abc', 7) AS v",
    "SELECT list_element('abc', 0) AS v",  # fuzz 20260823: '' not 'a'
    "SELECT bit_length('1010'::BIT) AS v",
    "SELECT bit_count('1011'::BIT) AS v",
    "SELECT octet_length('101010101'::BIT) AS v",
    "SELECT bit_length('abc') AS v",             # VARCHAR overload intact
    "SELECT bar(3, 0, 10) AS v",                 # 3-arg default width 80
    "SELECT date_part('year', age(TIMESTAMP '2024-03-15',"
    " TIMESTAMP '2023-01-31')) AS v",
]


def _norm(rows):
    out = []
    for r in rows:
        cells = []
        for c in r:
            if isinstance(c, float):
                c = round(c, 9)
            elif isinstance(c, datetime.datetime) and c.tzinfo is not None:
                c = c.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            cells.append(c)
        out.append(tuple(cells))
    return out


@pytest.mark.parametrize("q", BOTH)
def test_fn_surface_matches_duckdb(con, duck, q):
    want = duck.execute(q).fetchall()
    got = [tuple(r) for r in con.sql(q).df.collect()]
    assert _norm(got) == _norm(want)


def test_make_time_rides_the_time_carrier(con, duck):
    # TIME has no Spark storage type — make_time lands in the documented
    # µs-since-midnight BIGINT carrier, equal to epoch_us of the TIME
    got = con.sql("SELECT make_time(12, 30, 45.5) AS v").df.collect()
    want = duck.execute(
        "SELECT epoch_us(make_time(12, 30, 45.5)::TIME) AS v"
    ).fetchall()
    assert got[0][0] == want[0][0] == 45_045_500_000


def test_regexp_once_backreference(con, duck):
    q = r"SELECT regexp_replace('ab ab', '(a)(b)', '\2\1') AS v"
    assert con.sql(q).df.collect()[0][0] == duck.execute(q).fetchall()[0][0]


def test_aggregate_surface_matches_duckdb(con, duck, spark):
    """r12 aggregate-sweep additions: NULL-value-skipping arg_max/max_by
    (DuckDB skips rows whose VALUE is NULL; Spark's max_by keeps them),
    the arg_*_null variants, bitstring_agg over the BIT carrier, and
    expression-position entropy (Shannon log2, NULLs excluded, 0.0 for
    an empty group)."""
    duck.execute("CREATE OR REPLACE TABLE agg_t (k int, v varchar)")
    duck.execute("INSERT INTO agg_t VALUES (1,'a'),(5,NULL),(3,'c')")
    spark.createDataFrame(
        [(1, "a"), (5, None), (3, "c")], "k int, v string"
    ).createOrReplaceTempView("agg_t")
    for q in [
        "SELECT arg_max(v, k) AS a, arg_max_null(v, k) AS b,"
        " arg_min(v, k) AS c, arg_min_null(v, k) AS d FROM agg_t",
        "SELECT max_by(v, k) AS a, min_by(v, k) AS b FROM agg_t",
        "SELECT bitstring_agg(k) AS a FROM agg_t",
        "SELECT bitstring_agg(k, 0, 8) AS a FROM agg_t",
    ]:
        want = duck.execute(q).fetchall()
        got = [tuple(r) for r in con.sql(q).df.collect()]
        assert got == want, q


def test_entropy_matches_duckdb(con, duck, spark):
    duck.execute("CREATE OR REPLACE TABLE ent_t (g int, v int)")
    duck.execute(
        "INSERT INTO ent_t VALUES (1,1),(1,1),(1,2),(1,2),(2,NULL),(2,7)"
    )
    spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (1, 2), (2, None), (2, 7)], "g int, v int"
    ).createOrReplaceTempView("ent_t")
    q = "SELECT g, entropy(v) AS h FROM ent_t GROUP BY g ORDER BY g"
    want = duck.execute(q).fetchall()
    got = [tuple(r) for r in con.sql(q).df.collect()]
    assert [(g, round(h, 9)) for g, h in got] == \
        [(g, round(h, 9)) for g, h in want] == [(1, 1.0), (2, 0.0)]


def test_json_contains_fuzz_vs_oracle(con, duck):
    # randomized structural-containment agreement on nested documents
    import itertools
    import json

    docs = [
        {"a": 1, "b": [1, 2, {"c": "x"}]},
        [1, [2, 3], {"k": True}],
        {"n": None, "f": 1.5},
        "plain", 7, [],
    ]
    needles = ['1', '"x"', '{"c":"x"}', '[2]', '[{"k":true}]', 'null',
               '{"a":1}', '[3,2]', 'true', '"a"']
    rows = []
    for d, n in itertools.product(docs, needles):
        h = json.dumps(d)
        q = (
            "SELECT json_contains("
            + "'" + h.replace("'", "''") + "', "
            + "'" + n.replace("'", "''") + "') AS v"
        )
        want = duck.execute(q).fetchone()[0]
        got = con.sql(q).df.collect()[0][0]
        rows.append((h, n, want, got))
    bad = [r for r in rows if r[2] != r[3]]
    assert not bad, bad[:5]


def test_table_functions_matches_duckdb(con, duck):
    """r12 table-function additions: parquet_metadata /
    parquet_file_metadata (pyarrow footer view, reference column set),
    repeat_row, pg_timezone_names (IANA set — spot-checked on shared
    names). pragma_version/pragma_platform exist but report THIS
    engine's identity by design."""
    p = "/root/testdata/sf0.001/nation.parquet"
    for q in [
        f"SELECT * FROM parquet_file_metadata('{p}')",
        f"SELECT path_in_schema, type, num_values, stats_min_value, "
        f"stats_max_value, compression, row_group_num_rows "
        f"FROM parquet_metadata('{p}') ORDER BY column_id",
        "SELECT * FROM repeat_row(1, 'x', num_rows=3)",
        "SELECT column0 + 1 AS a FROM repeat_row(41, num_rows=2)",
        "SELECT name, is_dst FROM pg_timezone_names() "
        "WHERE name IN ('America/New_York', 'UTC', 'Asia/Tokyo') "
        "ORDER BY name",
    ]:
        want = duck.execute(q).fetchall()
        got = [tuple(r) for r in con.sql(q).df.collect()]
        assert got == want, (q, want, got)
    for q in ["SELECT * FROM pragma_version()",
              "SELECT * FROM pragma_platform()"]:
        assert len(con.sql(q).df.collect()) == 1, q


def test_catalog_tvfs_keywords_databases(con, duck):
    """duckdb_keywords() matches the oracle's keyword table exactly (it
    IS the vendored grammar's kwlist); duckdb_databases() lists the
    session catalog with the reference's column set."""
    q = "SELECT keyword_name, keyword_category FROM duckdb_keywords() " \
        "ORDER BY keyword_name"
    got = [tuple(r) for r in con.sql(q).df.collect()]
    want = duck.execute(q).fetchall()
    assert got == want and len(got) > 400
    dbs = con.sql("SELECT * FROM duckdb_databases()").df
    assert dbs.columns == [
        "database_name", "database_oid", "path", "comment", "tags",
        "internal", "type", "readonly",
    ]
    assert dbs.count() >= 1
