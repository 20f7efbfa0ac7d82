"""SQL frontend differential tests: DuckDB-dialect SQL through
transpile()+spark.sql must agree with DuckDB executing the original text.
"""

from __future__ import annotations

import duckdb
import pytest

from quackspark import sqlfront

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    d = duckdb.connect()
    for t in ["nation", "region", "customer", "orders", "part"]:
        d.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return d


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    from quackspark.session import register_testdata_views

    register_testdata_views(spark, SF)


CASES = [
    # function renames + list fns
    "SELECT n_nationkey, len(string_split(n_name, 'A')) AS parts "
    "FROM nation ORDER BY n_nationkey",
    # strftime C-format translation
    "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d "
    "FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey",
    # GLOB operator
    "SELECT p_partkey FROM part WHERE p_name GLOB '*green*' ORDER BY p_partkey",
    # integer division
    "SELECT n_nationkey, n_nationkey // 3 AS grp FROM nation ORDER BY n_nationkey",
    # regexp_matches / full match
    "SELECT p_partkey FROM part "
    "WHERE regexp_matches(p_name, '^[a-c]') ORDER BY p_partkey",
    # list HOFs
    "SELECT n_nationkey, "
    "list_transform(string_split(n_name, ''), x -> lower(x)) AS letters "
    "FROM nation ORDER BY n_nationkey",
    # epoch
    "SELECT o_orderkey, epoch(o_orderdate) AS ep FROM orders "
    "WHERE o_orderkey <= 100 ORDER BY o_orderkey",
    # monthname/dayname
    "SELECT o_orderkey, monthname(o_orderdate) AS mn, dayname(o_orderdate) AS dn "
    "FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey",
]


@pytest.mark.parametrize("q", CASES, ids=range(len(CASES)))
def test_transpiled_matches_duckdb(spark, duck, q):
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    exp = duck.sql(q).fetchall()
    assert got == exp, f"\nsql: {q}\nspark: {got[:3]}\nduck:  {exp[:3]}"


def test_distinct_on(spark, duck):
    q = (
        "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name "
        "FROM nation ORDER BY n_regionkey, n_name"
    )
    got = sorted(tuple(r) for r in sqlfront.sql(spark, q).collect())
    exp = sorted(duck.sql(q).fetchall())
    assert got == exp


def test_qualify(spark, duck):
    q = (
        "SELECT n_regionkey, n_name, "
        "row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) AS rn "
        "FROM nation QUALIFY rn <= 2"
    )
    got = sorted(tuple(r) for r in sqlfront.sql(spark, q).collect())
    exp = sorted(duck.sql(q).fetchall())
    assert got == exp


def test_replacement_scan(spark, duck):
    q = f"SELECT count(*) AS n FROM '{SF}/nation.parquet'"
    got = sqlfront.sql(spark, q).collect()[0][0]
    assert got == 25


def test_struct_pack(spark, duck):
    q = "SELECT struct_pack(a := 1, b := 'x') AS s"
    got = sqlfront.sql(spark, q).collect()[0][0]
    assert got.asDict() == {"a": 1, "b": "x"}


def test_unsupported_raises(spark):
    with pytest.raises(sqlfront.UnsupportedSQL):
        sqlfront.transpile("SELECT list_aggregate([1], 'median')")


def test_prepared_parameters(spark):
    # §3.2 prepared statements: named + positional parameter binding
    got = spark.sql(
        "SELECT n_name FROM nation WHERE n_nationkey = :k", args={"k": 3}
    ).collect()
    assert got[0][0] == "NATION_3"
    got2 = spark.sql(
        "SELECT count(*) FROM nation WHERE n_regionkey = ?", args=[2]
    ).collect()
    assert got2[0][0] == 5


def test_group_by_all_order_by_all(spark, duck):
    q = (
        "SELECT n_regionkey, count(*) AS n, sum(n_nationkey) AS s "
        "FROM nation GROUP BY ALL ORDER BY ALL"
    )
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    exp = duck.sql(q).fetchall()
    assert got == exp


def test_create_macro_inline_expansion(spark, duck):
    # §2.11 CREATE MACRO (ScalarMacroFunction): both engines register the
    # macro, then run the same query through it
    macro = "CREATE MACRO disc_rev(p, d) AS p * (1 - d)"
    q = (
        "SELECT o_orderkey, round(disc_rev(o_totalprice, 0.05), 4) AS r "
        "FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey"
    )
    sqlfront.sql(spark, macro)
    duck.execute(macro)
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    assert got == duck.sql(q).fetchall()


def test_macro_calling_macro(spark):
    sqlfront.sql(spark, "CREATE MACRO twice(x) AS x + x")
    sqlfront.sql(spark, "CREATE MACRO quad(x) AS twice(x) + twice(x)")
    assert sqlfront.sql(spark, "SELECT quad(3) AS v").collect()[0][0] == 12


def test_star_exclude_replace(spark, duck):
    q1 = "SELECT * EXCLUDE (n_name) FROM nation ORDER BY n_nationkey"
    got = [tuple(r) for r in sqlfront.sql(spark, q1).collect()]
    assert got == duck.sql(q1).fetchall()

    q2 = (
        "SELECT * REPLACE (n_nationkey * 2 AS n_nationkey) "
        "FROM nation ORDER BY n_nationkey"
    )
    got2 = {
        tuple(sorted(r.asDict().items())) for r in sqlfront.sql(spark, q2).collect()
    }
    cols = [d[0] for d in duck.sql(q2).description]
    exp2 = {tuple(sorted(zip(cols, r))) for r in duck.sql(q2).fetchall()}
    assert got2 == exp2


def test_similarity_and_time_bucket_in_sql(spark, duck):
    q = (
        "SELECT n_nationkey, round(jaccard(n_name, 'NATION'), 6) AS jac, "
        "round(jaro_winkler_similarity(n_name, 'NATION_5'), 6) AS jw "
        "FROM nation ORDER BY n_nationkey"
    )
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    exp = duck.sql(q).fetchall()
    assert got == exp

    q2 = (
        "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 10:17:33')"
        " AS b"
    )
    assert [tuple(r) for r in sqlfront.sql(spark, q2).collect()] == duck.sql(
        q2
    ).fetchall()


def test_copy_statement_and_export_import(spark, tmp_path):
    """COPY (SELECT …) TO / EXPORT DATABASE / IMPORT DATABASE statements
    route through the same writers as the programmatic API."""
    from quackspark import sqlfront

    out_csv = str(tmp_path / "nations.csv")
    res = sqlfront.sql(
        spark,
        f"COPY (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5) "
        f"TO '{out_csv}' (FORMAT CSV, HEADER, DELIMITER '|')",
    )
    assert res.collect()[0]["path"] == out_csv
    back = spark.read.option("header", True).option("sep", "|").csv(out_csv)
    assert back.count() == 5

    spark.sql("SELECT n_nationkey, n_name FROM nation").createOrReplaceTempView(
        "exp_stmt_nation"
    )
    exp_dir = str(tmp_path / "expdb")
    res = sqlfront.sql(
        spark, f"EXPORT DATABASE '{exp_dir}' (FORMAT PARQUET)"
    )
    assert "exp_stmt_nation" in {r["table"] for r in res.collect()}
    spark.catalog.dropTempView("exp_stmt_nation")
    res = sqlfront.sql(spark, f"IMPORT DATABASE '{exp_dir}'")
    assert spark.table("exp_stmt_nation").count() == 25
    spark.catalog.dropTempView("exp_stmt_nation")


def test_using_sample_rewrite(spark):
    """USING SAMPLE forms → TABLESAMPLE with matching cardinality semantics."""
    from quackspark import sqlfront

    t = sqlfront.transpile("SELECT * FROM nation USING SAMPLE 10 ROWS")
    assert "TABLESAMPLE ( 10 ROWS )" in t
    t = sqlfront.transpile("SELECT * FROM nation USING SAMPLE 20%")
    assert "TABLESAMPLE ( 20 PERCENT )" in t
    t = sqlfront.transpile("SELECT * FROM nation USING SAMPLE bernoulli(50%)")
    assert "TABLESAMPLE ( 50 PERCENT )" in t
    t = sqlfront.transpile("SELECT * FROM nation USING SAMPLE reservoir(7)")
    assert "TABLESAMPLE ( 7 ROWS )" in t
    rows = sqlfront.sql(
        spark, "SELECT n_nationkey FROM nation USING SAMPLE 5 ROWS"
    ).collect()
    assert len(rows) == 5


def test_with_recursive_union_all_series(spark):
    """WITH RECURSIVE ... UNION ALL: generate 1..10, differential value."""
    from quackspark import sqlfront

    got = sqlfront.sql(
        spark,
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 10) SELECT sum(n) AS s FROM t",
    ).collect()[0]["s"]
    import duckdb

    want = duckdb.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 10) SELECT sum(n) AS s FROM t"
    ).fetchone()[0]
    assert got == want == 55


def test_with_recursive_union_terminates_on_cycle(spark):
    """UNION (distinct) semantics must converge on cyclic edges."""
    from quackspark import sqlfront

    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src int, dst int"
    ).createOrReplaceTempView("cyc_edges")
    rows = sqlfront.sql(
        spark,
        "WITH RECURSIVE r(node) AS (SELECT 0 UNION "
        "SELECT dst FROM cyc_edges JOIN r ON src = node) "
        "SELECT node FROM r ORDER BY node",
    ).collect()
    assert [r["node"] for r in rows] == [0, 1, 2, 3]
    spark.catalog.dropTempView("cyc_edges")


def test_regexp_flags_translation(spark):
    """'i' flag → (?i) inline; flagless regexp_replace raises (DuckDB
    replaces first match only — no Spark equivalent)."""
    from quackspark import sqlfront

    got = sqlfront.sql(
        spark,
        "SELECT n_name FROM nation "
        "WHERE regexp_matches(n_name, 'nation_1$', 'i') ORDER BY n_name",
    ).collect()
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW nation AS SELECT * FROM '/root/testdata/sf0.01/nation.parquet'"
    )
    want = con.execute(
        "SELECT n_name FROM nation "
        "WHERE regexp_matches(n_name, 'nation_1$', 'i') ORDER BY n_name"
    ).fetchall()
    assert [(r["n_name"],) for r in got] == want

    t = sqlfront.transpile(
        "SELECT regexp_replace(n_name, 'N', 'x', 'gi') FROM nation"
    )
    assert "(?i)N" in t
    # flagless regexp_replace replaces the FIRST match only in DuckDB —
    # implemented via the qs_regexp_once kernel since r12 (was a refusal)
    t = sqlfront.transpile("SELECT regexp_replace(n_name, 'N', 'x') FROM nation")
    assert "qs_regexp_once" in t
    got = sqlfront.sql(
        spark, "SELECT regexp_replace('NaNa', 'N', 'x') AS v"
    ).collect()
    want = con.execute("SELECT regexp_replace('NaNa', 'N', 'x')").fetchall()
    assert [(got[0]["v"],)] == want == [("xaNa",)]


def test_ctas_and_insert_into(spark, tmp_path):
    """Append-only DML (reference INSERT duckdb.hpp:11969): CREATE TABLE AS
    and INSERT INTO pass through to Spark managed tables; MVCC
    UPDATE/DELETE stay documented out of scope (SURVEY §7)."""
    from quackspark import sqlfront

    spark.sql("DROP TABLE IF EXISTS dml_t")
    sqlfront.sql(
        spark,
        "CREATE TABLE dml_t AS SELECT n_nationkey AS k, n_name AS v "
        "FROM nation WHERE n_nationkey < 3",
    )
    sqlfront.sql(spark, "INSERT INTO dml_t SELECT 99, 'appended'")
    sqlfront.sql(
        spark, "INSERT INTO dml_t SELECT n_nationkey, n_name FROM nation "
               "WHERE n_nationkey BETWEEN 3 AND 4"
    )
    assert spark.table("dml_t").count() == 6
    assert [r["v"] for r in spark.sql("SELECT v FROM dml_t WHERE k = 99").collect()] == [
        "appended"
    ]
    spark.sql("DROP TABLE dml_t")


# --- ADVICE r1 regressions --------------------------------------------------


def test_backslash_regex_literal(spark, duck):
    # RLIKE pattern with \d must survive Spark's escape-consuming parser
    q = (
        "SELECT n_nationkey FROM nation "
        r"WHERE regexp_matches(n_name, 'NATION_\d\d') ORDER BY n_nationkey"
    )
    got = [r[0] for r in sqlfront.sql(spark, q).collect()]
    exp = [r[0] for r in duck.sql(q).fetchall()]
    assert got == exp and len(got) > 0


def test_glob_dot_is_literal(spark, duck):
    # GLOB '*.N*' — the '.' must be literal: 'NATION_1' has no dot and must
    # NOT match (pre-fix, RLIKE '^.*\.N.*$' reached Spark as '^.*.N.*$')
    q = "SELECT count(*) AS n FROM nation WHERE n_name GLOB '*.N*'"
    got = sqlfront.sql(spark, q).collect()[0][0]
    exp = duck.sql(q).fetchall()[0][0]
    assert got == exp == 0


def test_backslash_in_plain_literal(spark, duck):
    q = r"SELECT 'a\b' AS s, length('a\b') AS n"
    got = tuple(sqlfront.sql(spark, q).collect()[0])
    exp = tuple(duck.sql(q).fetchall()[0])
    assert got == exp == ("a\\b", 3)


def test_distinct_on_order_and_limit(spark, duck):
    # output row ORDER must match DuckDB (no sorted() masking) and trailing
    # LIMIT applies after dedup, outside the window spec
    q = (
        "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name "
        "FROM nation ORDER BY n_regionkey, n_name DESC LIMIT 3"
    )
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    exp = duck.sql(q).fetchall()
    assert got == exp and len(got) == 3


def test_distinct_on_no_order_with_limit(spark, duck):
    q = (
        "SELECT DISTINCT ON (n_regionkey) n_regionkey "
        "FROM nation LIMIT 2"
    )
    got = sqlfront.sql(spark, q).collect()
    assert len(got) == 2


def test_qualify_inline_window(spark, duck):
    # the common form: window fn directly in the QUALIFY predicate
    # (pre-fix: AnalysisException — window fn in WHERE)
    q = (
        "SELECT n_regionkey, n_name FROM nation "
        "QUALIFY row_number() OVER (PARTITION BY n_regionkey ORDER BY n_name) = 1 "
        "ORDER BY n_regionkey"
    )
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    exp = duck.sql(q).fetchall()
    assert got == exp and len(got) == 5


def test_qualify_trailing_limit(spark, duck):
    q = (
        "SELECT n_regionkey, n_name FROM nation "
        "QUALIFY rank() OVER (PARTITION BY n_regionkey ORDER BY n_name) <= 2 "
        "ORDER BY n_regionkey, n_name LIMIT 4"
    )
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    exp = duck.sql(q).fetchall()
    assert got == exp and len(got) == 4


def test_list_aggregate_string_agg_separator(spark, duck):
    q = (
        "SELECT list_aggregate(['a','b','c'], 'string_agg') AS dflt, "
        "list_aggregate(['a','b','c'], 'string_agg', '|') AS piped"
    )
    got = tuple(sqlfront.sql(spark, q).collect()[0])
    exp = tuple(duck.sql(q).fetchall()[0])
    assert got == exp == ("a,b,c", "a|b|c")


def test_strftime_iso_week_raises():
    from quackspark.functions.timefmt import translate_format

    for d in ("%G", "%V", "%U"):
        with pytest.raises(ValueError, match="unsupported strftime"):
            translate_format(f"%Y-{d}")


def test_update_delete_differential(spark, duck):
    """Copy-on-write UPDATE/DELETE vs DuckDB executing the IDENTICAL
    statements on the same base table (reference DML enum
    duckdb.hpp:11969-11972)."""
    base = "SELECT n_nationkey AS k, n_name AS v, n_regionkey AS r FROM nation"
    spark.sql("DROP TABLE IF EXISTS dml_cow")
    sqlfront.sql(spark, f"CREATE TABLE dml_cow AS {base}")
    duck.execute(f"CREATE OR REPLACE TABLE dml_cow AS {base}")
    stmts = [
        "UPDATE dml_cow SET v = lower(v) WHERE k % 3 = 0",
        "UPDATE dml_cow SET r = r + 10, v = v || '!' WHERE r >= 2",
        "DELETE FROM dml_cow WHERE k % 7 = 1",
        "UPDATE dml_cow SET v = 'all'",       # no WHERE: every row
    ]
    try:
        for s in stmts:
            sqlfront.sql(spark, s)
            duck.execute(s)
        got = sorted(tuple(r) for r in spark.table("dml_cow").collect())
        exp = sorted(duck.sql("SELECT * FROM dml_cow").fetchall())
        assert got == exp and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_cow")
        duck.execute("DROP TABLE IF EXISTS dml_cow")


def test_delete_without_where_empties_table(spark):
    spark.sql("DROP TABLE IF EXISTS dml_cow2")
    sqlfront.sql(spark, "CREATE TABLE dml_cow2 AS SELECT 1 AS x")
    try:
        sqlfront.sql(spark, "DELETE FROM dml_cow2")
        assert spark.table("dml_cow2").count() == 0
        # schema survives the empty rewrite
        assert spark.table("dml_cow2").columns == ["x"]
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_cow2")


def test_set_reset_passthrough(spark):
    """SET/RESET reach Spark verbatim — re-tokenized dotted keys with
    spaces are rejected by Spark's SET parser."""
    from quackspark.relation import Connection

    con = Connection(spark)
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        con.sql("SET spark.sql.shuffle.partitions = 16")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
        rows = con.sql("SET spark.sql.shuffle.partitions").fetchall()
        assert any("16" in str(r) for r in rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_table_macro(spark):
    """CREATE MACRO ... AS TABLE (reference TableMacroFunction,
    duckdb-internal.hpp:9930): FROM-position expansion as a subquery."""
    sqlfront.sql(spark, "CREATE MACRO tm_top(k) AS TABLE "
                        "SELECT n_name FROM nation ORDER BY n_nationkey LIMIT k")
    got = [r[0] for r in sqlfront.sql(spark, "SELECT * FROM tm_top(3)").collect()]
    assert got == ["NATION_0", "NATION_1", "NATION_2"]
    got2 = [r[0] for r in sqlfront.sql(
        spark, "SELECT t.n_name FROM tm_top(2) t ORDER BY 1").collect()]
    assert got2 == ["NATION_0", "NATION_1"]


def test_parquet_scan_and_glob(spark):
    c = sqlfront.sql(
        spark,
        "SELECT count(*) AS c FROM "
        "parquet_scan('/root/testdata/sf0.001/nation.parquet')",
    ).collect()[0][0]
    assert c == 25
    n = sqlfront.sql(
        spark,
        "SELECT count(*) AS c FROM glob('/root/testdata/sf0.001/*.parquet')",
    ).collect()[0][0]
    assert n >= 5
    empty = sqlfront.sql(
        spark, "SELECT count(*) AS c FROM glob('/nonexistent/*.xyz')"
    ).collect()[0][0]
    assert empty == 0


def test_read_text_blob_sniff(spark, tmp_path):
    """read_text/read_blob whole-file table functions (binaryFile source),
    sniff_csv dialect table function, parquet_schema introspection."""
    (tmp_path / "a.txt").write_text("hello world")
    (tmp_path / "b.csv").write_text("x;y\n1;2\n3;4\n")
    r = sqlfront.sql(
        spark,
        f"SELECT content, size FROM read_text('{tmp_path}/a.txt')",
    ).collect()
    assert r == [("hello world", 11)]
    blob = sqlfront.sql(
        spark, f"SELECT content FROM read_blob('{tmp_path}/a.txt')"
    ).collect()[0][0]
    assert bytes(blob) == b"hello world"
    sniff = sqlfront.sql(
        spark, f"SELECT * FROM sniff_csv('{tmp_path}/b.csv')"
    ).collect()[0]
    assert sniff[0] == ";" and sniff[2] is True
    sch = sqlfront.sql(
        spark,
        "SELECT name, type FROM "
        "parquet_schema('/root/testdata/sf0.001/nation.parquet')",
    ).collect()
    assert ("n_nationkey", "int32") == tuple(sch[0])
    assert sqlfront.sql(spark, "CHECKPOINT").collect()[0][0].startswith("checkpoint")


def test_split_statements_comment_aware():
    """A `;` inside a line or block comment is text, not a statement
    boundary (r11: oracle texts carry explanatory comments; the splitter
    used to cut mid-comment and die on unbalanced parentheses)."""
    from quackspark.sqlfront import _split_statements as s

    assert s("SELECT 1 -- note; not a split\nFROM t; SELECT 2") == [
        "SELECT 1 -- note; not a split\nFROM t",
        "SELECT 2",
    ]
    assert s("SELECT /* a;b */ 1; SELECT ';'") == [
        "SELECT /* a;b */ 1",
        "SELECT ';'",
    ]
    assert s("SELECT 1 -- trailing") == ["SELECT 1 -- trailing"]
    assert s("/* lead;in */ SELECT 1; SELECT 2 /* tail;bit */") == [
        "/* lead;in */ SELECT 1",
        "SELECT 2 /* tail;bit */",
    ]
