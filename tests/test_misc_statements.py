"""VACUUM / ANALYZE / TRUNCATE / USE statement forms (r12 surface
sweep): the vendored PG grammar parses all of them (VacuumStmt,
TruncateStmt, variable-set USE) and scripted DuckDB workloads emit them;
each behavior here is differentially pinned against live DuckDB in the
same test — result SHAPE included (empty 'Success' column for
VACUUM/ANALYZE/USE, one-row 'Count' for TRUNCATE)."""

from __future__ import annotations

import duckdb
import pytest

from quackspark import sqlfront


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _shape(df):
    return df.columns, [tuple(r) for r in df.collect()]


def test_vacuum_analyze_success_shape(spark, duck):
    sqlfront.sql(spark, "DROP TABLE IF EXISTS ms_t")
    for ex in (lambda q: sqlfront.sql(spark, q), duck.execute):
        ex("CREATE TABLE ms_t(i INT)")
        ex("INSERT INTO ms_t VALUES (1),(2)")
    for stmt in ("VACUUM", "ANALYZE", "VACUUM ANALYZE", "VACUUM ms_t",
                 "ANALYZE ms_t", "VACUUM ANALYZE ms_t"):
        cur = duck.execute(stmt)
        want = ([d[0] for d in cur.description], cur.fetchall())
        assert _shape(sqlfront.sql(spark, stmt)) == want, stmt
    sqlfront.sql(spark, "DROP TABLE ms_t")


def test_analyze_unknown_table_raises(spark, duck):
    with pytest.raises(Exception):
        duck.execute("ANALYZE ms_nosuch")
    with pytest.raises(Exception):
        sqlfront.sql(spark, "ANALYZE ms_nosuch")


def test_truncate_returns_deleted_count_and_empties(spark, duck):
    sqlfront.sql(spark, "DROP TABLE IF EXISTS ms_tr")
    for ex in (lambda q: sqlfront.sql(spark, q), duck.execute):
        ex("CREATE TABLE ms_tr(i INT)")
        ex("INSERT INTO ms_tr VALUES (1),(2),(3)")
    cur = duck.execute("TRUNCATE ms_tr")
    want = ([d[0] for d in cur.description], cur.fetchall())
    got = _shape(sqlfront.sql(spark, "TRUNCATE ms_tr"))
    assert got == want == (["Count"], [(3,)])
    assert sqlfront.sql(spark, "SELECT count(*) AS c FROM ms_tr").collect()[0][0] == 0
    assert duck.execute("SELECT count(*) FROM ms_tr").fetchall() == [(0,)]
    # TRUNCATE TABLE spelling; second truncate counts 0
    for ex in (lambda q: sqlfront.sql(spark, q), duck.execute):
        ex("TRUNCATE TABLE ms_tr")
    # table usable after truncate
    for ex in (lambda q: sqlfront.sql(spark, q), duck.execute):
        ex("INSERT INTO ms_tr VALUES (9)")
    assert sqlfront.sql(spark, "SELECT i FROM ms_tr").collect()[0][0] == 9
    sqlfront.sql(spark, "DROP TABLE ms_tr")


def test_use_main_is_success_noop(spark, duck):
    for stmt in ("USE main", "USE memory", "USE memory.main"):
        cur = duck.execute(stmt)
        want = ([d[0] for d in cur.description], cur.fetchall())
        assert _shape(sqlfront.sql(spark, stmt)) == want, stmt


def test_use_unknown_raises_loudly(spark, duck):
    with pytest.raises(Exception, match="(?i)catalog|schema"):
        duck.execute("USE ms_nosuch_db")
    with pytest.raises(Exception, match="(?i)catalog|schema|database"):
        sqlfront.sql(spark, "USE ms_nosuch_db")


# --- CALL + catalog table functions in FROM position (r12) ---------------


def test_call_range_matches_duckdb(spark, duck):
    cur = duck.execute("CALL range(3)")
    want = ([d[0] for d in cur.description], cur.fetchall())
    assert _shape(sqlfront.sql(spark, "CALL range(3)")) == want


def test_pragma_table_info_from_position(spark, duck):
    """Column names and ordinals must agree with DuckDB for a table
    created through both frontends (type SPELLINGS differ by engine —
    the reference prints INTEGER where Spark says int — so the
    differential is on name/cid, the join-stable columns)."""
    sqlfront.sql(spark, "DROP TABLE IF EXISTS ms_pti")
    for ex in (lambda q: sqlfront.sql(spark, q), duck.execute):
        ex("CREATE TABLE ms_pti(a INT, b VARCHAR, c DOUBLE)")
    q = "SELECT cid, name FROM pragma_table_info('ms_pti') ORDER BY cid"
    assert [tuple(r) for r in sqlfront.sql(spark, q).collect()] == duck.execute(
        q
    ).fetchall()
    # CALL spelling reaches the same helper
    got = sqlfront.sql(spark, "CALL pragma_table_info('ms_pti')")
    assert [r["name"] for r in got.collect()] == ["a", "b", "c"]
    sqlfront.sql(spark, "DROP TABLE ms_pti")


def test_duckdb_tables_from_position(spark, duck):
    sqlfront.sql(spark, "DROP TABLE IF EXISTS ms_cat")
    for ex in (lambda q: sqlfront.sql(spark, q), duck.execute):
        ex("CREATE TABLE ms_cat(x INT)")
    q = ("SELECT table_name FROM duckdb_tables() "
         "WHERE table_name = 'ms_cat'")
    assert [tuple(r) for r in sqlfront.sql(spark, q).collect()] == duck.execute(
        q
    ).fetchall() == [("ms_cat",)]
    sqlfront.sql(spark, "DROP TABLE ms_cat")


def test_catalog_tvf_name_inside_string_stays_text(spark):
    got = sqlfront.sql(
        spark, "SELECT 'duckdb_tables()' AS s, len('pragma_table_info(''x'')') AS l"
    ).collect()[0]
    assert got["s"] == "duckdb_tables()"
    assert got["l"] == len("pragma_table_info('x')")


def test_current_setting_duckdb_keys(spark, duck):
    """DuckDB setting names resolve through the session equivalents:
    threads is a number (the session's parallelism), TimeZone the
    session timezone string — the reference types threads as BIGINT
    (pinned live), so the inlined literal is unquoted."""
    row = sqlfront.sql(
        spark,
        "SELECT current_setting('threads') AS th, "
        "current_setting('TimeZone') AS tz",
    ).collect()[0]
    assert row["th"] == spark.sparkContext.defaultParallelism
    assert row["tz"] == spark.conf.get("spark.sql.session.timeZone")
    # duckdb's threads is numeric too
    (dth,) = duck.execute("SELECT current_setting('threads')").fetchone()
    assert isinstance(dth, int)


# --- r13: duckdb_settings / duckdb_types / test_vector_types ------------


def test_duckdb_settings_shape_and_live_values(spark, duck):
    q = "SELECT name, input_type, scope FROM duckdb_settings() ORDER BY name"
    got = sqlfront.sql(spark, q)
    assert [f.name for f in got.schema.fields] == ["name", "input_type", "scope"]
    names = {r["name"] for r in got.collect()}
    # the full reference registry is present
    exp_names = {r[0] for r in duck.execute(
        "SELECT name FROM duckdb_settings()").fetchall()}
    assert exp_names <= names
    # live-mapped values
    row = sqlfront.sql(
        spark,
        "SELECT value FROM duckdb_settings() WHERE name = 'threads'",
    ).collect()[0]
    assert row["value"] == str(spark.sparkContext.defaultParallelism)


def test_duckdb_settings_reflects_session_set(spark):
    sqlfront.sql(spark, "PRAGMA memory_limit='2GB'")
    row = sqlfront.sql(
        spark,
        "SELECT value FROM duckdb_settings() WHERE name = 'memory_limit'",
    ).collect()[0]
    assert row["value"] == "2GB"


def test_duckdb_types_surface(spark, duck):
    # same column set as the reference, one row per type name
    q = "SELECT type_name, logical_type, type_category FROM duckdb_types()"
    got = {tuple(r) for r in sqlfront.sql(spark, q).collect()}
    exp = {tuple(r) for r in duck.execute(
        "SELECT DISTINCT type_name, logical_type, type_category "
        "FROM duckdb_types() WHERE schema_name='main'").fetchall()}
    assert exp == got
    cols = [f.name for f in sqlfront.sql(
        spark, "SELECT * FROM duckdb_types() LIMIT 1").schema.fields]
    dcols = [d[0] for d in duck.sql("SELECT * FROM duckdb_types()").description]
    assert cols == dcols


def test_duckdb_types_lists_created_enum(spark):
    sqlfront.sql(spark, "DROP TYPE IF EXISTS ms_mood")
    sqlfront.sql(spark, "CREATE TYPE ms_mood AS ENUM ('sad', 'ok', 'happy')")
    rows = sqlfront.sql(
        spark,
        "SELECT type_name, logical_type, labels, internal "
        "FROM duckdb_types() WHERE type_name = 'ms_mood'",
    ).collect()
    assert len(rows) == 1
    assert rows[0]["logical_type"] == "ENUM"
    assert rows[0]["labels"] == ["sad", "ok", "happy"]
    assert rows[0]["internal"] is False


@pytest.mark.parametrize(
    "q",
    [
        "SELECT * FROM test_vector_types(NULL::INT)",
        "SELECT * FROM test_vector_types(NULL::BIGINT, NULL::VARCHAR)",
        "SELECT * FROM test_vector_types(1::SMALLINT, true::BOOLEAN)",
        "SELECT * FROM test_vector_types(NULL::DOUBLE, all_flat=true)",
    ],
)
def test_test_vector_types_matches_oracle(spark, duck, q):
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    exp = duck.sql(q).fetchall()
    assert got == exp


def test_test_vector_types_refuses_unrepresentable(spark):
    from quackspark.sqlfront import UnsupportedSQL

    with pytest.raises(UnsupportedSQL, match="test_vector_types"):
        sqlfront.sql(spark, "SELECT * FROM test_vector_types(NULL::DATE)")
