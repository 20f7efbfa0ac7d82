"""DESCRIBE / SHOW statement forms (r10 verdict missing #1): the plain
DuckDB statement spellings — `DESCRIBE t`, `SHOW t`, `SHOW TABLES`,
`SHOW ALL TABLES`, `DESCRIBE SELECT …`, bare `DESCRIBE` — dispatched
onto the existing catalog helpers, differentially tested against live
DuckDB output (rows AND column schema). The vendored PG grammar parses
DESCRIBE/SHOW into the same table functions the PRAGMA spellings reach
(duckdb-libpg_query.cpp); catalog.describe_relation reads null/key/
default from the ddl.py enforcement registries so frontend-created
tables describe like the reference's."""

from __future__ import annotations

import duckdb
import pytest

from quackspark import sqlfront
from quackspark.session import register_testdata_views

SF = "/root/testdata/sf0.001"

DESC_COLS = ["column_name", "column_type", "null", "key", "default", "extra"]


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _spark_rows(df):
    return [tuple(r) for r in df.collect()]


def _duck_rows(con, q):
    cur = con.execute(q)
    return [d[0] for d in cur.description], cur.fetchall()


def test_describe_table_matches_duckdb_constraints(spark, duck):
    ddl = (
        "CREATE TABLE desc_t (a INTEGER PRIMARY KEY, b VARCHAR NOT NULL, "
        "c DOUBLE DEFAULT 1.5, d INTEGER UNIQUE, e VARCHAR DEFAULT 'x')"
    )
    sqlfront.sql(spark, "DROP TABLE IF EXISTS desc_t")
    sqlfront.sql(spark, ddl)
    duck.execute(ddl)
    cols, want = _duck_rows(duck, "DESCRIBE desc_t")
    got_df = sqlfront.sql(spark, "DESCRIBE desc_t")
    assert got_df.columns == cols == DESC_COLS
    assert _spark_rows(got_df) == want
    # SHOW t is the same table function
    assert _spark_rows(sqlfront.sql(spark, "SHOW desc_t")) == want
    sqlfront.sql(spark, "DROP TABLE desc_t")


def test_describe_view_over_parquet(spark, duck):
    register_testdata_views(spark, SF)
    duck.execute(
        f"CREATE VIEW documents AS FROM '{SF}/documents.parquet'"
    )
    cols, want = _duck_rows(duck, "DESCRIBE documents")
    got = sqlfront.sql(spark, "DESCRIBE documents")
    assert got.columns == cols
    assert _spark_rows(got) == want


def test_describe_select_matches_duckdb(spark, duck):
    register_testdata_views(spark, SF)
    duck.execute(
        f"CREATE VIEW documents AS FROM '{SF}/documents.parquet'"
    )
    q = "SELECT doc_id, upper(lang) AS lang_u, n_chars * 2 AS twice FROM documents"
    cols, want = _duck_rows(duck, f"DESCRIBE {q}")
    got = sqlfront.sql(spark, f"DESCRIBE {q}")
    assert got.columns == cols
    assert _spark_rows(got) == want


def test_show_tables_lists_frontend_tables(spark):
    sqlfront.sql(spark, "DROP TABLE IF EXISTS show_probe_t")
    sqlfront.sql(spark, "CREATE TABLE show_probe_t (a INTEGER)")
    df = sqlfront.sql(spark, "SHOW TABLES")
    assert df.columns == ["name"]
    names = [r["name"] for r in df.collect()]
    assert "show_probe_t" in names
    assert names == sorted(names)
    # engine-internal derived twins never surface
    assert not any(n.startswith("qs_drv_") for n in names)
    sqlfront.sql(spark, "DROP TABLE show_probe_t")


def test_show_all_tables_and_bare_describe(spark):
    sqlfront.sql(spark, "DROP TABLE IF EXISTS show_all_probe")
    sqlfront.sql(spark, "CREATE TABLE show_all_probe (a INTEGER, b VARCHAR)")
    df = sqlfront.sql(spark, "SHOW ALL TABLES")
    assert df.columns == [
        "database", "schema", "name", "column_names", "column_types",
        "temporary",
    ]
    row = next(r for r in df.collect() if r["name"] == "show_all_probe")
    assert row["column_names"] == ["a", "b"]
    assert row["column_types"] == ["INTEGER", "VARCHAR"]
    # bare DESCRIBE is the same listing (the reference quirk)
    bare = sqlfront.sql(spark, "DESCRIBE")
    assert bare.columns == df.columns
    assert not any(
        r["name"].startswith("qs_drv_") for r in bare.collect()
    )
    sqlfront.sql(spark, "DROP TABLE show_all_probe")


def test_describe_type_rendering_nested(spark):
    """Array/struct/map/decimal spellings match DuckDB's ToString."""
    from quackspark.catalog import duck_type_name
    from pyspark.sql import types as T

    assert duck_type_name(T.ArrayType(T.FloatType())) == "FLOAT[]"
    assert (
        duck_type_name(T.MapType(T.StringType(), T.IntegerType()))
        == "MAP(VARCHAR, INTEGER)"
    )
    assert (
        duck_type_name(
            T.StructType(
                [
                    T.StructField("a", T.LongType()),
                    T.StructField("b", T.StringType()),
                ]
            )
        )
        == "STRUCT(a BIGINT, b VARCHAR)"
    )
    assert duck_type_name(T.DecimalType(12, 3)) == "DECIMAL(12,3)"


def test_describe_after_alter_add_column(spark, duck):
    ddl = "CREATE TABLE desc_alter (id INTEGER PRIMARY KEY, v VARCHAR)"
    alter = "ALTER TABLE desc_alter ADD COLUMN c1 VARCHAR DEFAULT 'd1'"
    sqlfront.sql(spark, "DROP TABLE IF EXISTS desc_alter")
    for stmt in (ddl, alter):
        sqlfront.sql(spark, stmt)
        duck.execute(stmt)
    _, want = _duck_rows(duck, "DESCRIBE desc_alter")
    assert _spark_rows(sqlfront.sql(spark, "DESCRIBE desc_alter")) == want
    sqlfront.sql(spark, "DROP TABLE desc_alter")
