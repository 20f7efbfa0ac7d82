"""Catalog introspection (duckdb_tables-family, duckdb-6.cpp:14150-14176)
and Arrow in/out (duckdb-6.cpp:7612-7615) coverage.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from quackspark import catalog as C

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    from quackspark.session import register_testdata_views

    register_testdata_views(spark, SF)


def test_duckdb_tables_lists_views(spark):
    names = {r["table_name"] for r in C.duckdb_tables(spark).collect()}
    for t in ["nation", "region", "lineitem", "documents", "embeddings"]:
        assert t in names


def test_duckdb_columns(spark):
    cols = C.duckdb_columns(spark, "nation").orderBy("column_index").collect()
    assert [c["column_name"] for c in cols] == [
        "n_nationkey",
        "n_name",
        "n_regionkey",
    ]
    assert cols[0]["data_type"] == "int"


def test_duckdb_constraints_view(spark):
    """r6: duckdb_constraints() lists the enforced-constraint registries."""
    from quackspark.sqlfront import sql

    sql(spark, "DROP TABLE IF EXISTS cat_c1")
    sql(spark, "DROP TABLE IF EXISTS cat_c2")
    sql(spark, "CREATE TABLE cat_c1 (id INTEGER PRIMARY KEY, "
               "v VARCHAR NOT NULL, n INTEGER CHECK (n > 0))")
    sql(spark, "CREATE TABLE cat_c2 (cid INTEGER, "
               "pid INTEGER REFERENCES cat_c1(id))")
    rows = {
        (r["table_name"], r["constraint_type"], r["constraint_text"])
        for r in C.duckdb_constraints(spark).collect()
    }
    assert ("cat_c1", "PRIMARY KEY", "id") in rows
    assert ("cat_c1", "NOT NULL", "v") in rows
    assert ("cat_c1", "NOT NULL", "id") in rows  # PK implies NOT NULL
    assert any(t == "cat_c1" and k == "CHECK" for t, k, _ in rows)
    assert ("cat_c2", "FOREIGN KEY", "pid -> cat_c1(id)") in rows
    sql(spark, "DROP TABLE cat_c2")
    sql(spark, "DROP TABLE cat_c1")


def test_duckdb_sequences_view(spark):
    """r6: duckdb_sequences() mirrors the reference's catalog function."""
    from quackspark.sqlfront import sql

    sql(spark, "DROP SEQUENCE IF EXISTS cat_seq")
    sql(spark, "CREATE SEQUENCE cat_seq START 5 INCREMENT 2 "
               "MINVALUE 1 MAXVALUE 99 CYCLE")
    rows = {r["sequence_name"]: r for r in C.duckdb_sequences(spark).collect()}
    r = rows["cat_seq"]
    assert (r["start_value"], r["min_value"], r["max_value"]) == (5, 1, 99)
    assert (r["increment_by"], r["cycle"], r["last_value"]) == (2, True, None)
    sql(spark, "SELECT nextval('cat_seq') AS i FROM nation "
               "WHERE n_nationkey < 3").collect()
    rows = {r["sequence_name"]: r for r in C.duckdb_sequences(spark).collect()}
    assert rows["cat_seq"]["last_value"] == 9  # 5, 7, 9
    sql(spark, "DROP SEQUENCE cat_seq")


def test_duckdb_functions_nonempty(spark):
    fns = {r["function_name"] for r in C.duckdb_functions(spark).collect()}
    assert {"sum", "transform", "percentile_approx"} <= fns


def test_arrow_out_roundtrip(spark):
    df = spark.table("nation").orderBy("n_nationkey")
    tbl = df.toArrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 25
    back = spark.createDataFrame(tbl.to_pandas())
    assert back.count() == 25
    assert [tuple(r) for r in back.orderBy("n_nationkey").collect()] == [
        tuple(r) for r in df.collect()
    ]


def test_pragma_table_info_and_summarize_statements(spark):
    """PRAGMA table_info / SUMMARIZE route through the statement frontend."""
    from quackspark import sqlfront

    info = sqlfront.sql(spark, "PRAGMA table_info('nation')").collect()
    assert [r["name"] for r in info] == ["n_nationkey", "n_name", "n_regionkey"]
    assert info[0]["cid"] == 0

    prof = sqlfront.sql(spark, "SUMMARIZE nation").collect()
    by_col = {r["column_name"]: r for r in prof}
    assert set(by_col) == {"n_nationkey", "n_name", "n_regionkey"}
    r = by_col["n_nationkey"]
    assert (r["min"], r["max"], r["count"], r["null_count"]) == ("0", "24", 25, 0)
    assert by_col["n_regionkey"]["column_type"] == "int"

    prof2 = sqlfront.sql(
        spark, "SUMMARIZE SELECT n_regionkey FROM nation WHERE n_nationkey < 10"
    ).collect()
    assert prof2[0]["count"] == 10


def test_summarize_exact_distinct(spark):
    from quackspark.catalog import summarize
    from quackspark.queries._util import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    prof = {
        r["column_name"]: r
        for r in summarize(li.select("l_returnflag", "l_orderkey"), exact_distinct=True).collect()
    }
    assert prof["l_returnflag"]["approx_unique"] == 3
