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
