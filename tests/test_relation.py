"""Relation API differential tests: the same relational-algebra pipeline
built through our Relation mirror and through DuckDB's own relational API
(the reference entry point C, duckdb-7.cpp:3468-3561) must agree.
"""

from __future__ import annotations

import duckdb
import pytest

from quackspark.relation import Connection

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con(spark):
    from quackspark.session import register_testdata_views

    register_testdata_views(spark, SF)
    return Connection(spark)


@pytest.fixture(scope="module")
def duck():
    d = duckdb.connect()
    for t in ["nation", "region", "customer", "orders", "supplier"]:
        d.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return d


def test_project_filter_order(con, duck):
    got = (
        con.table("nation")
        .filter("n_regionkey = 2")
        .project("n_nationkey", "upper(n_name) AS nm")
        .order("n_nationkey")
        .fetchall()
    )
    exp = (
        duck.table("nation")
        .filter("n_regionkey = 2")
        .project("n_nationkey, upper(n_name) AS nm")
        .order("n_nationkey")
        .fetchall()
    )
    assert got == exp


def test_join_aggregate(con, duck):
    got = (
        con.table("nation")
        .set_alias("n")
        .join(con.table("region").set_alias("r"), "n.n_regionkey = r.r_regionkey")
        .aggregate(["count(*) AS cnt"], ["r_name"])
        .order("r_name")
        .fetchall()
    )
    exp = duck.sql(
        "SELECT r_name, count(*) AS cnt FROM nation n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r_name ORDER BY r_name"
    ).fetchall()
    assert [(r[0], r[1]) for r in got] == [(r[0], r[1]) for r in exp]


def test_setops_distinct_limit(con, duck):
    a = con.table("nation").project("n_regionkey")
    b = con.table("region").project("r_regionkey")
    got = sorted(a.intersect(b).fetchall())
    exp = sorted(
        duck.sql(
            "SELECT n_regionkey FROM nation INTERSECT SELECT r_regionkey FROM region"
        ).fetchall()
    )
    assert got == exp
    assert a.distinct().count() == 5
    assert a.limit(3, offset=2).count() == 3


def test_union_except(con, duck):
    a = con.table("nation").project("n_regionkey AS k")
    b = con.values([(0,), (1,), (99,)], "k int")
    assert a.union(b).count() == 28
    assert sorted(b.except_(a.distinct()).fetchall()) == [(99,)]


def test_values_from_query_range(con):
    v = con.values([(1, "a"), (2, "b")], "k int, s string")
    assert v.fetchall() == [(1, "a"), (2, "b")]
    q = con.from_query("SELECT 40 + 2 AS answer")
    assert q.fetchall() == [(42,)]
    r = con.table_function("range", 0, 10, 3)
    assert r.count() == 4


def test_read_parquet_pipeline(con, duck):
    got = (
        con.read_parquet(f"{SF}/orders.parquet")
        .filter("o_totalprice > 300000")
        .aggregate(["count(*) AS n"])
        .fetchall()
    )
    exp = duck.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet' WHERE o_totalprice > 300000"
    ).fetchall()
    assert got[0][0] == exp[0][0]


def test_prepare_and_explain_statement(spark):
    """Connection.prepare (entry point B) + EXPLAIN statement parity."""
    from quackspark import sqlfront
    from quackspark.relation import Connection

    con = Connection(spark)
    stmt = con.prepare(
        "SELECT n_regionkey, count(*) AS n FROM nation "
        "WHERE n_nationkey < ? GROUP BY ALL ORDER BY ALL"
    )
    r1 = stmt.execute(10).fetchall()
    r2 = stmt.execute(25).fetchall()
    assert sum(n for _, n in r1) == 10 and sum(n for _, n in r2) == 25

    plan = sqlfront.sql(spark, "EXPLAIN SELECT 1 AS x").collect()
    assert any("Physical Plan" in r["explain_output"] for r in plan)


def test_glob_and_repeat_table_functions(spark):
    from quackspark.relation import Connection

    con = Connection(spark)
    files = con.table_function("glob", "/root/testdata/sf0.001/*.parquet").fetchall()
    names = {f[0].rsplit("/", 1)[-1] for f in files}
    assert "lineitem.parquet" in names and len(names) >= 8

    reps = con.table_function("repeat", "x", 5).fetchall()
    assert reps == [("x",)] * 5
