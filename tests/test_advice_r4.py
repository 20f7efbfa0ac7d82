"""Round-4 pinned regressions for the advisor findings (ADVICE.md r3):

1. mad() rewrite must keep NULL-valued group keys (null-safe join).
2. epoch_ms(non-evident-type expr) must refuse, not silently mistranslate.
3. Order-insensitive aggregate ORDER BY strip must handle multi-key
   modifiers (sum(x ORDER BY k1, k2)).
4. INSERT OR REPLACE with duplicate conflict keys inside one batch keeps
   a single (last) row per key, matching DuckDB.
5. Plain CREATE VIEW over an existing name errors (no silent replace).

Each is differential vs DuckDB where the statement is DuckDB-runnable.
"""

from __future__ import annotations

import duckdb
import pytest

from quackspark.oracle import _norm_cell
from quackspark.session import register_testdata_views
from quackspark.sqlfront import UnsupportedSQL, sql, transpile

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def both(spark):
    register_testdata_views(spark, SF)
    con = duckdb.connect()
    yield spark, con
    con.close()


def _cmp(spark, con, stmt, order_insensitive=False):
    sn = [tuple(_norm_cell(c) for c in r) for r in sql(spark, stmt).collect()]
    dn = [tuple(_norm_cell(c) for c in r) for r in con.sql(stmt).fetchall()]
    if order_insensitive:
        sn, dn = sorted(sn, key=repr), sorted(dn, key=repr)
    assert sn == dn, f"{stmt}\n spark={sn}\n duck ={dn}"


def test_mad_null_group_key(both):
    spark, con = both
    setup = (
        "CREATE OR REPLACE TEMPORARY VIEW adv_mad AS "
        "SELECT * FROM (VALUES ('a', 1.0), ('a', 3.0), ('a', 10.0), "
        "(NULL, 2.0), (NULL, 8.0), ('b', 5.0)) AS t(g, x)"
    )
    sql(spark, setup)
    con.sql(
        "CREATE OR REPLACE VIEW adv_mad AS "
        "SELECT * FROM (VALUES ('a', 1.0), ('a', 3.0), ('a', 10.0), "
        "(NULL, 2.0), (NULL, 8.0), ('b', 5.0)) AS t(g, x)"
    )
    # the NULL-key group must survive the median join (3 rows, not 2)
    _cmp(spark, con,
         "SELECT g, mad(CAST(x AS DOUBLE)) AS m FROM adv_mad "
         "GROUP BY g ORDER BY g NULLS FIRST")


def test_epoch_ms_ambiguous_refuses(both):
    spark, _ = both
    with pytest.raises(UnsupportedSQL):
        transpile("SELECT epoch_ms(o_orderkey) FROM orders", spark)
    # evident-type forms still translate
    assert "timestamp_millis" in transpile("SELECT epoch_ms(1704067200000)", spark)
    assert "unix_millis" in transpile(
        "SELECT epoch_ms(TIMESTAMP '2024-01-01')", spark)
    assert "unix_millis" in transpile(
        "SELECT epoch_ms(CAST(o_orderdate AS TIMESTAMP)) FROM orders", spark)


def test_multikey_order_by_strip(both):
    spark, con = both
    stmt = (
        "SELECT o_orderstatus, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) "
        "ORDER BY o_orderdate, o_orderkey DESC) AS DOUBLE) AS s, "
        "count(o_orderkey ORDER BY o_orderdate, o_orderkey) AS n "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    con.sql(
        f"CREATE OR REPLACE VIEW orders AS "
        f"SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    _cmp(spark, con, stmt)


def test_insert_or_replace_dupe_batch(both):
    spark, con = both
    script = [
        "CREATE TABLE adv_rep (k INTEGER PRIMARY KEY, v VARCHAR)",
        "INSERT INTO adv_rep VALUES (1, 'old1'), (2, 'old2')",
    ]
    for s in script:
        sql(spark, s)
        con.sql(s)
    # duplicate conflict key 1 within ONE batch: DuckDB refuses ("can not
    # update the same row twice in the same command") — so do we, instead
    # of silently appending duplicate-key rows
    dup = "INSERT OR REPLACE INTO adv_rep VALUES (1, 'a'), (1, 'b'), (3, 'c')"
    with pytest.raises(Exception, match="same row twice"):
        con.sql(dup)
    with pytest.raises(Exception, match="same row twice"):
        sql(spark, dup)
    # table unchanged on both; non-duplicated batch still replaces
    ok = "INSERT OR REPLACE INTO adv_rep VALUES (1, 'new1'), (3, 'new3')"
    sql(spark, ok)
    con.sql(ok)
    _cmp(spark, con, "SELECT k, v FROM adv_rep ORDER BY k")
    sql(spark, "DROP TABLE adv_rep")
    con.sql("DROP TABLE adv_rep")


def test_plain_create_view_exists_errors(both):
    spark, con = both
    sql(spark, "CREATE OR REPLACE TEMPORARY VIEW adv_v AS SELECT 1 AS x")
    with pytest.raises(Exception, match="already exists"):
        sql(spark, "CREATE VIEW adv_v AS SELECT 2 AS x")
    # IF NOT EXISTS and OR REPLACE still behave
    sql(spark, "CREATE VIEW IF NOT EXISTS adv_v AS SELECT 3 AS x")
    assert sql(spark, "SELECT x FROM adv_v").collect()[0][0] == 1
    sql(spark, "CREATE OR REPLACE VIEW adv_v AS SELECT 4 AS x")
    assert sql(spark, "SELECT x FROM adv_v").collect()[0][0] == 4
