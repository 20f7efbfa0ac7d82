"""Star-modifier and COLUMNS() expression semantics, differential vs live
DuckDB (reference surface: StarExpression exclude_list/replace_list and the
COLUMNS star wrapper in the vendored PG grammar, duckdb-internal.hpp).

The r12 upgrade this pins:

- `* REPLACE (expr AS col)` keeps the replaced column at its ORIGINAL
  ordinal position when the block's FROM is a single resolvable table
  (DuckDB semantics; previously the replacement re-appeared at the end).
- Paren-less single-entry forms `* EXCLUDE c` / `* REPLACE e AS c`.
- Qualified stars `t.* EXCLUDE (...)` / `alias.* REPLACE (...)`.
- COLUMNS(...) replicates its ENCLOSING select-list item per matched
  column — `min(COLUMNS('[ab]'))` → `min(a) AS a, min(b) AS b` — with
  lockstep replication for multiple COLUMNS in one expression, and the
  `COLUMNS(*)` / `COLUMNS(* EXCLUDE (...))` matcher forms.
"""

from __future__ import annotations

import duckdb
import pytest

from quackspark.relation import Connection
from quackspark.session import register_testdata_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a int, b int, c int)")
    con.execute("INSERT INTO t VALUES (1,2,3),(4,5,6)")
    con.execute(f"CREATE VIEW nation AS FROM '{SF}/nation.parquet'")
    con.execute(f"CREATE VIEW region AS FROM '{SF}/region.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def con(spark):
    register_testdata_views(spark, SF)
    spark.createDataFrame(
        [(1, 2, 3), (4, 5, 6)], "a int, b int, c int"
    ).createOrReplaceTempView("t")
    return Connection(spark)


BOTH = [
    # position-preserving REPLACE
    "SELECT * REPLACE (a+10 AS b) FROM t ORDER BY a",
    "SELECT * REPLACE (a+10 AS b, c*2 AS a) FROM t ORDER BY b",
    # paren-less single-entry modifiers
    "SELECT * REPLACE a+10 AS b FROM t ORDER BY a",
    "SELECT * EXCLUDE b FROM t ORDER BY a",
    "SELECT * EXCLUDE (b, c) FROM t ORDER BY a",
    # qualified stars, including through an alias
    "SELECT t.* EXCLUDE (b) FROM t ORDER BY a",
    "SELECT t.* REPLACE (a+10 AS b) FROM t ORDER BY a",
    "SELECT x.* REPLACE (a+10 AS b) FROM t x ORDER BY a",
    # COLUMNS replicates the enclosing item, named after the column
    "SELECT min(COLUMNS('[ab]')) FROM t",
    "SELECT min(COLUMNS(*)) FROM t",
    "SELECT COLUMNS('[ab]') + 1 FROM t ORDER BY a",
    "SELECT sum(COLUMNS('[ab]')) + 1 FROM t",
    # lockstep multi-COLUMNS, explicit alias duplicated per replica
    "SELECT COLUMNS('[ab]') + COLUMNS('[ab]') FROM t ORDER BY a",
    "SELECT min(COLUMNS('[ab]')) AS m FROM t",
    # matcher forms
    "SELECT COLUMNS(* EXCLUDE (b)) FROM t ORDER BY a",
    "SELECT a, min(COLUMNS('[bc]')) FROM t GROUP BY a ORDER BY a",
    # over testdata, nested one level down
    "SELECT * REPLACE (upper(n_name) AS n_name) FROM nation "
    "ORDER BY n_nationkey LIMIT 2",
    "SELECT n_regionkey, count(*) AS c FROM "
    "(SELECT * REPLACE (n_regionkey % 2 AS n_regionkey) FROM nation) "
    "GROUP BY 1 ORDER BY 1",
    "SELECT min(COLUMNS('n_n.*')) FROM nation",
]


@pytest.mark.parametrize("q", BOTH)
def test_star_columns_matches_duckdb(con, duck, q):
    cur = duck.execute(q)
    want_cols = [d[0].lower() for d in cur.description]
    want = cur.fetchall()
    df = con.sql(q).df
    assert [c.lower() for c in df.columns] == want_cols
    assert [tuple(r) for r in df.collect()] == want


def test_replace_falls_back_on_join_from(con, duck):
    # star over a join: source not statically resolvable — the fallback
    # keeps the column SET identical (ordinal may differ), values match
    q = (
        "SELECT * REPLACE (0 AS n_regionkey) FROM nation n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE n.n_nationkey = 3"
    )
    want = duck.execute(q).fetchdf()
    got = con.sql(q).df.toPandas()
    assert sorted(c.lower() for c in got.columns) == sorted(
        c.lower() for c in want.columns
    )
    assert got["n_regionkey"].tolist() == want["n_regionkey"].tolist()


def test_columns_in_where_is_honest_refusal(con):
    from quackspark.sqlfront import UnsupportedSQL

    with pytest.raises(UnsupportedSQL):
        con.sql("SELECT a FROM t WHERE COLUMNS('[ab]') > 0")


def test_columns_no_match_raises(con):
    from quackspark.sqlfront import UnsupportedSQL

    with pytest.raises(UnsupportedSQL):
        con.sql("SELECT COLUMNS('zz.*') FROM t")
