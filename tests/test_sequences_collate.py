"""Sequences (CREATE SEQUENCE / nextval / currval) and collations
(COLLATE NOCASE/NOACCENT/NFC) — differential vs DuckDB running the
identical statements (reference: sequences duckdb-6.cpp:2012; collation
binder surface)."""

from __future__ import annotations

import duckdb
import pytest

from quackspark import sqlfront
from quackspark.relation import Connection
from quackspark.session import register_testdata_views
from quackspark.sqlfront import UnsupportedSQL

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con(spark):
    register_testdata_views(spark, SF)
    return Connection(spark)


@pytest.fixture()
def duck():
    d = duckdb.connect()
    for t in ("customer", "nation"):
        d.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF}/{t}.parquet')"
        )
    yield d
    d.close()


def _rows(rel):
    return [tuple(r) for r in rel.df.collect()]


class TestSequences:
    def test_nextval_parity_and_resume(self, con, duck):
        sqlfront._SEQUENCES.pop("t_seq", None)
        for c in (con, duck):
            c.sql("CREATE SEQUENCE t_seq START 100 INCREMENT 3")
        q = (
            "SELECT nextval('t_seq') AS id, c_custkey FROM customer"
            " WHERE c_custkey <= 10 ORDER BY c_custkey"
        )
        assert _rows(con.sql(q)) == duck.sql(q).fetchall()
        # currval reflects the last assigned value
        cv = "SELECT currval('t_seq') AS c"
        assert _rows(con.sql(cv)) == duck.sql(cv).fetchall()
        # a second statement resumes from the advanced cursor
        assert _rows(con.sql(q)) == duck.sql(q).fetchall()

    def test_negative_increment(self, con, duck):
        sqlfront._SEQUENCES.pop("n_seq", None)
        for c in (con, duck):
            c.sql("CREATE SEQUENCE n_seq START 50 INCREMENT -2 MAXVALUE 100")
        q = (
            "SELECT nextval('n_seq') AS id, n_nationkey FROM nation"
            " WHERE n_nationkey < 5 ORDER BY n_nationkey"
        )
        assert _rows(con.sql(q)) == duck.sql(q).fetchall()

    def test_unknown_sequence_raises(self, con):
        with pytest.raises(UnsupportedSQL):
            con.sql("SELECT nextval('nope_seq') AS id FROM nation")

    def test_currval_before_nextval_raises(self, con):
        con.sql("CREATE SEQUENCE fresh_seq")
        with pytest.raises(UnsupportedSQL):
            con.sql("SELECT currval('fresh_seq') AS c")

    def test_drop_sequence(self, con):
        con.sql("CREATE SEQUENCE gone_seq")
        con.sql("DROP SEQUENCE gone_seq")
        with pytest.raises(UnsupportedSQL):
            con.sql("SELECT nextval('gone_seq') AS id FROM nation")


class TestCollate:
    @pytest.mark.parametrize(
        "q",
        [
            # predicate, collation on the left
            "SELECT c_custkey FROM customer WHERE c_mktsegment COLLATE NOCASE"
            " = 'automobile' AND c_custkey <= 50 ORDER BY c_custkey",
            # collation on the right operand
            "SELECT count(*) AS n FROM customer"
            " WHERE 'bUiLdInG' = c_mktsegment COLLATE NOCASE",
            # sort key
            "SELECT c_name FROM customer WHERE c_custkey <= 20"
            " ORDER BY c_name COLLATE NOCASE DESC, c_custkey LIMIT 5",
            # accent folding + parenthesized operand
            "SELECT ('CAFÉ-' || n_name) COLLATE NOACCENT = ('CAFE-' || n_name)"
            " AS x, n_nationkey FROM nation ORDER BY n_nationkey",
            # chained collation
            "SELECT n_nationkey FROM nation"
            " WHERE n_name COLLATE NOCASE.NOACCENT = lower(n_name)"
            " ORDER BY n_nationkey",
        ],
    )
    def test_collate_parity(self, con, duck, q):
        assert _rows(con.sql(q)) == duck.sql(q).fetchall()

    def test_unknown_collation_raises(self, con):
        with pytest.raises(UnsupportedSQL):
            con.sql("SELECT 'a' COLLATE KLINGON = 'A' AS x")
