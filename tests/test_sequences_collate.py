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

    def test_cycle_wraps_like_duckdb(self, con, duck):
        """r6: MAXVALUE + CYCLE — the modular walk over [min, max] must
        match DuckDB's wrap exactly, within one vectorized statement AND
        across statements."""
        sqlfront._SEQUENCES.pop("cy_seq", None)
        ddl = "CREATE SEQUENCE cy_seq START 8 MINVALUE 1 MAXVALUE 10 CYCLE"
        for c in (con, duck):
            c.sql(ddl)
        q = (
            "SELECT nextval('cy_seq') AS id, n_nationkey FROM nation"
            " WHERE n_nationkey < 7 ORDER BY n_nationkey"
        )
        assert _rows(con.sql(q)) == duck.sql(q).fetchall()  # 8,9,10,1,2,3,4
        assert _rows(con.sql(q)) == duck.sql(q).fetchall()  # resumes mid-cycle
        con.sql("DROP SEQUENCE cy_seq")

    def test_descending_cycle(self, con, duck):
        sqlfront._SEQUENCES.pop("dcy_seq", None)
        ddl = (
            "CREATE SEQUENCE dcy_seq START 3 INCREMENT -2"
            " MINVALUE 1 MAXVALUE 9 CYCLE"
        )
        for c in (con, duck):
            c.sql(ddl)
        q = (
            "SELECT nextval('dcy_seq') AS id, n_nationkey FROM nation"
            " WHERE n_nationkey < 6 ORDER BY n_nationkey"
        )
        assert _rows(con.sql(q)) == duck.sql(q).fetchall()
        con.sql("DROP SEQUENCE dcy_seq")

    def test_exhaustion_no_cycle_raises(self, con):
        """NO CYCLE walks past MAXVALUE → the statement fails atomically
        (reference exhaustion errors duckdb-6.cpp:1919-1923)."""
        sqlfront._SEQUENCES.pop("ex_seq", None)
        con.sql("CREATE SEQUENCE ex_seq START 1 MAXVALUE 5")
        ok = "SELECT nextval('ex_seq') AS id FROM nation WHERE n_nationkey < 5"
        assert len(_rows(con.sql(ok))) == 5  # exactly consumes 1..5
        with pytest.raises(sqlfront.SequenceExhausted, match="maximum"):
            con.sql("SELECT nextval('ex_seq') AS id FROM nation")
        con.sql("DROP SEQUENCE ex_seq")

    def test_descending_defaults_and_minimum_exhaustion(self, con, duck):
        """INCREMENT -1 with MINVALUE: starts at MAXVALUE by default
        (DuckDB descending defaults) and exhausts at the minimum."""
        sqlfront._SEQUENCES.pop("dn_seq", None)
        ddl = "CREATE SEQUENCE dn_seq INCREMENT -1 MINVALUE -3 MAXVALUE 3"
        for c in (con, duck):
            c.sql(ddl)
        q = (
            "SELECT nextval('dn_seq') AS id, n_nationkey FROM nation"
            " WHERE n_nationkey < 7 ORDER BY n_nationkey"
        )
        assert _rows(con.sql(q)) == duck.sql(q).fetchall()  # 3..-3
        with pytest.raises(sqlfront.SequenceExhausted, match="minimum"):
            con.sql("SELECT nextval('dn_seq') AS id FROM nation")
        con.sql("DROP SEQUENCE dn_seq")

    def test_start_outside_bounds_rejected(self, con):
        with pytest.raises(UnsupportedSQL, match="outside"):
            con.sql("CREATE SEQUENCE bad_seq START 11 MAXVALUE 10")

    def test_cross_session_block_claim(self, con, spark):
        """r6: the cursor is a warehouse-shared file with atomic block
        claims. Another session advancing the shared cursor between this
        session's transpile and execution must push our ids past its
        block (the re-emit path), never overlap them."""
        import json
        import os

        sqlfront._SEQUENCES.pop("sh_seq", None)
        con.sql("CREATE SEQUENCE sh_seq START 10 INCREMENT 2")
        path = sqlfront._seq_file(spark, "sh_seq")
        assert path and os.path.exists(path)
        q = (
            "SELECT nextval('sh_seq') AS id, n_nationkey FROM nation"
            " WHERE n_nationkey < 4 ORDER BY n_nationkey"
        )
        ids1 = [r["id"] for r in con.sql(q).df.collect()]
        assert ids1 == [10, 12, 14, 16]
        # simulate a concurrent session claiming a 100-id block
        with open(path) as fh:
            state = json.load(fh)
        assert state["next"] == 18  # our claim landed on the shared file
        state["next"] += 100
        sqlfront._seq_write(path, state)
        ids2 = [r["id"] for r in con.sql(q).df.collect()]
        assert ids2 == [118, 120, 122, 124]  # resumed past the foreign block
        con.sql("DROP SEQUENCE sh_seq")

    def test_claim_blocks_are_disjoint_under_threads(self, con, spark):
        """The claim primitive itself: 8 threads × 20 claims of 5 ids —
        every block disjoint, file tip = total ids claimed."""
        import json
        import threading

        sqlfront._SEQUENCES.pop("race_seq", None)
        # MINVALUE 0 because START below MINVALUE is a binder error
        # (matches DuckDB: "START value (0) cannot be less than MINVALUE")
        con.sql("CREATE SEQUENCE race_seq START 0 MINVALUE 0 INCREMENT 1")
        path = sqlfront._seq_file(spark, "race_seq")
        blocks: list[tuple[int, int]] = []
        lock = threading.Lock()

        def worker():
            # each thread is a simulated session: a PRIVATE registry whose
            # cursor goes stale the moment any other thread claims — the
            # file protocol must still hand out disjoint blocks
            mem = {"race_seq": dict(sqlfront._SEQUENCES["race_seq"])}
            for _ in range(20):
                sqlfront._claim_sequence_blocks(
                    spark, ["race_seq"], 5, registry=mem
                )
                s = mem["race_seq"]
                with lock:
                    blocks.append((s["next"], s["next"] + 5))
                s["next"] += 5  # session-local advance, as sql() does

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(blocks) == 160
        starts = sorted(b[0] for b in blocks)
        assert starts == sorted(set(starts))  # no duplicate block starts
        assert sorted(set(starts)) == list(range(0, 800, 5))  # dense, disjoint
        with open(path) as fh:
            assert json.load(fh)["next"] == 800
        con.sql("DROP SEQUENCE race_seq")


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
