"""DDL layer differential tests (quackspark/ddl.py).

Each scenario runs the identical statement script on Spark (through the
SQL frontend) and on DuckDB, then compares every checkpoint SELECT —
the reference's own DDL test strategy (CREATE/ALTER/DROP statement
enums duckdb.hpp:11960-11990) applied as engine-vs-engine equivalence.
"""

from __future__ import annotations

import duckdb
import pytest

from quackspark.oracle import _norm_cell
from quackspark.session import register_testdata_views
from quackspark.sqlfront import UnsupportedSQL, sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def both(spark):
    register_testdata_views(spark, SF)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{SF}/nation.parquet')"
    )
    yield spark, con
    con.close()


def run_script(spark, con, script):
    """Execute statements on both engines; compare each ('check', sql)."""
    for kind, stmt in script:
        s_rows = [tuple(r) for r in sql(spark, stmt).collect()]
        d_rows = con.sql(stmt).fetchall() if kind == "check" else con.sql(stmt)
        if kind == "check":
            sn = [tuple(_norm_cell(c) for c in r) for r in s_rows]
            dn = [tuple(_norm_cell(c) for c in r) for r in d_rows]
            assert sn == dn, f"{stmt}\n spark={sn}\n duck ={dn}"


def test_create_insert_defaults(both):
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE ddl_t1 (id INTEGER, name VARCHAR, "
                "score DOUBLE DEFAULT 1.5, tag VARCHAR DEFAULT 'x')"),
        ("run", "INSERT INTO ddl_t1 VALUES (1, 'a', 2.0, 'y')"),
        ("run", "INSERT INTO ddl_t1 (id, name) VALUES (2, 'b')"),
        ("run", "INSERT INTO ddl_t1 (name, id) "
                "SELECT n_name, n_nationkey FROM nation WHERE n_nationkey = 9"),
        ("check", "SELECT * FROM ddl_t1 ORDER BY id"),
        ("run", "DROP TABLE ddl_t1"),
    ])


def test_insert_by_name(both):
    """INSERT INTO … BY NAME (DuckDB by-name insert binding): source
    column names pick the target columns, order-independent; unnamed
    columns fill with DEFAULT/NULL; an unknown source column is a binder
    error on both engines."""
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE ddl_bn (id INTEGER, name VARCHAR, "
                "score DOUBLE DEFAULT 1.5)"),
        ("run", "INSERT INTO ddl_bn BY NAME SELECT 'a' AS name, 1 AS id"),
        ("run", "INSERT INTO ddl_bn BY NAME "
                "SELECT 9.0 AS score, 2 AS id"),
        ("run", "INSERT INTO ddl_bn BY NAME "
                "SELECT n_nationkey AS id, n_name AS name "
                "FROM nation WHERE n_nationkey = 3"),
        ("check", "SELECT * FROM ddl_bn ORDER BY id"),
        ("run", "DROP TABLE ddl_bn"),
    ])
    with pytest.raises(Exception, match="(?i)binder"):
        sql(spark, "CREATE TABLE ddl_bn2 (id INTEGER)")
        try:
            sql(spark, "INSERT INTO ddl_bn2 BY NAME SELECT 1 AS nope")
        finally:
            sql(spark, "DROP TABLE ddl_bn2")


def test_alter_column_lifecycle(both):
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE ddl_t2 (id INTEGER, v VARCHAR)"),
        ("run", "INSERT INTO ddl_t2 VALUES (1, 'a'), (2, 'b')"),
        ("run", "ALTER TABLE ddl_t2 ADD COLUMN extra INTEGER DEFAULT 7"),
        ("check", "SELECT * FROM ddl_t2 ORDER BY id"),
        ("run", "ALTER TABLE ddl_t2 RENAME COLUMN extra TO e2"),
        ("run", "ALTER TABLE ddl_t2 ALTER COLUMN e2 TYPE VARCHAR"),
        ("check", "SELECT id, e2 FROM ddl_t2 ORDER BY id"),
        ("run", "ALTER TABLE ddl_t2 DROP COLUMN v"),
        ("check", "SELECT * FROM ddl_t2 ORDER BY id"),
        ("run", "DROP TABLE ddl_t2"),
    ])


def test_rename_truncate(both):
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE ddl_t3 (id INTEGER)"),
        ("run", "INSERT INTO ddl_t3 VALUES (1), (2), (3)"),
        ("run", "ALTER TABLE ddl_t3 RENAME TO ddl_t4"),
        ("check", "SELECT count(*) AS c FROM ddl_t4"),
        ("run", "TRUNCATE ddl_t4"),
        ("check", "SELECT count(*) AS c FROM ddl_t4"),
        ("run", "DROP TABLE ddl_t4 CASCADE"),
    ])


def test_views_and_update_delete(both):
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE ddl_t5 (id INTEGER, v VARCHAR)"),
        ("run", "INSERT INTO ddl_t5 VALUES (1, 'a'), (2, 'b'), (3, 'c')"),
        ("run", "CREATE VIEW ddl_v5 AS SELECT id FROM ddl_t5 WHERE id > 1"),
        ("check", "SELECT * FROM ddl_v5 ORDER BY id"),
        ("run", "CREATE OR REPLACE VIEW ddl_v5 AS "
                "SELECT v FROM ddl_t5 WHERE id < 3"),
        ("check", "SELECT * FROM ddl_v5 ORDER BY v"),
        ("run", "UPDATE ddl_t5 SET v = 'zz' WHERE id = 1"),
        ("run", "DELETE FROM ddl_t5 WHERE id = 2"),
        ("check", "SELECT * FROM ddl_t5 ORDER BY id"),
        ("run", "DROP VIEW ddl_v5"),
        ("run", "DROP TABLE ddl_t5"),
    ])


def test_constraints_recorded(both):
    """PRIMARY KEY/NOT NULL/CHECK parse into the enforcement registries;
    the data path still works for valid rows."""
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE ddl_t6 (id INTEGER PRIMARY KEY, "
                "v VARCHAR NOT NULL, CHECK (id > 0))"),
        ("run", "INSERT INTO ddl_t6 VALUES (1, 'ok')"),
        ("check", "SELECT * FROM ddl_t6"),
    ])
    from quackspark.ddl import TABLE_CONSTRAINTS

    assert "ddl_t6" in TABLE_CONSTRAINTS
    run_script(spark, con, [("run", "DROP TABLE ddl_t6")])
    # r6: DROP TABLE forgets the registries (a re-created ddl_t6 must not
    # inherit this definition's constraints)
    assert "ddl_t6" not in TABLE_CONSTRAINTS


def _both_reject(spark, con, stmt):
    """The statement must raise on BOTH engines; ours with a message the
    reference's ConstraintException family would use."""
    with pytest.raises(Exception) as se:
        sql(spark, stmt)
    with pytest.raises(Exception):
        con.sql(stmt)
    assert "Constraint Error" in str(se.value), str(se.value)


class TestConstraintEnforcement:
    """r6: PRIMARY KEY / UNIQUE / NOT NULL / CHECK enforce on DML —
    engine-vs-engine: violations raise on both, valid data matches
    (reference ConstraintException via ART index probes; here one
    bounded validation job per statement, ddl._enforce_insert)."""

    def test_insert_violations(self, both):
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_c1 (id INTEGER PRIMARY KEY, "
                    "v VARCHAR NOT NULL, n INTEGER CHECK (n >= 0))"),
            ("run", "INSERT INTO ddl_c1 VALUES (1, 'a', 0), (2, 'b', 5)"),
        ])
        _both_reject(spark, con, "INSERT INTO ddl_c1 VALUES (3, NULL, 1)")
        _both_reject(spark, con, "INSERT INTO ddl_c1 VALUES (3, 'c', -1)")
        _both_reject(spark, con, "INSERT INTO ddl_c1 VALUES (1, 'dup', 1)")
        _both_reject(
            spark, con,
            "INSERT INTO ddl_c1 VALUES (7, 'x', 1), (7, 'y', 2)",
        )
        _both_reject(spark, con, "INSERT INTO ddl_c1 VALUES (NULL, 'z', 1)")
        # CHECK passes on NULL (three-valued logic) and failed statements
        # left nothing behind (atomicity)
        run_script(spark, con, [
            ("run", "INSERT INTO ddl_c1 VALUES (3, 'c', NULL)"),
            ("check", "SELECT * FROM ddl_c1 ORDER BY id"),
            ("run", "DROP TABLE ddl_c1"),
        ])

    def test_partial_insert_not_null(self, both):
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_c2 (id INTEGER, v VARCHAR NOT NULL, "
                    "w VARCHAR NOT NULL DEFAULT 'd')"),
            # missing w fills from DEFAULT → valid
            ("run", "INSERT INTO ddl_c2 (id, v) VALUES (1, 'a')"),
            ("check", "SELECT * FROM ddl_c2 ORDER BY id"),
        ])
        # missing v has no default → NULL → rejected by both
        _both_reject(spark, con, "INSERT INTO ddl_c2 (id, w) VALUES (2, 'x')")
        run_script(spark, con, [
            ("check", "SELECT * FROM ddl_c2 ORDER BY id"),
            ("run", "DROP TABLE ddl_c2"),
        ])

    def test_unique_nulls_never_conflict(self, both):
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_c3 (id INTEGER, u VARCHAR UNIQUE)"),
            ("run", "INSERT INTO ddl_c3 VALUES (1, 'a'), (2, NULL), (3, NULL)"),
            ("run", "INSERT INTO ddl_c3 VALUES (4, NULL)"),
            ("check", "SELECT * FROM ddl_c3 ORDER BY id"),
        ])
        _both_reject(spark, con, "INSERT INTO ddl_c3 VALUES (5, 'a')")
        run_script(spark, con, [("run", "DROP TABLE ddl_c3")])

    def test_table_level_composite_unique(self, both):
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_c4 (a INTEGER, b INTEGER, v VARCHAR, "
                    "UNIQUE (a, b))"),
            ("run", "INSERT INTO ddl_c4 VALUES (1, 1, 'x'), (1, 2, 'y')"),
        ])
        _both_reject(spark, con, "INSERT INTO ddl_c4 VALUES (1, 1, 'z')")
        run_script(spark, con, [
            ("check", "SELECT * FROM ddl_c4 ORDER BY a, b"),
            ("run", "DROP TABLE ddl_c4"),
        ])

    def test_update_violations(self, both):
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_c5 (id INTEGER PRIMARY KEY, "
                    "n INTEGER CHECK (n >= 0), v VARCHAR NOT NULL)"),
            ("run", "INSERT INTO ddl_c5 VALUES (1, 0, 'a'), (2, 5, 'b')"),
        ])
        _both_reject(spark, con, "UPDATE ddl_c5 SET n = -1 WHERE id = 1")
        _both_reject(spark, con, "UPDATE ddl_c5 SET v = NULL WHERE id = 2")
        _both_reject(spark, con, "UPDATE ddl_c5 SET id = 2 WHERE id = 1")
        run_script(spark, con, [
            # untouched-row CHECK state can't fail a disjoint update
            ("run", "UPDATE ddl_c5 SET n = 9 WHERE id = 2"),
            ("check", "SELECT * FROM ddl_c5 ORDER BY id"),
            ("run", "DROP TABLE ddl_c5"),
        ])

    def test_insert_select_enforced(self, both):
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_c6 (k INTEGER PRIMARY KEY, "
                    "name VARCHAR NOT NULL)"),
            ("run", "INSERT INTO ddl_c6 SELECT n_nationkey, n_name "
                    "FROM nation WHERE n_nationkey < 10"),
            ("check", "SELECT * FROM ddl_c6 ORDER BY k"),
        ])
        # re-inserting the same key range collides with existing rows
        _both_reject(
            spark, con,
            "INSERT INTO ddl_c6 SELECT n_nationkey, n_name FROM nation "
            "WHERE n_nationkey < 3",
        )
        run_script(spark, con, [("run", "DROP TABLE ddl_c6")])

    def test_drop_key_column_refused(self, both):
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_c7 (id INTEGER PRIMARY KEY, v VARCHAR)"),
            ("run", "INSERT INTO ddl_c7 VALUES (1, 'a')"),
        ])
        _both_reject(spark, con, "ALTER TABLE ddl_c7 DROP COLUMN id")
        run_script(spark, con, [
            ("run", "ALTER TABLE ddl_c7 DROP COLUMN v"),  # non-key is fine
            ("check", "SELECT * FROM ddl_c7"),
            ("run", "DROP TABLE ddl_c7"),
        ])

    def test_foreign_key_enforced(self, both):
        """r6: FOREIGN KEY — inserts must resolve against the parent,
        NULL FKs pass, deleting referenced parent keys fails, dropping a
        referenced parent fails; drop child-then-parent succeeds."""
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_p (pid INTEGER PRIMARY KEY, "
                    "name VARCHAR)"),
            ("run", "CREATE TABLE ddl_ch (cid INTEGER PRIMARY KEY, "
                    "pid INTEGER REFERENCES ddl_p(pid))"),
            ("run", "INSERT INTO ddl_p VALUES (1, 'a'), (2, 'b')"),
            ("run", "INSERT INTO ddl_ch VALUES (10, 1), (11, NULL)"),
        ])
        _both_reject(spark, con, "INSERT INTO ddl_ch VALUES (12, 99)")
        _both_reject(spark, con, "DELETE FROM ddl_p WHERE pid = 1")
        run_script(spark, con, [
            ("run", "DELETE FROM ddl_p WHERE pid = 2"),  # unreferenced: fine
            ("check", "SELECT * FROM ddl_p ORDER BY pid"),
            ("check", "SELECT * FROM ddl_ch ORDER BY cid"),
        ])
        _both_reject(spark, con, "DROP TABLE ddl_p")
        run_script(spark, con, [
            ("run", "DROP TABLE ddl_ch"),
            ("run", "DROP TABLE ddl_p"),
        ])

    def test_recreate_clears_old_constraints(self, both):
        spark, con = both
        run_script(spark, con, [
            ("run", "CREATE TABLE ddl_c8 (id INTEGER PRIMARY KEY, v VARCHAR)"),
            ("run", "DROP TABLE ddl_c8"),
            ("run", "CREATE TABLE ddl_c8 (id INTEGER, v VARCHAR)"),
            # the re-created table has no PK: duplicates are legal again
            ("run", "INSERT INTO ddl_c8 VALUES (1, 'a'), (1, 'b')"),
            ("check", "SELECT * FROM ddl_c8 ORDER BY id, v"),
            ("run", "DROP TABLE ddl_c8"),
        ])


def test_update_from_delete_using(both):
    """UPDATE … FROM / DELETE … USING (reference update/delete grammar
    with from/usingClause) as distributed join rewrites — engine-vs-
    engine on scripts with unique matches (the engine's multi-match pick
    is arbitrary; ours is deterministic, pinned separately below)."""
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE uf_t (id INTEGER, v VARCHAR, x DOUBLE)"),
        ("run", "INSERT INTO uf_t VALUES (1,'a',1.0),(2,'b',2.0),"
                "(3,'c',3.0),(3,'c',3.0)"),
        ("run", "CREATE TABLE uf_s (id INTEGER, nv VARCHAR, bump DOUBLE)"),
        ("run", "INSERT INTO uf_s VALUES (1,'A',10.0),(3,'C',30.0),(9,'Z',90.0)"),
        # qualified source refs; duplicate target rows must BOTH update
        ("run", "UPDATE uf_t SET v = uf_s.nv, x = x + uf_s.bump "
                "FROM uf_s WHERE uf_t.id = uf_s.id"),
        ("check", "SELECT * FROM uf_t ORDER BY id, v, x"),
        # alias + bare source-only column reference
        ("run", "UPDATE uf_t SET v = upper(nv) FROM uf_s AS z "
                "WHERE uf_t.id = z.id AND z.bump < 20"),
        ("check", "SELECT * FROM uf_t ORDER BY id, v, x"),
        # semi-join delete removes every matching physical row
        ("run", "DELETE FROM uf_t USING uf_s WHERE uf_t.id = uf_s.id "
                "AND uf_s.bump > 20"),
        ("check", "SELECT * FROM uf_t ORDER BY id, v, x"),
        ("run", "DROP TABLE uf_t"),
        ("run", "DROP TABLE uf_s"),
    ])


def test_upsert_where_null_gate_keeps_row(spark):
    """DO UPDATE ... WHERE with a NULL gate keeps the existing row (SQL
    three-valued logic; PostgreSQL semantics). Pinned LITERALLY, not
    differentially: DuckDB 1.0's evaluation of a NULL gate is heap-
    history-dependent (r6 fuzz finding, seeds 23/47 — the same statement
    on the same table state updates or keeps depending on connection
    history), so the oracle cannot carry this case and the fuzzer now
    avoids NULL gates."""
    sql(spark, "DROP TABLE IF EXISTS upd_ng")
    sql(spark, "CREATE TABLE upd_ng (id INTEGER PRIMARY KEY, v VARCHAR, x DOUBLE)")
    sql(spark, "INSERT INTO upd_ng VALUES (1, 'keep', NULL), (2, 'upd', 5.0)")
    sql(
        spark,
        "INSERT INTO upd_ng VALUES (1, 'P1', -1.0), (2, 'P2', -1.0) "
        "ON CONFLICT (id) DO UPDATE SET v = excluded.v WHERE x > 0",
    )
    got = [tuple(r) for r in sql(spark, "SELECT * FROM upd_ng ORDER BY id").collect()]
    assert got == [(1, "keep", None), (2, "P2", 5.0)]
    sql(spark, "DROP TABLE upd_ng")


def test_update_from_multi_match_deterministic(spark):
    """When several source rows match one target row the engine picks
    one arbitrarily; we pin the DETERMINISTIC choice (smallest source
    tuple) so re-runs and task retries agree."""
    sql(spark, "DROP TABLE IF EXISTS ufm_t")
    sql(spark, "DROP TABLE IF EXISTS ufm_s")
    sql(spark, "CREATE TABLE ufm_t (id INTEGER, v VARCHAR)")
    sql(spark, "INSERT INTO ufm_t VALUES (1,'a')")
    sql(spark, "CREATE TABLE ufm_s (id INTEGER, nv VARCHAR)")
    sql(spark, "INSERT INTO ufm_s VALUES (1,'ZZ'),(1,'AA'),(1,'MM')")
    sql(spark, "UPDATE ufm_t SET v = ufm_s.nv FROM ufm_s WHERE ufm_t.id = ufm_s.id")
    assert [tuple(r) for r in sql(spark, "SELECT * FROM ufm_t").collect()] == [
        (1, "AA")
    ]
    sql(spark, "DROP TABLE ufm_t")
    sql(spark, "DROP TABLE ufm_s")


def test_index_shim_and_comment(both):
    spark, con = both
    sql(spark, "CREATE TABLE ddl_t7 (id INTEGER)")
    sql(spark, "CREATE INDEX ddl_idx ON ddl_t7 (id)")
    from quackspark.ddl import COMMENTS, INDEXES

    assert "ddl_idx" in INDEXES
    # duckdb_indexes() introspects the shim registry with the reference's
    # normalized serialization (r12) — differential against live DuckDB
    con.execute("CREATE TABLE ddl_t7 (id INTEGER)")
    con.execute("CREATE INDEX ddl_idx ON ddl_t7 (id)")
    cols = "index_name, table_name, is_unique, is_primary, expressions, sql"
    got = [tuple(r) for r in sql(
        spark, f"SELECT {cols} FROM duckdb_indexes() WHERE index_name = 'ddl_idx'"
    ).collect()]
    want = con.execute(
        f"SELECT {cols} FROM duckdb_indexes() WHERE index_name = 'ddl_idx'"
    ).fetchall()
    assert got == want
    sql(spark, "DROP INDEX ddl_idx")
    assert "ddl_idx" not in INDEXES
    assert sql(spark, "SELECT count(*) AS c FROM duckdb_indexes()"
               ).collect()[0]["c"] == 0
    sql(spark, "COMMENT ON TABLE ddl_t7 IS 'probe'")
    assert COMMENTS.get("table:ddl_t7") == "probe"
    sql(spark, "DROP TABLE ddl_t7")


def test_alter_unknown_action_refuses(both):
    spark, con = both
    sql(spark, "CREATE TABLE ddl_t8 (id INTEGER)")
    with pytest.raises(UnsupportedSQL):
        sql(spark, "ALTER TABLE ddl_t8 SET LOGGED")
    sql(spark, "DROP TABLE ddl_t8")


def test_prepare_execute_deallocate(both):
    """SQL-level PREPARE/EXECUTE with $n and ? parameters (reference
    PreparedStatementData, duckdb-7.cpp:1968-2055)."""
    spark, con = both
    sql(spark, "PREPARE ddl_q AS SELECT n_name FROM nation "
               "WHERE n_nationkey = $1 OR n_nationkey = $2 ORDER BY 1")
    got = [r[0] for r in sql(spark, "EXECUTE ddl_q(7, 9)").collect()]
    assert got == ["NATION_7", "NATION_9"]
    sql(spark, "PREPARE ddl_q2 AS SELECT count(*) AS c FROM nation "
               "WHERE n_regionkey = ? AND n_nationkey > ?")
    assert sql(spark, "EXECUTE ddl_q2(2, 10)").collect()[0][0] == 3
    sql(spark, "DEALLOCATE ddl_q")
    with pytest.raises(UnsupportedSQL):
        sql(spark, "EXECUTE ddl_q(1, 2)")


def test_copy_from_roundtrip(both, tmp_path):
    """COPY t FROM 'file' appends with the target table's schema; accepts
    Spark part-file directories as well as single files."""
    spark, con = both
    sql(spark, "CREATE TABLE ddl_cp (id INTEGER, v VARCHAR)")
    sql(spark, "INSERT INTO ddl_cp VALUES (1,'a'), (2,'b')")
    out = str(tmp_path / "out.csv")
    sql(spark, f"COPY ddl_cp TO '{out}' (HEADER)")
    sql(spark, "CREATE TABLE ddl_cp2 (id INTEGER, v VARCHAR)")
    sql(spark, f"COPY ddl_cp2 FROM '{out}' (HEADER)")
    got = [tuple(r) for r in
           sql(spark, "SELECT * FROM ddl_cp2 ORDER BY id").collect()]
    assert got == [(1, "a"), (2, "b")]
    sql(spark, "DROP TABLE ddl_cp")
    sql(spark, "DROP TABLE ddl_cp2")


def test_insert_conflict_clauses(both):
    """OR IGNORE / OR REPLACE / ON CONFLICT DO NOTHING / DO UPDATE keyed
    on the recorded PRIMARY KEY (DO UPDATE implemented round 5 as a
    MERGE-shaped lazy plan, ddl._merge_do_update)."""
    spark, con = both
    sql(spark, "CREATE TABLE ddl_up (id INTEGER PRIMARY KEY, v VARCHAR)")
    sql(spark, "INSERT INTO ddl_up VALUES (1,'a'), (2,'b')")
    sql(spark, "INSERT OR IGNORE INTO ddl_up VALUES (1, 'dup'), (3, 'c')")
    sql(spark, "INSERT OR REPLACE INTO ddl_up VALUES (1, 'new')")
    sql(spark, "INSERT INTO ddl_up VALUES (1, 'x'), (4, 'd') "
               "ON CONFLICT DO NOTHING")
    got = [tuple(r) for r in
           sql(spark, "SELECT * FROM ddl_up ORDER BY id").collect()]
    assert got == [(1, "new"), (2, "b"), (3, "c"), (4, "d")]
    sql(spark, "INSERT INTO ddl_up VALUES (1,'y'), (5,'e') "
               "ON CONFLICT DO UPDATE SET v = excluded.v")
    got = [tuple(r) for r in
           sql(spark, "SELECT * FROM ddl_up ORDER BY id").collect()]
    assert got == [(1, "y"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
    sql(spark, "DROP TABLE ddl_up")


def test_varchar_length_ignored(both):
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE ddl_t9 (v VARCHAR(5), d DECIMAL(10,2), "
                "l INTEGER[])"),
        ("run", "INSERT INTO ddl_t9 VALUES ('longer-than-five', 12.34, [1,2])"),
        ("check", "SELECT v, d, to_json(l) AS lj FROM ddl_t9"),
        ("run", "DROP TABLE ddl_t9"),
    ])


def test_end_to_end_statement_scenario(both, tmp_path):
    """A realistic session script touching the whole statement surface:
    DDL + defaults + upserts + ALTER + PREPARE + COPY + views + an
    analytic query with mad() — checkpoints compared engine-vs-engine."""
    spark, con = both
    run_script(spark, con, [
        ("run", "CREATE TABLE sc_events (id INTEGER PRIMARY KEY, "
                "kind VARCHAR DEFAULT 'view', score DOUBLE)"),
        ("run", "INSERT INTO sc_events VALUES (1, 'click', 0.5), "
                "(2, 'view', 1.5), (3, 'click', 2.5)"),
        ("run", "INSERT INTO sc_events (id, score) VALUES (4, 3.5)"),
        ("run", "INSERT OR REPLACE INTO sc_events VALUES (1, 'click', 9.0)"),
        ("run", "INSERT INTO sc_events VALUES (2, 'dup', 0.0), (5, 'view', 4.5) "
                "ON CONFLICT DO NOTHING"),
        ("check", "SELECT * FROM sc_events ORDER BY id"),
        ("run", "ALTER TABLE sc_events ADD COLUMN flag BOOLEAN DEFAULT false"),
        ("run", "UPDATE sc_events SET flag = true WHERE score > 2"),
        ("check", "SELECT id, flag FROM sc_events ORDER BY id"),
        ("run", "CREATE VIEW sc_clicks AS SELECT id, score FROM sc_events "
                "WHERE kind = 'click'"),
        ("check", "SELECT * FROM sc_clicks ORDER BY id"),
        ("check", "SELECT kind, count(*) AS n, round(mad(score), 6) AS m "
                  "FROM sc_events GROUP BY kind ORDER BY kind"),
        ("run", "PREPARE sc_q AS SELECT count(*) AS c FROM sc_events "
                "WHERE score > $1"),
        ("check", "EXECUTE sc_q(1.0)"),
        ("run", "DROP VIEW sc_clicks"),
        ("run", "DROP TABLE sc_events"),
    ])
