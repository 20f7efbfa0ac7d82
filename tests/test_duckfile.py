"""Native .duckdb file ATTACH (sources/duckfile.py) — VERDICT r3 gap #3.

A real DuckDB database file (built by the embedded engine itself, so the
storage format is authoritative) is attached through the SQL frontend and
every table — including a stored view and an empty table — must come back
row-identical to the embedded engine reading the same file.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from quackspark.oracle import _norm_cell
from quackspark.sqlfront import sql

BUILD = """
CREATE TABLE people (id INTEGER, name VARCHAR, born DATE, score DOUBLE);
INSERT INTO people VALUES
    (1, 'ada', DATE '1815-12-10', 9.5),
    (2, 'grace', DATE '1906-12-09', 9.9),
    (3, NULL, NULL, NULL);
CREATE TABLE tags (id INTEGER, tags VARCHAR[]);
INSERT INTO tags VALUES (1, ['math', 'eng']), (2, ['navy']), (3, []);
CREATE TABLE empty_t (k BIGINT, v VARCHAR);
CREATE VIEW grownups AS SELECT id, name FROM people WHERE born < DATE '1900-01-01';
"""


@pytest.fixture(scope="module")
def duck_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("duckfile") / "legacy.duckdb")
    con = duckdb.connect(p)
    for stmt in BUILD.strip().split(";"):
        if stmt.strip():
            con.execute(stmt)
    con.close()
    return p


def _duck_rows(path, q):
    con = duckdb.connect(path, read_only=True)
    try:
        return sorted(
            (tuple(_norm_cell(c) for c in r) for r in con.sql(q).fetchall()),
            key=repr,
        )
    finally:
        con.close()


def _spark_rows(spark, q):
    return sorted(
        (tuple(_norm_cell(c) for c in r) for r in sql(spark, q).collect()),
        key=repr,
    )


def test_attach_duckdb_file_tables_match(spark, duck_file):
    out = sql(spark, f"ATTACH '{duck_file}' AS legacy (READ_ONLY)")
    names = {r["table"] for r in out.collect()}
    assert names == {"people", "tags", "empty_t", "grownups"}
    for q in [
        "SELECT id, name, born, score FROM legacy.people",
        "SELECT id, tags FROM legacy.tags",
        "SELECT id, name FROM legacy.grownups",
    ]:
        want = _duck_rows(duck_file, q.replace("legacy.", ""))
        got = _spark_rows(spark, q)
        assert got == want, (q, got, want)


def test_attach_empty_table_schema_survives(spark, duck_file):
    sql(spark, f"ATTACH '{duck_file}' AS legacy2")
    df = sql(spark, "SELECT * FROM legacy2.empty_t")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]


def test_attached_tables_are_queryable_with_dialect(spark, duck_file):
    sql(spark, f"ATTACH '{duck_file}' AS legacy3")
    got = _spark_rows(
        spark,
        "SELECT upper(name) AS n, len(tags) AS nt "
        "FROM legacy3.people JOIN legacy3.tags USING (id) "
        "WHERE name IS NOT NULL ORDER BY 1",
    )
    assert got == [("ADA", 2), ("GRACE", 1)]


def test_detach_removes_alias(spark, duck_file):
    sql(spark, f"ATTACH '{duck_file}' AS legacy4")
    sql(spark, "DETACH legacy4")
    with pytest.raises(Exception):
        spark.table("legacy4.people").collect()


def test_attach_large_table_multi_batch(spark, tmp_path):
    """Streaming path: a table larger than 4×BATCH_ROWS must roll over
    multiple parquet part files and come back row-complete (pins the
    bounded-memory batch loop, not just the small-table path)."""
    import os

    from quackspark.sources import duckfile

    n = 4 * duckfile.BATCH_ROWS + 12345  # > one writer's worth
    p = str(tmp_path / "big.duckdb")
    con = duckdb.connect(p)
    con.execute(
        f"CREATE TABLE big AS SELECT range AS id, range % 97 AS k, "
        f"'v' || range AS v FROM range({n})"
    )
    con.close()
    sql(spark, f"ATTACH '{p}' AS bigdb")
    got = sql(
        spark,
        "SELECT count(*) AS n, sum(id) AS s, count(DISTINCT k) AS dk "
        "FROM bigdb.big",
    ).collect()[0]
    assert (got["n"], got["s"], got["dk"]) == (n, n * (n - 1) // 2, 97)
    # multiple part files were produced (splittable for Spark)
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    parts = os.listdir(os.path.join(wh, "bigdb__duckfile", "big"))
    assert sum(1 for f in parts if f.endswith(".parquet")) >= 2
    sql(spark, "DETACH bigdb")
