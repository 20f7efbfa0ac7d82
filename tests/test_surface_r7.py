"""Round-7 surface tail (VERDICT r6 missing items): TIME/TIMETZ DDL
column types, named ENUM types + the enum_* introspection family, and
read_json columns= explicit schema."""

from __future__ import annotations

import json
import os

import pytest

from quackspark import sqlfront
from quackspark.sqlfront import UnsupportedSQL


def test_create_type_enum_and_fns(spark):
    sqlfront.sql(
        spark, "CREATE OR REPLACE TYPE mood AS ENUM ('sad', 'ok', 'happy')"
    )
    row = sqlfront.sql(
        spark,
        """SELECT enum_first(NULL::mood) AS f, enum_last(NULL::mood) AS l,
                  enum_range(NULL::mood) AS r,
                  enum_range_boundary(NULL, 'ok'::mood) AS upto,
                  enum_range_boundary('ok'::mood, NULL) AS frm,
                  enum_range_boundary('sad'::mood, 'happy'::mood) AS full_
        """,
    ).collect()[0]
    # pinned against real DuckDB CREATE TYPE output (inclusive both ends,
    # NULL = open end)
    assert (row["f"], row["l"]) == ("sad", "happy")
    assert row["r"] == ["sad", "ok", "happy"]
    assert row["upto"] == ["sad", "ok"]
    assert row["frm"] == ["ok", "happy"]
    assert row["full_"] == ["sad", "ok", "happy"]


def test_enum_cast_validates_literals(spark):
    sqlfront.sql(spark, "CREATE OR REPLACE TYPE mood AS ENUM ('sad', 'ok')")
    with pytest.raises(UnsupportedSQL, match="not a member"):
        sqlfront.sql(spark, "SELECT 'angry'::mood AS x")
    # dynamic non-member: CAST raises like DuckDB's enum conversion
    # error; TRY_CAST yields NULL (r7 ADVICE #4 — previously CAST also
    # NULLed, silently storing NULL where DuckDB raises)
    with pytest.raises(Exception, match="INVALID_INDEX_OF_ZERO|index 0"):
        sqlfront.sql(
            spark, "SELECT (CASE WHEN 1=1 THEN 'angry' END)::mood AS x"
        ).collect()
    got = sqlfront.sql(
        spark,
        "SELECT TRY_CAST((CASE WHEN 1=1 THEN 'angry' END) AS mood) AS x",
    ).collect()[0]["x"]
    assert got is None
    # member round-trips through the dynamic path
    got = sqlfront.sql(
        spark, "SELECT (CASE WHEN 1=1 THEN 'ok' END)::mood AS x"
    ).collect()[0]["x"]
    assert got == "ok"


def test_drop_type(spark):
    sqlfront.sql(spark, "CREATE OR REPLACE TYPE tmp_t AS ENUM ('a')")
    sqlfront.sql(spark, "DROP TYPE tmp_t")
    with pytest.raises(UnsupportedSQL):
        sqlfront.sql(spark, "DROP TYPE tmp_t")
    sqlfront.sql(spark, "DROP TYPE IF EXISTS tmp_t")  # no raise


def test_time_literals(spark):
    row = sqlfront.sql(
        spark,
        """SELECT TIME '01:02:03' AS a, TIME '23:59:59.999999' AS b,
                  TIMETZ '12:00:00-05:30' AS c,
                  TIME WITH TIME ZONE '01:02:03+02' AS d""",
    ).collect()[0]
    assert row["a"] == 3723000000
    assert row["b"] == 86399999999
    assert row["c"].micros == 43200000000 and row["c"].offset_s == -19800
    assert row["d"].micros == 3723000000 and row["d"].offset_s == 7200


def test_time_ddl_column_roundtrip(spark):
    import shutil
    from urllib.parse import urlparse

    spark.sql("DROP TABLE IF EXISTS t_times_r7")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if wh:
        shutil.rmtree(f"{wh}/t_times_r7", ignore_errors=True)
    sqlfront.sql(spark, "CREATE TABLE t_times_r7 (id INT, t TIME, z TIMETZ)")
    sqlfront.sql(
        spark,
        "INSERT INTO t_times_r7 VALUES "
        "(1, TIME '12:00:00', TIMETZ '12:00:00+01'), "
        "(2, TIME '01:00:00', TIMETZ '01:00:00-02')",
    )
    got = sqlfront.sql(
        spark, "SELECT id FROM t_times_r7 WHERE t > TIME '02:00:00' "
    ).collect()
    assert [r["id"] for r in got] == [1]
    ordered = sqlfront.sql(
        spark, "SELECT id FROM t_times_r7 ORDER BY t"
    ).collect()
    assert [r["id"] for r in ordered] == [2, 1]
    spark.sql("DROP TABLE IF EXISTS t_times_r7")


def test_read_json_columns(spark, tmp_path):
    p = os.path.join(str(tmp_path), "j.ndjson")
    with open(p, "w") as f:
        f.write(json.dumps({"a": 1, "b": "x", "extra": 9}) + "\n")
        f.write(json.dumps({"a": 2}) + "\n")
    df = sqlfront.sql(
        spark,
        f"SELECT * FROM read_json('{p}', "
        f"columns={{'a': 'BIGINT', 'b': 'VARCHAR'}})",
    )
    assert df.columns == ["a", "b"]  # explicit schema, no inference
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [(1, "x"), (2, None)]


def test_read_csv_columns_explicit_schema(spark, tmp_path):
    """read_csv columns= is an explicit schema — no inference pass
    (r7 missing #5; symmetric with read_json columns=). read_csv_auto
    keeps a pointed refusal (it sniffs by definition)."""
    p = os.path.join(str(tmp_path), "c.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    df = sqlfront.sql(
        spark,
        f"SELECT * FROM read_csv('{p}', "
        f"columns={{'a': 'BIGINT', 'b': 'VARCHAR'}})",
    )
    assert df.columns == ["a", "b"]
    assert dict(df.dtypes)["a"] == "bigint"
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [(1, "x"), (2, "y")]
    with pytest.raises(UnsupportedSQL, match="read_csv_auto sniffs"):
        sqlfront.sql(
            spark,
            f"SELECT * FROM read_csv_auto('{p}', columns={{'a': 'INT'}})",
        )


def test_enum_ddl_column(spark):
    """A named ENUM used as a CREATE TABLE column type stores the
    validated-string carrier with an implicit membership CHECK — a
    non-member INSERT raises where DuckDB raises its enum conversion
    error; NULL passes (CHECK semantics)."""
    import shutil
    from urllib.parse import urlparse

    sqlfront.sql(spark, "CREATE OR REPLACE TYPE mood2 AS ENUM ('sad', 'ok')")
    spark.sql("DROP TABLE IF EXISTS t_mood_r7")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if wh:
        shutil.rmtree(f"{wh}/t_mood_r7", ignore_errors=True)
    sqlfront.sql(spark, "CREATE TABLE t_mood_r7 (id INT, m mood2)")
    sqlfront.sql(
        spark, "INSERT INTO t_mood_r7 VALUES (1, 'sad'), (2, 'ok'), (3, NULL)"
    )
    assert spark.table("t_mood_r7").count() == 3
    with pytest.raises(Exception, match="CHECK|constraint"):
        sqlfront.sql(spark, "INSERT INTO t_mood_r7 VALUES (4, 'angry')")
    assert spark.table("t_mood_r7").count() == 3
    spark.sql("DROP TABLE IF EXISTS t_mood_r7")
