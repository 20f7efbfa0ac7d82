"""Round-9 fixes for the r8 ADVICE items:

#1 (medium) — the TIME cast carrier measured ELAPSED session time
   (unix_micros(t) − unix_micros(midnight)), reading 11:00 for noon on
   spring-forward days in DST session zones. Both the SQL carrier
   (sqlfront._time_carrier_toks) and compat.time_of_day_micros now
   decompose the TIMESTAMP_NTZ wall value instead.
#2 (medium) — read_csv(columns=...) kept the shim's header=True default,
   silently dropping the first data row of headerless files. DuckDB
   (pinned this round) header-sniffs even under an explicit schema:
   header iff the first row fails type conversion OR equals the names.
Also covers the r9 TIMETZ expression-cast close (VERDICT r8 next #6).
"""

from __future__ import annotations

import os

import pytest

from quackspark import sqlfront


@pytest.fixture()
def ny_session(spark):
    """Temporarily run the session in a DST-observing zone (the bare
    parity config's America/New_York)."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


def test_time_cast_dst_spring_forward(ny_session):
    """Noon on 2024-03-10 (US spring-forward) must be 12:00:00, not the
    11 elapsed hours since midnight (ADVICE r8 #1)."""
    row = sqlfront.sql(
        ny_session,
        """SELECT epoch_us(CAST(TIMESTAMP '2024-03-10 12:00:00' AS TIME))
                      AS noon,
                  epoch_us(CAST(TIMESTAMP '2024-11-03 12:00:00' AS TIME))
                      AS fallback_noon,
                  epoch_us(CAST(TIMESTAMP '2024-03-10 01:59:59.25' AS TIME))
                      AS pre_jump
        """,
    ).collect()[0]
    assert row["noon"] == 12 * 3_600_000_000
    assert row["fallback_noon"] == 12 * 3_600_000_000
    assert row["pre_jump"] == (1 * 3600 + 59 * 60 + 59) * 1_000_000 + 250_000


def test_time_of_day_micros_dst(ny_session):
    from pyspark.sql import functions as F

    from quackspark.functions import compat

    df = ny_session.createDataFrame(
        [("2024-03-10 12:00:00.5",)], "s string"
    ).select(
        compat.time_of_day_micros(
            F.col("s").cast("timestamp")
        ).alias("tod")
    )
    assert df.collect()[0]["tod"] == 12 * 3_600_000_000 + 500_000


def test_timetz_expression_cast(spark):
    """CAST(x AS TIMETZ) in expression position → struct<micros,offset_s>
    carrier, DuckDB-pinned semantics: explicit trailing offsets kept,
    timestamps get +00, failures NULL (r9; duckdb.hpp:931)."""
    row = sqlfront.sql(
        spark,
        """SELECT CAST('12:30:45.5+05:30' AS TIMETZ) AS a,
                  CAST('12:30:45+05:30:30' AS TIMETZ) AS full3,
                  CAST('12:30:45-02' AS TIME WITH TIME ZONE) AS c,
                  CAST(TIMESTAMP '2024-03-10 12:00:00.123456' AS TIMETZ)
                      AS ts_pm,
                  '07:08:09'::TIMETZ AS postfix,
                  TRY_CAST('25:99' AS TIMETZ) AS bad
        """,
    ).collect()[0]
    assert row["a"]["micros"] == (12 * 3600 + 30 * 60 + 45) * 10**6 + 500_000
    assert row["a"]["offset_s"] == 5 * 3600 + 30 * 60
    assert row["full3"]["offset_s"] == 5 * 3600 + 30 * 60 + 30
    assert row["c"]["offset_s"] == -7200
    assert row["ts_pm"]["micros"] == 12 * 3_600_000_000 + 123_456
    assert row["ts_pm"]["offset_s"] == 0
    # UTC-pinned quackspark session: bare strings get the session offset 0
    assert row["postfix"]["offset_s"] == 0
    assert row["bad"] is None


def test_read_csv_columns_headerless_keeps_first_row(spark, tmp_path):
    """ADVICE r8 #2: a headerless file under columns= must not lose its
    first data row."""
    p = os.path.join(str(tmp_path), "nohdr.csv")
    with open(p, "w") as f:
        f.write("1,alpha\n2,beta\n")
    df = sqlfront.sql(
        spark,
        f"SELECT * FROM read_csv('{p}', "
        f"columns={{'a': 'INT', 'b': 'VARCHAR'}})",
    )
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [
        (1, "alpha"),
        (2, "beta"),
    ]


def test_read_csv_columns_header_still_sniffed(spark, tmp_path):
    """DuckDB still skips a real header under columns= — both via type
    mismatch (INT column, alpha header) and via name equality
    (all-VARCHAR schema whose names match row 1)."""
    p = os.path.join(str(tmp_path), "hdr.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,alpha\n2,beta\n")
    typed = sqlfront.sql(
        spark,
        f"SELECT * FROM read_csv('{p}', "
        f"columns={{'a': 'INT', 'b': 'VARCHAR'}})",
    )
    assert sorted((r["a"], r["b"]) for r in typed.collect()) == [
        (1, "alpha"),
        (2, "beta"),
    ]
    by_name = sqlfront.sql(
        spark,
        f"SELECT * FROM read_csv('{p}', "
        f"columns={{'a': 'VARCHAR', 'b': 'VARCHAR'}})",
    )
    assert sorted((r["a"], r["b"]) for r in by_name.collect()) == [
        ("1", "alpha"),
        ("2", "beta"),
    ]
    # all-VARCHAR, names that do NOT match row 1 → row 1 is data
    other = sqlfront.sql(
        spark,
        f"SELECT * FROM read_csv('{p}', "
        f"columns={{'x': 'VARCHAR', 'y': 'VARCHAR'}})",
    )
    assert sorted((r["x"], r["y"]) for r in other.collect()) == [
        ("1", "alpha"),
        ("2", "beta"),
        ("a", "b"),
    ]


def test_read_csv_columns_explicit_header_wins(spark, tmp_path):
    p = os.path.join(str(tmp_path), "nohdr2.csv")
    with open(p, "w") as f:
        f.write("x,y\n1,alpha\n")
    df = sqlfront.sql(
        spark,
        f"SELECT * FROM read_csv('{p}', header=false, "
        f"columns={{'x': 'VARCHAR', 'y': 'VARCHAR'}})",
    )
    assert df.count() == 2  # user said no header: 'x,y' is data
