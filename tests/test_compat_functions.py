"""Compat-layer functions vs DuckDB builtins on literal inputs."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from quackspark.functions import compat, timefmt

PAIRS = [
    ("duck", "luck"),
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("abc", "abc"),
    ("", "abc"),
    ("a", "b"),
    ("CRATE", "TRACE"),
]


def _duck_scalar(sql: str):
    return duckdb.sql(sql).fetchone()[0]


@pytest.mark.parametrize("a,b", PAIRS)
def test_jaro_winkler_matches_duckdb(spark, a, b):
    got = (
        spark.range(1)
        .select(compat.jaro_winkler(F.lit(a), F.lit(b)).alias("v"))
        .collect()[0]["v"]
    )
    want = _duck_scalar(f"SELECT jaro_winkler_similarity('{a}', '{b}')")
    assert got == pytest.approx(want, abs=1e-12), (a, b)


@pytest.mark.parametrize("a,b", PAIRS)
def test_jaccard_matches_duckdb(spark, a, b):
    if not a or not b:
        return  # duckdb errors on empty input
    got = (
        spark.range(1).select(compat.jaccard(F.lit(a), F.lit(b)).alias("v")).collect()[0]["v"]
    )
    want = _duck_scalar(f"SELECT jaccard('{a}', '{b}')")
    assert got == pytest.approx(want, abs=1e-12), (a, b)


def test_hamming_matches_duckdb(spark):
    got = (
        spark.range(1)
        .select(compat.hamming(F.lit("karolin"), F.lit("kathrin")).alias("v"))
        .collect()[0]["v"]
    )
    assert got == _duck_scalar("SELECT hamming('karolin', 'kathrin')")


def test_strip_accents_matches_duckdb(spark):
    s = "âéïõü ÀÇñ café"
    got = spark.range(1).select(compat.strip_accents(F.lit(s)).alias("v")).collect()[0]["v"]
    assert got == _duck_scalar(f"SELECT strip_accents('{s}')")


def test_glob_to_regex(spark):
    pat = compat.glob_to_regex("a*c?.txt")
    strings = ["abcd.txt", "ac!.txt", "nope", "a.c..txt", "xac!.txt"]
    got = (
        spark.createDataFrame([(s,) for s in strings], ["s"])
        .select("s", F.regexp_like("s", F.lit(pat)).alias("v"))
        .collect()
    )
    for r in got:
        want = _duck_scalar(f"SELECT '{r['s']}' GLOB 'a*c?.txt'")
        assert r["v"] == want, r["s"]


def test_strftime_translation(spark):
    fmt = "%Y-%m-%d %H:%M:%S"
    got = (
        spark.sql("SELECT timestamp'1995-03-15 13:14:15' AS t")
        .select(timefmt.strftime_spark("t", fmt).alias("v"))
        .collect()[0]["v"]
    )
    want = _duck_scalar(f"SELECT strftime(TIMESTAMP '1995-03-15 13:14:15', '{fmt}')")
    assert got == want


def test_strptime_roundtrip(spark):
    got = (
        spark.sql("SELECT '15/03/1995 13:14' AS s")
        .select(timefmt.strptime_spark("s", "%d/%m/%Y %H:%M").alias("v"))
        .collect()[0]["v"]
    )
    assert str(got) == "1995-03-15 13:14:00"


def test_isodow_matches_duckdb(spark):
    rows = (
        spark.sql(
            "SELECT explode(sequence(date'2024-01-01', date'2024-01-14')) AS d"
        )
        .select(F.col("d"), compat.isodow(F.col("d").cast("timestamp")).alias("v"))
        .collect()
    )
    for r in rows:
        want = _duck_scalar(f"SELECT isodow(DATE '{r['d']}')")
        assert r["v"] == want, r["d"]


def test_time_bucket_matches_duckdb(spark):
    got = (
        spark.sql("SELECT timestamp'2024-01-01 10:22:33' AS t")
        .select(compat.time_bucket(900, "t").alias("v"))
        .collect()[0]["v"]
    )
    want = _duck_scalar(
        "SELECT time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-01-01 10:22:33')"
    )
    assert got == want


def test_age_parts_matches_duckdb(spark):
    """age() borrow chain (time->days->months->years) incl. sign flips and
    month-length boundaries, differential vs DuckDB on a deterministic grid."""
    import itertools
    import random

    rng = random.Random(7)
    stamps = [
        "1995-01-20 00:00:00", "1996-03-15 00:00:00", "1996-01-31 23:30:00",
        "1996-03-10 05:00:00", "1996-02-29 12:00:00", "1995-02-28 11:59:59",
        "1996-12-31 00:00:01", "1997-01-01 00:00:00", "2000-02-29 06:07:08",
        "1999-03-01 06:07:09",
    ] + [
        f"{rng.randint(1994, 2001)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} "
        f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
        for _ in range(10)
    ]
    pairs = list(itertools.product(stamps, stamps))[:200]
    rows = spark.createDataFrame(pairs, "a string, b string").select(
        F.col("a"), F.col("b"), *(
            part.alias(name)
            for part, name in zip(
                compat.age_parts(F.col("a").cast("timestamp"), F.col("b").cast("timestamp")),
                ["years", "months", "days", "micros"],
            )
        )
    )
    got = {(r["a"], r["b"]): (r["years"], r["months"], r["days"], r["micros"])
           for r in rows.collect()}
    con = duckdb.connect()
    for a, b in pairs:
        want = con.sql(
            f"""SELECT date_part('year', g), date_part('month', g),
                       date_part('day', g),
                       date_part('hour', g) * 3600000000
                       + date_part('minute', g) * 60000000
                       + CAST(date_part('second', g) * 1000000 AS BIGINT)
                FROM (SELECT age(TIMESTAMP '{a}', TIMESTAMP '{b}') AS g)"""
        ).fetchone()
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)
