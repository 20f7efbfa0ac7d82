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
