"""day_bound (queries/_util.py): the redundant zone-map DATE predicate
must be a pure SUPERSET of the exact timestamp predicate for EVERY
input — including non-midnight timestamps the TPC-H fixtures never
contain — so ANDing it can never change results, only prune."""

from __future__ import annotations

import datetime as dt
import random

import pyspark.sql.functions as F

from quackspark.queries._util import day_bound

OPS = [">=", ">", "<", "<=", "="]


def _exact(ts, op, day):
    boundary = dt.datetime.fromisoformat(day)
    return {
        ">=": ts >= boundary,
        ">": ts > boundary,
        "<": ts < boundary,
        "<=": ts <= boundary,
        "=": ts == boundary,
    }[op]


def test_day_bound_equals_exact_predicate_on_adversarial_times(spark):
    """500 random timestamps spanning midnights, microsecond offsets
    around day boundaries, and random (op, day) pairs: filtering through
    day_bound (with the derived _d column present) must select EXACTLY
    the rows the plain timestamp predicate selects."""
    rng = random.Random(8)
    base = dt.datetime(1995, 6, 15)
    rows = []
    for i in range(500):
        t = base + dt.timedelta(
            days=rng.randrange(-400, 400),
            seconds=rng.choice([0, 1, 86399, rng.randrange(86400)]),
            microseconds=rng.choice([0, 1, 999999]),
        )
        rows.append((i, t))
    df = spark.createDataFrame(rows, "id int, ts timestamp_ntz").withColumn(
        "ts_d", F.col("ts").cast("date")
    )
    for _ in range(25):
        op = rng.choice(OPS)
        day = (base + dt.timedelta(days=rng.randrange(-300, 300))).strftime(
            "%Y-%m-%d"
        )
        got = {
            r.id for r in df.filter(day_bound(df, "ts", op, day)).collect()
        }
        want = {r[0] for r in rows if _exact(r[1], op, day)}
        assert got == want, (op, day, got ^ want)


def test_day_bound_falls_back_without_derived_column(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(1995, 1, 1, 12))], "id int, ts timestamp_ntz"
    )
    # no ts_d column: predicate is the exact timestamp comparison only
    assert df.filter(day_bound(df, "ts", ">=", "1995-01-01")).count() == 1
    assert df.filter(day_bound(df, "ts", ">", "1995-01-01")).count() == 1
    assert df.filter(day_bound(df, "ts", "<", "1995-01-02")).count() == 1
    assert df.filter(day_bound(df, "ts", "=", "1995-01-01")).count() == 0
