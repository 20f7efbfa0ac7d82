"""Operator-inventory query corpus (SURVEY.md §2).

Each module contributes:
  - ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]`` — the Spark-first
    implementation of one operator/query from the reference inventory.
  - ``ORACLES: dict[name, str]`` — the equivalent ANSI SQL DuckDB runs on
    the same parquet (the differential-testing oracle, SURVEY.md §5).
    Missing oracle ⇒ rows-only check (non-SQL-expressible ops).

Column names are aliased identically on both sides: the driver's compare
sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from quackspark.queries import (
        aggregates,
        datetimes,
        dedup,
        dml,
        eventops,
        frontend,
        fts,
        joins,
        jsonops,
        maths,
        misc,
        multimodal,
        nested,
        pipeline,
        setops,
        simsearch,
        streamwin,
        strings,
        subqueries,
        textops,
        tpch,
        tpch2,
        tpch3,
        unionenum,
        windows,
    )

    return [
        tpch,
        tpch2,
        tpch3,
        jsonops,
        maths,
        joins,
        aggregates,
        windows,
        setops,
        nested,
        unionenum,
        multimodal,
        strings,
        datetimes,
        subqueries,
        misc,
        dedup,
        dml,
        eventops,
        frontend,
        fts,
        pipeline,
        textops,
        simsearch,
        streamwin,
    ]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _modules():
        dup = out.keys() & m.QUERIES.keys()
        if dup:
            raise ValueError(f"duplicate query names {dup} in {m.__name__}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLES", {}))
    return out
