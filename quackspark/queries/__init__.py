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


#: how many leading entries the driver's correctness gate samples
DRIVER_WINDOW = 50


def all_queries() -> dict[str, QueryFn]:
    """Full corpus, ordered so the driver's correctness window (the
    FIRST ``DRIVER_WINDOW`` entries) spans every query family (VERDICT
    r11 #4: eleven rounds sampled only tpch/json/math/joins/aggs):
    modules are interleaved round-robin for the window — one query per
    family per pass, rows-only entries (no oracle ⇒ weaker driver
    check) deferred past it — then everything else follows in module
    order. Deterministic: dict order only, no randomness."""
    mods = _modules()
    per: list[list[tuple[str, QueryFn]]] = []
    seen: dict[str, QueryFn] = {}
    for m in mods:
        dup = seen.keys() & m.QUERIES.keys()
        if dup:
            raise ValueError(f"duplicate query names {dup} in {m.__name__}")
        seen.update(m.QUERIES)
        per.append(list(m.QUERIES.items()))
    oracles = all_oracles()
    window: dict[str, QueryFn] = {}
    idx = [0] * len(per)
    while len(window) < DRIVER_WINDOW:
        progressed = False
        for i, items in enumerate(per):
            while idx[i] < len(items):
                name, fn = items[idx[i]]
                idx[i] += 1
                if name in oracles:
                    window[name] = fn
                    progressed = True
                    break
            if len(window) >= DRIVER_WINDOW:
                break
        if not progressed:
            break
    out = dict(window)
    for m in mods:
        for name, fn in m.QUERIES.items():
            out.setdefault(name, fn)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLES", {}))
    return out
