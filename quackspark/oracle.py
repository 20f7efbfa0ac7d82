"""Differential-testing harness: Spark result vs DuckDB oracle.

The reference self-verifies by re-running every query under different
engine configurations and comparing results (ClientContext::VerifyQuery,
duckdb-7.cpp:2891-2990). Our modern equivalent (SURVEY.md §5): run the
Spark plan and the equivalent ANSI SQL on DuckDB over the same parquet and
require exact value equality. This module is the local feedback loop for
the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

from pyspark.sql import DataFrame

from quackspark.session import TESTDATA_TABLES, table_path


def duck_connection(sf_dir: str):
    """A DuckDB connection with the testdata tables registered as views."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    """Normalize a result cell to a hashable, engine-neutral value."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, Decimal):
        return float(v)
    import uuid as _uuid

    if isinstance(v, _uuid.UUID):  # DuckDB UUID vs Spark's string carrier
        return str(v)
    if hasattr(v, "asDict"):  # pyspark Row (struct) — check before tuple:
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        # DuckDB surfaces MAP values as {'key': [...], 'value': [...]} —
        # canonicalize to the same (k, v) pair tuples as a Python dict
        if set(v) == {"key", "value"} and isinstance(v.get("key"), list):
            v = dict(zip(v["key"], v["value"]))
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if hasattr(v, "isoformat"):  # pandas Timestamp
        return _norm_cell(v.to_pydatetime()) if hasattr(v, "to_pydatetime") else v.isoformat()
    try:  # float('nan') inside object columns
        if isinstance(v, float) and math.isnan(v):
            return None
    except TypeError:
        pass
    return v


def _rows_to_normed(columns: list[str], rows) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(_norm_cell(row[i]) for i in order) for row in rows),
        key=repr,
    )


def spark_rows(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    data = [tuple(r) for r in df.collect()]
    return cols, _rows_to_normed(cols, data)


def duck_rows(sf_dir: str, sql: str) -> tuple[list[str], list[tuple]]:
    con = duck_connection(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        data = cur.fetchall()
    finally:
        con.close()
    return cols, _rows_to_normed(cols, data)


def _cells_equal(a, b, rel: float) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y, rel) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return rel > 0 and math.isclose(a, b, rel_tol=rel, abs_tol=rel)
    return a == b


def compare(df: DataFrame, sql: str, sf_dir: str, rel: float = 0.0) -> list[str]:
    """Compare Spark result against DuckDB oracle. Returns list of problems
    (empty ⇒ match). ``rel=0`` demands exact equality — the target, since
    the driver hash-compares values."""
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duck_rows(sf_dir, sql)
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not _cells_equal(sr, dr, rel):
            problems.append(f"row {i} differs:\n  spark={sr!r}\n  duck ={dr!r}")
            if len(problems) >= 4:
                problems.append("... (truncated)")
                break
    return problems
