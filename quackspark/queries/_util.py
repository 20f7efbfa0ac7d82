"""Shared helpers for the query corpus.

Determinism policy for the differential oracle (SURVEY.md §5): floating
aggregates are order-sensitive, and Spark's partial aggregation order
differs from DuckDB's — so every SUM/AVG over computed double terms is
routed through DECIMAL: cast the per-row term to DECIMAL(18,6) (identical
rounding of the same IEEE double in both engines), sum exactly in decimal
(order-independent), cast the total back to DOUBLE. Both sides of every
oracle pair use the same construction, so values hash-match at any
parallelism/scale. Plain column sums whose values are dyadic-safe keep the
native double path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from quackspark.session import load_table  # noqa: F401  (re-export)

DEC = "decimal(18,6)"


def dsum(expr: Column | str) -> Column:
    """Order-independent sum of a double expression (exact decimal path)."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(DEC)).cast("double")


def davg(expr: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, divided as double."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def o_dsum(term: str) -> str:
    """Oracle-side SQL matching :func:`dsum`."""
    return f"CAST(sum(CAST({term} AS DECIMAL(18,6))) AS DOUBLE)"


def o_davg(term: str) -> str:
    """Oracle-side SQL matching :func:`davg`."""
    return f"CAST(sum(CAST({term} AS DECIMAL(18,6))) AS DOUBLE) / count({term})"
