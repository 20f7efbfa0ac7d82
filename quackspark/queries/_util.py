"""Shared helpers for the query corpus.

Determinism policy for the differential oracle (SURVEY.md §5): floating
aggregates are order-sensitive, and Spark's partial aggregation order
differs from DuckDB's — so every SUM/AVG over computed double terms is
routed through an order-independent exact path. Both sides of every
oracle pair use the same construction, so values hash-match at any
parallelism/scale. Two interchangeable modes:

- ``long`` (default): round the per-row term to integer micro-units
  (×10^6, HALF-AWAY rounding — identical in both engines for the same
  IEEE double), sum as BIGINT (fast whole-stage-codegen long adds),
  divide back. Bit-identical to the decimal path wherever it doesn't
  overflow; 2.6× faster on the q1-shaped aggregation at sf0.1 (1.43s →
  0.54s measured). Overflow envelope: total |micro-mass| per group must
  stay under 2^63 ≈ 9.2e18 — at lineitem magnitudes (≤1e6/row → ≤1e12
  micro-units/row) that is ~10^7 worst-case rows per group, comfortably
  past the benched scale factors.
- ``decimal``: cast per-row to DECIMAL(18,6), sum exactly, cast back —
  overflow-safe to DECIMAL(28,6) totals. Flip
  ``QUACKSPARK_EXACT_SUM=decimal`` (env, read at import) for runs whose
  per-group micro-mass can exceed the long envelope; both engines'
  expressions switch together, so parity is preserved either way.

Rounding policy: ``round(x, 6)`` is NOT engine-portable at exact .5
boundaries — Spark rounds the full binary expansion of the double
(BigDecimal), DuckDB rounds the scaled product — so a value like
75.2659375 whose double sits one ulp below the boundary rounds DOWN on
Spark and UP on DuckDB. Ratios of small integers (interpolation weights,
terminating decimals) hit this for real (dt_gapfill at sf0.001). Where
an expression can land on the boundary, use the explicit portable form
``floor(x * 1e6 + 0.5) / 1e6`` on BOTH sides — identical double op
sequence, identical result.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

from quackspark.session import load_table  # noqa: F401  (re-export)

DEC = "decimal(18,6)"
_SCALE = 1_000_000
EXACT_SUM_MODE = os.environ.get("QUACKSPARK_EXACT_SUM", "long")


def _col(expr: Column | str) -> Column:
    return F.col(expr) if isinstance(expr, str) else expr


def day_bound(df, ts_col: str, op: str, day: str) -> Column:
    """Day-boundary predicate on a timestamp column, augmented with a
    redundant SUPERSET predicate on the derived DATE twin column
    (``<ts_col>_d``, sources/derived.py) when the layout provides one.

    Spark's parquet pushdown cannot prune on TIMESTAMP_NTZ (no
    ParquetFilters support — measured: a pushed NTZ range over
    date-sorted row groups scans every row), so the exact timestamp
    comparison alone never reaches the zone maps. The date predicate is
    implied by the timestamp one for EVERY input (ts >= midnight(d) ⟹
    date(ts) >= d; ts < midnight(d) ⟹ date(ts) < d; ts <= midnight(d)
    ⟹ date(ts) <= d; ts > midnight(d) ⟹ date(ts) >= d; equality maps
    to equality), so ANDing it changes no results while the INT32 date
    stats drive row-group/page skipping — the reference's per-row-group
    min/max pruning (duckdb-internal.hpp:3999-4002) re-expressed on the
    engine-owned layout."""
    ts = F.col(ts_col)
    lit_ts = F.lit(day).cast("timestamp")
    exact = {
        ">=": ts >= lit_ts,
        ">": ts > lit_ts,
        "<": ts < lit_ts,
        "<=": ts <= lit_ts,
        "=": ts == lit_ts,
    }[op]
    dcol = f"{ts_col}_d"
    if dcol not in df.columns:
        return exact
    dc = F.col(dcol)
    lit_d = F.lit(day).cast("date")
    coarse = {
        ">=": dc >= lit_d,
        ">": dc >= lit_d,  # superset: same-day later times satisfy ts >
        "<": dc < lit_d,
        "<=": dc <= lit_d,
        "=": dc == lit_d,
    }[op]
    return coarse & exact


def dsum(expr: Column | str) -> Column:
    """Order-independent sum of a double expression (exact path; see
    module docstring for the long-vs-decimal trade)."""
    c = _col(expr)
    if EXACT_SUM_MODE == "decimal":
        return F.sum(c.cast(DEC)).cast("double")
    return F.sum(F.round(c * _SCALE).cast("long")) / F.lit(float(_SCALE))


def dsum_u(df, ucol: str, expr: Column | str) -> Column:
    """:func:`dsum` served from a materialized micro-unit long column when
    the derived storage layout provides one on ``df`` (sources/derived.py
    stores ``round(expr*1e6)::long`` at write time — the identical
    long-mode per-row term, so the result is bit-equal while the hot loop
    sums a stored BIGINT instead of multiplying + Round(BigDecimal) per
    row). Falls back to the query-time expression when the column is
    absent or decimal mode is forced."""
    if EXACT_SUM_MODE == "long" and ucol in df.columns:
        return F.sum(F.col(ucol)) / F.lit(float(_SCALE))
    return dsum(expr)


def dsum_u_when(df, ucol: str, cond: Column, expr: Column | str) -> Column:
    """:func:`dsum` of ``CASE WHEN cond THEN expr ELSE 0.0 END``, served
    from a materialized micro-unit column when available —
    ``round(CASE…*1e6)`` with a 0.0 else-branch equals
    ``CASE WHEN cond THEN stored_u ELSE 0 END`` exactly."""
    if EXACT_SUM_MODE == "long" and ucol in df.columns:
        return (
            F.sum(F.when(cond, F.col(ucol)).otherwise(F.lit(0)))
            / F.lit(float(_SCALE))
        )
    return dsum(F.when(cond, _col(expr)).otherwise(F.lit(0.0)))


def davg(expr: Column | str) -> Column:
    """Order-independent mean: exact sum / count, divided as double."""
    c = _col(expr)
    return dsum(c) / F.count(c)


def dsum_part(expr: Column | str) -> Column:
    """Partial accumulator of :func:`dsum` for two-level aggregation
    (r14): per-subgroup exact sums that :func:`dsum_merge` combines into
    a total BIT-IDENTICAL to a one-level ``dsum`` — both modes' partials
    are exact (BIGINT micro-units / DECIMAL), so addition is associative
    and the grouping split cannot change the result."""
    c = _col(expr)
    if EXACT_SUM_MODE == "decimal":
        return F.sum(c.cast(DEC))
    return F.sum(F.round(c * _SCALE).cast("long"))


def dsum_merge(part: Column | str) -> Column:
    """Combine :func:`dsum_part` partials into the :func:`dsum` total."""
    c = _col(part)
    if EXACT_SUM_MODE == "decimal":
        return F.sum(c).cast("double")
    return F.sum(c) / F.lit(float(_SCALE))


def davg_merge(part: Column | str, cnt: Column | str) -> Column:
    """:func:`davg` from :func:`dsum_part` partials and per-subgroup
    non-null counts: (exact total) / (total count) — the identical
    division :func:`davg` performs."""
    return dsum_merge(part) / F.sum(_col(cnt))


def o_dsum(term: str) -> str:
    """Oracle-side SQL matching :func:`dsum`."""
    if EXACT_SUM_MODE == "decimal":
        return f"CAST(sum(CAST({term} AS DECIMAL(18,6))) AS DOUBLE)"
    return f"(CAST(sum(CAST(round(({term}) * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE})"


def o_davg(term: str) -> str:
    """Oracle-side SQL matching :func:`davg`."""
    return f"{o_dsum(term)} / count({term})"


def parallelize_kernel_input(df):
    """Rebalance a DataFrame ahead of a compute-heavy Arrow-kernel stage
    when — and only when — the upstream scan is coarser than the cluster:
    a small parquet file arrives as 1-2 partitions, which would serialize
    the per-row Python kernel on one task while every other core idles
    (measured: text_fingerprint at sf1 is one 5.5 MB file → 1 task →
    4.1 s of a 0.07 s-parallel kernel).

    At 100 TB the scan already has thousands of splits, the condition is
    false, and NO shuffle is added — this is a small-input rescue, not a
    pipeline stage. Round-robin repartition is safe here because every
    kernel this guards is per-row (order-free) and downstream consumers
    re-sort or re-aggregate."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 32):
        return df.repartition(min(target, 32))
    return df
