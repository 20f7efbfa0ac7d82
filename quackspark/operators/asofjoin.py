"""As-of (temporal) join — a custom operator the reference lacks natively
(DuckDB v0.7 has no ASOF JOIN; users express it as a correlated
max-subquery, which is exactly our differential oracle's form). Spark also
lacks it, so this is a north-star pipeline operator built from primitives.

Algorithm (the scalable union-sort form, same idea as pandas merge_asof
generalized to a distributed sort): tag right rows 0 and left rows 1,
union on (by, on, tag), then one window pass per partition carries the
most recent right payload forward (`last(..., ignorenulls=True)` over
rows UNBOUNDED PRECEDING..CURRENT). Left rows then hold their backward
match; ties at equal `on` sort the right row first, so equal timestamps
match (inclusive), and a right-side tiebreaker keeps the carried payload
deterministic when two right rows share (by, on).

Scale: one shuffle + sort of each input keyed by `by` — the same cost as
a single sort-merge join; no range explosion, no per-row subquery. Skewed
`by` keys are AQE-splittable only at the exchange, so extremely hot keys
should be pre-salted by the caller (each salt lane still gets a correct
backward match only within its lane — document-level salting applies when
the right side is replicated per lane).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
    tiebreaker: str | None = None,
) -> DataFrame:
    """For each left row, attach the closest right row at-or-before
    (``backward``) or at-or-after (``forward``) its ``on`` value, matching
    within ``by`` groups. Right columns are prefixed with ``right_prefix``
    (the ``on``/``by`` columns keep one copy from the left). ``tiebreaker``
    names a right column ordering simultaneous right rows (last one wins
    for backward, first for forward); defaults to the ``on`` column only.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by = [by] if isinstance(by, str) else list(by or [])
    keys = by + [on]
    lpay_cols = [c for c in left.columns]
    rpay_cols = [c for c in right.columns if c not in by]  # keep `on` in payload

    lrows = left.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lpay_cols]).alias("__lpay"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in rpay_cols]).alias("s")
            ).schema["s"].dataType
        ).alias("__rpay"),
    )
    rrows = right.select(
        *[F.col(k) for k in keys],
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in lpay_cols]).alias("s")
            ).schema["s"].dataType
        ).alias("__lpay"),
        (F.col(tiebreaker) if tiebreaker else F.lit(0)).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in rpay_cols]).alias("__rpay"),
    )
    merged = lrows.unionByName(rrows)

    if direction == "backward":
        order = [F.col(on).asc(), F.col("__side").asc(), F.col("__tb").asc()]
    else:
        order = [F.col(on).desc(), F.col("__side").asc(), F.col("__tb").desc()]
    w = (
        Window.partitionBy(*[F.col(k) for k in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: Column = F.last("__rpay", ignorenulls=True).over(w)

    matched = (
        merged.withColumn("__match", carried)
        .filter(F.col("__side") == 1)
        .select(
            *[F.col(f"__lpay.{c}").alias(c) for c in lpay_cols],
            *[
                F.col(f"__match.{c}").alias(f"{right_prefix}{c}")
                for c in rpay_cols
            ],
        )
    )
    return matched
