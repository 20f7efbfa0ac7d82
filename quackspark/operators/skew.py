"""Skew mitigation: salted joins and two-phase salted aggregation.

Spark's first line of defense is AQE skew-join splitting
(spark.sql.adaptive.skewJoin, on in the session preset) — it re-splits
oversized SMJ partitions at runtime. Salting is the explicit fallback for
the cases AQE cannot fix: a single hot key probed against a non-broadcast
side, or a groupBy whose per-key state is too large for one reducer even
after partial aggregation (e.g. collect_list of a hot key).

`salted_join` replicates the SMALL side `salt`× (a bounded, broadcast-
friendly blowup) and sprays the big side's hot rows across `salt`
sub-partitions; results are row-identical to the plain join for any salt
value — the salt only changes the shuffle layout, never the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, spreading each big-side key over
    `salt` shuffle partitions. The small side is replicated `salt`× so
    every (key, salt) bucket still finds its match. Supported `how`:
    inner / left / left_semi / left_anti (the big side must be the
    preserved side — that is where the skew lives)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    on = [on] if isinstance(on, str) else list(on)
    spark = big.sparkSession
    b = big.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    s = small.crossJoin(
        F.broadcast(spark.range(salt).select(F.col("id").cast("int").alias("__salt")))
    )
    joined = b.join(s, on + ["__salt"], how)
    return joined.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str] | str,
    salt: int = 16,
    **aggs: tuple[str, str],
) -> DataFrame:
    """Two-phase aggregation for hot keys: phase 1 aggregates on
    (keys, salt) so no single reducer owns a hot key's full state; phase 2
    merges the per-salt partials. `aggs` maps output name → (function,
    column) with function ∈ {sum, count, min, max} (the distributive
    aggregates, which re-merge with sum/sum/min/max respectively)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    _MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    partial_exprs = []
    final_exprs = []
    for name, (fn, col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"unsupported aggregate {fn!r}")
        partial_exprs.append(getattr(F, fn)(col).alias(f"__p_{name}"))
        final_exprs.append(getattr(F, _MERGE[fn])(f"__p_{name}").alias(name))
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
