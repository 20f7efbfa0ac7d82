"""Bucketed band join — the scale path for the reference's range-join
operators (PIECEWISE_MERGE_JOIN duckdb-3.cpp:17261 for one range predicate,
IE_JOIN duckdb-3.cpp:15445 for two). Spark answers a bare range predicate
with BroadcastNestedLoopJoin (fine when one side broadcasts) or a cartesian
— both collapse at 100 TB. When the predicate is a bounded band
``|l - r| <= band``, bucketing turns it into an EQUI join:

  bucket(left) = floor(l / band); each right row is replicated to the three
  buckets its matching window [r-band, r+band] can overlap. Equal-bucket
  pairs are then filtered by the exact predicate. Each qualifying pair
  meets in exactly one bucket (the left row's), so no dedup is needed.

Cost: one hash-shuffle of each side keyed by bucket with ≤3× replication
of the right side — versus the quadratic blow-up of a nested-loop range
join. This is the standard interval/band-join decomposition used by
distributed engines (e.g. Spark's own range-join hints in Databricks
runtime, Flink interval joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    band: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join rows where ``abs(left_on - right_on) <= band`` (numeric
    columns, e.g. µs-since-epoch longs). ``extra_keys`` are additional
    equi-join keys (e.g. a user id) folded into the shuffle key. Output has
    all left columns plus all right columns (caller ensures disjoint names
    beyond ``extra_keys``, which keep the left copy)."""
    if band <= 0:
        raise ValueError("band must be positive")
    extra_keys = list(extra_keys or [])
    lb = left.withColumn("__bucket", F.floor(F.col(left_on) / band))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((F.col(right_on) - band) / band),
                F.floor((F.col(right_on) + band) / band),
            )
        ),
    )
    cond = [lb["__bucket"] == rb["__bucket"]] + [
        lb[k] == rb[k] for k in extra_keys
    ]
    joined = lb.join(rb, cond, "inner").filter(
        F.abs(lb[left_on] - rb[right_on]) <= band
    )
    keep_right = [c for c in right.columns if c not in extra_keys]
    return joined.select(
        *[lb[c] for c in left.columns], *[rb[c] for c in keep_right]
    )
