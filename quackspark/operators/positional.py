"""POSITIONAL join (reference duckdb-4.cpp:16) — scalable global row
numbering.

The naive translation (`row_number() OVER (ORDER BY key)` with no
PARTITION BY) funnels the whole relation through ONE task — the
scale-killer VERDICT r1 flagged. The distributed form used here is the
classic three-step global enumerate:

1. range-sort by the ordering key (parallel, AQE-sized partitions) —
   partition *i*'s rows all precede partition *i+1*'s;
2. per-partition `row_number` keyed by `spark_partition_id()` (parallel
   windows, no global funnel);
3. add each partition's start offset — a numPartitions-row metadata
   table (collected driver-side like AQE's own stats, then rejoined via
   broadcast).

Every step is JVM-side; cost is one range-sort shuffle per relation —
the same price the reference pays to physically order the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_position(
    df: DataFrame, order_by: list[Column | str], pos_col: str = "pos"
) -> DataFrame:
    """Append 1-based global ``pos`` following ``order_by`` order."""
    # localCheckpoint pins the range-sort partitioning so the counts
    # collect and the broadcast join replay identical partition
    # assignments even under task retry / speculative execution (see
    # operators/packing.with_global_cumsum for the full argument).
    sdf = (
        df.orderBy(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    local = sdf.withColumn("__rn", F.row_number().over(w))
    counts = sorted(
        local.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for row in counts:
        offsets.append((row["__pid"], acc))
        acc += row["n"]
    spark = df.sparkSession
    off = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    return (
        local.join(F.broadcast(off), "__pid")
        .withColumn(pos_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[Column | str],
    right_order: list[Column | str],
) -> DataFrame:
    """Row-by-row alignment of two ordered relations (inner on position —
    the reference pads the shorter side with NULLs only in FULL mode)."""
    l = with_global_position(left, left_order)
    r = with_global_position(right, right_order)
    return l.join(r, "pos")
