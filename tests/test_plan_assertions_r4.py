"""Round-4 plan-shape assertions: the new operators must have the plans
SCALE.md claims — broadcast model/metadata sides, no stray shuffles, the
kernel stages map-only — plus a randomized differential pin of the
TIME_TZ carrier's total order against native TIMETZ.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_negative_sampling_broadcasts_count_and_joins_once(spark):
    from quackspark.queries.pipeline import pipeline_negative_sampling

    plan = _plan(pipeline_negative_sampling(spark, SF))
    # corpus count rides a broadcast nested loop (1-row side); the
    # negatives fetch is the ONE real join
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_hashed_classifier_weights_broadcast(spark):
    from quackspark.queries.textops import text_hashed_classifier

    plan = _plan(text_hashed_classifier(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zorder_key_is_pure_codegen(spark):
    from quackspark.queries.misc import misc_zorder_layout

    plan = _plan(misc_zorder_layout(spark, SF))
    assert "ArrowEvalPython" not in plan  # no UDF — shift/mask expressions
    assert "BatchEvalPython" not in plan
    # one exchange total (tree node): the presentation sort
    assert plan.count("Exchange (") == 1
    assert "PushedFilters: [IsNotNull(c_custkey), LessThanOrEqual" in plan


def test_neardup_wide_path_has_no_extra_shuffle_stage(spark):
    """The adaptive banding swaps the key source (packed BIGINT → kernel
    array) but must not change the join topology: band self-join, dedup
    aggregation, nothing else."""
    from quackspark.operators import simsearch as S
    from quackspark.queries._util import load_table

    emb = load_table(spark, SF, "embeddings")
    wide = S._banded(emb, "embedding", "vec_id", "e", wide=True, band_bits=8)
    plan = _plan(wide)
    # the signature stage is localCheckpointed (lineage cut), so the
    # visible plan is the explode over the checkpointed blocks — the
    # invariant that matters: banding adds NO exchange of its own
    assert "Exchange" not in plan
    # and the kernel itself is the map-only Arrow stage pre-checkpoint
    kernel_plan = _plan(
        emb.select(S.srp_band_keys_arrow(F.col("embedding"), band_bits=8))
    )
    assert "ArrowEvalPython" in kernel_plan
    assert "Exchange" not in kernel_plan


def test_time_tz_sort_key_matches_native_timetz_order(spark):
    """Randomized differential: 300 (micros, offset) pairs sorted by the
    carrier key must come back in exactly the order DuckDB sorts the
    equivalent native TIMETZ values."""
    rng = random.Random(20260814)
    rows = []
    for i in range(300):
        micros = rng.randrange(0, 86_400_000_000)
        off = rng.choice([-57599, -7200, -3600, 0, 1800, 3600, 19800, 57599])
        # force ties on micros so the offset-DESC tiebreak is exercised
        if i % 7 == 0 and rows:
            micros = rows[-1][1]
        rows.append((i, micros, off))

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, micros BIGINT, offset_s INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = [
        r[0]
        for r in con.execute("""
            SELECT id FROM t
            ORDER BY (CAST(TIMESTAMP '1970-01-01' + to_microseconds(micros)
                           AS TIME) ||
                      printf('%s%02d:%02d:%02d',
                             CASE WHEN offset_s < 0 THEN '-' ELSE '+' END,
                             abs(offset_s) // 3600,
                             abs(offset_s) % 3600 // 60,
                             abs(offset_s) % 60))::TIMETZ, id
        """).fetchall()
    ]

    from quackspark.functions import compat

    df = spark.createDataFrame(rows, "id int, micros long, offset_s int")
    ttz = compat.make_time_tz(F.col("micros"), F.col("offset_s"))
    got = [
        r[0]
        for r in df.orderBy(compat.time_tz_sort_key(ttz), "id")
        .select("id")
        .collect()
    ]
    assert got == want
