"""as-of / band join operators: paths not covered by the parity corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackspark.oracle import compare
from quackspark.operators.asofjoin import asof_join
from quackspark.operators.rangejoin import band_join
from quackspark.session import load_table

SF = "/root/testdata/sf0.01"


def test_band_join_with_extra_keys(spark):
    """Per-user band join: extra equi keys fold into the bucket shuffle key."""
    e = load_table(spark, SF, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("err_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("err_us"),
    )
    clk = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("click_us"),
    )
    pairs = band_join(
        err, clk, "err_us", "click_us", 3_600_000_000, extra_keys=["user_id"]
    ).select("user_id", "err_id", "click_id")
    problems = compare(
        pairs,
        """
        SELECT a.user_id, a.event_id AS err_id, b.event_id AS click_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND abs(epoch_us(CAST(a.ts AS TIMESTAMP))
                 - epoch_us(CAST(b.ts AS TIMESTAMP))) <= 3600000000
        WHERE a.event_type = 'error' AND b.event_type = 'click'
        """,
        SF,
    )
    assert not problems, problems


def test_asof_unmatched_left_rows_are_null(spark):
    """Left rows before any right row keep NULL right columns (outer-ish)."""
    left = spark.createDataFrame(
        [(1, 10), (1, 100), (2, 5)], "k int, t int"
    )
    right = spark.createDataFrame([(1, 50, "a"), (2, 500, "b")], "k int, t int, v string")
    out = asof_join(left, right, on="t", by="k").orderBy("k", "t").collect()
    assert [(r["k"], r["t"], r["r_t"], r["r_v"]) for r in out] == [
        (1, 10, None, None),
        (1, 100, 50, "a"),
        (2, 5, None, None),
    ]


def test_asof_tiebreaker_picks_last_right_row(spark):
    """Two right rows at the same instant: highest tiebreaker wins backward."""
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, 7, "lo"), (1, 10, 9, "hi")], "k int, t int, seq long, v string"
    )
    out = asof_join(left, right, on="t", by="k", tiebreaker="seq").collect()
    assert out[0]["r_v"] == "hi" and out[0]["r_seq"] == 9


def test_asof_and_band_match_bruteforce_on_random_data(spark):
    """Randomized check (fixed seed): the optimized operators must agree
    with the brute-force all-pairs definition of their semantics."""
    import random

    rng = random.Random(99)
    left = [(rng.randint(0, 4), rng.randint(0, 1000), i) for i in range(120)]
    right = [
        (rng.randint(0, 4), rng.randint(0, 1000), 1000 + i, rng.random())
        for i in range(80)
    ]
    L = spark.createDataFrame(left, "k int, t int, lid int")
    R = spark.createDataFrame(right, "k int, t int, rid int, v double")

    got = {
        (r["lid"], r["r_rid"])
        for r in asof_join(L, R, on="t", by="k", tiebreaker="rid").collect()
    }
    want = set()
    for k, t, lid in left:
        cands = [(rk, rt, rid) for rk, rt, rid, _ in right if rk == k and rt <= t]
        best = max(cands, key=lambda c: (c[1], c[2]), default=None)
        want.add((lid, best[2] if best else None))
    assert got == want

    band = 50
    gotb = {
        (r["lid"], r["rid"])
        for r in band_join(
            L.select("lid", F.col("t").alias("lt")),
            R.select("rid", F.col("t").alias("rt")),
            "lt",
            "rt",
            band,
        ).collect()
    }
    wantb = {
        (lid, rid)
        for _, lt, lid in left
        for _, rt, rid, _ in right
        if abs(lt - rt) <= band
    }
    assert gotb == wantb


def test_limit_percent_plan_is_take_ordered(spark):
    """VERDICT r1 #2: LIMIT PERCENT must plan as TakeOrderedAndProject
    (per-partition heaps), not a single-partition global window."""
    from quackspark.queries.maths import misc_limit_percent

    df = misc_limit_percent(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_positional_join_distributed(spark):
    """VERDICT r1 "What's wrong" #3: positional join must not funnel
    through a single-partition window. operators/positional.py enumerates
    via range-sort + per-partition row_number + offset join."""
    from quackspark.operators.positional import with_global_position
    from quackspark.session import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    pos = with_global_position(li, [F.col("l_orderkey"), F.col("l_linenumber")])
    plan = pos._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    n = li.count()
    stats = pos.agg(
        F.min("pos").alias("mn"),
        F.max("pos").alias("mx"),
        F.count_distinct("pos").alias("nd"),
    ).collect()[0]
    assert (stats.mn, stats.mx, stats.nd) == (1, n, n)
    # positions follow the requested order
    head = pos.orderBy("pos").limit(5).collect()
    want = li.orderBy("l_orderkey", "l_linenumber").limit(5).collect()
    assert [(r.l_orderkey, r.l_linenumber) for r in head] == [
        (r.l_orderkey, r.l_linenumber) for r in want
    ]


def test_pack_sequences_distributed(spark):
    """Sequence packing's prefix sum must use the distributed enumerate
    (per-partition window keyed by spark_partition_id + broadcast offsets),
    never a single-partition global window — and the assignment must be a
    correct exclusive cumsum (verified against a driver-side replay)."""
    from quackspark.operators.packing import pack_sequences
    from quackspark.session import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    counted = d.select(
        "doc_id", (F.col("doc_id") % 7 + 1).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(counted, "n_tokens", "doc_id", 50)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    rows = sorted(
        (r["doc_id"], r["n_tokens"], r["pack_id"], r["offset_in_pack"])
        for r in packed.collect()
    )
    acc = 0
    for doc_id, n, pack_id, off in rows:
        assert pack_id == acc // 50 and off == acc % 50, (doc_id, acc)
        acc += n
