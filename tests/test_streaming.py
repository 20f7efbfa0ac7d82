"""Structured Streaming equivalence: the same logical window
transformations must produce identical results in batch mode and as a
real stream (availableNow micro-batches → memory sink). This is the
metamorphic-verifier idea of the reference (ClientContext::VerifyQuery,
duckdb-7.cpp:2891-2990) applied across execution modes.
"""

from __future__ import annotations

import pytest

from quackspark.queries._util import load_table
from quackspark.streaming import engine as E

SF = "/root/testdata/sf0.001"


def _rows(df, order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


@pytest.mark.parametrize(
    "name,transform,order",
    [
        ("t_tumbling", E.tumbling_counts, ["w_start", "event_type"]),
        ("t_sliding", E.sliding_counts, ["w_start"]),
        ("t_session", E.session_windows, ["user_id", "s_start"]),
    ],
)
def test_stream_equals_batch(spark, name, transform, order):
    batch = transform(load_table(spark, SF, "events"))
    stream = transform(E.stream_events(spark, SF))
    got = E.run_to_memory(stream, name)
    assert _rows(got, order) == _rows(batch, order)


def test_stateful_running_user_stats(spark):
    stream = E.running_user_stats(E.stream_events(spark, SF))
    got = E.run_to_memory(stream, "t_state")
    # final state per user must equal the batch aggregate
    import pyspark.sql.functions as F

    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.sum("value").alias("value_sum"),
            F.max("value").alias("max_value"),
        )
    )
    # memory sink in update mode keeps the last emit per key per batch;
    # with availableNow single-batch input, that IS the final state.
    g = {r["user_id"]: r for r in got.collect()}
    for r in batch.collect():
        s = g[r["user_id"]]
        assert s["events_seen"] == r["events_seen"]
        assert abs(s["value_sum"] - r["value_sum"]) < 1e-6
        assert s["max_value"] == r["max_value"]


def test_streaming_dedup(spark):
    # duplicate the stream by unioning it with itself: dedup must halve it
    batch = load_table(spark, SF, "events")
    n = batch.count()
    doubled = E.stream_events(spark, SF)
    doubled = doubled.union(doubled)
    got = E.run_to_memory(
        E.streaming_dedup(doubled, ["event_id"]).groupBy().count(), "t_dedup"
    )
    assert got.collect()[0][0] == n


def test_stream_stream_join(spark):
    """Watermarked stream-stream self-join: click-like events joined to
    purchase-like events for the same user within ±5 minutes."""
    import pyspark.sql.functions as F

    ev = E.stream_events(spark, SF)
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("a_ts")
    )
    b = E.stream_events(spark, SF).filter(
        F.col("event_type") == "purchase"
    ).select(F.col("user_id").alias("u2"), F.col("ts").alias("b_ts"))
    joined = a.join(
        b,
        F.expr(
            "u = u2 AND b_ts BETWEEN a_ts - INTERVAL 5 MINUTES "
            "AND a_ts + INTERVAL 5 MINUTES"
        ),
    )
    got = E.run_to_memory(joined, "t_ssj", output_mode="append")
    # batch equivalent
    bat = load_table(spark, SF, "events")
    ba = bat.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("a_ts")
    )
    bb = bat.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("b_ts")
    )
    bj = ba.join(
        bb,
        F.expr(
            "u = u2 AND b_ts BETWEEN a_ts - INTERVAL 5 MINUTES "
            "AND a_ts + INTERVAL 5 MINUTES"
        ),
    )
    assert got.count() == bj.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, bj.collect()))


def test_stream_stream_join_engine_inner(spark):
    """engine.stream_stream_join (r5): the inner join over a MULTI-batch
    stream (4 time-ordered files, watermark advancing between batches)
    equals the batch twin exactly."""
    import pyspark.sql.functions as F

    ev = E.stream_events_multi(spark, SF)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = E.stream_events_multi(spark, SF).filter(
        F.col("event_type") == "purchase"
    )
    got = E.run_to_memory(
        E.stream_stream_join(clicks, purchases, "inner"),
        "t_ssj_inner",
        output_mode="append",
    )
    bat = load_table(spark, SF, "events")
    exp = E.stream_stream_join(
        bat.filter(F.col("event_type") == "click"),
        bat.filter(F.col("event_type") == "purchase"),
        "inner",
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_stream_stream_join_engine_left(spark):
    """LEFT stream-stream join: matched rows equal the batch inner join;
    NULL-extended rows emit once the watermark passes their horizon —
    every click older than (max ts − delay − range) MUST have emitted,
    clicks younger than that may still be buffered at availableNow
    termination. Stream output is always a subset of the batch twin."""
    import datetime

    import pyspark.sql.functions as F

    ev = E.stream_events_multi(spark, SF)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = E.stream_events_multi(spark, SF).filter(
        F.col("event_type") == "purchase"
    )
    got = E.run_to_memory(
        E.stream_stream_join(clicks, purchases, "left"),
        "t_ssj_left",
        output_mode="append",
    )
    bat = load_table(spark, SF, "events")
    exp = E.stream_stream_join(
        bat.filter(F.col("event_type") == "click"),
        bat.filter(F.col("event_type") == "purchase"),
        "left",
    )
    got_rows = set(map(tuple, got.collect()))
    exp_rows = set(map(tuple, exp.collect()))
    assert got_rows <= exp_rows, "stream emitted a row batch never would"
    # matched portion is complete and exact
    assert {r for r in got_rows if r[4] is not None} == {
        r for r in exp_rows if r[4] is not None
    }
    # NULL-extension completeness behind the watermark horizon. The
    # final watermark the query reaches is max-ts-of-the-PENULTIMATE
    # file − 10 min delay (the watermark computed after batch k only
    # applies during batch k+1, so the last file's own max never becomes
    # a watermark under availableNow); a buffered click evicts when
    # l_ts + 10 min range < watermark.
    ts_sorted = [r[0] for r in bat.select("ts").orderBy("ts").collect()]
    n = len(ts_sorted)
    step = (n + 3) // 4  # mirror stream_events_multi's 4-way slicing
    wm_base = ts_sorted[min(3 * step, n) - 1]
    cutoff = wm_base - datetime.timedelta(minutes=25)  # delay+range+slack
    missing = exp_rows - got_rows
    assert all(r[4] is None for r in missing), "matched rows must all emit"
    assert all(r[2] > cutoff for r in missing), (
        f"unemitted rows not explained by the watermark horizon: "
        f"{[r for r in missing if not r[2] > cutoff][:5]}"
    )
    # and the horizon actually did its job: some NULL-extended rows emitted
    assert any(r[4] is None for r in got_rows)


def test_stream_static_enrichment_join(spark):
    """Stream-static broadcast join: per-segment counts equal batch."""
    import pyspark.sql.functions as F

    dim = load_table(spark, SF, "customer").select(
        (F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment"
    ).filter(F.col("user_id") < 150)
    enriched = E.enrich_with_static(
        E.stream_events(spark, SF), dim, on="user_id"
    ).groupBy("c_mktsegment").count()
    got = E.run_to_memory(enriched, "t_enrich")
    batch = (
        load_table(spark, SF, "events")
        .join(dim, "user_id")
        .groupBy("c_mktsegment")
        .count()
    )
    assert _rows(got, ["c_mktsegment"]) == _rows(batch, ["c_mktsegment"])


def test_incremental_micro_batches(spark, tmp_path):
    """True incremental processing: the events table split into 4 parquet
    slices, streamed with maxFilesPerTrigger=1 → 4 real micro-batches with
    state carried across them. The windowed aggregate in complete mode
    must equal the batch aggregate over the union — exercising watermark
    state across batches, which the single-file availableNow path never
    does."""
    import pyspark.sql.functions as F

    batch = load_table(spark, SF, "events")
    src_dir = str(tmp_path / "slices")
    # deterministic 4-way slice by event_id; one file per slice
    for i in range(4):
        batch.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", "10 minutes")
    )
    got = E.run_to_memory(E.tumbling_counts(stream), "t_incr")
    want = E.tumbling_counts(batch)
    assert _rows(got, ["w_start", "event_type"]) == _rows(
        want, ["w_start", "event_type"]
    )


@pytest.mark.parametrize(
    "name,transform",
    [
        ("source", lambda df: df),
        ("tumbling", E.tumbling_counts),
        ("sliding", E.sliding_counts),
        ("session", E.session_windows),
        ("dedup", lambda df: E.streaming_dedup(df, ["event_id"])),
    ],
)
def test_stream_batch_schema_contract(spark, name, transform):
    """The stream and batch sides of every streaming query must agree on
    *schema*, not just rows — when the driver regenerated events.ts as
    timestamp[us] NTZ, the old hardcoded nanos schema silently produced
    1970 dates and one test failed via a wrong join instead of loudly
    (VERDICT r2 item 9). Analysis-only: no execution."""
    batch = transform(load_table(spark, SF, "events"))
    stream = transform(E.stream_events(spark, SF))
    # nullability differs benignly between a parquet batch scan and a
    # file-stream source; the contract is column names + data types
    s_shape = [(f.name, f.dataType) for f in stream.schema.fields]
    b_shape = [(f.name, f.dataType) for f in batch.schema.fields]
    assert s_shape == b_shape, (
        f"{name}: stream schema {stream.schema.simpleString()} != "
        f"batch schema {batch.schema.simpleString()}"
    )


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch arbitrary sink: per-batch parquet appends hold every row."""
    out = str(tmp_path / "sink")
    seen = []

    def sink(df, epoch_id):
        seen.append(epoch_id)
        df.write.mode("append").parquet(out)

    E.run_foreach_batch(E.stream_events(spark, SF), sink)
    n = load_table(spark, SF, "events").count()
    assert len(seen) >= 1
    assert spark.read.parquet(out).count() == n


def test_stream_append_versioned_exactly_once(spark, tmp_path):
    """r6: streaming sink into a commit-log table. 4 micro-batches → one
    create + 3 txn-stamped appends; readback == source; a REPLAYED batch
    (the crash-between-commit-and-checkpoint case) is skipped via
    last_txn_version; a restart with the same checkpoint adds nothing."""
    stream = E.stream_events_multi(spark, SF).select(
        "event_id", "user_id", "event_type", "value"
    )
    path, ckpt = str(tmp_path / "vt"), str(tmp_path / "ckpt")
    table = E.stream_append_versioned(stream, path, "app1", ckpt)
    versions = table._versions()
    assert versions == [0, 1, 2, 3]
    n_src = load_table(spark, SF, "events").count()
    assert table.snapshot().read(spark).count() == n_src
    assert table.last_txn_version("app1") == 3

    # crash-replay simulation: re-delivering an already-committed batch id
    # must be a no-op (this is exactly what foreachBatch re-runs after a
    # failure between the table commit and the checkpoint write)
    replay = load_table(spark, SF, "events").limit(7).select(
        "event_id", "user_id", "event_type", "value"
    )
    from quackspark.sources.commitlog import VersionedTable

    t2 = VersionedTable(path)
    E.versioned_batch_sink(t2, "app1")(replay, 3)  # re-delivered batch 3
    assert t2._versions() == [0, 1, 2, 3]
    assert t2.snapshot().read(spark).count() == n_src

    # restart with the same checkpoint: no new files → no new batches
    table = E.stream_append_versioned(stream, path, "app1", ckpt)
    assert table._versions() == [0, 1, 2, 3]
    assert table.snapshot().read(spark).count() == n_src

    # a DIFFERENT writer app appends freely (optimistic concurrency)
    t2.append(replay, txn={"app": "other", "version": 0})
    assert t2.snapshot().read(spark).count() == n_src + 7
    assert t2.last_txn_version("app1") == 3
    assert t2.last_txn_version("other") == 0


def test_stream_stream_join_engine_right_and_full(spark):
    """RIGHT and FULL OUTER stream-stream joins (r6 completes the outer
    family): the matched portion equals the batch twin exactly; NULL-
    extended rows are a subset of the batch result (unmatched rows still
    inside the watermark horizon may be buffered at availableNow
    termination — same contract the LEFT test pins in detail)."""
    import pyspark.sql.functions as F

    bat = load_table(spark, SF, "events")
    for how, sink in (("right", "t_ssj_right"), ("full_outer", "t_ssj_full")):
        clicks = E.stream_events_multi(spark, SF).filter(
            F.col("event_type") == "click"
        )
        purchases = E.stream_events_multi(spark, SF).filter(
            F.col("event_type") == "purchase"
        )
        got = E.run_to_memory(
            E.stream_stream_join(clicks, purchases, how),
            sink,
            output_mode="append",
        )
        exp = E.stream_stream_join(
            bat.filter(F.col("event_type") == "click"),
            bat.filter(F.col("event_type") == "purchase"),
            how,
        )
        got_rows = set(map(tuple, got.collect()))
        exp_rows = set(map(tuple, exp.collect()))
        assert got_rows <= exp_rows, f"{how}: stream emitted a row batch never would"
        # matched rows (both sides present) are complete and exact
        matched = lambda rows: {r for r in rows if r[1] is not None and r[4] is not None}
        assert matched(got_rows) == matched(exp_rows), how


def test_watermark_late_data_eviction(spark, tmp_path):
    """Late-data differential (VERDICT r6 directive 8): rows arriving
    beyond the watermark are dropped from finalized append-mode windows,
    the drop persists across an availableNow RESTART on the same
    checkpoint, and an all-late file delivered after the watermark
    advanced appends nothing."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "wm_ckpt")
    os.makedirs(src)

    _seq = [0]

    def write_file(name, rows):
        # one flat FILE per delivery (the streaming source lists leaf
        # files oldest-first; mtime is forced so delivery order is the
        # write order)
        import glob as _glob
        import shutil

        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{name}.parquet")
        shutil.move(part, dst)
        _seq[0] += 1
        t = 1_700_000_000 + _seq[0] * 60
        os.utime(dst, (t, t))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # file A: window [0,10) plus a row at 60 ⇒ next-batch watermark 50
    write_file("a", [(1, ts(1), 1.0), (2, ts(5), 1.0), (3, ts(60), 1.0)])
    # file B: on-time row — its batch runs with watermark 50, which
    # FINALIZES (emits + evicts) window [0,10)
    write_file("b", [(4, ts(61), 1.0)])

    schema = "event_id long, ts timestamp, value double"

    def run(name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("w_start"), "n")
        )
        # foreachBatch (checkpoint-recoverable, unlike the memory sink)
        # collecting THIS run's append-mode emissions only
        emitted: list = []

        def capture(batch_df, batch_id):
            emitted.extend(
                (r["w_start"], r["n"]) for r in batch_df.collect()
            )

        q = (
            stream.writeStream.foreachBatch(capture)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return dict(emitted)

    got = run("wm_run1")
    # [0,10) finalized with exactly its 2 rows; open windows unemitted
    assert got == {ts(0): 2}

    # restart on the same checkpoint with an ALL-LATE file: row 6 targets
    # the finalized-and-evicted [0,10), row 7 a never-seen window whose
    # end (00:50) is already <= the checkpointed watermark (00:51) — both
    # must be dropped, and NOTHING may be (re-)emitted: append mode's
    # no-duplicate contract across availableNow restarts
    write_file("c", [(6, ts(3), 1.0), (7, ts(41), 1.0)])
    got2 = run("wm_run2")
    assert got2 == {}


def test_versioned_sink_crash_between_files_and_commit(spark, tmp_path):
    """Exactly-once under a crash INSIDE the sink (VERDICT r6 directive
    8): kill between the data-file write and the commit claim — the table
    must be unchanged (orphan bytes, no torn commit), and re-delivering
    the same batch id must land exactly once."""
    import pytest as _pytest

    from quackspark.sources.commitlog import VersionedTable

    stream = E.stream_events_multi(spark, SF).select(
        "event_id", "user_id", "event_type", "value"
    )
    path, ckpt = str(tmp_path / "vt2"), str(tmp_path / "ckpt2")
    table = E.stream_append_versioned(stream, path, "appX", ckpt)
    versions0 = table._versions()
    n0 = table.snapshot().read(spark).count()

    batch = load_table(spark, SF, "events").limit(5).select(
        "event_id", "user_id", "event_type", "value"
    )
    t2 = VersionedTable(path)
    sink = E.versioned_batch_sink(t2, "appX")
    next_id = max(versions0) + 1

    # crash between _write_files and the commit claim
    real_claim = VersionedTable._claim

    def dying_claim(self, version, commit):
        raise RuntimeError("killed before commit")

    VersionedTable._claim = dying_claim
    try:
        with _pytest.raises(RuntimeError, match="killed before commit"):
            sink(batch, next_id)
    finally:
        VersionedTable._claim = real_claim

    # torn write: no new version, snapshot unchanged (orphans only)
    assert t2._versions() == versions0
    assert t2.snapshot().read(spark).count() == n0
    assert t2.last_txn_version("appX") == max(versions0)

    # re-delivery after the crash lands EXACTLY once …
    sink(batch, next_id)
    assert t2._versions() == versions0 + [next_id]
    assert t2.snapshot().read(spark).count() == n0 + 5
    # … and a second re-delivery of the same batch id is a no-op
    sink(batch, next_id)
    assert t2._versions() == versions0 + [next_id]
    assert t2.snapshot().read(spark).count() == n0 + 5
    # vacuum reclaims the crash's orphaned files without touching live
    # data (grace 0: this test KNOWS no writer is in flight — the default
    # grace would rightly defer these seconds-old orphans)
    removed = t2.vacuum(orphan_grace_s=0.0)
    assert removed, "crash must have left orphan files for vacuum"
    assert t2.snapshot().read(spark).count() == n0 + 5
