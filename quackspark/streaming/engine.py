"""Event-time streaming over the `events` table: tumbling / sliding /
session windows with watermarks, plus a custom stateful operator via
`applyInPandasWithState`.

Correctness contract: every windowed transformation here is the *same
logical plan* in batch and streaming mode — `F.window`/`F.session_window`
work on both — so tests run the stream with `trigger(availableNow=True)`
into a memory sink and assert equality with the batch result (and the
batch result is separately oracle-checked against DuckDB gaps-and-islands
SQL in queries/streamwin.py).

Scale posture: watermark bounds state; the shuffle key is (window, key);
`applyInPandasWithState` state is per-group and spills via the state
store — nothing driver-side.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _events_read_schema(sf_dir: str) -> tuple[StructType, str]:
    """Inspect the events parquet footer and return (explicit read schema,
    ts normalization kind) — streaming sources need an explicit schema, and
    the fixture's ts storage has changed across driver generations
    (timestamp[ns] → timestamp[us] NTZ), so dispatch on the file, exactly
    like session.load_table does for the batch path."""
    import pyarrow.parquet as pq

    t = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    if str(t) in ("int64", "timestamp[ns]"):
        ts_field, kind = StructField("ts", LongType()), "nanos"
    else:
        ts_field, kind = StructField("ts", TimestampNTZType()), "ntz"
    return (
        StructType(
            [
                StructField("event_id", LongType()),
                ts_field,
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        ),
        kind,
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (schema must be explicit for
    streaming sources; one file = one micro-batch under availableNow).

    The file-stream source requires a *directory*, and the fixture is a
    single file — stage a symlink directory (testdata stays read-only).
    ts is normalized to TimestampType (µs, UTC) whichever way the fixture
    stores it, so stream and batch sides always agree on schema."""
    src = os.path.join(sf_dir, "events.parquet")
    stage = os.path.join(
        tempfile.gettempdir(), f"qs_stream_{os.path.basename(sf_dir)}"
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    schema, kind = _events_read_schema(sf_dir)
    stream = spark.readStream.schema(schema).parquet(stage)
    if kind == "nanos":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # session timeZone is UTC → NTZ-to-LTZ cast is value-preserving
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream.withWatermark("ts", "10 minutes")


def tumbling_counts(events: DataFrame) -> DataFrame:
    """15-minute tumbling windows per event_type."""
    return (
        events.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event in 2 windows)."""
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows with a fixed inactivity gap: session end =
    last event + gap (Spark session_window semantics)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n",
            "total",
        )
    )


STATE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_TYPE = StructType(
    [
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-user
    event count / value sum / max — the streaming analog of the reference's
    aggregate state update/combine (duckdb.hpp:19029-19036)."""

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen, vsum, vmax = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        for pdf in pdfs:
            seen += len(pdf)
            vsum += float(pdf["value"].sum())
            vmax = max(vmax, float(pdf["value"].max()))
        state.update((seen, vsum, vmax))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "events_seen": [seen],
                "value_sum": [vsum],
                "max_value": [vmax],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STATE_OUTPUT,
        stateStructType=_STATE_TYPE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(events: DataFrame, keys: list[str]) -> DataFrame:
    """Streaming exact dedup: `dropDuplicates` under the watermark — state
    is bounded by the watermark horizon, the streaming form of the batch
    exact-dedup operator (operators/dedup.exact_dedup). At 100 TB/day this
    is the first stage of an ingest pipeline: duplicates never reach the
    sink, and state expires instead of accumulating."""
    return events.dropDuplicates(keys)


def enrich_with_static(stream: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static enrichment join: the static dimension is broadcast to
    every micro-batch executor, so the stream side never shuffles and no
    join state accumulates (unlike stream-stream joins). This is the
    standard dimension-lookup stage of an ingest pipeline; at 100 TB/day
    the static side is refreshed by re-planning the query, not by state."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_join(
    clicks: DataFrame, purchases: DataFrame, how: str = "inner"
) -> DataFrame:
    """Watermarked stream-stream join (inner/left): match each click to
    purchases by the same user within the following 10 minutes.

    Both sides carry their own watermark and the join condition bounds
    event time on BOTH sides (r_ts ∈ [l_ts, l_ts + 10 min]) — that range
    is what lets Structured Streaming evict join state: a buffered click
    older than watermark−10min can never match a future purchase and is
    dropped (emitting its NULL-extended row first in LEFT mode). Without
    the range the state grows unboundedly — the 100 TB/day failure mode.

    The same function runs unchanged on batch DataFrames (the batch twin
    sw_stream_stream_join* is oracle-checked against DuckDB); the
    stream==batch equivalence is pinned in tests/test_streaming.py."""
    l = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_id"),
        F.col("value").alias("l_value"),
    )
    r = purchases.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    if l.isStreaming:
        l = l.withWatermark("l_ts", "10 minutes")
        r = r.withWatermark("r_ts", "10 minutes")
    cond = (
        (F.col("user_id") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return l.join(r, cond, how).select(
        "user_id", "l_id", "l_ts", "l_value", "r_id", "r_ts"
    )


def stream_events_multi(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """readStream over the events fixture staged as ``n_files``
    time-ordered parquet splits — with ``maxFilesPerTrigger=1`` each split
    is one micro-batch, so the watermark actually ADVANCES between
    batches (a single-file stream never moves its watermark mid-query,
    which would keep stream-stream join state from evicting and LEFT-join
    NULL rows from emitting)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    stage = os.path.join(
        tempfile.gettempdir(),
        f"qs_stream_multi_{os.path.basename(sf_dir)}_{n_files}",
    )
    if not os.path.isdir(stage) or len(os.listdir(stage)) != n_files:
        os.makedirs(stage, exist_ok=True)
        tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        order = pa.compute.sort_indices(tbl, sort_keys=[("ts", "ascending")])
        tbl = tbl.take(order)
        step = (tbl.num_rows + n_files - 1) // n_files
        for i in range(n_files):
            pq.write_table(
                tbl.slice(i * step, step),
                os.path.join(stage, f"part-{i:03d}.parquet"),
            )
    schema, kind = _events_read_schema(sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(stage)
    )
    if kind == "nanos":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def run_foreach_batch(
    stream_df: DataFrame, sink: "callable", output_mode: str = "append"
) -> None:
    """Execute a stream with a foreachBatch sink (the arbitrary-sink slot —
    upserts, multi-table writes, external systems). `sink(df, epoch_id)` is
    called once per micro-batch with a *batch* DataFrame."""
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def versioned_batch_sink(table, app_id: str):
    """The idempotent foreachBatch body (factored out so tests can drive
    the crash-replay path directly): create on first batch, skip any
    batch id at or below the app's last committed txn version, else
    append with the txn stamp."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not table.exists():
            table.create(batch_df, txn={"app": app_id, "version": batch_id})
            return
        last = table.last_txn_version(app_id)
        if last is not None and batch_id <= last:
            return  # replayed after restart — this batch already landed
        table.append(batch_df, txn={"app": app_id, "version": batch_id})

    return sink


def stream_append_versioned(
    stream_df: DataFrame,
    table_path: str,
    app_id: str,
    checkpoint_dir: str,
) -> "VersionedTable":
    """Exactly-once streaming sink into a commit-log versioned table
    (sources/commitlog.py — the SURVEY §4.2 MVCC/WAL analog).

    foreachBatch gives at-least-once: after a crash between the table
    commit and the streaming checkpoint, the restarted query REPLAYS the
    last micro-batch. The commit log closes the gap the way Delta's
    idempotent writes do (public txnAppId/txnVersion protocol): every
    append is stamped ``txn={"app": app_id, "version": batch_id}``, and a
    replayed batch whose version is <= last_txn_version(app_id) is
    skipped. Restartable, concurrent-writer-safe (appends always rebase),
    and every micro-batch is one atomic version — readers pinned to a
    snapshot never see a torn batch."""
    from quackspark.sources.commitlog import VersionedTable

    table = VersionedTable(table_path)
    sink = versioned_batch_sink(table, app_id)
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return table


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow into a memory sink;
    returns the materialized result table."""
    if output_mode is None:
        output_mode = "complete" if not _is_update_only(stream_df) else "update"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark = stream_df.sparkSession
    return spark.table(name)


def _is_update_only(df: DataFrame) -> bool:
    # applyInPandasWithState plans only support update mode
    return "FlatMapGroupsInPandasWithState" in df._jdf.queryExecution().analyzed().toString()
