"""Event-time window queries over `events`, batch mode (streaming/engine.py
transformations run unchanged on batch DataFrames). Oracles: tumbling and
sliding via time_bucket arithmetic; session windows via gaps-and-islands
SQL (lag + running sum) — the classical batch formulation of what
Structured Streaming's session_window computes incrementally.

tests/test_streaming.py additionally runs the SAME transformations as real
streams (availableNow → memory sink) and asserts stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.queries._util import load_table
from quackspark.streaming import engine as E


def sw_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return E.tumbling_counts(ev).orderBy("w_start", "event_type")


def sw_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return E.sliding_counts(ev).orderBy("w_start")


def sw_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return E.session_windows(ev).orderBy("user_id", "s_start")


def _click_purchase(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(ev.event_type == "click")
    purchases = ev.filter(ev.event_type == "purchase")
    return E.stream_stream_join(clicks, purchases, how).orderBy(
        "user_id", "l_id", "r_id"
    )


def sw_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream INNER join (clicks ×
    purchases within 10 minutes, same user); stream==batch equivalence is
    pinned in tests/test_streaming.py."""
    return _click_purchase(spark, sf_dir, "inner")


def sw_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream LEFT join (every click,
    NULL-extended when no purchase follows within 10 minutes)."""
    return _click_purchase(spark, sf_dir, "left")


def sw_stream_stream_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream RIGHT join (every
    purchase, NULL-extended when no click preceded it within 10 minutes —
    r6 completes the outer family; state eviction bounds as in inner)."""
    return _click_purchase(spark, sf_dir, "right")


def sw_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream FULL OUTER join —
    unmatched rows on BOTH sides emit NULL-extended once their side's
    watermark passes the range bound (Structured Streaming supports full
    outer with two-sided event-time ranges; same eviction contract)."""
    return _click_purchase(spark, sf_dir, "full_outer")


def sw_stream_to_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → commit-log table end-to-end (r6): the events fixture
    streamed as 4 time-ordered micro-batches lands in a versioned table
    through the exactly-once foreachBatch sink (engine.
    stream_append_versioned — txn-stamped commits, one atomic VERSION per
    micro-batch), then the snapshot readback is aggregated. The oracle
    recomputes the same aggregate straight from the source, so the
    differential verifies the full stream→log→snapshot path loses and
    duplicates nothing. Restart/replay idempotence is pinned in
    tests/test_streaming.py."""
    import os
    import shutil
    import tempfile

    stream = E.stream_events_multi(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"qs_sw_versioned_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    table = E.stream_append_versioned(
        stream,
        os.path.join(base, "t"),
        app_id="sw_demo",
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    return (
        table.snapshot()
        .read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "sw_tumbling": sw_tumbling,
    "sw_sliding": sw_sliding,
    "sw_session": sw_session,
    "sw_stream_stream_join": sw_stream_stream_join,
    "sw_stream_stream_left_join": sw_stream_stream_left_join,
    "sw_stream_stream_right_join": sw_stream_stream_right_join,
    "sw_stream_stream_full_join": sw_stream_stream_full_join,
    "sw_stream_to_versioned": sw_stream_to_versioned,
}

_SSJ = """
    SELECT l.user_id, l.event_id AS l_id, CAST(l.ts AS TIMESTAMP) AS l_ts,
           l.value AS l_value, r.event_id AS r_id,
           CAST(r.ts AS TIMESTAMP) AS r_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    {join} JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP)
     AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP)
                                     + INTERVAL 10 MINUTE
    ORDER BY l.user_id, l_id, r_id
"""

ORACLES = {
    "sw_tumbling": """
        SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) AS w_start,
               time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
                   + INTERVAL 15 MINUTE AS w_end,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM events
        GROUP BY 1, 2, 3 ORDER BY w_start, event_type
    """,
    "sw_sliding": """
        WITH starts AS (
            SELECT unnest([
                       time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)),
                       time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP))
                           - INTERVAL 5 MINUTE
                   ]) AS w_start
            FROM events
        )
        SELECT w_start, count(*) AS n
        FROM starts GROUP BY 1 ORDER BY w_start
    """,
    "sw_session": """
        WITH ordered AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   CASE WHEN CAST(ts AS TIMESTAMP)
                             - lag(CAST(ts AS TIMESTAMP)) OVER
                               (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 5 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ), tagged AS (
            SELECT user_id, ts, value,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess
            FROM ordered
        )
        SELECT user_id,
               min(ts) AS s_start,
               max(ts) + INTERVAL 5 MINUTE AS s_end,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM tagged
        GROUP BY user_id, sess ORDER BY user_id, s_start
    """,
    "sw_stream_stream_join": _SSJ.format(join="INNER"),
    "sw_stream_stream_left_join": _SSJ.format(join="LEFT"),
    "sw_stream_stream_right_join": _SSJ.format(join="RIGHT"),
    "sw_stream_stream_full_join": _SSJ.format(join="FULL"),
    "sw_stream_to_versioned": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}
