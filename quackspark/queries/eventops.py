"""Event-analytics queries over `events` — the funnel / cohort-retention
workloads an events table exists for, expressed as window + aggregate
plans (no self-join chains: an N-step funnel as N-1 self-joins shuffles
the fact table N times; the window form pays ONE partition-by-user
sort).

Reference parity note: the reference has no dedicated funnel/retention
operators — its users write exactly these window/CASE constructions
(the oracles below are that idiom, run verbatim on DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quackspark.queries._util import load_table

#: ordered funnel stages over the synthetic event_type vocabulary
_STAGES = ["signup", "view", "purchase"]


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel: users who signed up, then viewed AFTER the
    signup, then purchased AFTER that view. Strict event-time ordering —
    the thing a naive `count(DISTINCT user) per type` gets wrong.

    Plan: one window partitioned by user computes the stage timestamps
    left-to-right (each stage's min-ts conditions on the previous
    stage's), then a single global aggregate counts stage survivors.
    Scale: one shuffle on user_id (uniform), one tiny rollup."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == _STAGES[0], F.col("ts"))).over(w)
    d1 = e.select("user_id", "event_type", "ts", t1.alias("t1"))
    t2 = F.min(
        F.when((F.col("event_type") == _STAGES[1]) & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    d2 = d1.select("user_id", "event_type", "ts", "t1", t2.alias("t2"))
    d3 = d2.groupBy("user_id").agg(
        F.min("t1").alias("t1"),
        F.min("t2").alias("t2"),
        F.min(
            F.when(
                (F.col("event_type") == _STAGES[2]) & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).alias("t3"),
    )
    return d3.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_view_after"),
        F.count("t3").alias("n_purchase_after"),
        # exact integer-microsecond mean conversion delays
        F.floor(
            F.sum(F.unix_micros("t2") - F.unix_micros("t1"))
            / F.greatest(F.count("t2"), F.lit(1))
        ).cast("bigint").alias("mean_us_s1_s2"),
        F.floor(
            F.sum(F.unix_micros("t3") - F.unix_micros("t2"))
            / F.greatest(F.count("t3"), F.lit(1))
        ).cast("bigint").alias("mean_us_s2_s3"),
    )


def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week, then
    for each (cohort, week-offset) the count of cohort members active
    that week. Integer epoch-week arithmetic end to end.

    Plan: first-seen week is one window min over user; the retention
    grid is one distinct + groupBy — two shuffles total, both on
    uniform keys (user, then cohort×offset)."""
    e = load_table(spark, sf_dir, "events")
    wk = F.floor(F.unix_timestamp(F.col("ts")) / (7 * 86400)).cast("long")
    w = Window.partitionBy("user_id")
    d = e.select("user_id", wk.alias("wk")).select(
        "user_id", "wk", F.min("wk").over(w).alias("cohort")
    )
    grid = d.select("user_id", "cohort", (F.col("wk") - F.col("cohort")).alias("off")).distinct()
    sizes = grid.filter(F.col("off") == 0).groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = grid.groupBy("cohort", "off").agg(F.count(F.lit(1)).alias("n_active"))
    return (
        ret.join(sizes, "cohort")
        .select(
            "cohort",
            "off",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort", "off")
    )


_SESSION_GAP_S = 1800  # 30-minute inactivity gap


def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: assign a session id per user by splitting
    at >30-min inactivity gaps (lag + cumulative-sum-of-boundaries — the
    standard one-sort plan; the streaming twin is sw_session). Rolls up
    per session: event count, duration, distinct event types.

    Scale: ONE shuffle partitioned by user_id with an in-partition sort;
    the cumulative sum is a running window (no frame buffering)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > _SESSION_GAP_S * 1_000_000)
    ).cast("long")
    d = e.select("user_id", "event_id", "ts", "event_type", is_new.alias("new_s"))
    sess = F.sum("new_s").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    labeled = d.select(
        "user_id", "ts", "event_type", sess.cast("long").alias("session_no")
    )
    return (
        labeled.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .cast("long")
            .alias("duration_us"),
            F.count_distinct("event_type").cast("long").alias("n_types"),
        )
        .orderBy("user_id", "session_no")
    )


QUERIES = {
    "ev_funnel": ev_funnel,
    "ev_retention": ev_retention,
    "ev_sessionize": ev_sessionize,
}

ORACLES = {
    "ev_funnel": f"""
        WITH d1 AS (
            SELECT user_id, event_type, ts,
                   min(CASE WHEN event_type = '{_STAGES[0]}' THEN ts END)
                       OVER (PARTITION BY user_id) AS t1
            FROM events
        ), d2 AS (
            SELECT user_id, event_type, ts, t1,
                   min(CASE WHEN event_type = '{_STAGES[1]}' AND ts > t1
                            THEN ts END)
                       OVER (PARTITION BY user_id) AS t2
            FROM d1
        ), d3 AS (
            SELECT user_id, min(t1) AS t1, min(t2) AS t2,
                   min(CASE WHEN event_type = '{_STAGES[2]}' AND ts > t2
                            THEN ts END) AS t3
            FROM d2
            GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               count(t1) AS n_signup,
               count(t2) AS n_view_after,
               count(t3) AS n_purchase_after,
               CAST(floor(sum(epoch_us(t2) - epoch_us(t1))
                    / greatest(count(t2), 1)) AS BIGINT) AS mean_us_s1_s2,
               CAST(floor(sum(epoch_us(t3) - epoch_us(t2))
                    / greatest(count(t3), 1)) AS BIGINT) AS mean_us_s2_s3
        FROM d3
    """,
    "ev_retention": """
        WITH d AS (
            SELECT user_id,
                   CAST(floor(floor(epoch(ts)) / (7 * 86400)) AS BIGINT) AS wk
            FROM events
        ), c AS (
            SELECT user_id, wk,
                   min(wk) OVER (PARTITION BY user_id) AS cohort
            FROM d
        ), grid AS (
            SELECT DISTINCT user_id, cohort, wk - cohort AS off FROM c
        ), sizes AS (
            SELECT cohort, count(*) AS cohort_size
            FROM grid WHERE off = 0 GROUP BY cohort
        ), ret AS (
            SELECT cohort, off, count(*) AS n_active
            FROM grid GROUP BY cohort, off
        )
        SELECT ret.cohort, off, n_active, cohort_size,
               round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
        FROM ret JOIN sizes ON sizes.cohort = ret.cohort
        ORDER BY ret.cohort, off
    """,
}

ORACLES["ev_sessionize"] = f"""
    WITH d AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id))
                            > {_SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), lab AS (
        SELECT user_id, ts, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_no
        FROM d
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
               AS duration_us,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM lab GROUP BY user_id, session_no
    ORDER BY user_id, session_no
"""
