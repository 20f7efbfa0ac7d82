"""Date / time functions (reference registration duckdb-5.cpp:11399-11414;
date_part named functions duckdb-5.cpp:8134-8200).

Spark-first: everything here is built-in Column expressions (codegen'd,
pushdown-friendly). The genuine gaps the reference fills natively are
covered by compat helpers: `time_bucket` (epoch arithmetic), `isodow`
(Spark dayofweek is Sun=1), and the C↔Java format translation in
quackspark.functions.timefmt (strftime/strptime, duckdb-5.cpp:11408-11409).

Semantics notes (SURVEY.md §7 hard parts):
- DuckDB `dayofweek` is Sun=0..Sat=6 → Spark ``dayofweek() - 1``.
- DuckDB `yearweek` is ISO year*100 + ISO week → ``extract(YEAROFWEEK)``.
- DuckDB `date_diff('month', a, b)` counts month-boundary crossings →
  ``(year(b)-year(a))*12 + (month(b)-month(a))``, not months_between.
- events.ts has shipped as both timestamp[ns] and timestamp[us] NTZ across
  fixture generations — load_table (session.py) normalizes either to
  TimestampType (µs, UTC session); oracles cast through TIMESTAMP (µs) on
  the DuckDB side so both engines agree at µs precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quackspark.functions import compat
from quackspark.functions.timefmt import strftime_spark, strptime_spark
from quackspark.queries._util import davg, dsum, load_table, o_davg, o_dsum


def dt_part_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_part named functions (duckdb-5.cpp:8134-8200): year..century."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        (F.dayofweek(d) - 1).alias("dow"),
        compat.isodow(d).alias("isodow"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("wk"),
        (F.expr("extract(YEAROFWEEK FROM o_orderdate)") * 100 + F.weekofyear(d))
        .cast("long")
        .alias("yrwk"),
        F.date_format(d, "MMMM").alias("moname"),
        F.date_format(d, "EEEE").alias("dayname"),
        F.last_day(d).alias("lastday"),
        F.floor(F.year(d) / 10).cast("long").alias("decade"),
        F.ceil(F.year(d) / 100).cast("long").alias("century"),
        F.unix_timestamp(d).cast("double").alias("ep"),
    )


def dt_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc at year/quarter/month/week/day grain (duckdb-5.cpp:11402)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("year", d).alias("t_year"),
        F.date_trunc("quarter", d).alias("t_quarter"),
        F.date_trunc("month", d).alias("t_month"),
        F.date_trunc("week", d).alias("t_week"),
        F.date_trunc("day", d).alias("t_day"),
    )


def dt_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interval +/- , date_diff day/month/year, date_add (duckdb-5.cpp:11400-11404)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    d = F.col("o_orderdate")
    anchor = F.lit("1995-06-17").cast("timestamp")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 3 DAYS")).alias("plus3d"),
        (d - F.expr("INTERVAL 2 HOURS")).alias("minus2h"),
        F.add_months(d, 4).cast("timestamp").alias("plus4mo"),
        F.datediff(d, anchor).cast("long").alias("dd_day"),
        ((F.year(d) - F.lit(1995)) * 12 + F.month(d) - F.lit(6))
        .cast("long")
        .alias("dd_month"),
        (F.year(d) - F.lit(1995)).cast("long").alias("dd_year"),
        F.greatest(d, anchor).alias("later"),
    )


def dt_strftime_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strftime / strptime with C-format translation (duckdb-5.cpp:11408-11409)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    d = F.col("o_orderdate")
    iso = strftime_spark(d, "%Y-%m-%d %H:%M:%S")
    return o.select(
        "o_orderkey",
        strftime_spark(d, "%Y-%m-%d").alias("ymd"),
        strftime_spark(d, "%d/%m/%Y").alias("dmy"),
        strftime_spark(d, "%A, %d %B %Y").alias("wordy"),
        iso.alias("iso"),
        strptime_spark(iso, "%Y-%m-%d %H:%M:%S").alias("rt"),
    )


def dt_make(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_date / make_timestamp constructors (duckdb-5.cpp:11406)."""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        F.make_date(F.lit(2020) + k, (k % 12) + 1, (k % 28) + 1).alias("md"),
        F.make_timestamp(
            F.lit(2020), (k % 12) + 1, (k % 28) + 1, k % 24, k % 60, (k * 7 % 60).cast("double")
        ).alias("mts"),
    ).orderBy("n_nationkey")


def dt_time_bucket_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time_bucket(INTERVAL 15 MINUTE, ts) rollup over events
    (duckdb-5.cpp:11411) — epoch arithmetic keeps it in codegen and the
    groupBy shuffles on a low-cardinality bucket key: scales linearly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            compat.time_bucket(900, F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("total"),
        )
        .orderBy("bucket", "event_type")
    )


def dt_events_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hour/minute/second/millisecond/microsecond extraction on the ns-sourced
    events table (µs-truncated on both engines)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    ts = F.col("ts")
    return e.select(
        "event_id",
        F.hour(ts).alias("hr"),
        F.minute(ts).alias("mi"),
        F.second(ts).alias("sec"),
        (F.second(ts) * 1000).cast("long").alias("ms"),
        F.unix_micros(ts).alias("micros"),
    )


def dt_interval_constructors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_years/to_months/to_days/to_hours/to_minutes/to_seconds family
    (duckdb-5.cpp:11412 to_interval registrations) applied in timestamp
    arithmetic — Spark's make_interval covers the whole family."""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    base = F.lit("2020-06-15 12:30:45").cast("timestamp")
    return n.select(
        "n_nationkey",
        (base + F.make_interval(years=k)).alias("plus_years"),
        (base + F.make_interval(months=k)).alias("plus_months"),
        (base + F.make_interval(days=k)).alias("plus_days"),
        (base + F.make_interval(hours=k)).alias("plus_hours"),
        (base + F.make_interval(mins=k)).alias("plus_minutes"),
        (base + F.make_interval(secs=k.cast("double"))).alias("plus_seconds"),
        (base - F.make_interval(days=k, hours=k % 24)).alias("minus_mixed"),
    ).orderBy("n_nationkey")


def dt_age_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """age(l_shipdate, o_orderdate) decomposed into symbolic interval fields
    (DuckDB `age`, duckdb-5.cpp:11400) — rolled up by (years, months) so the
    borrow chain (time→days→months→years) is exercised across every
    month-length boundary in the data. Pure codegen arithmetic, no UDF."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    y, m, d, _t = compat.age_parts(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        j.select(y.alias("years"), m.alias("months"), d.alias("days"))
        .groupBy("years", "months")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("days").alias("min_days"),
            F.max("days").alias("max_days"),
        )
        .orderBy("years", "months")
    )


def dt_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-type carrier ops over the ns-sourced events table: CAST(ts AS
    TIME) as µs-since-midnight, make_time reconstruction of the whole-second
    part, and the sub-second remainder (LogicalTypeId TIME duckdb.hpp:914,
    make_time duckdb-5.cpp:11399 family)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    ts = F.col("ts")
    tod = compat.time_of_day_micros(ts)
    whole = compat.make_time_micros(F.hour(ts), F.minute(ts), F.second(ts))
    return e.select(
        "event_id",
        tod.alias("tod_us"),
        whole.alias("whole_sec_us"),
        (tod - whole).alias("subsec_us"),
    )


def dt_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass over events rolled
    up through a bucket hierarchy (hour ⊃ 15-min ⊃ minute) via ROLLUP —
    the multi-resolution time-series materialization TimescaleDB calls a
    hypertable rollup, expressed as a single grouping-sets aggregation so
    every resolution shares one shuffle."""
    e = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return (
        e.select(
            compat.time_bucket(3600, ts).alias("b_hour"),
            compat.time_bucket(900, ts).alias("b_15m"),
            compat.time_bucket(60, ts).alias("b_min"),
            "value",
        )
        .rollup("b_hour", "b_15m", "b_min")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total"),
            F.grouping_id().alias("lvl"),
        )
        .orderBy("lvl", "b_hour", "b_15m", "b_min")
    )


def dt_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time_bucket_gapfill + LOCF + linear interpolation — the
    TimescaleDB continuous-aggregate trio the reference's time_bucket
    family stops short of. A sparse series (1-in-50 users, hourly
    buckets over 30 days) is densified against a per-series generated
    spine, then filled two ways: last-observation-carried-forward and
    linear interpolation between the neighboring observations.

    Scale shape: the spine is generated per series key from its own
    min/max (sequence + explode — no driver loop); the fill windows are
    one partition-by-series sort. Determinism: bucket values are exact
    means (davg), interpolation arithmetic is the same expression tree
    on both engines, and the spine is integer epoch-seconds."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    s = F.unix_timestamp(F.col("ts"))
    agg = (
        e.select(
            F.col("event_type").alias("typ"),
            (s - s % 3600).alias("b"),
            "value",
        )
        .groupBy("typ", "b")
        .agg(davg("value").alias("v"))
    )
    spine = (
        agg.groupBy("typ")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select("typ", F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("b"))
    )
    j = spine.join(agg, ["typ", "b"], "left")
    back = Window.partitionBy("typ").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd = Window.partitionBy("typ").orderBy("b").rowsBetween(
        0, Window.unboundedFollowing
    )
    v, b = F.col("v"), F.col("b")
    pv = F.last(v, ignorenulls=True).over(back)
    pb = F.last(F.when(v.isNotNull(), b), ignorenulls=True).over(back)
    nv = F.first(v, ignorenulls=True).over(fwd)
    nb = F.first(F.when(v.isNotNull(), b), ignorenulls=True).over(fwd)
    interp = F.when(
        pv.isNotNull() & nv.isNotNull() & (pb != nb),
        pv + (nv - pv) * (b - pb) / (nb - pb),
    ).otherwise(F.coalesce(pv, nv))
    # 6-dp rounding via floor(x*1e6 + 0.5): round(x, 6) diverges between
    # engines when a value lands exactly on the .5 boundary (Spark rounds
    # the full binary expansion, DuckDB the scaled double) — the explicit
    # floor form is the same double op sequence on both
    def _r6(c):
        return F.floor(c * 1000000 + F.lit(0.5)) / 1000000

    return j.select(
        "typ",
        "b",
        v.isNull().cast("int").alias("is_gap"),
        _r6(F.coalesce(pv, nv)).alias("locf"),
        _r6(interp).alias("interp"),
    ).orderBy("typ", "b")


def dt_time_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME_TZ carrier ops (LogicalTypeId TIME_TZ duckdb.hpp:931): build a
    time-with-offset from the events wall clock plus a per-row whole-hour
    offset, then exercise the two semantics DuckDB's native TIMETZ defines —
    comparison against a TIMETZ literal and total ordering (wall µs asc,
    offset DESC) — via the single-BIGINT sort key. The oracle constructs
    real TIMETZ values and sorts/compares natively, so this pins the
    carrier's order to the engine's."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    ts = F.col("ts")
    tod = compat.time_of_day_micros(ts)
    off = ((F.col("event_id") % 5).cast("int") - 2) * 3600
    ttz = compat.make_time_tz(tod, off)
    noon_plus1 = compat.make_time_tz(
        F.lit(12 * 3_600_000_000), F.lit(3600)
    )
    key = compat.time_tz_sort_key(ttz)
    return e.select(
        "event_id",
        ttz.getField("micros").alias("ttz_us"),
        ttz.getField("offset_s").alias("offset_s"),
        (key < compat.time_tz_sort_key(noon_plus1)).alias("lt_noon_plus1"),
    ).orderBy(key, "event_id")


def dt_timetz_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-position `CAST(x AS TIMETZ)` (LogicalTypeId TIME_TZ
    duckdb.hpp:931) — the last refused §1.2 cast, closed r9 (VERDICT r8
    next #6). The Spark side goes through the SQL front so the
    _timetz_carrier_toks rewrite itself is what's under test: a
    timestamp cast (+00 offset), a literal with an explicit offset, a
    per-row printf-built string with varying ±HH:MM offsets, and a
    TRY_CAST failure. Field extraction and the engine-matched total
    order (wall µs asc, offset DESC — compat.time_tz_sort_key) happen
    DataFrame-side; the oracle constructs native TIMETZ values and
    sorts/extracts natively."""
    from quackspark.relation import Connection
    from quackspark.session import register_testdata_views

    register_testdata_views(spark, sf_dir)
    raw = Connection(spark).sql("""
        SELECT event_id,
               CAST(ts AS TIMETZ) AS a,
               CAST('10:30:00.25+05:30' AS TIMETZ) AS c,
               CAST(printf('%02d:30:45%+03d:30',
                           CAST(event_id % 12 AS INT) + 6,
                           CAST(event_id % 3 AS INT) - 1) AS TIMETZ) AS d,
               TRY_CAST('25:99' AS TIMETZ) AS b
        FROM events WHERE event_id <= 2000
    """).df
    key = compat.time_tz_sort_key(F.col("d"))
    noon_plus1 = compat.make_time_tz(F.lit(12 * 3_600_000_000), F.lit(3600))
    return raw.select(
        "event_id",
        F.col("a").getField("micros").alias("a_us"),
        F.col("a").getField("offset_s").alias("a_off"),
        F.col("c").getField("micros").alias("c_us"),
        F.col("c").getField("offset_s").alias("c_off"),
        F.col("d").getField("micros").alias("d_us"),
        F.col("d").getField("offset_s").alias("d_off"),
        F.col("b").isNull().alias("b_null"),
        (key < compat.time_tz_sort_key(noon_plus1)).alias("d_lt_noon1"),
    ).orderBy(key, "event_id")


QUERIES = {
    "dt_hypertable_rollup": dt_hypertable_rollup,
    "dt_time_tz": dt_time_tz,
    "dt_timetz_cast": dt_timetz_cast,
    "dt_gapfill": dt_gapfill,
    "dt_age_parts": dt_age_parts,
    "dt_time_of_day": dt_time_of_day,
    "dt_part_family": dt_part_family,
    "dt_interval_constructors": dt_interval_constructors,
    "dt_trunc": dt_trunc,
    "dt_arithmetic": dt_arithmetic,
    "dt_strftime_roundtrip": dt_strftime_roundtrip,
    "dt_make": dt_make,
    "dt_time_bucket_events": dt_time_bucket_events,
    "dt_events_hour_profile": dt_events_hour_profile,
}

ORACLES = {
    "dt_timetz_cast": """
        WITH t AS (
            SELECT event_id,
                   CAST(CAST(ts AS TIMESTAMP) AS TIMETZ) AS a,
                   CAST('10:30:00.25+05:30' AS TIMETZ) AS c,
                   CAST(printf('%02d:30:45%+03d:30',
                               CAST(event_id % 12 AS INT) + 6,
                               CAST(event_id % 3 AS INT) - 1) AS TIMETZ) AS d,
                   TRY_CAST('25:99' AS TIMETZ) AS b
            FROM events WHERE event_id <= 2000
        )
        SELECT event_id,
               epoch_us(CAST(a AS TIME)) AS a_us,
               CAST(datepart('timezone', a) AS INT) AS a_off,
               epoch_us(CAST(c AS TIME)) AS c_us,
               CAST(datepart('timezone', c) AS INT) AS c_off,
               epoch_us(CAST(d AS TIME)) AS d_us,
               CAST(datepart('timezone', d) AS INT) AS d_off,
               b IS NULL AS b_null,
               d < TIMETZ '12:00:00+01:00' AS d_lt_noon1
        FROM t ORDER BY d, event_id
    """,
    "dt_time_tz": """
        WITH t AS (
            SELECT event_id,
                   (CAST(CAST(ts AS TIMESTAMP) AS TIME) ||
                    printf('%+03d:00', CAST(event_id % 5 AS INT) - 2))::TIMETZ
                       AS ttz
            FROM events WHERE event_id <= 2000
        )
        SELECT event_id,
               epoch_us(CAST(ttz AS TIME)) AS ttz_us,
               CAST(datepart('timezone', ttz) AS INT) AS offset_s,
               ttz < TIMETZ '12:00:00+01:00' AS lt_noon_plus1
        FROM t ORDER BY ttz, event_id
    """,
    "dt_gapfill": f"""
        WITH ag AS (
            SELECT typ, b, {o_davg("value")} AS v
            FROM (SELECT event_type AS typ,
                         CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS b,
                         value
                  FROM events WHERE user_id % 50 = 0) _f
            GROUP BY typ, b
        ), spine AS (
            SELECT typ, unnest(generate_series(lo, hi, 3600)) AS b
            FROM (SELECT typ, min(b) AS lo, max(b) AS hi
                  FROM ag GROUP BY typ) _s
        ), j AS (
            SELECT spine.typ, spine.b, ag.v
            FROM spine LEFT JOIN ag
              ON ag.typ = spine.typ AND ag.b = spine.b
        ), w AS (
            SELECT typ, b, v,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY typ ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
                       OVER (PARTITION BY typ ORDER BY b
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS pb,
                   first_value(v IGNORE NULLS) OVER (
                       PARTITION BY typ ORDER BY b
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
                       OVER (PARTITION BY typ ORDER BY b
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS nb
            FROM j
        )
        SELECT typ, b, CAST(v IS NULL AS INT) AS is_gap,
               floor(coalesce(pv, nv) * 1000000 + 0.5) / 1000000 AS locf,
               floor((CASE WHEN pv IS NOT NULL AND nv IS NOT NULL AND pb != nb
                           THEN pv + (nv - pv) * (b - pb) / (nb - pb)
                           ELSE coalesce(pv, nv) END) * 1000000 + 0.5)
                   / 1000000 AS interp
        FROM w ORDER BY typ, b
    """,
    "dt_hypertable_rollup": f"""
        SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS b_hour,
               time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) AS b_15m,
               time_bucket(INTERVAL 1 MINUTE, CAST(ts AS TIMESTAMP)) AS b_min,
               count(*) AS n,
               {o_dsum("value")} AS total,
               CAST(grouping(b_hour) * 4 + grouping(b_15m) * 2
                    + grouping(b_min) AS BIGINT) AS lvl
        FROM events
        GROUP BY ROLLUP (b_hour, b_15m, b_min)
        ORDER BY lvl, b_hour, b_15m, b_min
    """,
    "dt_age_parts": """
        SELECT CAST(date_part('year', age(l_shipdate, o_orderdate)) AS INT)
                   AS years,
               CAST(date_part('month', age(l_shipdate, o_orderdate)) AS INT)
                   AS months,
               count(*) AS n,
               CAST(min(date_part('day', age(l_shipdate, o_orderdate))) AS INT)
                   AS min_days,
               CAST(max(date_part('day', age(l_shipdate, o_orderdate))) AS INT)
                   AS max_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "dt_time_of_day": """
        SELECT event_id,
               epoch_us(CAST(CAST(ts AS TIMESTAMP) AS TIME)) AS tod_us,
               epoch_us(make_time(hour(CAST(ts AS TIMESTAMP)),
                                  minute(CAST(ts AS TIMESTAMP)),
                                  floor(second(CAST(ts AS TIMESTAMP)))))
                   AS whole_sec_us,
               epoch_us(CAST(CAST(ts AS TIMESTAMP) AS TIME))
                   - epoch_us(make_time(hour(CAST(ts AS TIMESTAMP)),
                                        minute(CAST(ts AS TIMESTAMP)),
                                        floor(second(CAST(ts AS TIMESTAMP)))))
                   AS subsec_us
        FROM events WHERE event_id <= 2000
    """,
    "dt_interval_constructors": """
        SELECT n_nationkey,
               TIMESTAMP '2020-06-15 12:30:45' + to_years(n_nationkey)
                   AS plus_years,
               TIMESTAMP '2020-06-15 12:30:45' + to_months(n_nationkey)
                   AS plus_months,
               TIMESTAMP '2020-06-15 12:30:45' + to_days(n_nationkey)
                   AS plus_days,
               TIMESTAMP '2020-06-15 12:30:45' + to_hours(n_nationkey)
                   AS plus_hours,
               TIMESTAMP '2020-06-15 12:30:45' + to_minutes(n_nationkey)
                   AS plus_minutes,
               TIMESTAMP '2020-06-15 12:30:45' + to_seconds(n_nationkey)
                   AS plus_seconds,
               TIMESTAMP '2020-06-15 12:30:45'
                   - (to_days(n_nationkey) + to_hours(n_nationkey % 24))
                   AS minus_mixed
        FROM nation ORDER BY n_nationkey
    """,
    "dt_part_family": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(dayofweek(o_orderdate) AS INT) AS dow,
               CAST(isodow(o_orderdate) AS INT) AS isodow,
               CAST(dayofyear(o_orderdate) AS INT) AS doy,
               CAST(week(o_orderdate) AS INT) AS wk,
               CAST(yearweek(o_orderdate) AS BIGINT) AS yrwk,
               monthname(o_orderdate) AS moname,
               dayname(o_orderdate) AS dayname,
               last_day(CAST(o_orderdate AS DATE)) AS lastday,
               CAST(decade(o_orderdate) AS BIGINT) AS decade,
               CAST(century(o_orderdate) AS BIGINT) AS century,
               epoch(o_orderdate) AS ep
        FROM orders WHERE o_orderkey <= 5000
    """,
    "dt_trunc": """
        SELECT o_orderkey,
               CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS t_year,
               CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS t_quarter,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS t_month,
               CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS t_week,
               CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS t_day
        FROM orders WHERE o_orderkey <= 5000
    """,
    "dt_arithmetic": """
        SELECT o_orderkey,
               o_orderdate + INTERVAL 3 DAY AS plus3d,
               o_orderdate - INTERVAL 2 HOUR AS minus2h,
               o_orderdate + INTERVAL 4 MONTH AS plus4mo,
               CAST(date_diff('day', TIMESTAMP '1995-06-17', o_orderdate) AS BIGINT)
                   AS dd_day,
               CAST(date_diff('month', TIMESTAMP '1995-06-17', o_orderdate) AS BIGINT)
                   AS dd_month,
               CAST(date_diff('year', TIMESTAMP '1995-06-17', o_orderdate) AS BIGINT)
                   AS dd_year,
               greatest(o_orderdate, TIMESTAMP '1995-06-17') AS later
        FROM orders WHERE o_orderkey <= 5000
    """,
    "dt_strftime_roundtrip": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS ymd,
               strftime(o_orderdate, '%d/%m/%Y') AS dmy,
               strftime(o_orderdate, '%A, %d %B %Y') AS wordy,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso,
               strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                        '%Y-%m-%d %H:%M:%S') AS rt
        FROM orders WHERE o_orderkey <= 5000
    """,
    "dt_make": """
        SELECT n_nationkey,
               make_date(2020 + n_nationkey, n_nationkey % 12 + 1,
                         n_nationkey % 28 + 1) AS md,
               make_timestamp(2020, n_nationkey % 12 + 1, n_nationkey % 28 + 1,
                              n_nationkey % 24, n_nationkey % 60,
                              n_nationkey * 7 % 60) AS mts
        FROM nation ORDER BY n_nationkey
    """,
    "dt_time_bucket_events": f"""
        SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) AS bucket,
               event_type,
               count(*) AS n,
               {o_dsum("value")} AS total
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "dt_events_hour_profile": """
        SELECT event_id,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
               CAST(minute(CAST(ts AS TIMESTAMP)) AS INT) AS mi,
               CAST(floor(second(CAST(ts AS TIMESTAMP))) AS INT) AS sec,
               CAST(floor(second(CAST(ts AS TIMESTAMP))) AS BIGINT) * 1000 AS ms,
               epoch_us(CAST(ts AS TIMESTAMP)) AS micros
        FROM events WHERE event_id <= 2000
    """,
}
