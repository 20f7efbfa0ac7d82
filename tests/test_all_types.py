"""Type-exhaustive differential tests (the reference's test_all_types()
idea, duckdb-6.cpp:14174): min/max/NULL rows of every Spark-representable
type written to parquet, then read by BOTH engines and compared — first
verbatim, then through a transformation matrix exercising arithmetic,
NULL propagation, string/collection functions, and nested access.
"""

from __future__ import annotations

import pytest

from quackspark.functions import compat
from quackspark.oracle import compare
from quackspark.sources.alltypes import all_types_df

SF = "/root/testdata/sf0.01"  # only used for the oracle's view registration


@pytest.fixture(scope="module")
def alltypes_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("alltypes") / "all_types")
    all_types_df(spark).write.mode("overwrite").parquet(p)
    return p


def test_all_types_roundtrip_verbatim(spark, alltypes_path):
    df = spark.read.parquet(alltypes_path)
    problems = compare(df, f"SELECT * FROM '{alltypes_path}/*.parquet'", SF)
    assert not problems, problems


def test_all_types_transformation_matrix(spark, alltypes_path):
    from pyspark.sql import functions as F

    df = spark.read.parquet(alltypes_path).select(
        "id",
        (F.col("ti").cast("int") + 1).alias("ti_inc"),
        # abs(INT_MIN) overflows: DuckDB raises (checked arithmetic,
        # duckdb-5.cpp:16398); non-ANSI Spark wraps. Widen to BIGINT so
        # both engines agree — the narrow form is a documented drift edge.
        F.abs(F.col("i").cast("long")).alias("i_abs"),
        (F.col("bi") % 97).alias("bi_mod"),
        F.coalesce("b", F.lit(True)).alias("b_coal"),
        F.least("dec9", F.lit(0).cast("decimal(9,4)")).alias("dec_least"),
        F.length("s").alias("s_len"),
        F.upper(F.substring("s", 1, 5)).alias("s_head"),
        F.length("bin").alias("bin_len"),
        F.year("dt").alias("dt_year"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.array_size("sl").alias("sl_size"),
        F.element_at("il", 1).alias("il_first"),
        F.col("st.a").alias("st_a"),
        F.element_at("m", "k1").alias("m_k1"),
        F.isnull("d").alias("d_isnull"),
        # TIME_TZ carrier vs native TIMETZ: the comparison must match the
        # engine comparing real TIMETZ values (wall µs asc, offset desc)
        (
            compat.time_tz_sort_key(F.col("ttz"))
            < compat.time_tz_sort_key(
                compat.make_time_tz(F.lit(12 * 3_600_000_000), F.lit(3600))
            )
        ).alias("ttz_lt_noon"),
        F.col("ttz.micros").alias("ttz_us"),
        F.col("ttz.offset_s").alias("ttz_off"),
        # TIME carrier vs native TIME; INTERVAL struct carrier vs native
        # interval arithmetic/extraction; BIT string carrier vs native BIT
        F.floor(F.col("tm") / F.lit(3_600_000_000)).cast("long").alias("tm_hour"),
        (F.col("tm") % 1_000_000).alias("tm_subsec_us"),
        F.expr(
            "TIMESTAMP '2000-01-15 01:02:03' + make_interval(0, iv.months, "
            "0, iv.days, 0, 0, CAST(iv.micros AS DECIMAL(18,6)) / 1000000)"
        ).alias("iv_plus_ts"),
        (F.col("iv.months") % 12).cast("long").alias("iv_month_part"),
        F.length("bits").cast("long").alias("bit_len"),
        F.when(F.length("bits") >= 3, F.substring("bits", 3, 1) == "1")
        .alias("bit2_set"),
    )
    # size(NULL) is -1 under Spark's legacy default — array_size matches
    # DuckDB's len(NULL) = NULL convention.
    sql = f"""
        SELECT id,
               CAST(ti AS INT) + 1 AS ti_inc,
               abs(CAST(i AS BIGINT)) AS i_abs,
               bi % 97 AS bi_mod,
               coalesce(b, true) AS b_coal,
               least(dec9, CAST(0 AS DECIMAL(9,4))) AS dec_least,
               length(s) AS s_len,
               upper(substring(s, 1, 5)) AS s_head,
               octet_length(bin) AS bin_len,
               CAST(year(dt) AS INT) AS dt_year,
               date_trunc('hour', ts) AS ts_hour,
               CAST(len(sl) AS INT) AS sl_size,
               il[1] AS il_first,
               st.a AS st_a,
               m['k1'][1] AS m_k1,
               d IS NULL AS d_isnull,
               (CAST(TIMESTAMP '1970-01-01' + to_microseconds(ttz.micros)
                     AS TIME) ||
                printf('%s%02d:%02d:%02d',
                       CASE WHEN ttz.offset_s < 0 THEN '-' ELSE '+' END,
                       abs(ttz.offset_s) // 3600,
                       abs(ttz.offset_s) % 3600 // 60,
                       abs(ttz.offset_s) % 60))::TIMETZ
                   < TIMETZ '12:00:00+01:00' AS ttz_lt_noon,
               ttz.micros AS ttz_us,
               ttz.offset_s AS ttz_off,
               hour(CAST(TIMESTAMP '1970-01-01' + to_microseconds(tm) AS TIME))::BIGINT
                   AS tm_hour,
               tm % 1000000 AS tm_subsec_us,
               TIMESTAMP '2000-01-15 01:02:03'
                   + (to_months(iv.months) + to_days(iv.days)
                      + to_microseconds(iv.micros)) AS iv_plus_ts,
               date_part('month', to_months(iv.months) + to_days(iv.days)
                                  + to_microseconds(iv.micros))::BIGINT
                   AS iv_month_part,
               length(bits::BIT)::BIGINT AS bit_len,
               CASE WHEN length(bits) >= 3 THEN get_bit(bits::BIT, 2) = 1
                    END AS bit2_set
        FROM '{alltypes_path}/*.parquet'
    """
    problems = compare(df, sql, SF)
    assert not problems, problems
