"""Regression for VERDICT r1 "What's wrong" #1: the driver harness owns the
active SparkSession and builds it WITHOUT quackspark's presets. get_session
must retrofit the runtime-settable confs (especially
spark.sql.legacy.parquet.nanosAsLong, without which every events.parquet read
throws PARQUET_TYPE_ILLEGAL) onto that session.

Runs in a subprocess so the plain session truly lacks the presets — the
in-process test session already has them.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

DRIVER_SIM = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    # A driver-style session: no quackspark presets at all.
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[4]")
        .getOrCreate()
    )
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"

    import __spark_entry__ as entry

    qs = entry.queries()
    # The exact queries that erred in CORRECTNESS_r01.json (events readers).
    for name in ["join_asof_backward", "json_extract_scalar", "dt_time_bucket_events"]:
        df = qs[name](spark, "/root/testdata/sf0.001")
        n = df.count()
        assert n >= 0, name
        print(f"OK {name} rows={n}")
    print("DRIVER_SIM_PASS")
    """
)


def test_plain_driver_session_reads_events():
    proc = subprocess.run(
        [sys.executable, "-c", DRIVER_SIM],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_SIM_PASS" in proc.stdout
