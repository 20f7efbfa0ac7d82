"""Property-based differential tests (hypothesis): our compat-layer
translations must agree with DuckDB on randomized inputs, not just the
fixtures — the generative extension of the reference's verifier strategy
(SURVEY.md §5).
"""

from __future__ import annotations

import datetime as dt
import re

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from quackspark.functions.compat import _jaro_winkler_py, glob_to_regex
from quackspark.functions.timefmt import strftime_spark, translate_format

# --- jaro_winkler: python impl == duckdb builtin --------------------------

_words = st.text(alphabet="abcdefgh ", min_size=0, max_size=12)


@settings(max_examples=200, deadline=None)
@given(_words, _words)
def test_jaro_winkler_matches_duckdb(a, b):
    got = _jaro_winkler_py(a, b)
    exp = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert got == pytest.approx(exp, abs=1e-9)


# --- glob translation: python re on translated pattern == duckdb GLOB ------

_glob_atom = st.one_of(
    st.text(alphabet="abcx", min_size=1, max_size=3),
    st.just("*"),
    st.just("?"),
    st.just("[ab]"),
    st.just("[!a]"),
)
_glob_pattern = st.lists(_glob_atom, min_size=0, max_size=5).map("".join)
_subject = st.text(alphabet="abcx!", min_size=0, max_size=8)


@settings(max_examples=300, deadline=None)
@given(_glob_pattern, _subject)
def test_glob_translation_matches_duckdb(pattern, subject):
    translated = glob_to_regex(pattern)
    got = re.match(translated + r"\Z", subject) is not None
    exp = duckdb.sql(
        "SELECT ? GLOB ?", params=[subject, pattern]
    ).fetchone()[0]
    assert got == exp, f"pattern={pattern!r} subject={subject!r} re={translated!r}"


# --- strftime translation: Spark(date_format, translated) == duckdb --------

_DIRECTIVES = ["%Y", "%y", "%m", "%d", "%H", "%I", "%M", "%S", "%p", "%j",
               "%a", "%A", "%b", "%B"]


def test_strftime_translation_matches_duckdb_batch(spark):
    """One batched comparison over 200 random (timestamp, format) pairs —
    avoids per-example Spark jobs."""
    import random

    rng = random.Random(42)
    base = dt.datetime(1990, 1, 1)
    cases = []
    for i in range(200):
        ts = base + dt.timedelta(
            days=rng.randrange(0, 15000), seconds=rng.randrange(0, 86400)
        )
        fmt = "-".join(rng.sample(_DIRECTIVES, rng.randrange(1, 4)))
        cases.append((i, ts, fmt))

    df = spark.createDataFrame(cases, "i int, ts timestamp, fmt string")
    got = {}
    # formats vary per row → evaluate grouped by format
    from collections import defaultdict

    by_fmt = defaultdict(list)
    for i, ts, fmt in cases:
        by_fmt[fmt].append((i, ts))
    import pyspark.sql.functions as F

    for fmt, rows in by_fmt.items():
        sub = df.filter(F.col("fmt") == fmt).select(
            "i", strftime_spark(F.col("ts"), fmt).alias("s")
        )
        for r in sub.collect():
            got[r["i"]] = r["s"]

    con = duckdb.connect()
    for i, ts, fmt in cases:
        exp = con.execute(
            "SELECT strftime(?::TIMESTAMP, ?)", [ts, fmt]
        ).fetchone()[0]
        assert got[i] == exp, f"ts={ts} fmt={fmt!r}: spark={got[i]!r} duck={exp!r}"


def test_translate_format_rejects_unknown():
    with pytest.raises(ValueError):
        translate_format("%Q")
