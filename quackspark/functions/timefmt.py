"""C-style (strftime/strptime, duckdb-5.cpp:11408-11409) ↔ Java
(DateTimeFormatter) time format-string translation.

DuckDB formats with C `%`-directives; Spark's date_format/to_timestamp use
Java patterns. Translate once, reuse everywhere (SURVEY.md §2.7). Literal
text is quoted with single quotes so Java pattern letters inside literals
don't misfire.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: C directive → Java DateTimeFormatter pattern
_C2J = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",  # microseconds
    "%g": "SSS",  # duckdb: milliseconds
    "%p": "a",
    "%j": "DDD",
    "%a": "EEE",
    "%A": "EEEE",
    "%b": "MMM",
    "%B": "MMMM",
    "%Z": "zz",
    "%z": "xx",
    "%%": "%",
}

#: directives with no valid Spark datetime-pattern letter: Spark >=3.0
#: rejects week-based 'YYYY'/'ww' patterns outright
#: (DATETIME_PATTERN_RECOGNITION; ADVICE r1). Raise a clear error here
#: instead of a confusing engine error at runtime; callers wanting ISO
#: year/week should use extract(YEAROFWEEK/WEEK) expressions.
_UNSUPPORTED = {"%G", "%V", "%U", "%W", "%u", "%w", "%C"}


#: parse-direction overrides: C strptime directives accept UNPADDED digits
#: ('%m' parses '3' and '03'); Java's doubled letters are width-strict, the
#: single letters are lenient. Formatting keeps the padded doubles.
_C2J_PARSE = {
    "%Y": "y", "%m": "M", "%d": "d", "%H": "H", "%I": "h",
    "%M": "m", "%S": "s", "%j": "D",
}


def translate_format(c_fmt: str, parse: bool = False) -> str:
    """Translate a C strftime format string to a Java pattern.

    ``parse=True`` targets to_timestamp/strptime: lenient single-letter
    fields that accept unpadded digits like C strptime does (oracle:
    strptime('05 3', '%d %m') parses)."""
    out: list[str] = []
    lit: list[str] = []

    def flush_literal() -> None:
        if lit:
            text = "".join(lit)
            if any(ch.isalpha() for ch in text):
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            lit.clear()

    i = 0
    while i < len(c_fmt):
        if c_fmt[i] == "%" and i + 1 < len(c_fmt):
            tok = c_fmt[i : i + 2]
            if tok == "%%":
                lit.append("%")
            elif tok in _C2J:
                flush_literal()
                out.append(_C2J_PARSE[tok] if parse and tok in _C2J_PARSE
                           else _C2J[tok])
            elif tok in _UNSUPPORTED:
                raise ValueError(
                    f"unsupported strftime directive {tok!r}: no Spark "
                    "datetime pattern exists (week-based letters are "
                    "rejected by Spark >=3.0); use extract-based "
                    "expressions instead"
                )
            else:
                raise ValueError(f"unsupported strftime directive {tok!r}")
            i += 2
        else:
            lit.append(c_fmt[i])
            i += 1
    flush_literal()
    return "".join(out)


def strftime_spark(ts: Column | str, c_fmt: str) -> Column:
    """DuckDB strftime(ts, '%Y-%m-%d') on Spark."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(ts, translate_format(c_fmt))


def strptime_spark(s: Column | str, c_fmt: str) -> Column:
    """DuckDB strptime(str, fmt) → TimestampType."""
    s = F.col(s) if isinstance(s, str) else s
    return F.to_timestamp(s, translate_format(c_fmt, parse=True))
