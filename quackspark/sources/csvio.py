"""read_csv / COPY TO / replacement scans (reference: CSV reader options
duckdb-internal.hpp:39284-39360, ParallelCSVReader duckdb-internal.hpp:39732,
CSVCopyFunction duckdb-6.cpp:10499, replacement scans duckdb-6.cpp:10501-10502).

Option mapping is DuckDB-name → Spark DataFrameReader/Writer options; the
C-style date/timestamp format strings go through the same translator as
strftime (functions/timefmt.py). Spark's CSV source is itself a parallel
splitting reader, so the reference's parallel-CSV machinery is inherited,
and `auto_detect` maps to inferSchema+header sampling.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from quackspark.functions.timefmt import translate_format

#: DuckDB read_csv option → (spark option, value mapper)
_READ_OPTS = {
    "header": ("header", lambda v: v),
    "delim": ("sep", lambda v: v),
    "sep": ("sep", lambda v: v),
    "quote": ("quote", lambda v: v),
    "escape": ("escape", lambda v: v),
    "nullstr": ("nullValue", lambda v: v),
    "null_padding": ("mode", lambda v: "PERMISSIVE" if v else "FAILFAST"),
    "ignore_errors": ("mode", lambda v: "DROPMALFORMED" if v else "FAILFAST"),
    "compression": ("compression", lambda v: v),
    "comment": ("comment", lambda v: v),
    "sample_size": ("samplingRatio", lambda v: 1.0),  # spark samples by ratio
    "dateformat": ("dateFormat", translate_format),
    "timestampformat": ("timestampFormat", translate_format),
    "auto_detect": ("inferSchema", lambda v: v),
    "all_varchar": ("inferSchema", lambda v: not v),
    # Spark-side escape hatch for the quoted-newline default below: on a
    # known newline-free single large file, multiline=false restores
    # intra-file input splits
    "multiline": ("multiLine", lambda v: v),
}


#: inclusive upper bound per integer type (lower bound is -hi-1)
_INT_HI = {
    "tinyint": 127,
    "smallint": 32767,
    "int": 2**31 - 1,
    "integer": 2**31 - 1,
    "bigint": 2**63 - 1,
}

#: ASCII-only digit runs with optional _ separators. Pinned live against
#: duckdb 1.0 read_csv (ADVICE r9 #3; tests/test_advice_r9.py): the CSV
#: converter accepts '1_000' and '1_0' (kept as data) but rejects unicode
#: digits '１２３', decimal points and exponents for integer columns
#: ('1.5'/'1e2' under INT flip to header — unlike the SQL cast, which
#: rounds), and enforces per-width bounds (128 under TINYINT is header).
_INT_RE = re.compile(r"[+-]?[0-9](?:_?[0-9])*")
_NUM_RE = re.compile(
    r"[+-]?(?:[0-9](?:_?[0-9])*(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
)
_INF_NAN = frozenset(
    p + s for s in ("inf", "infinity", "nan") for p in ("", "+", "-")
)


def _field_castable(value: str, spark_type: str) -> bool:
    """Would DuckDB's CSV converter accept `value` for this column type?
    Driver-side, first row only — mirrors the reference sniffer's
    per-type TryCast pass (duckdb-internal.hpp:39284-39360). Explicit
    regex/range checks, not Python numeric parsing (ADVICE r9 #3):
    Python's int() shares the underscore rule but also takes unicode
    digits and has no width bounds; every branch below is pinned against
    a live duckdb read_csv header-detection probe."""
    t = spark_type.strip().lower()
    v = value.strip()
    if not v:  # empty = NULL, castable to anything
        return True
    try:
        if t in _INT_HI:
            if not _INT_RE.fullmatch(v):
                return False
            hi = _INT_HI[t]
            return -hi - 1 <= int(v) <= hi
        elif t in ("float", "double", "real"):
            # inf/nan ARE accepted (verified: first row 'inf' under
            # DOUBLE stays data), and FLOAT has no overflow rejection
            # ('1e40' is kept as inf)
            return v.lower() in _INF_NAN or bool(_NUM_RE.fullmatch(v))
        elif t.startswith("decimal"):
            if not _NUM_RE.fullmatch(v):
                return False
            m = re.match(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
            if not m:
                return True
            prec, scale = int(m.group(1)), int(m.group(2))
            import decimal

            # width check AFTER rounding to scale (verified: '1.555'
            # fits DECIMAL(4,2) via rounding, '123.456' does not)
            with decimal.localcontext() as ctx:
                ctx.prec = 60
                d = decimal.Decimal(v.replace("_", "")).quantize(
                    decimal.Decimal(1).scaleb(-scale),
                    rounding=decimal.ROUND_HALF_UP,
                )
            return abs(d) < decimal.Decimal(1).scaleb(prec - scale)
        elif t == "boolean":
            if v.lower() not in ("true", "false", "t", "f", "0", "1"):
                return False
        elif t == "date":
            # DuckDB takes unpadded ISO parts ('2024-1-5') and validates
            # the calendar ('2024-13-01' flips to header)
            m = re.fullmatch(r"(\d{1,4})-(\d{1,2})-(\d{1,2})", v)
            if not m:
                return False
            import datetime

            datetime.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        elif t.startswith("timestamp"):
            import datetime

            datetime.datetime.fromisoformat(v)
        else:  # string-ish types accept anything
            return True
    except (ValueError, TypeError, ArithmeticError):
        return False
    return True


def _sniff_header_for_schema(
    path: str, columns: dict[str, str], *, delim: str, quote: str
) -> bool:
    """First-row header detection under an explicit columns= schema,
    matching DuckDB (verified r9): header iff the first row fails
    conversion to the declared types OR equals the declared names
    (case-insensitive). Bounded driver work: one line of one file, like
    sources/sniffer.py. Unreadable/globbed/compressed inputs fall back
    to the shim's historical header=True."""
    import csv as _csv
    import glob as _glob
    import io

    candidates = sorted(_glob.glob(path)) or [path]
    first = candidates[0]
    try:
        if first.endswith(".gz"):
            import gzip

            with gzip.open(first, "rt", errors="replace") as f:
                line = f.readline()
        else:
            with open(first, "r", errors="replace") as f:
                line = f.readline()
    except OSError:
        return True
    if not line.strip():
        return True
    row = next(
        _csv.reader(io.StringIO(line), delimiter=delim or ",",
                    quotechar=quote or '"'),
        [],
    )
    names = [c.lower() for c in columns]
    if [v.strip().lower() for v in row] == names:
        return True
    types = list(columns.values())
    if len(row) == len(types) and not all(
        _field_castable(v, t) for v, t in zip(row, types)
    ):
        return True
    return False


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    columns: dict[str, str] | None = None,
    auto_detect: bool = True,
    **options,
) -> DataFrame:
    """DuckDB `read_csv`/`read_csv_auto` on Spark.

    `columns` (explicit name→SQL-type mapping, the reference's `columns`
    struct option) becomes an explicit schema — skipping inference entirely,
    which at 100 TB is the difference between 0 and 1 extra full scans.
    """
    reader = spark.read
    # Spark's CSV source cannot skip N arbitrary leading rows (only
    # comment-prefixed ones); raising beats silently reading junk.
    if options.pop("skip", 0):
        raise ValueError(
            "read_csv skip=N is unsupported on Spark; use comment='#' when "
            "the preamble shares a prefix"
        )
    if "header" in options:
        header = options.pop("header")
    elif columns:
        # reference: an explicit columns= schema disables full
        # auto-detection but STILL header-sniffs the first row
        # (duckdb-internal.hpp:39311-39313; pinned against DuckDB this
        # round): it is a header iff it fails conversion to the declared
        # types OR equals the declared names — a blanket header=True
        # default silently dropped the first data row of headerless
        # files (ADVICE r8 #2), a blanket False re-reads real headers
        header = _sniff_header_for_schema(
            path if isinstance(path, str) else path[0],
            columns,
            delim=str(options.get("delim", options.get("sep", ","))),
            quote=str(options.get("quote", '"')),
        )
    else:
        header = True
    spark_opts: dict[str, object] = {"header": header}
    for k, v in options.items():
        if k not in _READ_OPTS:
            raise ValueError(f"unsupported read_csv option: {k!r}")
        name, conv = _READ_OPTS[k]
        spark_opts[name] = conv(v)
    # DuckDB dialect defaults Spark's univocity parser does not share
    # (tools/fuzz_csv.py): the default ESCAPE is the quote character
    # itself (doubled-quote escaping — '' inside '…'), and quoted fields
    # may embed record separators (multiLine; trades intra-file input
    # splits for parity — pass multiline=false on known newline-free
    # files to restore them; cross-file parallelism is unaffected)
    spark_opts.setdefault("escape", spark_opts.get("quote", '"'))
    spark_opts.setdefault("multiLine", True)
    if columns:
        reader = reader.schema(
            ", ".join(f"{c} {t}" for c, t in columns.items())
        )
    elif auto_detect:
        spark_opts.setdefault("inferSchema", True)
    for k, v in spark_opts.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_csv_auto(spark: SparkSession, path: str, **options) -> DataFrame:
    """DuckDB `read_csv_auto`: sniff the dialect from a bounded sample, then
    scan with Spark's parallel CSV reader (reference sniffer,
    duckdb-internal.hpp:39284-39360; see sources/sniffer.py).

    Explicit options win over sniffed values — same precedence as the
    reference (user options pin the sniffer's search space)."""
    from quackspark.sources.sniffer import sniff_csv

    sniffed = sniff_csv(path, sample_bytes=int(options.pop("sample_bytes", 65536)))
    options.setdefault("delim", sniffed["delim"])
    options.setdefault("quote", sniffed["quote"])
    options.setdefault("header", sniffed["header"])
    if sniffed["skip"]:
        if sniffed["comment"] is None:
            raise ValueError(
                f"sniffed {sniffed['skip']} leading junk rows in {path!r} "
                "with no shared comment prefix; Spark cannot skip them — "
                "pass skip-cleaned input or an explicit dialect"
            )
        options.setdefault("comment", sniffed["comment"])
    return read_csv(spark, path, **options)


def copy_to(
    df: DataFrame,
    path: str,
    *,
    format: str = "csv",
    header: bool = True,
    delim: str = ",",
    compression: str | None = None,
    partition_by: list[str] | None = None,
    overwrite: bool = True,
) -> None:
    """`COPY rel TO 'path' (FORMAT ..., HEADER, DELIMITER, PARTITION_BY ...)`
    (duckdb-4.cpp:4689). Partitioned writes map to `partitionBy`, which also
    gives hive-style partition pruning on read-back."""
    writer = df.write.mode("overwrite" if overwrite else "error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if format == "csv":
        writer = writer.option("header", header).option("sep", delim)
        if compression:
            writer = writer.option("compression", compression)
        writer.csv(path)
    elif format == "parquet":
        if compression:
            writer = writer.option("compression", compression)
        writer.parquet(path)
    elif format == "json":
        # DuckDB COPY (FORMAT JSON) writes newline-delimited JSON —
        # exactly Spark's json sink (json extension, duckdb-7.cpp:4405)
        if compression:
            writer = writer.option("compression", compression)
        writer.json(path)
    else:
        raise ValueError(f"unsupported COPY format: {format!r}")


def from_path(spark: SparkSession, path: str, **options) -> DataFrame:
    """Replacement scan (`FROM 'file.csv'`, duckdb-6.cpp:10501-10502):
    dispatch on extension. Glob patterns pass straight through — Spark's
    path resolution handles them like the reference's glob()."""
    base = path.rstrip("/").lower()
    for ext in (".csv", ".csv.gz", ".tsv"):
        if base.endswith(ext):
            if ext == ".tsv":
                options.setdefault("delim", "\t")
                return read_csv(spark, path, **options)
            # replacement scans sniff like the reference's read_csv_auto
            return read_csv_auto(spark, path, **options)
    if base.endswith((".parquet", ".parq")) or "*" in os.path.basename(base):
        return spark.read.parquet(path)
    if base.endswith((".json", ".jsonl", ".ndjson")):
        return spark.read.json(path)
    raise ValueError(f"cannot infer format for {path!r}")
