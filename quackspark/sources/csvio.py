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
}


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
    spark_opts: dict[str, object] = {"header": options.pop("header", True)}
    for k, v in options.items():
        if k not in _READ_OPTS:
            raise ValueError(f"unsupported read_csv option: {k!r}")
        name, conv = _READ_OPTS[k]
        spark_opts[name] = conv(v)
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
