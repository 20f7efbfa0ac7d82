"""Differential CSV-dialect fuzzer: random files × random read_csv options,
both engines, row-for-row.

The CSV surface (reference reader options, duckdb-internal.hpp:39284-39360;
sources/csvio.py + sources/sniffer.py on our side) has the classic silent
failure mode: a dialect misread that still parses — wrong column split,
header row eaten or kept as data, quoted delimiter broken apart. This
fuzzer generates files with randomized dialects (delimiter, quote, header,
NULL spelling, quoted fields embedding delimiters/quotes/newlines, numeric
and date columns, ragged whitespace) and reads each through BOTH engines
with the same explicit options — plus a read_csv_auto pass where the
sniffer must recover the dialect unaided.

Classification mirrors tools/fuzz_sqlfront.py: MATCH / UNSUPPORTED /
DUCK_ERROR / SPARK_ERROR / MISMATCH, zero MISMATCH tolerated.

CLI: python tools/fuzz_csv.py [--n 60] [--seed 1] [--verbose]
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DELIMS = [",", ";", "|", "\t"]
QUOTES = ['"', "'"]
NULLSTRS = ["", "NULL", "\\N", "na"]


def gen_file(rng: random.Random, dirpath: str, idx: int):
    """One CSV file + the option dict both engines read it with."""
    delim = rng.choice(DELIMS)
    quote = rng.choice(QUOTES)
    header = rng.random() < 0.6
    nullstr = rng.choice(NULLSTRS)
    ncols = rng.randrange(2, 5)
    kinds = [rng.choice(["int", "str", "float", "date"]) for _ in range(ncols)]
    names = [f"c{k}" for k in range(ncols)]

    def cell(kind):
        r = rng.random()
        if r < 0.08 and nullstr != "":
            return nullstr
        if kind == "int":
            return str(rng.randrange(-1000, 1000))
        if kind == "float":
            return f"{rng.randrange(-100, 100)}.{rng.randrange(100):02d}"
        if kind == "date":
            return (f"{rng.randrange(2000, 2030):04d}-"
                    f"{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d}")
        base = rng.choice(["plain", "word", "Hello World", "x"])
        r = rng.random()
        if r < 0.25:
            # embedded delimiter / quote / newline — must be quoted
            inner = rng.choice([
                f"a{delim}b",
                f"q{quote}{quote}mid",     # escaped quote (doubled)
                "line1\nline2" if rng.random() < 0.5 else f"tail{delim}",
            ])
            return f"{quote}{inner}{quote}"
        if r < 0.35:
            return f"{quote}{base}{quote}"
        return base

    lines = []
    if header:
        lines.append(delim.join(names))
    for _ in range(rng.randrange(3, 20)):
        lines.append(delim.join(cell(k) for k in kinds))
    path = os.path.join(dirpath, f"f{idx}.csv")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    opts = {"delim": delim, "quote": quote, "header": header}
    if nullstr:
        opts["nullstr"] = nullstr
    return path, opts, names if header else None


def _canon(rows):
    out = []
    for row in rows:
        cells = []
        for c in row:
            if isinstance(c, float):
                cells.append("NaN" if math.isnan(c) else round(c, 6))
            else:
                cells.append(str(c) if c is not None else None)
        out.append(tuple(cells))
    return sorted(out, key=repr)


def run_fuzz(n: int = 60, seed: int = 1, verbose: bool = False) -> dict:
    import duckdb

    from quackspark.session import get_session
    from quackspark.sources.csvio import read_csv, read_csv_auto

    spark = get_session("csv-fuzz", cpus=8)
    dd = duckdb.connect()
    rng = random.Random(seed)
    stats = {"MATCH": 0, "UNSUPPORTED": 0, "DUCK_ERROR": 0,
             "SPARK_ERROR": 0, "MISMATCH": 0}
    failures = []
    with tempfile.TemporaryDirectory(prefix="qs_csv_fuzz_") as d:
        for i in range(n):
            path, opts, _ = gen_file(rng, d, i)
            # auto (sniffer-vs-sniffer) only on tame dialects: the two
            # sniffers legitimately diverge on exotic quotes / NULL
            # spellings / headerless ambiguous files, and DuckDB's own
            # auto misreads some of those — explicit options are the
            # parity surface; auto is compared where duck's sniff is
            # deterministic (default quote, headered, no custom nullstr)
            auto = (rng.random() < 0.35 and opts["quote"] == '"'
                    and opts["header"] and "nullstr" not in opts)
            def sql_lit(v):
                if v is True:
                    return "true"
                if v is False:
                    return "false"
                # single-quoted SQL literal; DuckDB string literals have
                # no backslash escapes (repr() would double them)
                return "'" + str(v).replace("'", "''") + "'"

            dopt = ", ".join(f"{k}={sql_lit(v)}" for k, v in opts.items())
            duck_q = (f"SELECT * FROM read_csv_auto('{path}')" if auto
                      else f"SELECT * FROM read_csv('{path}', {dopt})")
            try:
                want = _canon(dd.execute(duck_q).fetchall())
            except Exception as exc:
                stats["DUCK_ERROR"] += 1
                if verbose:
                    print(f"[{i}] DUCK_ERROR {duck_q}: {str(exc)[:120]}")
                continue
            try:
                df = (read_csv_auto(spark, path) if auto
                      else read_csv(spark, path, **opts))
                got = _canon([tuple(r) for r in df.collect()])
            except ValueError as exc:  # documented honest refusals
                stats["UNSUPPORTED"] += 1
                if verbose:
                    print(f"[{i}] UNSUPPORTED: {exc}")
                continue
            except Exception as exc:
                stats["SPARK_ERROR"] += 1
                failures.append(("SPARK_ERROR", path, opts, str(exc)[:200]))
                continue
            if got == want:
                stats["MATCH"] += 1
            else:
                stats["MISMATCH"] += 1
                failures.append(
                    ("MISMATCH", path, dict(opts, auto=auto),
                     f"duck={want[:3]!r} spark={got[:3]!r}")
                )
                # keep the offending file for triage
                import shutil

                keep = f"/tmp/csv_fuzz_fail_{seed}_{i}.csv"
                shutil.copy(path, keep)
                if verbose:
                    print(f"[{i}] MISMATCH kept at {keep}")
    stats["failures"] = failures
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    stats = run_fuzz(args.n, args.seed, args.verbose)
    failures = stats.pop("failures")
    print(stats)
    for kind, path, opts, detail in failures:
        print(f"\n--- {kind} {path} opts={opts}\n{detail}")
    return 1 if stats["MISMATCH"] else 0


if __name__ == "__main__":
    sys.exit(main())
