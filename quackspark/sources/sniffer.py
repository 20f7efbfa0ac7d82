"""CSV dialect sniffer — `read_csv_auto` parity.

The reference's CSV sniffer (CSVSniffer state machine,
duckdb-internal.hpp:39284-39360) samples the file and searches the
(delimiter, quote, escape, header, skip) space for the most consistent
dialect, then hands the winner to the parallel reader. Same shape here:

- the sniff reads a BOUNDED sample (``sample_bytes`` from the first file
  only — metadata-scale driver work, like the reference's
  ``sample_size`` rows), never the whole input;
- the detected dialect configures Spark's own splitting parallel CSV
  source, so the actual scan stays distributed and scales to 100 TB —
  sniffing cost is constant no matter the input size.

Search space mirrors the reference's defaults: delimiters ``, | ; \\t``,
quotes ``" '``, header detected by first-row-vs-body type disagreement,
leading junk lines detected by field-count mismatch (→ ``skip``).
"""

from __future__ import annotations

import csv
import glob as _glob
import io
import os
import re

_DELIMS = [",", "|", ";", "\t"]
_QUOTES = ['"', "'"]

#: body-cell type detectors, most-specific first (reference type-detection
#: order: BOOLEAN < BIGINT < DOUBLE < TIME < DATE < TIMESTAMP < VARCHAR,
#: duckdb-internal.hpp:39300ff)
_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?$")
_BOOL = {"true", "false", "t", "f", "0", "1"}  # 0/1 counted as int first


def _cell_type(cell: str) -> str:
    c = cell.strip()
    if c == "":
        return "null"
    if _INT_RE.match(c):
        return "bigint"
    if _FLOAT_RE.match(c):
        return "double"
    if _TS_RE.match(c):
        return "timestamp"
    if _DATE_RE.match(c):
        return "date"
    if c.lower() in ("true", "false"):
        return "boolean"
    return "varchar"


def _read_sample(path: str, sample_bytes: int) -> str:
    """First ``sample_bytes`` of the first matching file (driver-side)."""
    matches = sorted(_glob.glob(path)) if any(ch in path for ch in "*?[") else [path]
    if not matches or not os.path.exists(matches[0]):
        raise FileNotFoundError(path)
    first = matches[0]
    if first.endswith(".gz"):
        import gzip

        with gzip.open(first, "rt", errors="replace") as f:
            return f.read(sample_bytes)
    with open(first, "rt", errors="replace") as f:
        return f.read(sample_bytes)


def _parse(
    sample: str, delim: str, quote: str, truncated: bool
) -> list[list[str]]:
    try:
        rows = list(
            csv.reader(io.StringIO(sample), delimiter=delim, quotechar=quote)
        )
    except csv.Error:
        return []
    # drop the final row only when the byte-bounded sample actually cut the
    # file short (a clean small file's last row is real data)
    if truncated and len(rows) > 1:
        rows = rows[:-1]
    return [r for r in rows if r]


def _consistency(rows: list[list[str]]) -> tuple[float, int]:
    """(fraction of post-preamble rows at the modal width, modal width) —
    the sniffer's scoring function: a correct dialect parses almost every
    sampled row to the same column count (reference consistency check,
    duckdb-internal.hpp:39330ff). Rows before the first modal-width row are
    treated as skippable preamble, not inconsistency — otherwise a wrong
    delimiter that degenerates every line to one field scores a perfect
    width-1 parse and beats the real dialect on a file with junk headers."""
    if not rows:
        return 0.0, 0
    widths: dict[int, int] = {}
    for r in rows:
        widths[len(r)] = widths.get(len(r), 0) + 1
    mode_w, _ = max(widths.items(), key=lambda kv: (kv[1], kv[0]))
    start = next(i for i, r in enumerate(rows) if len(r) == mode_w)
    body = rows[start:]
    return sum(len(r) == mode_w for r in body) / len(body), mode_w


def sniff_csv(path: str, sample_bytes: int = 64 * 1024) -> dict:
    """Detect ``{delim, quote, header, skip, columns}`` from a sample.

    ``columns`` is the per-column body type (sample-derived) — advisory;
    the caller normally still lets Spark's ``inferSchema`` do the final
    distributed type pass, exactly like the reference re-validates sniffed
    types during the real scan.
    """
    sample = _read_sample(path, sample_bytes)
    truncated = len(sample) >= sample_bytes
    best = None  # (score tuple, delim, quote, rows, width)
    for delim in _DELIMS:
        for quote in _QUOTES:
            rows = _parse(sample, delim, quote, truncated)
            cons, width = _consistency(rows)
            if width < 1 or not rows:
                continue
            # prefer: consistent parses, then wider tables (a wrong
            # delimiter yields width 1 at 100% consistency), then the
            # earlier-listed quote (") on ties
            score = (cons, width)
            if best is None or score > best[0]:
                best = (score, delim, quote, rows, width)
    if best is None:
        raise ValueError(f"cannot sniff CSV dialect of {path!r}")
    _, delim, quote, rows, width = best

    # leading-junk detection: rows before the first run of modal-width rows
    skip = 0
    for r in rows:
        if len(r) == width:
            break
        skip += 1
    # junk lines sharing a first character → Spark's `comment` option can
    # drop them distributedly (Spark has no skip-N-rows; a shared prefix is
    # how such preambles almost always look: '#', '//', ';')
    comment = None
    if skip:
        firsts = {r[0][0] for r in rows[:skip] if r[0]}
        if len(firsts) == 1:
            comment = firsts.pop()
    body = [r for r in rows[skip:] if len(r) == width]

    # header: first row is all-varchar/non-null while some column's body
    # (rest of sample) has a non-varchar type — the reference's rule
    header = False
    if len(body) >= 2:
        first, rest = body[0], body[1:]
        first_types = [_cell_type(c) for c in first]
        col_types = []
        for i in range(width):
            ts = {_cell_type(r[i]) for r in rest} - {"null"}
            if not ts:
                col_types.append("varchar")
            elif ts <= {"bigint", "double"}:
                col_types.append("double" if "double" in ts else "bigint")
            elif len(ts) == 1:
                col_types.append(next(iter(ts)))
            else:
                col_types.append("varchar")
        if all(t == "varchar" for t in first_types):
            # typed body → the all-varchar first row is a header; all-varchar
            # body → undecidable from types, and the reference defaults to
            # header=true there (verified against duckdb read_csv_auto)
            header = True
    else:
        col_types = ["varchar"] * width

    return {
        "delim": delim,
        "quote": quote,
        "header": header,
        "skip": skip,
        "comment": comment,
        "columns": col_types,
    }
