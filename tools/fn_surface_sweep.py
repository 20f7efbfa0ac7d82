"""Function-surface sweep: probe DuckDB's own scalar-function catalog
against the sqlfront translation, differentially.

For every scalar function in ``duckdb_functions()`` (reference catalog,
duckdb-6.cpp:5993-6040) build a type-directed sample invocation, keep the
first one the ORACLE executes, then run the identical text through
Connection.sql and classify:

- OK          values match
- MISSING     UnsupportedSQL (honest posture — counted, not failed)
- MISMATCH    both run, values differ (the bad bucket: silent wrong)
- ERR         engine-level failure (bad: confusing error for real surface)

The r12 run of this tool surfaced and fixed: gamma/lgamma returning the
integer-factorial value for fractional inputs, strptime/strftime leaking
literal letters into Java patterns, to_binary/bin hex-decoding instead of
bit-printing, parse_dirname/dirpath('nosep') returning the input,
json_object coercing values through a MAP, json_array_length NULL-for-0,
first-match-only regexp_replace, TIME-carrier extraction overloads, BIT
length family, TIMESTAMPTZ typed literals, timezone()/age()/make_time/
make_timestamp(µs)/add/subtract/multiply/greatest-least(1-arg)/
json_contains/from_binary.

Usage: python tools/fn_surface_sweep.py [name-substring ...]
"""

from __future__ import annotations

import itertools
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLES = {
    "VARCHAR": ["'abc'", "'Hello World'"],
    "INTEGER": ["7"], "BIGINT": ["7"], "SMALLINT": ["7"], "TINYINT": ["3"],
    "HUGEINT": ["7"], "UBIGINT": ["7"], "UINTEGER": ["7"],
    "USMALLINT": ["7"], "UTINYINT": ["3"], "UHUGEINT": ["7"],
    "DOUBLE": ["2.5"], "FLOAT": ["2.5"], "DECIMAL": ["2.5"],
    "BOOLEAN": ["true"],
    "DATE": ["DATE '2024-03-05'"],
    "TIMESTAMP": ["TIMESTAMP '2024-03-05 12:30:45'"],
    "TIMESTAMP WITH TIME ZONE": ["TIMESTAMPTZ '2024-03-05 12:30:45+00'"],
    "TIMESTAMP_NS": ["TIMESTAMP '2024-03-05 12:30:45'"],
    "TIME": ["TIME '12:30:45'"],
    "TIME WITH TIME ZONE": ["TIMETZ '12:30:45+00'"],
    "INTERVAL": ["INTERVAL 3 DAY"],
    "BLOB": ["'ab'::BLOB"],
    "BIT": ["'1010'::BIT"],
    "UUID": ["'5a0f875f-3d2d-46d4-9e48-5a4a1d5ba203'::UUID"],
    "JSON": ["'{\"a\":1,\"b\":[1,2]}'::JSON"],
    "VARCHAR[]": ["['a','b','c']"],
    "BIGINT[]": ["[1,2,3]"], "INTEGER[]": ["[1,2,3]"],
    "DOUBLE[]": ["[1.0,2.0,3.0]"], "FLOAT[]": ["[1.0,2.0,3.0]"],
    "ANY[]": ["[1,2,3]"], "ANY": ["7", "'abc'"],
    "T": ["7"], "T[]": ["[1,2,3]"],
}

#: skipped: ICU collation shims (loadable extension — refused by design),
#: internal compression helpers, nondeterministic/now-dependent fns, and
#: aggregate-combine machinery that has no scalar call form
SKIP = re.compile(
    r"^(icu_|__internal|gen_random|random$|uuid$|now$|current_|"
    r"get_current|today$|transaction_timestamp|error$|version$|pg_|"
    r"uuid_extract|in_search_path|txid_current|finalize$|combine$|"
    r"create_sort_key$|alias$|current_query$)"
)


def args_for(ptypes):
    opts = []
    for p in ptypes:
        p = p.strip()
        if p in SAMPLES:
            opts.append(SAMPLES[p])
        elif p.endswith("[]"):
            opts.append(SAMPLES.get(p, ["[1,2,3]"]))
        elif p.startswith("DECIMAL"):
            opts.append(["2.5"])
        elif p.startswith("MAP"):
            opts.append(["map(['k'],[1])"])
        elif p.startswith("STRUCT"):
            opts.append(["{'a': 1}"])
        elif p.startswith(("UNION", "ENUM")) or "LAMBDA" in p or "->" in p:
            return None
        elif p == "NULL":
            opts.append(["NULL"])
        elif p == "INVALID":
            return None
        else:
            opts.append(["7"])
    return opts


def build_probes(dd):
    rows = dd.execute(
        "SELECT function_name, parameter_types FROM duckdb_functions() "
        "WHERE function_type='scalar' "
        "ORDER BY function_name, len(parameter_types)"
    ).fetchall()
    probes: dict[str, str] = {}
    for name, ptypes in rows:
        if not re.match(r"^[a-z_][a-z0-9_]*$", name) or SKIP.search(name):
            continue
        if name in probes:
            continue
        opts = args_for(ptypes or [])
        if opts is None:
            continue
        for combo in itertools.islice(itertools.product(*opts), 4):
            q = f"SELECT {name}({', '.join(combo)}) AS v"
            try:
                dd.execute(q).fetchall()
                probes[name] = q
                break
            except Exception:
                continue
    return probes


def cells_match(w, g):
    import datetime

    if isinstance(w, datetime.datetime) and w.tzinfo is not None:
        w = w.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(g, datetime.datetime) and g.tzinfo is not None:
        g = g.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if isinstance(w, float) and isinstance(g, (int, float)):
        return (math.isnan(w) and isinstance(g, float) and math.isnan(g)) \
            or abs(w - g) <= 1e-9 * max(1.0, abs(w))
    if isinstance(w, list) and isinstance(g, list):
        return len(w) == len(g) and all(cells_match(a, b) for a, b in zip(w, g))
    return str(w) == str(g)


#: documented representation/carrier divergences — values are correct under
#: the repo's stated conventions but fetch differently than the oracle
DIVERGES = {
    "hash": "engine-specific 64-bit hash (DuckDB murmur finalize vs Spark)",
    "array_distinct": "distinct ORDER is unspecified in both engines",
    "list_distinct": "distinct ORDER is unspecified in both engines",
    "map": "duckdb client fetches MAP as {'key': [...], 'value': [...]}",
    "make_time": "TIME rides the µs-since-midnight BIGINT carrier",
    "age": "bare age() returns the y/m/d marker struct date_part consumes",
    "repeat": "BLOB carrier repeats as STRING (binary repeat, same bytes)",
    "to_centuries": "CalendarIntervalType has no PySpark fetch",
    "to_days": "CalendarIntervalType has no PySpark fetch",
    "to_decades": "CalendarIntervalType has no PySpark fetch",
    "to_hours": "CalendarIntervalType has no PySpark fetch",
    "to_microseconds": "CalendarIntervalType has no PySpark fetch",
    "to_millennia": "CalendarIntervalType has no PySpark fetch",
    "to_milliseconds": "CalendarIntervalType has no PySpark fetch",
    "to_minutes": "CalendarIntervalType has no PySpark fetch",
    "to_months": "CalendarIntervalType has no PySpark fetch",
    "to_quarters": "CalendarIntervalType has no PySpark fetch",
    "to_seconds": "CalendarIntervalType has no PySpark fetch",
    "to_weeks": "CalendarIntervalType has no PySpark fetch",
    "to_years": "CalendarIntervalType has no PySpark fetch",
    "to_timestamp": "oracle fetches TIMESTAMPTZ tz-aware; same instant",
}


def main():
    import duckdb

    from quackspark.relation import Connection
    from quackspark.session import get_session
    from quackspark.sqlfront import UnsupportedSQL

    dd = duckdb.connect()
    probes = build_probes(dd)
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    if filters:
        probes = {k: v for k, v in probes.items()
                  if any(f in k for f in filters)}
    print(f"{len(probes)} oracle-executable probes", file=sys.stderr)

    spark = get_session("fn-surface-sweep")
    con = Connection(spark)
    buckets = {"OK": [], "MISSING": [], "MISMATCH": [], "ERR": [],
               "DIVERGES": []}
    for name, q in sorted(probes.items()):
        if name in DIVERGES:
            buckets["DIVERGES"].append(name)
            print(f"DIVERGES {name}: {DIVERGES[name]}")
            continue
        want = dd.execute(q).fetchall()
        try:
            got = [tuple(r) for r in con.sql(q).df.collect()]
        except UnsupportedSQL as e:
            buckets["MISSING"].append(name)
            print(f"MISSING  {name}: {str(e)[:90]}")
            continue
        except Exception as e:
            buckets["ERR"].append(name)
            print(f"ERR      {name}: {type(e).__name__}: {str(e)[:110]}")
            continue
        if got and want and cells_match(want[0][0], got[0][0]):
            buckets["OK"].append(name)
        else:
            buckets["MISMATCH"].append(name)
            print(f"MISMATCH {name}: {q}")
            print(f"         duck={want!r:.100} ours={got!r:.100}")
    print("\n=== fn-surface sweep summary ===")
    for k, v in buckets.items():
        print(f"{k:9s} {len(v)}")
    return 1 if buckets["MISMATCH"] else 0


if __name__ == "__main__":
    sys.exit(main())
