"""Sweep every oracle SQL string through Connection.sql and classify.

Usage: python tools/sqlfront_corpus_sweep.py [name-substring ...]

For each query in ``oracle_sql()`` run the DuckDB-dialect text through the
sqlfront transpiler on Spark and compare the result to DuckDB's own
execution (the same differential the driver uses). Classifies each as:

- MATCH        transpiles, runs, exact value match
- MISMATCH     transpiles + runs but values differ   (worst: silent wrong)
- UNSUPPORTED  raises UnsupportedSQL                 (honest posture)
- ERROR        engine-level failure                  (bad: confusing error)

The corpus-driven growth loop (VERDICT r1 #4): drive MISMATCH and ERROR
to zero; shrink UNSUPPORTED below 20%.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quackspark.oracle import compare
from quackspark.relation import Connection
from quackspark.session import get_session, register_testdata_views
from quackspark.sqlfront import UnsupportedSQL

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    osql = m.oracle_sql()
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    if filters:
        osql = {k: v for k, v in osql.items() if any(f in k for f in filters)}

    spark = get_session("corpus-sweep")
    register_testdata_views(spark, SF_DIR)
    con = Connection(spark)

    buckets: dict[str, list[str]] = {
        "MATCH": [], "MISMATCH": [], "UNSUPPORTED": [], "ERROR": []
    }
    for name, sql in sorted(osql.items()):
        try:
            df = con.sql(sql).df
        except UnsupportedSQL as exc:
            buckets["UNSUPPORTED"].append(name)
            print(f"UNSUPPORTED {name}: {exc}")
            continue
        except Exception as exc:
            buckets["ERROR"].append(name)
            msg = str(exc).replace("\n", " ")[:200]
            print(f"ERROR       {name}: {type(exc).__name__}: {msg}")
            if "-v" in sys.argv:
                traceback.print_exc()
            continue
        try:
            probs = compare(df, sql, SF_DIR)
        except Exception as exc:
            buckets["ERROR"].append(name)
            print(f"ERROR       {name}: collect: {str(exc)[:200]}")
            continue
        if probs:
            buckets["MISMATCH"].append(name)
            print(f"MISMATCH    {name}: {probs[0][:200]}")
        else:
            buckets["MATCH"].append(name)
            print(f"MATCH       {name}")

    total = sum(len(v) for v in buckets.values())
    print("\n=== corpus sweep summary ===")
    for k, v in buckets.items():
        print(f"{k:12s} {len(v):4d}  ({100 * len(v) / max(total, 1):.0f}%)")
    print(f"total        {total}")
    for k in ("MISMATCH", "ERROR"):
        if buckets[k]:
            print(f"\n{k}: {', '.join(buckets[k])}")


if __name__ == "__main__":
    main()
