"""Exact-substring dedup growth measurement → SCALE_DUPSPANS.json.

duplicate_spans / span_scrub at 5k / 50k / 500k documents (sf0.1, sf1,
sf10 fixtures — 10× then 100× the bench base). Questions, per size:

1. is the window volume (the one corpus-wide shuffle) LINEAR in the
   corpus? It must be by construction — windows/doc depends on document
   length, not corpus size — but the record pins it.
2. do duplicated windows stay a bounded fraction (the second, doc-keyed
   shuffle is dup_fraction × corpus)? The sf10 fixture is 100 replicas
   with per-replica perturbation, so duplication is high BY DESIGN
   there — the interesting column is wall seconds, not the fraction.
3. what does wall clock do vs DuckDB running the identical oracle?

Repro: python tools/make_sf10.py && python tools/scale_duplicate_spans.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, "localdata", "sf1")),
    ("sf10", os.path.join(REPO, "localdata", "sf10")),
    # r11 (VERDICT r10 next #6): one more decade — 5 M docs, the
    # sf100-equivalent tier, confirming the 0.63× crossover holds and
    # the windows/doc constant survives
    ("sf100-equivalent", os.path.join(REPO, "localdata", "sf100_docs")),
]


def _ensure_sf100_docs() -> None:
    """5 M docs = sf10 documents × 10 (the make_sf10 construction, one
    more decade): strided doc_ids, per-copy ' repx{i}' text suffix so
    copies share all interior windows — the designed worst case the
    smaller tiers already measure (97.7% of windows duplicated)."""
    dst = os.path.join(REPO, "localdata", "sf100_docs")
    out = os.path.join(dst, "documents.parquet")
    src = os.path.join(REPO, "localdata", "sf10", "documents.parquet")
    if os.path.exists(out) or not os.path.exists(src):
        return
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    con.execute(f"""
        COPY (
            SELECT doc_id + i * 10000000000 AS doc_id,
                   text || ' repx' || i AS text,
                   lang, source
            FROM '{src}', range(10) t(i)
        ) TO '{out}' (FORMAT PARQUET)
    """)
    print("sf100 documents ready", file=sys.stderr)


def main() -> int:
    _ensure_sf100_docs()
    import duckdb

    from quackspark.operators import dedup as D
    from quackspark.queries import all_oracles, all_queries
    from quackspark.session import get_session, load_table

    spark = get_session("dupspans-scale")
    qs, osql = all_queries(), all_oracles()
    out: dict = {"tool": "tools/scale_duplicate_spans.py", "sizes": {}}

    for tag, sf in SIZES:
        if not os.path.exists(os.path.join(sf, "documents.parquet")):
            print(f"skip {tag}: no fixture", file=sys.stderr)
            continue
        docs = load_table(spark, sf, "documents")
        n_docs = docs.count()

        # volume of the two shuffles, exactly as the operator builds them
        k = D._window_hash_kernel(15)
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        windows = docs.select(
            F.col("doc_id").alias("doc"), F.explode(k(F.col("text"))).alias("w")
        ).select("doc", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
        n_windows = windows.count()
        n_dup = (
            windows.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("h")))
            .filter(F.col("c") > 1)
            .count()
        )

        row: dict = {
            "docs": n_docs,
            "windows": n_windows,
            "windows_per_doc": round(n_windows / max(n_docs, 1), 1),
            "dup_windows": n_dup,
            "dup_fraction": round(n_dup / max(n_windows, 1), 4),
        }
        for name in ("dedup_duplicate_spans", "dedup_span_scrub"):
            df = qs[name](spark, sf)
            df.count()  # warmup
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            row[f"{name}_spark_sec"] = round(time.perf_counter() - t0, 2)
            con = duckdb.connect()
            con.execute(f"SET threads TO {os.cpu_count() or 8}")
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(sf, 'documents.parquet')}'"
            )
            t0 = time.perf_counter()
            con.execute(osql[name]).fetchall()
            row[f"{name}_duckdb_sec"] = round(time.perf_counter() - t0, 2)
            row[f"{name}_ratio"] = round(
                row[f"{name}_spark_sec"] / row[f"{name}_duckdb_sec"], 2
            )
            con.close()
        out["sizes"][tag] = row
        print(tag, json.dumps(row), flush=True)

    with open(os.path.join(REPO, "SCALE_DUPSPANS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
