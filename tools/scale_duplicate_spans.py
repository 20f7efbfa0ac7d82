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


#: The parity oracles express first-occurrence/duplicate detection with
#: window functions over the corpus-wide hash — DuckDB-OPTIMAL at the
#: small tiers (4.3/5.0 s at sf1 vs 14.9/19.1 s for the group-by form)
#: but the window operator materializes the full per-partition sort
#: workspace: at the 5 M-doc tier (206 M windows) it OOM-killed the box
#: at 108 GB RSS and exhausted a 72 GB spill disk under a 64 GB memory
#: limit. A DuckDB user at that scale would rewrite to the group-by +
#: semi-join form below (identical rows; first occurrence as a packed
#: BIGINT min — a struct-min aggregate measured ~7× slower) — so the
#: sf100 tier times THAT as the DuckDB column and the record carries the
#: formulation story explicitly. Parity oracles are untouched.
LEAN_ORACLES = {
    "dedup_duplicate_spans": r"""
    WITH tok AS (
        SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), pos AS (
        SELECT doc, t, unnest(range(0, len(t) - 15 + 1)) AS pos
        FROM tok WHERE len(t) >= 15
    ), win AS (
        -- NOT materialized on purpose: the inlined double-reference
        -- streams tok→pos→win twice (double tokenize+md5 CPU) but the
        -- only state held is the distinct-hash aggregate (~2 M keys)
        -- and the dup-hash join build — materializing 206 M window
        -- rows exhausted the 64 GB limit + 72 GB spill
        SELECT doc, pos, md5(array_to_string(t[pos + 1 : pos + 15], ' ')) AS h
        FROM pos
    ), hstat AS (
        SELECT h, count(*) AS c FROM win GROUP BY h
    ), dup AS (
        SELECT w.doc, w.pos FROM win w JOIN hstat g USING (h) WHERE g.c > 1
    ), brk AS (
        SELECT doc, pos,
               CASE WHEN pos > coalesce(max(pos + 14) OVER (
                   PARTITION BY doc ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
               THEN 1 ELSE 0 END AS brk
        FROM dup
    ), isl AS (
        SELECT doc, pos,
               sum(brk) OVER (PARTITION BY doc ORDER BY pos) AS island
        FROM brk
    )
    SELECT doc, min(pos) AS span_start, max(pos) + 14 AS span_end,
           count(*) AS n_windows
    FROM isl GROUP BY doc, island
    ORDER BY doc, span_start
""",
    "dedup_span_scrub": r"""
    WITH tok AS (
        SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), pos AS (
        SELECT doc, t, unnest(range(0, len(t) - 15 + 1)) AS pos
        FROM tok WHERE len(t) >= 15
    ), win AS (
        SELECT doc, pos, md5(array_to_string(t[pos + 1 : pos + 15], ' ')) AS h
        FROM pos
    ), hstat AS (
        SELECT h, min(doc * 1048576 + pos) AS fkey, count(*) AS c
        FROM win GROUP BY h
    ), marked AS (
        SELECT w.doc, w.pos FROM win w JOIN hstat g USING (h)
        WHERE g.c > 1 AND w.doc * 1048576 + w.pos <> g.fkey
    ), brk AS (
        SELECT doc, pos,
               CASE WHEN pos > coalesce(max(pos + 14) OVER (
                   PARTITION BY doc ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
               THEN 1 ELSE 0 END AS brk
        FROM marked
    ), isl AS (
        SELECT doc, pos,
               sum(brk) OVER (PARTITION BY doc ORDER BY pos) AS island
        FROM brk
    ), sp AS (
        SELECT doc, min(pos) AS s, max(pos) + 14 AS e
        FROM isl GROUP BY doc, island
    ), removed AS (
        SELECT doc, sum(e - s + 1) AS n_removed FROM sp GROUP BY doc
    ), toki AS (
        SELECT doc, t, unnest(range(0, len(t))) AS i FROM tok
    ), kept AS (
        SELECT y.doc, string_agg(y.t[y.i + 1], ' ' ORDER BY y.i) AS kept_text
        FROM toki y
        WHERE NOT EXISTS (
            SELECT 1 FROM sp
            WHERE sp.doc = y.doc AND y.i BETWEEN sp.s AND sp.e
        )
        GROUP BY y.doc
    ), scr AS (
        SELECT t.doc, CAST(len(t.t) AS BIGINT) AS n_tokens,
               CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
               coalesce(k.kept_text, '') AS kept_text
        FROM tok t
        LEFT JOIN removed r ON r.doc = t.doc
        LEFT JOIN kept k ON k.doc = t.doc
    )
    SELECT doc, n_tokens, n_removed, kept_text FROM scr ORDER BY doc
""",
}


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
        lean_tier = tag == "sf100-equivalent"
        for name in ("dedup_duplicate_spans", "dedup_span_scrub"):
            df = qs[name](spark, sf)
            df.count()  # warmup
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            row[f"{name}_spark_sec"] = round(time.perf_counter() - t0, 2)
            con = duckdb.connect()
            con.execute(f"SET threads TO {os.cpu_count() or 8}")
            # bound DuckDB so a misestimate SPILLS instead of taking the
            # whole box down (the parity oracles' window form OOM-killed
            # the first r11 sweep at 108 GB RSS on the 5 M-doc tier)
            con.execute("SET memory_limit = '64GB'")
            con.execute("SET temp_directory = '/tmp/duck_spill'")
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(sf, 'documents.parquet')}'"
            )
            # sf100: the window form cannot complete on this box (see
            # LEAN_ORACLES note) — time the group-by rewrite instead and
            # say so in the record
            orc = LEAN_ORACLES[name] if lean_tier else osql[name]
            t0 = time.perf_counter()
            try:
                con.execute(orc).fetchall()
                row[f"{name}_duckdb_sec"] = round(time.perf_counter() - t0, 2)
                row[f"{name}_ratio"] = round(
                    row[f"{name}_spark_sec"] / row[f"{name}_duckdb_sec"], 2
                )
            except duckdb.Error as exc:
                # the tier outgrew the single-node oracle: record the
                # DNF instead of losing the Spark column with it
                row[f"{name}_duckdb_sec"] = None
                row[f"{name}_ratio"] = None
                row[f"{name}_duckdb_dnf"] = (
                    f"{type(exc).__name__} after "
                    f"{round(time.perf_counter() - t0, 1)}s under 64GB "
                    f"memory limit + 72GB spill disk: {str(exc)[:140]}"
                )
            if lean_tier:
                row[f"{name}_duckdb_form"] = (
                    "lean group-by rewrite (parity window form: "
                    "OOM >108GB / >72GB spill at this tier)"
                )
            if tag == "sf10":
                # calibration: the lean rewrite's cost at a tier where
                # BOTH forms complete, so the sf100 column is readable
                t0 = time.perf_counter()
                con.execute(LEAN_ORACLES[name]).fetchall()
                row[f"{name}_duckdb_lean_sec"] = round(
                    time.perf_counter() - t0, 2
                )
            if tag == "sf0.1":
                # equivalence pin: lean rewrite == parity oracle, row
                # for row, on a tier where diffing is cheap
                a = con.execute(osql[name]).fetchall()
                b = con.execute(LEAN_ORACLES[name]).fetchall()
                assert a == b, f"lean rewrite diverges for {name}"
                row[f"{name}_lean_equivalent"] = True
            con.close()
        out["sizes"][tag] = row
        print(tag, json.dumps(row), flush=True)

    with open(os.path.join(REPO, "SCALE_DUPSPANS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
