"""Generate an sf1-scale copy of the TPC-H-ish tables (VERDICT r2 item 7).

Purpose: demonstrate fixed-cost amortization. At sf0.1 most per-query
Spark-vs-DuckDB ratios are dominated by Spark's ~0.3-1s fixed scheduling
and codegen cost against scans DuckDB finishes in milliseconds; at 10×
the data that constant should visibly collapse. The scaled tables are
derived from the driver's own sf0.1 fixtures — lineitem and orders are
replicated 10× with disjoint order keys (join fan-outs preserved: each
customer simply has 10× orders), dimensions are copied as-is.

Output: /root/repo/localdata/sf1/*.parquet (gitignored — ~500 MB of
derived data; regenerate with this script). bench.py picks the directory
up automatically and emits an "sf1" section.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "localdata", "sf1")
COPIES = 10
#: well above max o_orderkey at sf0.1 (~6e5 * 4) so replica key ranges
#: stay disjoint
KEY_STRIDE = 100_000_000


def main() -> int:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    copy_as_is = ["region", "nation", "customer", "supplier", "part"]
    for t in copy_as_is:
        out = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(out):
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}' (FORMAT PARQUET)"
            )
        print(f"{t}: copied")

    out = os.path.join(DST, "orders.parquet")
    if not os.path.exists(out):
        con.execute(f"""
            COPY (
                SELECT o_orderkey + i * {KEY_STRIDE} AS o_orderkey,
                       o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                       o_orderpriority
                FROM '{SRC}/orders.parquet', range({COPIES}) t(i)
            ) TO '{out}' (FORMAT PARQUET)
        """)
    print("orders: replicated x", COPIES)

    out = os.path.join(DST, "lineitem.parquet")
    if not os.path.exists(out):
        con.execute(f"""
            COPY (
                SELECT l_orderkey + i * {KEY_STRIDE} AS l_orderkey,
                       l_partkey, l_suppkey, l_linenumber, l_quantity,
                       l_extendedprice, l_discount, l_tax, l_returnflag,
                       l_linestatus, l_shipdate
                FROM '{SRC}/lineitem.parquet', range({COPIES}) t(i)
            ) TO '{out}' (FORMAT PARQUET)
        """)
    print("lineitem: replicated x", COPIES)

    out = os.path.join(DST, "documents.parquet")
    if not os.path.exists(out):
        # per-replica text perturbation: replicas are NEAR-duplicates
        # (clusters of 10), not exact copies — the realistic shape for the
        # dedup/pipeline operators at 10×
        con.execute(f"""
            COPY (
                SELECT doc_id + i * {KEY_STRIDE} AS doc_id,
                       text || ' rep' || i AS text,
                       lang, source
                FROM '{SRC}/documents.parquet', range({COPIES}) t(i)
            ) TO '{out}' (FORMAT PARQUET)
        """)
    print("documents: replicated x", COPIES, "(perturbed near-dups)")

    out = os.path.join(DST, "events.parquet")
    if not os.path.exists(out):
        # replicas shifted 30 days apart: 10× events over a 10× timeline,
        # same user population — sessions/rollups scale in window count
        con.execute(f"""
            COPY (
                SELECT event_id + i * {KEY_STRIDE} AS event_id,
                       ts + INTERVAL (i * 30) DAY AS ts,
                       user_id, event_type, value, props
                FROM '{SRC}/events.parquet', range({COPIES}) t(i)
            ) TO '{out}' (FORMAT PARQUET)
        """)
    print("events: replicated x", COPIES, "(time-shifted)")

    out = os.path.join(DST, "embeddings.parquet")
    if not os.path.exists(out):
        # per-replica perturbation: replicas drift by i·0.001 per element,
        # so they are near- but not exact duplicates in embedding space
        # (ANN/k-means shapes stay realistic at 10×)
        con.execute(f"""
            COPY (
                SELECT vec_id + i * {KEY_STRIDE} AS vec_id,
                       list_transform(embedding,
                                      x -> CAST(x + i * 0.001 AS FLOAT))
                           AS embedding,
                       label
                FROM '{SRC}/embeddings.parquet', range({COPIES}) t(i)
            ) TO '{out}' (FORMAT PARQUET)
        """)
    print("embeddings: replicated x", COPIES, "(perturbed)")

    n = con.execute(f"SELECT count(*) FROM '{DST}/lineitem.parquet'").fetchone()[0]
    nd = con.execute(f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
    print(f"sf1 ready at {DST}: lineitem rows = {n}, documents = {nd}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
