"""Generate sf10-scale (100× the bench base) copies of the scale-critical
tables, for the one-off SCALE_SF10_DEMO measurement (not per-round bench:
~1.5 GB derived data, minutes of generation).

Same construction as make_sf1.py, but 100 replicas of the sf0.1 fixtures
with disjoint key ranges and per-replica perturbation where near-dup
semantics need it. Only the tables the demo queries touch are produced:
lineitem+orders (q1/q5 class), documents (dedup/fingerprint class),
embeddings (near-dup class).
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "localdata", "sf10")
COPIES = 100
KEY_STRIDE = 100_000_000


def main() -> int:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    for t in ["region", "nation", "customer", "supplier", "part"]:
        out = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(out):
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}' (FORMAT PARQUET)"
            )

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
    print("orders x", COPIES)

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
    print("lineitem x", COPIES)

    out = os.path.join(DST, "events.parquet")
    if not os.path.exists(out):
        # 100× events over a 100× timeline (replicas 30 days apart), same
        # user population — added r6 so the sf10 evidence run covers
        # json_group_rollup and the streaming-window batch twins too
        con.execute(f"""
            COPY (
                SELECT event_id + i * {KEY_STRIDE} AS event_id,
                       ts + INTERVAL (i * 30) DAY AS ts,
                       user_id, event_type, value, props
                FROM '{SRC}/events.parquet', range({COPIES}) t(i)
            ) TO '{out}' (FORMAT PARQUET)
        """)
    print("events x", COPIES, "(time-shifted)")

    out = os.path.join(DST, "documents.parquet")
    if not os.path.exists(out):
        con.execute(f"""
            COPY (
                SELECT doc_id + i * {KEY_STRIDE} AS doc_id,
                       text || ' rep' || i AS text,
                       lang, source
                FROM '{SRC}/documents.parquet', range({COPIES}) t(i)
            ) TO '{out}' (FORMAT PARQUET)
        """)
    print("documents x", COPIES)

    out = os.path.join(DST, "embeddings.parquet")
    if not os.path.exists(out):
        con.execute(f"""
            COPY (
                SELECT vec_id + i * {KEY_STRIDE} AS vec_id,
                       list_transform(embedding,
                                      x -> CAST(x + i * 0.0002 AS FLOAT))
                           AS embedding,
                       label
                FROM '{SRC}/embeddings.parquet', range({COPIES}) t(i)
            ) TO '{out}' (FORMAT PARQUET)
        """)
    print("embeddings x", COPIES)

    n = con.execute(f"SELECT count(*) FROM '{DST}/lineitem.parquet'").fetchone()[0]
    print(f"sf10 ready at {DST}: lineitem rows = {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
