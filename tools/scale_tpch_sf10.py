"""Bound the TPC-H single-node gap with sf10 evidence (VERDICT r4
directive 1, carried to r5 directive 4).

The nine sf1-weak queries (q1 q3 q5 q9 q10 q13 q21 json_group_rollup
sw_tumbling) are correct and cluster-shaped but looked 4–40× slower than
single-node DuckDB at sf1 in late-session bench sections. This tool
produces the demanded evidence at sf10 (100× the bench base, 60 M
lineitem rows), uncontended, one process:

1. WARM medians: per query, one untimed warmup then median of 3 timed
   runs (single run when the first timed run exceeds ONE_RUN_ABOVE —
   growth questions don't need podium medians on 10 s queries), with the
   bench's persisted-block + GC hygiene between queries.
2. DuckDB same protocol on the same parquet (bench.bench_duckdb).
3. Stage breakdown for the worst joins (q5/q9/q10) from the profiled
   plan (catalog.explain_analyze — real SQLMetrics, not estimates):
   scan time vs shuffle bytes/time vs join/agg/sort time, so the floor
   has a NAME (scan-bound / exchange-bound / floor-bound).
4. Raw-layout A/B (r7): the mainline now reads the derived storage
   layout (sources/derived.py — orderkey-bucketed facts, materialized
   money longs, shredded JSON), so the WEAK section measures it
   directly; a second pass re-runs the formerly-exchange-bound queries
   with QUACKSPARK_DERIVED=0 to record exactly what the layout buys.

Output: SCALE_TPCH_SF10.json (committed); SCALE.md summarizes.

Repro: python tools/make_sf10.py && python tools/scale_tpch_sf10.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "localdata", "sf10"
)
WEAK = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q21_waiting_supplier",
    "json_group_rollup",
    "sw_tumbling",
    # r8 (r7 verdict directive 3): every weak-graded query gets a
    # largest-SF row — q6 and json_extract_scalar had only sub-second
    # sf1 absolutes behind their grades; q18 joins as the big-agg shape
    "q6_forecast_revenue",
    "json_extract_scalar",
    "q18_large_orders",
]
BREAKDOWN = [
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q10_returned_items",
    # r10 (r8 verdict directive 3): name q13's floor — where do its
    # 0.89 s go (two tiny aggs vs a live exchange)?
    "q13_customer_distribution",
    # r11 (r10 verdict directive 3): name the q1/q3 floors — both are
    # expected scan-bound (q1 has no join at all; q3's joins probe
    # broadcast dims), so their exchange bytes should be trivial and
    # the residual is the single-JVM parquet-scan floor
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_orders",
]
#: r10 (r8 verdict directive 1): same-session A/B of the month-major
#: within-bucket sort (the v5 ordering, now the 'ym' policy) vs the
#: key-major default — the r8 record showed q21 +36% / q9 +35%
#: Spark-side with DuckDB flat and the v5 sort was the prime suspect.
#: The first r10 A/B confirmed it (month-major lost all seven), so
#: key-major became the v6 DEFAULT and this section now measures the
#: retired ordering as the alternative. q3/q9/q21 are the join family;
#: q5/q6/q10 are the date-pruning wins month-major was built for.
SORT_AB = [
    "q3_shipping_priority",
    "q9_product_profit",
    "q21_waiting_supplier",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q1_pricing_summary",
]
#: the five formerly-exchange-bound queries (one lineitem exchange each —
#: join resp. groupBy on orderkey) that the bucketed layout de-shuffles
BUCKET_TWINS = BREAKDOWN + ["q3_shipping_priority", "q21_waiting_supplier"]
ONE_RUN_ABOVE = 8.0

#: metrics worth carrying into the committed JSON, by substring
_KEEP_METRICS = (
    "scan time",
    "shuffle write time",
    "fetch wait time",
    "time to build",
    "time in aggregation",
    "sort time",
    "shuffle bytes written",
    "records written",
    "records read",
    "numOutputRows",
    "data size",
    # Exchange nodes report no numOutputRows — their row/byte truth is
    # the shuffle-write pair (camelCase in the SQLMetrics names)
    "shuffleRecordsWritten",
    "shuffleBytesWritten",
)


def _warm_median(spark, fn, drop) -> float:
    """One untimed warmup, then median of 3 timed runs — with the bench's
    persisted-block + System.gc hygiene BETWEEN runs, not just between
    queries: a prior query's uncollected shuffle/broadcast metadata can
    inflate the first timed run past ONE_RUN_ABOVE and turn the median
    into a single contaminated measurement (observed r6: q21 8.9 s in a
    late-tool JVM vs 4.5 s stable with per-run hygiene)."""
    fn().count()  # warmup: plan + codegen + page cache
    drop()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        drop()
        if runs[0] > ONE_RUN_ABOVE:
            break
    return round(statistics.median(runs), 3)


def _breakdown(spark, df) -> dict:
    """Aggregate the profiled plan's SQLMetrics by operator class."""
    from quackspark.catalog import explain_analyze

    prof = explain_analyze(df)
    agg: dict[str, dict[str, int]] = {}
    for row in prof.collect():
        op, metric, value = row["operator"], row["metric"], row["value"]
        if not any(k in metric for k in _KEEP_METRICS):
            continue
        # "Join" must be tested BEFORE "Shuffle": ShuffledHashJoin is a
        # JOIN — r8-r10 records classified its output rows as "exchange",
        # which misread q9/q10 as carrying a fact-sized exchange they
        # do not have (the actual Exchange rows are the partial-agg
        # states; AQEShuffleRead re-reads are still counted as exchange)
        cls = (
            "scan"
            if "Scan" in op
            else "join"
            if "Join" in op
            else "exchange"
            if "Exchange" in op or "Shuffle" in op
            else "agg"
            if "Aggregate" in op
            else "sort"
            if op == "Sort"
            else "other"
        )
        agg.setdefault(cls, {})
        key = metric.split("(")[0].strip()
        agg[cls][key] = agg[cls].get(key, 0) + int(value)
    return agg


def main() -> int:
    import argparse

    import bench
    from quackspark.entry import queries
    from quackspark.session import _TABLE_CACHE, get_session

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--skip-ab",
        action="store_true",
        help="skip the sort-policy A/B (rebuilds month-major fact twins, "
        "~20 min) and carry the previous record's sort_ab sections "
        "forward verbatim, annotated with their source. Use when the "
        "sort adjudication is settled and only the mainline numbers "
        "need refreshing.",
    )
    args = ap.parse_args()

    if not os.path.isdir(SF10):
        print("run tools/make_sf10.py first", file=sys.stderr)
        return 1
    spark = get_session("sf10-tpch")
    qs = queries()
    drop = lambda: bench._drop_persisted(spark)  # noqa: E731
    out: dict = {"sf": 10, "spark": {}, "duckdb": {}, "ratio": {}}

    for name in WEAK:
        out["spark"][name] = _warm_median(
            spark, lambda: qs[name](spark, SF10), drop
        )
        print("spark", name, out["spark"][name], flush=True)

    out["duckdb"] = bench.bench_duckdb(WEAK, sf_dir=SF10, one_run_above=10.0)
    # input-symmetric column (r7 verdict directive 1): DuckDB on its own
    # native storage format, mirroring the Spark side's derived layout
    out["duckdb_native"] = bench.bench_duckdb(
        WEAK, sf_dir=SF10, one_run_above=10.0, native=True
    )
    out["ratio_native"] = {}
    for n in WEAK:
        d = out["duckdb"].get(n, -1)
        if d > 0 and out["spark"][n] > 0:
            out["ratio"][n] = round(out["spark"][n] / d, 2)
        dn = out["duckdb_native"].get(n, -1)
        if dn > 0 and out["spark"][n] > 0:
            out["ratio_native"][n] = round(out["spark"][n] / dn, 2)

    out["stage_breakdown"] = {}
    for name in BREAKDOWN:
        out["stage_breakdown"][name] = _breakdown(spark, qs[name](spark, SF10))
        drop()
        print("breakdown", name, flush=True)

    # --- sort-policy A/B (r8 verdict directive 1) -----------------------
    # Mainline (key-major, the v6 default) numbers are the WEAK medians
    # above; the 'ym' pass rebuilds the fact twins month-major in their
    # own dirs and re-measures the same queries in THIS session, so the
    # comparison is same-JVM same-page-cache. The ym twin dir is deleted
    # afterwards (it exists only for this record). delta_pct = how much
    # SLOWER month-major is.
    from quackspark.sources import derived as _derived

    record_path = os.path.abspath(
        os.path.join(os.path.dirname(SF10), "..", "SCALE_TPCH_SF10.json")
    )
    if args.skip_ab:
        prev = {}
        if os.path.exists(record_path):
            with open(record_path) as f:
                prev = json.load(f)
        for k in ("sort_ab", "sort_ab_reverse_order"):
            if k in prev:
                out[k] = prev[k]
                out[k]["carried_from_previous_record"] = True
        return _finish(out, spark, qs, drop, _TABLE_CACHE, record_path)

    out["sort_ab"] = {"key": {n: out["spark"][n] for n in SORT_AB
                              if n in out["spark"]},
                      "ym": {}}
    for name in SORT_AB:  # all are WEAK members today; belt-and-braces
        if name not in out["sort_ab"]["key"]:
            out["sort_ab"]["key"][name] = _warm_median(
                spark, lambda: qs[name](spark, SF10), drop
            )
    os.environ["QUACKSPARK_SORT_POLICY"] = "ym"
    _TABLE_CACHE.clear()
    ym_dir = os.path.join(_derived.DERIVED_ROOT, _derived.layout_tag(SF10))
    try:
        for name in SORT_AB:
            out["sort_ab"]["ym"][name] = _warm_median(
                spark, lambda: qs[name](spark, SF10), drop
            )
            print("sort_ab ym", name, out["sort_ab"]["ym"][name],
                  flush=True)
    finally:
        os.environ.pop("QUACKSPARK_SORT_POLICY", None)
        _TABLE_CACHE.clear()
        import shutil

        shutil.rmtree(ym_dir, ignore_errors=True)
    out["sort_ab"]["delta_pct"] = {
        n: round(100.0 * (out["sort_ab"]["ym"][n] / out["sort_ab"]["key"][n]
                          - 1.0), 1)
        for n in SORT_AB
        if out["sort_ab"]["key"].get(n)
    }

    return _finish(out, spark, qs, drop, _TABLE_CACHE, record_path)


def _finish(out, spark, qs, drop, table_cache, record_path) -> int:
    # --- raw-layout A/B ------------------------------------------------
    # Since r7 the derived storage layout (sources/derived.py: bucketed
    # facts + materialized money longs + shredded JSON) IS the mainline —
    # the WEAK section above already measured it. This section re-runs
    # the formerly-exchange-bound queries with the layout DISABLED (raw
    # parquet reads) so the committed record carries the layout's delta
    # at 100× directly.
    out["raw_layout"] = {}
    os.environ["QUACKSPARK_DERIVED"] = "0"
    table_cache.clear()
    try:
        for name in BUCKET_TWINS + ["q1_pricing_summary", "json_group_rollup"]:
            out["raw_layout"][name] = _warm_median(
                spark, lambda: qs[name](spark, SF10), drop
            )
            print("raw layout", name, out["raw_layout"][name], flush=True)
    finally:
        os.environ.pop("QUACKSPARK_DERIVED", None)
        table_cache.clear()

    with open(record_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
