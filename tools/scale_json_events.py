"""JSON/event-family 100× amortization record → SCALE_JSON_EVENTS.json
(VERDICT r8 next #4).

json_extract_scalar sits at ~87× DuckDB-native at sf10-per-round scale
with a 0.245 s absolute, and json_group_rollup's grade likewise rests on
the "per-stage floors amortize" argument. This tool commits the growth
curve that argument needs: both queries at events = 100 k (sf0.1 base),
1 M (sf1, 10×), and 10 M (sf10, 100×) rows, both engines, one process —
if the floor story is true, Spark's seconds grow ≪ linearly while the
ratio falls with scale (the same shape SCALE_SF10_DEMO pinned for the
LLM ops in r4).

Protocol: bench hygiene (persisted-block drop + System.gc between runs),
warm median of 3 (tools/scale_tpch_sf10._warm_median), DuckDB side via
bench.bench_duckdb on the same parquet.

Repro: python tools/make_sf1.py && python tools/make_sf10.py &&
       python tools/scale_json_events.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIERS = [
    ("sf0.1", "/root/testdata/sf0.1", 100_000),
    ("sf1", os.path.join(ROOT, "localdata", "sf1"), 1_000_000),
    ("sf10", os.path.join(ROOT, "localdata", "sf10"), 10_000_000),
]
QUERIES = ["json_extract_scalar", "json_group_rollup"]


def main() -> int:
    import bench
    from quackspark.entry import queries
    from quackspark.session import get_session
    from tools.scale_tpch_sf10 import _warm_median

    spark = get_session("json-events-scale")
    qs = queries()
    drop = lambda: bench._drop_persisted(spark)  # noqa: E731
    out: dict = {"queries": QUERIES, "tiers": []}
    for tag, sf_dir, rows in TIERS:
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        tier: dict = {"tier": tag, "events_rows": rows, "spark": {},
                      "duckdb": {}, "ratio": {}}
        for name in QUERIES:
            tier["spark"][name] = _warm_median(
                spark, lambda: qs[name](spark, sf_dir), drop
            )
            print(tag, "spark", name, tier["spark"][name], flush=True)
        tier["duckdb"] = bench.bench_duckdb(QUERIES, sf_dir=sf_dir,
                                            one_run_above=10.0)
        for n in QUERIES:
            d = tier["duckdb"].get(n, -1)
            if d and d > 0:
                tier["ratio"][n] = round(tier["spark"][n] / d, 2)
        out["tiers"].append(tier)
    # growth factors vs the 100 k base
    if len(out["tiers"]) >= 2:
        base = out["tiers"][0]
        out["growth_vs_base"] = {
            t["tier"]: {
                n: {
                    "rows_x": round(t["events_rows"] / base["events_rows"]),
                    "spark_x": round(t["spark"][n] / base["spark"][n], 2)
                    if base["spark"][n] else None,
                }
                for n in QUERIES
            }
            for t in out["tiers"][1:]
        }
    with open(os.path.join(ROOT, "SCALE_JSON_EVENTS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
