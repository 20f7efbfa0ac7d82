"""One-off 100× scale demonstration → SCALE_SF10_DEMO.json.

Measures the scale-critical operator classes at sf10 (100× the bench
base: 60 M lineitem rows, 500 k documents, 200 k vectors) on BOTH
engines, with the growth factors vs the per-round sf0.1 numbers. The
questions this answers, per SCALE.md:
- do the one-shuffle TPC-H plans stay ~linear at 100×?
- does occupancy-adaptive near-dup banding hold pairs ~linear (the r4
  fix for the quadratic 4-bit blow-up)?
- do the Arrow-kernel text paths keep their ~1× ratio when the corpus
  no longer fits a single scan split?

Repro: python tools/make_sf10.py && python tools/scale_sf10_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "localdata", "sf10")

DEMO = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "text_fingerprint",
    "fts_bm25_topk",
    "dedup_minhash_lsh",
    "sim_embedding_neardup",
    "sim_kmeans",
]
#: oracle side skipped where super-linear (same rule as bench SF1_SPARK_ONLY)
SPARK_ONLY = {"sim_embedding_neardup"}


def main() -> int:
    import bench
    from quackspark.entry import queries
    from quackspark.session import get_session

    spark = get_session("sf10-demo")
    qs = queries()
    out: dict = {"sf": 10, "copies_of_sf01": 100, "spark": {}, "duckdb": {}}
    for name in DEMO:
        t0 = time.perf_counter()
        qs[name](spark, SF10).write.format("noop").mode("overwrite").save()
        out["spark"][name] = round(time.perf_counter() - t0, 2)
        print("spark", name, out["spark"][name], flush=True)
        bench._drop_persisted(spark)
    duck = bench.bench_duckdb(
        [n for n in DEMO if n not in SPARK_ONLY], sf_dir=SF10, one_run_above=5.0
    )
    out["duckdb"] = duck
    for name in DEMO:
        d = duck.get(name, -1)
        if out["spark"][name] > 0 and d and d > 0:
            out.setdefault("ratio_spark_vs_duckdb", {})[name] = round(
                out["spark"][name] / d, 3
            )
    path = os.path.join(os.path.dirname(SF10), "..", "SCALE_SF10_DEMO.json")
    with open(os.path.abspath(path), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
