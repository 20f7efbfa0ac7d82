"""Semantic-dedup growth measurement → SCALE_SEMDEDUP.json (VERDICT r8
next #2 "pin with a growth measurement" — the 2k→20k protocol that
produced SCALE.md's 3 s → 211 s near-dup evidence, extended to 200k).

Three questions, answered per corpus size n ∈ {2k, 20k, 200k} (prefixes
of the sf1/sf10 embeddings fixtures):
1. does the occupancy-adaptive codebook (k = n/64 capped) hold the
   within-cluster candidate-pair count ~LINEAR in n? (fixed k=8 is the
   quadratic control — its exact-path pair count is n²/8/2.)
2. does the within-cluster SRP banding bound the pair work when
   occupancy blows past the 4096-row budget anyway (fixed k=8 at 200k:
   ~25k-row clusters → banding auto-triggers)?
3. what does the wall clock do?

Candidate-pair counts come from the cluster-size aggregate
(Σ c·(c−1)/2 — exact for the all-pairs path, an upper bound the banding
then cuts), so the record separates "pairs the blocking admits" from
"wall seconds" explicitly.

Repro: python tools/make_sf10.py && python tools/scale_semantic_dedup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, "localdata", "sf1")
SF10 = os.path.join(ROOT, "localdata", "sf10")


def _corpus(spark, n: int):
    """n=2000 → the base block of sf1; 20k/200k → sf1/sf10 whole (the
    copy blocks carry offset vec_ids, so a `< n` prefix filter would
    select one block regardless of n)."""
    from quackspark.queries._util import load_table

    if n == 2_000:
        return load_table(spark, SF1, "embeddings").filter("vec_id < 2000")
    return load_table(spark, SF1 if n == 20_000 else SF10, "embeddings")


def _pair_budget(spark, e, k: int) -> tuple[int, int, int]:
    """(Σ c(c−1)/2, max cluster, clusters over the banding knee)."""
    from pyspark.sql import functions as F

    from quackspark.operators import kmeans as KM
    from quackspark.operators import simsearch as S

    sizes = (
        KM.kmeans_assign(e, k=k, iters=2)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"),
            F.max("c").alias("mx"),
            F.sum(
                (F.col("c") > S.SEM_BAND_CLUSTER_ROWS).cast("int")
            ).alias("over"),
        )
        .collect()[0]
    )
    return int(sizes["pairs"]), int(sizes["mx"]), int(sizes["over"])


def main() -> int:
    from quackspark.operators import simsearch as S
    from quackspark.session import get_session

    spark = get_session("semdedup-scale")
    out: dict = {"target_cluster": S.SEM_TARGET_CLUSTER,
                 "k_cap": S.SEM_K_CAP,
                 "band_knee_rows": S.SEM_BAND_CLUSTER_ROWS,
                 "runs": []}
    plans = [
        (2_000, "adaptive"), (20_000, "adaptive"), (200_000, "adaptive"),
        (2_000, "fixed8"), (20_000, "fixed8"),
        # fixed k=8 at 200k is ONLY feasible because the banding knee
        # fires (25k-row clusters): the exact control would be 2.5e9
        # pairs. This row is the banding demonstration.
        (200_000, "fixed8"),
    ]
    for n, mode in plans:
        e = _corpus(spark, n)
        k = S.semantic_k(n) if mode == "adaptive" else 8
        pairs, mx, over = _pair_budget(spark, e, k)
        t0 = time.perf_counter()
        dups = (
            S.semantic_dedup(e, n_rows=n, k=k)
            .filter("dup_of IS NOT NULL")
            .count()
        )
        wall = round(time.perf_counter() - t0, 2)
        row = {"n": n, "mode": mode, "k": k, "cand_pairs_exact": pairs,
               "pairs_per_row": round(pairs / n, 1), "max_cluster": mx,
               "clusters_over_knee": over, "banding_fired": over > 0,
               "wall_s": wall, "dups": dups}
        out["runs"].append(row)
        print(json.dumps(row))
    with open(os.path.join(ROOT, "SCALE_SEMDEDUP.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
