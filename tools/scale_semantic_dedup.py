"""Semantic-dedup growth measurement → SCALE_SEMDEDUP.json.

r8 protocol (2k→200k, adaptive-k vs fixed-8) extended per VERDICT r10
next #2 with the numbers that matter after the recursive-refinement
fix:

1. `cand_pairs_exact` — Σ c·(c−1)/2 over raw cluster sizes: what the
   blocking would admit with NO banding (the upper bound; this is the
   column that hit 442 pairs/row at 200 k in r10).
2. `admitted` — the budget the shipped blocking actually admits,
   measured on the operator's own staging (semantic_pair_budget):
   exact clusters all-pairs + refined non-saturated buckets all-pairs
   + saturated buckets' linear representative compares. The r11 gate:
   `admitted.pairs_per_row` stays O(target_cluster) through 2 M rows.
3. recall cost — at 200 k (the largest size where the exact quadratic
   path is still feasible) the dup sets of the banded+refined path vs
   band=False exact are compared directly: `dups_exact`,
   `dups_banded`, `recall` = |banded ∩ exact| / |exact| (banded dups
   are a subset by construction, so the intersection is |banded|).

The 2 M tier extends the sf10 fixture the same way sf10 extends sf0.1:
10 perturbed key-strided copies (tools/make_sf10.py construction),
written once to localdata/sf100_embeddings.parquet (~1 GB).

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
EMB_2M = os.path.join(ROOT, "localdata", "sf100_embeddings.parquet")


def _ensure_2m():
    """2 M vectors = sf10 embeddings × 10, per-copy perturbation on a
    different scale than make_sf10's (0.00007 vs 0.0002) so copies are
    near- but not exactly aligned, vec_ids strided disjoint."""
    if os.path.exists(EMB_2M):
        return
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    con.execute(f"""
        COPY (
            SELECT vec_id + i * 10000000000 AS vec_id,
                   list_transform(embedding,
                                  x -> CAST(x + i * 0.00007 AS FLOAT))
                       AS embedding,
                   label
            FROM '{SF10}/embeddings.parquet', range(10) t(i)
        ) TO '{EMB_2M}' (FORMAT PARQUET)
    """)
    print("sf100 embeddings ready", file=sys.stderr)


def _corpus(spark, n: int):
    """n=2000 → the base block of sf1; 20k/200k → sf1/sf10 whole (the
    copy blocks carry offset vec_ids, so a `< n` prefix filter would
    select one block regardless of n); 2M → the sf100 extension."""
    from quackspark.queries._util import load_table

    if n == 2_000:
        return load_table(spark, SF1, "embeddings").filter("vec_id < 2000")
    if n == 2_000_000:
        _ensure_2m()
        return spark.read.parquet(EMB_2M)
    return load_table(spark, SF1 if n == 20_000 else SF10, "embeddings")


def _pair_budget(spark, e, k: int) -> tuple[int, int, int]:
    """(Σ c(c−1)/2, max cluster, clusters over the banding knee) — the
    NO-banding upper bound from raw cluster sizes."""
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
                 "split_rounds": S.SEM_SPLIT_ROUNDS,
                 "split_bits": S.SEM_SPLIT_BITS,
                 "runs": []}
    plans = [
        (2_000, "adaptive"), (20_000, "adaptive"), (200_000, "adaptive"),
        (2_000_000, "adaptive"),
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
        admitted = S.semantic_pair_budget(e, n_rows=n, k=k)
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
               "admitted": admitted, "wall_s": wall, "dups": dups}
        out["runs"].append(row)
        print(json.dumps(row))

    # recall cost at the largest exact-feasible size: banded+refined
    # dups are a subset of exact dups (every admitted pair is a true
    # pair), so recall = dups_banded / dups_exact
    e = _corpus(spark, 200_000)
    k = S.semantic_k(200_000)
    t0 = time.perf_counter()
    dups_exact = (
        S.semantic_dedup(e, n_rows=200_000, k=k, band=False)
        .filter("dup_of IS NOT NULL")
        .count()
    )
    exact_wall = round(time.perf_counter() - t0, 2)
    dups_banded = next(
        r["dups"] for r in out["runs"]
        if r["n"] == 200_000 and r["mode"] == "adaptive"
    )
    out["recall_200k"] = {
        "dups_exact": dups_exact,
        "dups_banded": dups_banded,
        "recall": round(dups_banded / max(dups_exact, 1), 4),
        "exact_wall_s": exact_wall,
    }
    print(json.dumps(out["recall_200k"]))
    with open(os.path.join(ROOT, "SCALE_SEMDEDUP.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
