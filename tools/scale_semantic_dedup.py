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


def sampled_recall(spark, corpus, *, n: int, k: int,
                   sample_per_class: int = 5_000,
                   threshold: float = 0.45) -> dict:
    """Sampled exact-neighbor recall at tiers where the full exact
    quadratic is infeasible (VERDICT r11 next #5 / wrong #2: 0.9998 was
    measured at 200 k only, while the 2 M tier has 7.48 M row-slots on
    the saturated-bucket linear path — exactly where misses would live
    if the refinement bits correlate within near-dup families).

    Protocol: run the shipped banded dedup once (localCheckpoint pins
    cluster assignment AND decisions), then draw a deterministic
    md5-ordered stratified sample of ``sample_per_class`` dropped +
    ``sample_per_class`` kept rows and compute each sampled row's EXACT
    within-cluster decision (∃ lower-id cluster-mate at cos ≥ τ, same
    round-6 rule as the operator) by joining the broadcast sample
    against the full membership — Σ cluster-size-per-sample pair
    compares, NOT n². Admitted pairs are exact-verified by
    construction, so dropped rows are true dups; the unknown is the
    kept-side miss fraction f_k, and

        recall = D / (D + f_k · K)

    with D/K the total dropped/kept counts. The dropped-side sample is
    still exact-checked as a subset-property sanity row (expect 1.0)."""
    from pyspark.sql import functions as F

    from quackspark.operators import simsearch as S

    res = S.semantic_dedup(corpus, n_rows=n, k=k).localCheckpoint()
    by_kept = {r["kept"]: r["cnt"] for r in
               res.groupBy("kept").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    D, K = by_kept.get(False, 0), by_kept.get(True, 0)

    # deterministic md5-ordered draw per class as a distributed TopK
    # (TakeOrderedAndProject — no full sort materializes), not a
    # 2-partition window sort
    def _draw(kept: bool):
        return (
            res.filter(F.col("kept") == kept)
            .orderBy(F.md5(F.col("vec_id").cast("string")))
            .limit(sample_per_class)
            .select("vec_id", "cluster", "kept")
        )

    samp = _draw(True).unionByName(_draw(False)).localCheckpoint()
    vecs = corpus.select(
        "vec_id",
        F.col("embedding").alias("vec"),
        S.norm(F.col("embedding")).alias("nrm"),
    )
    members = res.select("vec_id", "cluster").join(vecs, "vec_id")
    samp_v = samp.join(vecs, "vec_id")
    hits = (
        members.alias("m")
        .join(
            F.broadcast(samp_v).alias("s"),
            (F.col("s.cluster") == F.col("m.cluster"))
            & (F.col("m.vec_id") < F.col("s.vec_id")),
        )
        .select(
            F.col("s.vec_id").alias("vec_id"),
            (
                F.round(
                    S.dot_arrow(F.col("s.vec"), F.col("m.vec"))
                    / (F.col("s.nrm") * F.col("m.nrm")),
                    6,
                )
                >= F.lit(threshold)
            ).alias("hit"),
        )
        .groupBy("vec_id")
        .agg(F.max("hit").alias("exact_dup"))
    )
    checked = (
        samp.join(hits, "vec_id", "left_outer")
        .na.fill({"exact_dup": False})
        .groupBy("kept")
        .agg(
            F.count(F.lit(1)).alias("n_samp"),
            F.sum(F.col("exact_dup").cast("int")).alias("n_exact_dup"),
        )
        .collect()
    )
    per = {r["kept"]: r for r in checked}
    f_k = per[True]["n_exact_dup"] / max(per[True]["n_samp"], 1)
    dropped_subset_ok = (
        per.get(False) is None
        or per[False]["n_exact_dup"] == per[False]["n_samp"]
    )
    est_missed = f_k * K
    recall = D / max(D + est_missed, 1)
    import math

    se = math.sqrt(max(f_k * (1 - f_k), 1e-12) / max(per[True]["n_samp"], 1))
    return {
        "n": n,
        "k": k,
        "dropped_total": D,
        "kept_total": K,
        "sample_per_class": sample_per_class,
        "kept_miss_fraction": round(f_k, 6),
        "kept_miss_fraction_se": round(se, 6),
        "est_missed_dups": int(est_missed),
        "recall": round(recall, 5),
        "recall_low_2se": round(D / max(D + (f_k + 2 * se) * K, 1), 5),
        "dropped_sample_all_exact": bool(dropped_subset_ok),
    }


def recall_tiers(spark) -> dict:
    """500 k + 2 M sampled-recall rows. The 500 k tier is a
    deterministic 25 % id-slice of the 2 M fixture (vec_id % 4 = 0 —
    spans all 10 perturbed copies, so the near-dup family structure
    survives the cut)."""
    from quackspark.operators import simsearch as S  # noqa: F401

    out = {}
    _ensure_2m()
    full = spark.read.parquet(EMB_2M)
    half = full.filter("vec_id % 4 = 0")
    n500 = half.count()
    for label, corpus, n in (("500k", half, n500), ("2M", full, 2_000_000)):
        t0 = time.perf_counter()
        row = sampled_recall(spark, corpus, n=n, k=S.semantic_k(n))
        row["wall_s"] = round(time.perf_counter() - t0, 2)
        out[label] = row
        print(json.dumps({label: row}))
    return out


def main() -> int:
    import argparse

    from quackspark.operators import simsearch as S
    from quackspark.session import get_session

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--recall-only",
        action="store_true",
        help="run ONLY the 500k/2M sampled-recall section (VERDICT r11 "
        "#5) and append it to the existing SCALE_SEMDEDUP.json",
    )
    args = ap.parse_args()
    if args.recall_only:
        spark = get_session("semdedup-recall")
        path = os.path.join(ROOT, "SCALE_SEMDEDUP.json")
        with open(path) as f:
            rec = json.load(f)
        rec["recall_sampled"] = recall_tiers(spark)
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        return 0

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
    # sampled recall where exact-full is infeasible (r12, VERDICT r11 #5)
    out["recall_sampled"] = recall_tiers(spark)
    with open(os.path.join(ROOT, "SCALE_SEMDEDUP.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
