"""Distributed Lloyd k-means over an embedding column — the codebook
trainer the IVF index (operators/simsearch.py::ivf_topk) slots in, and
the corpus-bucketing primitive for embedding-space data curation
(cluster-then-sample, domain balancing).

The reference has no clustering operator; its users export vectors and
cluster outside the engine. Here each Lloyd round is two shuffles,
both partial-agg friendly:
  1. assignment: corpus ⨯ broadcast(K centroids) → argmin squared-L2
     (min-of-struct, tie → lowest centroid id) — a map-side projection
     plus one groupBy(vec) min;
  2. update: posexplode to (cluster, dim) cells → order-independent
     exact mean (queries/_util.davg long-scaled path) → rebuild the
     centroid arrays with an array_sort(collect_list(struct)) — K×DIM
     rows total, trivially small however large the corpus.

Determinism contract (what lets the DuckDB oracle replay it
bit-for-bit): seed centroids are the K smallest-id vectors; distances
fold left in dimension order (same shape as simsearch._sql_dot); means
go through the scaled-long exact path; ties break on centroid id.

At 100 TB: the corpus is scanned once per round; above 2 rounds
kmeans_fit automatically persists the projected (id, vec) frame (and
cuts centroid lineage per round), eagerly unpersisting before return.
The only all-data shuffle is the per-vector argmin groupBy, keyed by
vec id — uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from quackspark.queries._util import davg

__all__ = ["sqdist", "kmeans_fit", "kmeans_assign"]


def sqdist(a: Column, b: Column) -> Column:
    """Squared L2, folded left in dimension order (float jitter-free
    across engines: identical op sequence)."""
    d = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, embedding) ⨯ broadcast(cluster, cent) → per-vector
    argmin; keeps the embedding for the next update step.

    Expression form — kept as the reference implementation the Arrow path
    is pinned against (tests/test_kmeans_fts.py). The hot path is
    :func:`_assign_arrow`: the crossJoin+groupBy costs K interpreted
    64-step folds per vector plus a corpus shuffle, where the kernel is
    one map-only numpy pass (measured 6.9× vs DuckDB at sf1 → ~1×)."""
    j = vecs.crossJoin(F.broadcast(cents))
    j = j.withColumn("d2", sqdist(F.col("embedding"), F.col("cent")))
    return (
        j.groupBy("vec_id")
        .agg(
            F.min(F.struct(F.col("d2").alias("d"), F.col("cluster").alias("c"))).alias(
                "m"
            ),
            F.first("embedding").alias("embedding"),
        )
        .select(
            "vec_id",
            "embedding",
            F.col("m.c").alias("cluster"),
            F.col("m.d").alias("d2"),
        )
    )


def _assign_arrow(vecs: DataFrame, cent_rows: list) -> DataFrame:
    """Map-only argmin assignment: centroids arrive as collected rows
    (K×DIM driver metadata — the same bounded round-trip the broadcast
    made anyway) and one Arrow kernel computes every distance in numpy,
    replaying the exact IEEE op sequence of :func:`sqdist` (cast to
    float64, per-dimension (x−y)·(x−y), left-fold ascending over
    dimensions) so distances — and therefore assignments, tie-breaks
    (lowest cluster id), and the DuckDB oracle — match the expression
    form bit-for-bit. ZERO shuffle: the crossJoin and the groupBy(vec)
    min disappear."""
    import numpy as np
    import pandas as pd

    ordered = sorted(cent_rows, key=lambda r: r["cluster"])
    ids = np.array([r["cluster"] for r in ordered], dtype=np.int64)
    C = np.array([[float(x) for x in r["cent"]] for r in ordered])  # K × DIM

    @F.pandas_udf("struct<cluster: int, d2: double>")
    def _arg(col):
        a = np.vstack(col.to_numpy()).astype(np.float64)  # n × DIM
        n = a.shape[0]
        acc = np.zeros((n, C.shape[0]))
        buf = np.empty_like(acc)
        for i in range(a.shape[1]):
            # in-place (x−y)·(x−y) then add: the IDENTICAL IEEE op
            # sequence as the allocating form, ~2× less memory traffic —
            # at k in the hundreds the n×k temporaries were the dominant
            # cost of the whole dedup (SCALE_SEMDEDUP.json r10)
            np.subtract(a[:, i : i + 1], C[:, i], out=buf)
            np.multiply(buf, buf, out=buf)
            acc += buf
        best = np.argmin(acc, axis=1)  # first minimum → lowest cluster id
        return pd.DataFrame(
            {"cluster": ids[best].astype(np.int32),
             "d2": acc[np.arange(n), best]}
        )

    return vecs.select(
        "vec_id", "embedding", _arg(F.col("embedding")).alias("m")
    ).select(
        "vec_id", "embedding", F.col("m.cluster").alias("cluster"),
        F.col("m.d2").alias("d2"),
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroid = exact per-dimension mean of the members."""
    cells = assigned.select(
        "cluster", F.posexplode("embedding").alias("i", "x")
    )
    # cast BEFORE the scaled-long mean: float*int stays float otherwise,
    # and the two engines' float rounding would diverge
    means = cells.groupBy("cluster", "i").agg(
        davg(F.col("x").cast("double")).alias("m")
    )
    return means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
        ).alias("cent")
    )


def kmeans_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Train the codebook: `iters` Lloyd rounds from the deterministic
    seed (the K smallest-id vectors). Returns (cluster, cent) — the
    centroids the final assignment runs against (feed this straight
    into simsearch.ivf_topk's `codebook=`)."""
    vecs = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    # deep iteration (> 2 rounds): cache the projected (id, vec) frame so
    # every Lloyd round reads the corpus from memory instead of rescanning
    # the source, and cut the centroid lineage per round (the plan would
    # otherwise grow a full assign+update subtree per iteration). Eagerly
    # unpersisted before returning; the 2-round benched path is untouched.
    deep = iters > 2
    if deep:
        vecs = vecs.persist()
    cents = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").cast("int").alias("cluster"),
            F.col("embedding").alias("cent"),
        )
    )
    for _ in range(iters - 1):
        # per-round driver round-trip is K×DIM centroid metadata (the same
        # payload the broadcast shipped); collecting it also resets the
        # logical plan each round, so lineage stays O(1) in iterations
        cents = _update(_assign_arrow(vecs, cents.collect()))
        if deep:
            cents = cents.localCheckpoint(eager=True)  # K rows
    if deep:
        vecs.unpersist()
    return cents


def kmeans_assign(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Run `iters` Lloyd rounds and return (vec_id, cluster, d2) — the
    final assignment with its squared distance."""
    vecs = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    cents = kmeans_fit(df, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    return _assign_arrow(vecs, cents.collect()).select(
        "vec_id", "cluster", F.round("d2", 6).alias("d2")
    )
