"""Similarity-search queries over `embeddings` (operators/simsearch.py):
brute-force cosine top-k, SRP-LSH approximate top-k, embedding near-dup
pairs. Oracles recompute the identical double-cast left-fold arithmetic
and the identical md5-derived SRP sign constants, so the differential
check verifies the scores bit-for-bit, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.operators import kmeans as KM
from quackspark.operators import simsearch as S
from quackspark.queries._util import load_table, o_davg

K = 5
N_QUERIES = 5
THRESHOLD = 0.45


def _load(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir)
    return S.brute_force_topk(
        e, e.filter(F.col("vec_id") < N_QUERIES), k=K
    ).orderBy("q_id", "rnk")


def sim_bruteforce_heap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition-heap form of exact top-k (VERDICT r8 next #5): one
    mapInPandas pass keeps only candidates that can still make the
    global top-k, so the exchange carries ~batches × queries × k rows
    instead of corpus × queries. Same oracle as sim_bruteforce_topk —
    the two forms are result-identical by construction."""
    e = _load(spark, sf_dir)
    return S.brute_force_topk_heap(
        e, e.filter(F.col("vec_id") < N_QUERIES), k=K
    ).orderBy("q_id", "rnk")


def sim_srp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir)
    return S.srp_lsh_topk(
        e, e.filter(F.col("vec_id") < N_QUERIES), k=K
    ).orderBy("q_id", "rnk")


N_CENT = 16
NPROBE = 2


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (operators/simsearch.py::ivf_topk): deterministic
    codebook → map-side cell assignment → nprobe probe → exact rerank."""
    e = _load(spark, sf_dir)
    return S.ivf_topk(
        e,
        e.filter(F.col("vec_id") < N_QUERIES),
        n_centroids=N_CENT,
        nprobe=NPROBE,
        k=K,
    ).orderBy("q_id", "rnk")


def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir)
    return S.embedding_neardup_pairs(e, threshold=THRESHOLD).orderBy("d1", "d2")


N_KMEANS = 8


def sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic Lloyd rounds (operators/kmeans.py) — the IVF
    codebook trainer as a first-class query. The oracle replays the
    identical seed, fold order, exact-mean path, and tie-break, so the
    differential check verifies the whole iteration, not one round."""
    e = _load(spark, sf_dir)
    return KM.kmeans_assign(e, k=N_KMEANS, iters=2).orderBy("vec_id")


def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED quantizer: the two-round Lloyd codebook
    (operators/kmeans.kmeans_fit) feeds ivf_topk's `codebook=` — the
    full train-then-probe composition, end-to-end oracled."""
    e = _load(spark, sf_dir)
    cb = KM.kmeans_fit(e, k=N_KMEANS, iters=2)
    return S.ivf_topk(
        e,
        e.filter(F.col("vec_id") < N_QUERIES),
        nprobe=NPROBE,
        k=K,
        codebook=cb,
    ).orderBy("q_id", "rnk")


def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method) — operators/simsearch.semantic_dedup, with the r10
    occupancy-adaptive codebook (VERDICT r8 next #2): k = max(8,
    min(256, n // 64)) via the memoized corpus count, so per-cluster
    pair work stays constant as the corpus grows; clusters past the
    1024-row pair budget additionally get within-cluster SRP banding
    (never triggered at oracle scale — the split is deterministic). The
    oracle replays the CHOSEN k (the same greatest/least/integer-divide
    over count(*)), the identical two Lloyd rounds, fold arithmetic, and
    round-to-6 threshold compare, so survivors match bit-for-bit."""
    e = _load(spark, sf_dir)
    return S.semantic_dedup(e, threshold=THRESHOLD).orderBy("vec_id")


QUERIES = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_bruteforce_heap": sim_bruteforce_heap,
    "sim_kmeans": sim_kmeans,
    "sim_ivf_kmeans_topk": sim_ivf_kmeans_topk,
    "sim_srp_lsh_topk": sim_srp_lsh_topk,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_embedding_neardup": sim_embedding_neardup,
    "sim_semantic_dedup": sim_semantic_dedup,
}

# --- oracle SQL builders ---


def _sql_dot(a: str, b: str, dim: int = S.DIM) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
    )


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"round({_sql_dot(a, b)} / "
        f"(sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)})), 6)"
    )


def _sql_srp_sig(vec: str) -> str:
    terms = []
    for p in range(S.N_PLANES):
        signs = "[" + ", ".join(str(s) for s in S.srp_signs(p)) + "]"
        proj = _sql_dot(vec, signs)
        terms.append(f"(CASE WHEN {proj} > 0 THEN CAST({2**p} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _sql_band_keys(sig: str) -> str:
    keys = ", ".join(
        f"'{b}:' || ((sig >> {b * S.BAND_BITS}) & {2**S.BAND_BITS - 1})"
        for b in range(S.N_BANDS)
    )
    return f"(SELECT [{keys}] FROM (SELECT {sig} AS sig) _bk)"


_SIG_CTE = f"""
    sig AS (
        SELECT vec_id, embedding,
               sqrt({_sql_dot("embedding", "embedding")}) AS nrm,
               {_sql_srp_sig("embedding")} AS s
        FROM embeddings
    ), banded AS (
        SELECT vec_id, embedding, nrm,
               unnest({_sql_band_keys("s")}) AS band
        FROM sig
    )
"""

def _sql_cosine_raw(a: str, b: str) -> str:
    return (
        f"{_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}))"
    )


ORACLES = {
    "sim_ivf_topk": f"""
        WITH cents AS (
            SELECT vec_id AS cid, embedding AS cvec
            FROM embeddings WHERE vec_id < {N_CENT}
        ), assign AS (
            SELECT e.vec_id, e.embedding, cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_sql_cosine_raw("e.embedding", "cvec")} DESC, cid
                   ) AS rn
            FROM embeddings e, cents
        ), cells AS (
            SELECT vec_id AS c_id, embedding AS c_vec, cid AS cell
            FROM assign WHERE rn = 1
        ), qprobe AS (
            SELECT vec_id AS q_id, embedding AS q_vec, cid AS cell
            FROM assign WHERE vec_id < {N_QUERIES} AND rn <= {NPROBE}
        ), cand AS (
            SELECT DISTINCT q_id, q_vec, c_id, c_vec
            FROM qprobe JOIN cells USING (cell)
            WHERE q_id != c_id
        ), scored AS (
            SELECT q_id, c_id, {_sql_cosine("q_vec", "c_vec")} AS cos
            FROM cand
        ), ranked AS (
            SELECT q_id, c_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, c_id) AS rnk
            FROM scored
        )
        SELECT q_id, CAST(rnk AS INT) AS rnk, c_id, cos
        FROM ranked WHERE rnk <= {K} ORDER BY q_id, rnk
    """,
    "sim_bruteforce_topk": f"""
        WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                   {_sql_cosine("q.embedding", "c.embedding")} AS cos
            FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ), ranked AS (
            SELECT q_id, c_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, c_id) AS rnk
            FROM scored
        )
        SELECT q_id, CAST(rnk AS INT) AS rnk, c_id, cos
        FROM ranked WHERE rnk <= {K} ORDER BY q_id, rnk
    """,
    "sim_srp_lsh_topk": f"""
        WITH {_SIG_CTE},
        cand AS (
            SELECT DISTINCT q.vec_id AS q_id, q.embedding AS q_vec, q.nrm AS q_nrm,
                            c.vec_id AS c_id, c.embedding AS c_vec, c.nrm AS c_nrm
            FROM banded q JOIN banded c
              ON q.band = c.band AND q.vec_id != c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ), scored AS (
            SELECT q_id, c_id,
                   round({_sql_dot("q_vec", "c_vec")} / (q_nrm * c_nrm), 6) AS cos
            FROM cand
        ), ranked AS (
            SELECT q_id, c_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, c_id) AS rnk
            FROM scored
        )
        SELECT q_id, CAST(rnk AS INT) AS rnk, c_id, cos
        FROM ranked WHERE rnk <= {K} ORDER BY q_id, rnk
    """,
    "sim_embedding_neardup": f"""
        WITH {_SIG_CTE},
        cand AS (
            SELECT DISTINCT a.vec_id AS d1, a.embedding AS v1, a.nrm AS n1,
                            b.vec_id AS d2, b.embedding AS v2, b.nrm AS n2
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.vec_id < b.vec_id
        ), scored AS (
            SELECT d1, d2,
                   round({_sql_dot("v1", "v2")} / (n1 * n2), 6) AS cos
            FROM cand
        )
        SELECT d1, d2, cos FROM scored
        WHERE cos >= {THRESHOLD}
        ORDER BY d1, d2
    """,
}


# --- k-means oracle: replay both Lloyd rounds in SQL ---


def _sql_sqdist(a: str, b: str, dim: int = S.DIM) -> str:
    """Mirror of operators/kmeans.sqdist: left fold in dimension order."""
    t = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        f"i -> {t} * {t})), (x, y) -> x + y)"
    )


def _sql_km_assign(cent_cte: str) -> str:
    return f"""
        SELECT vec_id, embedding, cluster, d2 FROM (
            SELECT vec_id, embedding, cluster, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cluster) AS rk
            FROM (SELECT e.vec_id, e.embedding, c.cluster,
                         {_sql_sqdist("e.embedding", "c.cent")} AS d2
                  FROM embeddings e CROSS JOIN {cent_cte} c) _d
        ) _r WHERE rk = 1
    """


ORACLES["sim_kmeans"] = f"""
    WITH seed AS (
        SELECT CAST(vec_id AS INT) AS cluster, embedding AS cent
        FROM embeddings ORDER BY vec_id LIMIT {N_KMEANS}
    ), a1 AS ({_sql_km_assign("seed")}
    ), cent2 AS (
        SELECT cluster, list(m ORDER BY i) AS cent FROM (
            SELECT cluster, i, {o_davg("CAST(embedding[i] AS DOUBLE)")} AS m
            FROM (SELECT cluster, embedding,
                         unnest(generate_series(1, {S.DIM})) AS i
                  FROM a1) _c
            GROUP BY cluster, i
        ) _m GROUP BY cluster
    ), a2 AS ({_sql_km_assign("cent2")})
    SELECT vec_id, cluster, round(d2, 6) AS d2
    FROM a2 ORDER BY vec_id
"""


# IVF with the trained quantizer: Lloyd rounds (seed → a1 → cent2), then
# the same probe/rerank pipeline as sim_ivf_topk against cent2
ORACLES["sim_ivf_kmeans_topk"] = f"""
    WITH seed AS (
        SELECT CAST(vec_id AS INT) AS cluster, embedding AS cent
        FROM embeddings ORDER BY vec_id LIMIT {N_KMEANS}
    ), a1 AS ({_sql_km_assign("seed")}
    ), cent2 AS (
        SELECT cluster, list(m ORDER BY i) AS cent FROM (
            SELECT cluster, i, {o_davg("CAST(embedding[i] AS DOUBLE)")} AS m
            FROM (SELECT cluster, embedding,
                         unnest(generate_series(1, {S.DIM})) AS i
                  FROM a1) _c
            GROUP BY cluster, i
        ) _m GROUP BY cluster
    ), cents AS (
        SELECT cluster AS cid, cent AS cvec FROM cent2
    ), assign AS (
        SELECT e.vec_id, e.embedding, cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_sql_cosine_raw("e.embedding", "cvec")} DESC, cid
               ) AS rn
        FROM embeddings e, cents
    ), cells AS (
        SELECT vec_id AS c_id, embedding AS c_vec, cid AS cell
        FROM assign WHERE rn = 1
    ), qprobe AS (
        SELECT vec_id AS q_id, embedding AS q_vec, cid AS cell
        FROM assign WHERE vec_id < {N_QUERIES} AND rn <= {NPROBE}
    ), cand AS (
        SELECT DISTINCT q_id, q_vec, c_id, c_vec
        FROM qprobe JOIN cells USING (cell)
        WHERE q_id != c_id
    ), scored AS (
        SELECT q_id, c_id, {_sql_cosine("q_vec", "c_vec")} AS cos
        FROM cand
    ), ranked AS (
        SELECT q_id, c_id, cos,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cos DESC, c_id) AS rnk
        FROM scored
    )
    SELECT q_id, CAST(rnk AS INT) AS rnk, c_id, cos
    FROM ranked WHERE rnk <= {K} ORDER BY q_id, rnk
"""


# SemDeDup replay: the identical Lloyd rounds (seed → a1 → cent2 → a2),
# then within-cluster pairs with the identical round-to-6 cosine compare.
# The seed LIMIT replays the occupancy-adaptive k — same greatest/least/
# integer-divide the Spark side computes (operators/simsearch.semantic_k)
# window-filter form, not LIMIT: a subquery LIMIT is valid DuckDB but
# Spark requires a foldable limit, and this oracle must also run
# through quackspark's own frontend in the corpus sweep — rn <= scalar
# subquery is identical in both engines
_SEM_K_SQL = (
    f"greatest(8, least({S.SEM_K_CAP}, "
    f"(SELECT count(*) FROM embeddings) // {S.SEM_TARGET_CLUSTER}))"
)
ORACLES["sim_semantic_dedup"] = f"""
    WITH seed AS (
        SELECT cluster, cent FROM (
            SELECT CAST(vec_id AS INT) AS cluster, embedding AS cent,
                   row_number() OVER (ORDER BY vec_id) AS qs_rn
            FROM embeddings
        ) _s WHERE qs_rn <= {_SEM_K_SQL}
    ), a1 AS ({_sql_km_assign("seed")}
    ), cent2 AS (
        SELECT cluster, list(m ORDER BY i) AS cent FROM (
            SELECT cluster, i, {o_davg("CAST(embedding[i] AS DOUBLE)")} AS m
            FROM (SELECT cluster, embedding,
                         unnest(generate_series(1, {S.DIM})) AS i
                  FROM a1) _c
            GROUP BY cluster, i
        ) _m GROUP BY cluster
    ), a2 AS ({_sql_km_assign("cent2")}
    ), ve AS (
        SELECT e.vec_id, a2.cluster, e.embedding
        FROM embeddings e JOIN a2 USING (vec_id)
    ), dup AS (
        SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
        FROM ve a JOIN ve b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE {_sql_cosine("a.embedding", "b.embedding")} >= {THRESHOLD}
        GROUP BY b.vec_id
    )
    SELECT ve.vec_id, ve.cluster, dup.dup_of AS dup_of,
           dup.dup_of IS NULL AS kept
    FROM ve LEFT JOIN dup USING (vec_id) ORDER BY ve.vec_id
"""

# the heap form is result-identical to the window form by construction,
# so it shares the window form's oracle verbatim
ORACLES["sim_bruteforce_heap"] = ORACLES["sim_bruteforce_topk"]
