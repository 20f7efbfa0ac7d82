"""Multimodal column queries (operators/multimodal.py): binary payload +
typed metadata, decode/feature-extract/resize/frame-sample via mapInPandas.

The decode stage is a deterministic md5-derived stub (no codec libs in
this container), which makes even the Pandas-UDF path *oracle-checkable*:
DuckDB recomputes the same md5 arithmetic in SQL, so the differential test
verifies the Arrow plumbing end-to-end (schema, batching, row expansion),
not just row counts. Binary outputs are compared by md5 digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.operators import multimodal as M
from quackspark.queries._util import load_table


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.attach_payloads(load_table(spark, sf_dir, "documents"))


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → fixed-width feature vector (stub decode) via mapInPandas."""
    out = M.extract_features(_payloads(spark, sf_dir))
    # feature list serialized to fixed-scale decimal strings: float JSON
    # rendering differs between engines, and the driver canon cannot hash
    # ArrayType columns (CORRECTNESS_r02 json_inspect)
    return out.select(
        "doc_id",
        "modality",
        "n_bytes",
        "digest",
        F.array_join(
            F.transform(
                F.col("features"),
                lambda x: F.round(x, 6).cast("decimal(18,6)").cast("string"),
            ),
            ",",
        ).alias("features"),
    ).orderBy("doc_id")


def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: ≤4 frames per payload, compared by frame digest."""
    frames = M.sample_frames(_payloads(spark, sf_dir), every_ms=1000, max_frames=4)
    return frames.select(
        "doc_id", "frame_idx", F.md5(F.col("frame")).alias("frame_md5")
    ).orderBy("doc_id", "frame_idx")


def mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: payload truncation (stub resample) + JVM-side metadata
    rewrite; verified by output digest + metadata."""
    out = M.resize_payloads(_payloads(spark, sf_dir), 128, 96)
    return out.select(
        "doc_id",
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("meta.modality").alias("modality"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).orderBy("doc_id")


def mm_filtered_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-pruned decode: the Catalyst filter on the typed metadata
    struct runs before any Python — only image rows reach the Arrow stage."""
    p = _payloads(spark, sf_dir).filter(F.col("meta.modality") == "image")
    return (
        M.extract_features(p)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("modality")
    )


def mm_feature_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval: decode payloads to feature vectors (Arrow
    stage) then exact cosine top-k over them (operators/simsearch.py) —
    the decode→embed→search composition of a multimodal pipeline, fully
    oracled because the stub decode is md5-replayable in SQL."""
    from quackspark.operators.simsearch import brute_force_topk

    feats = M.extract_features(_payloads(spark, sf_dir)).select(
        "doc_id", "features"
    )
    return brute_force_topk(
        feats,
        feats.filter(F.col("doc_id") < 5),
        vec_col="features",
        id_col="doc_id",
        k=3,
    ).orderBy("q_id", "rnk")


QUERIES = {
    "mm_feature_search": mm_feature_search,
    "mm_features": mm_features,
    "mm_frames": mm_frames,
    "mm_resize_meta": mm_resize_meta,
    "mm_filtered_decode": mm_filtered_decode,
}

_MODALITY = "['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]"
_FEATURES = ", ".join(
    f"round(('0x' || substr(md5(text), {2 * i + 1}, 2))::BIGINT / 255.0, 6)"
    for i in range(M.N_FEATURES)
)

_RAW_FEATURES = ", ".join(
    f"('0x' || substr(md5(text), {2 * i + 1}, 2))::BIGINT / 255.0"
    for i in range(M.N_FEATURES)
)


def _mm_sql_dot(a: str, b: str) -> str:
    from quackspark.queries.simsearch import _sql_dot

    return _sql_dot(a, b, dim=M.N_FEATURES)


ORACLES = {
    "mm_feature_search": f"""
        WITH f AS (
            SELECT doc_id, [{_RAW_FEATURES}] AS v FROM documents
        ), scored AS (
            SELECT q.doc_id AS q_id, c.doc_id AS c_id,
                   round({_mm_sql_dot("q.v", "c.v")}
                         / (sqrt({_mm_sql_dot("q.v", "q.v")})
                            * sqrt({_mm_sql_dot("c.v", "c.v")})), 6) AS cos
            FROM f q JOIN f c ON q.doc_id != c.doc_id
            WHERE q.doc_id < 5
        ), ranked AS (
            SELECT q_id, c_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, c_id) AS rnk
            FROM scored
        )
        SELECT q_id, CAST(rnk AS INT) AS rnk, c_id, cos
        FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk
    """,
    "mm_features": f"""
        SELECT doc_id,
               {_MODALITY} AS modality,
               CAST(length(text) AS INT) AS n_bytes,
               md5(text) AS digest,
               array_to_string(
                   list_transform([{_RAW_FEATURES}],
                       x -> CAST(CAST(round(x, 6) AS DECIMAL(18,6)) AS VARCHAR)),
                   ',') AS features
        FROM documents ORDER BY doc_id
    """,
    "mm_frames": f"""
        WITH meta AS (
            SELECT doc_id, text,
                   least(4, greatest(1, (length(text) * 10) // 1000)) AS n,
                   length(text) AS nb
            FROM documents
        ), frames AS (
            SELECT doc_id,
                   CAST(unnest(generate_series(0, CAST(n AS INT) - 1)) AS INT)
                       AS frame_idx,
                   text,
                   greatest(1, nb // n) AS step
            FROM meta
        )
        SELECT doc_id, frame_idx,
               md5(substr(text, CAST(frame_idx * step AS INT) + 1, 16)) AS frame_md5
        FROM frames ORDER BY doc_id, frame_idx
    """,
    "mm_resize_meta": f"""
        SELECT doc_id,
               md5(substr(text, 1, (128 * 96) // 64)) AS payload_md5,
               {_MODALITY} AS modality,
               CAST(128 AS INT) AS width,
               CAST(96 AS INT) AS height
        FROM documents ORDER BY doc_id
    """,
    "mm_filtered_decode": f"""
        SELECT {_MODALITY} AS modality,
               count(*) AS n,
               sum(CAST(length(text) AS BIGINT)) AS total_bytes
        FROM documents
        WHERE {_MODALITY} = 'image'
        GROUP BY 1 ORDER BY modality
    """,
}
