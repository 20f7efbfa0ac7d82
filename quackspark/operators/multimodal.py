"""Multimodal (image/audio/video) column plumbing for the training-data
pipeline: opaque `binary` payload + typed metadata struct, with decode /
feature-extract / resize / frame-sample stages as Arrow-batched
`mapInPandas` operators.

The reference stores binary payloads as BLOB (duckdb.hpp:924) with no
media semantics; this module is the capability extension that makes those
columns *processable* at scale. Design:

- payloads never pass through the driver; every stage is mapInPandas over
  Arrow batches, so the transfer cost is one columnar copy per batch and
  memory is bounded by `spark.sql.execution.arrow.maxRecordsPerBatch`.
- metadata is a typed struct column (modality/width/height/sample_rate/
  duration), so filters on it are plain Catalyst predicates that prune
  BEFORE any payload decode runs — decode only the rows you keep.
- the actual codec calls (PIL/ffmpeg/soundfile) are NOT in this
  container, so `decode_payload` routes to a clearly-marked deterministic
  fake (`_fake_decode`); the Spark-side schema, batching, and partitioning
  are real and tested, and a real codec drops in by replacing one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata struct carried alongside every payload
META_SCHEMA = StructType(
    [
        StructField("modality", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("digest", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

N_FEATURES = 8


def _fake_decode(payload: bytes) -> list[float]:
    """STUB decode: deterministic md5-derived feature vector standing in for
    a real image/audio decoder (PIL/ffmpeg are not in this container).
    Replace with a real codec to productionize; everything upstream and
    downstream of this function is production plumbing."""
    dig = hashlib.md5(payload).digest()
    return [dig[i] / 255.0 for i in range(N_FEATURES)]


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Fixture adapter: synthesize a binary payload + typed metadata from the
    `documents` table (the container ships no media fixtures). Payload =
    UTF-8 bytes of the text; metadata derived deterministically."""
    mod = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        mod.alias("modality"),
        (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.length("text") * 10).cast("int").alias("duration_ms"),
    )
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        meta.alias("meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract as one mapInPandas pass: payload bytes →
    fixed-width float vector. Arrow-batched; no row-at-a-time Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_payloads(df: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' stage: metadata is rewritten JVM-side (a pure Catalyst
    projection — free), payload transformation is the stubbed byte-level
    truncation standing in for a pixel resample."""
    target_bytes = (width * height) // 64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(lambda b: b[:target_bytes])
            yield pdf

    resized = df.select("doc_id", "payload").mapInPandas(
        run, StructType(df.select("doc_id", "payload").schema.fields)
    )
    meta = df.select(
        "doc_id",
        F.col("meta")
        .withField("width", F.lit(width).cast("int"))
        .withField("height", F.lit(height).cast("int"))
        .alias("meta"),
    )
    return resized.join(meta, "doc_id")


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for video payloads: emits ≤max_frames chunks per
    payload (stub: byte slices at duration-proportional offsets). One input
    row → N output rows, the mapInPandas row-expansion shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                n = min(max_frames, max(1, int(meta["duration_ms"]) // every_ms))
                step = max(1, len(payload) // max(n, 1))
                for i in range(n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(bytes(payload[i * step : i * step + 16]))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)
