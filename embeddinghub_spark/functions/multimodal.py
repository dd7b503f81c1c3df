"""Multimodal (image/audio/video) column plumbing for LLM pipelines.

Beyond-reference operators (BASELINE.json: "multimodal columns").
Media is an opaque ``binary`` column plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` — the only places Python touches data, and each is
batch-shaped (one pandas frame per Arrow batch, never per-row calls).

The actual codec step is STUBBED in this environment (no image/audio
libraries in the container): ``extractor="fake"`` produces a
deterministic bytes-derived feature vector so the Spark-side plumbing
(schema, batching, partitioning) is fully real and testable;
``extractor="real"`` raises NotImplementedError at the exact point a
PIL/librosa/ffmpeg call would go.

Scale notes: media bytes dominate row size — partition sizing uses
byte-budgets, not row counts (``repartition_by_bytes``); metadata-only
stages select away the binary column so Tungsten never carries blobs
through shuffles that don't need them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StructField,
    StructType,
)

MEDIA_META_COLS = ("media_size_bytes", "media_md5", "media_mime")


def with_media_metadata(
    df: DataFrame, binary_col: str = "media", mime_col: str | None = None
) -> DataFrame:
    """Typed metadata for an opaque binary column — all JVM-side."""
    out = df.withColumn(
        "media_size_bytes", F.length(F.col(binary_col)).cast("long")
    ).withColumn("media_md5", F.md5(F.col(binary_col)))
    mime = F.col(mime_col) if mime_col else F.lit("application/octet-stream")
    return out.withColumn("media_mime", mime)


def _fake_feature_vector(data: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-media embedding: an
    md5 HEX-STRING chain (block k+1 = md5 of block k's hex digest)
    expanded to ``dim`` floats in [-1, 1). Chaining over hex strings —
    not raw digest bytes — keeps the whole derivation replayable in
    any engine whose md5 takes strings (DuckDB's md5 is VARCHAR-only),
    which is what lets the plumbing be oracle-checked even though the
    real codec is env-stubbed. Each float is an exact multiple of
    2^-31, so double arithmetic on the values is exact."""
    out: list[float] = []
    block = hashlib.md5(data).hexdigest()
    while len(out) < dim:
        for i in range(0, 32, 8):
            if len(out) >= dim:
                break
            v = int(block[i : i + 8], 16)
            out.append((v / 2**31) - 1.0)
        block = hashlib.md5(block.encode("ascii")).hexdigest()
    return out


def extract_media_features(
    df: DataFrame,
    binary_col: str = "media",
    id_cols: list[str] | None = None,
    dim: int = 32,
    extractor: str = "fake",
    batch_target_rows: int = 256,
) -> DataFrame:
    """Decode + featurize media bytes → ``feature`` array<float>.

    ``mapInPandas`` so each Arrow batch is processed vectorized; the
    output schema drops the binary payload (features only), so the
    expensive bytes never cross the downstream shuffles.
    """
    ids = id_cols or [c for c in df.columns if c != binary_col][:1]
    out_schema = StructType(
        [df.schema[c] for c in ids]
        + [StructField("feature", ArrayType(FloatType()), False)]
    )

    if extractor not in ("fake", "real"):
        raise ValueError(f"unknown extractor {extractor!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if extractor == "real":
                raise NotImplementedError(
                    "real media decode requires image/audio codecs not present "
                    "in this environment; plug PIL/librosa/ffmpeg here"
                )
            feats = [
                _fake_feature_vector(b if b is not None else b"", dim)
                for b in pdf[binary_col]
            ]
            out = pdf[ids].copy()
            out["feature"] = feats
            yield out

    return df.select(*ids, binary_col).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    binary_col: str = "media",
    id_cols: list[str] | None = None,
    n_frames: int = 4,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    with (frame_idx, frame_bytes). The codec is stubbed: frames are
    deterministic byte-slices standing in for decoded frames, but the
    explode shape, schema, and per-batch behavior match the real op."""
    ids = id_cols or [c for c in df.columns if c != binary_col][:1]
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            # byte-slice stand-in for frame decode (substr is 1-based)
            F.substring(
                F.col(binary_col),
                (i * (F.length(F.col(binary_col)) / n_frames).cast("int")) + 1,
                (F.length(F.col(binary_col)) / n_frames).cast("int"),
            ).alias("frame_bytes"),
        ),
    )
    return (
        df.select(*ids, F.explode(chunks).alias("fr"))
        .select(*ids, F.col("fr.frame_idx").alias("frame_idx"),
                F.col("fr.frame_bytes").alias("frame_bytes"))
    )


def repartition_by_bytes(
    df: DataFrame,
    size_col: str = "media_size_bytes",
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Partition count from total payload bytes, not row count — media
    rows vary by orders of magnitude (same 128 MB heuristic as the
    reference's online push, runner :617-660)."""
    total = df.agg(F.sum(size_col).alias("b")).collect()[0]["b"] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)
