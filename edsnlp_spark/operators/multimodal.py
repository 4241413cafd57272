"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star requirement (BASELINE.json): treat image/audio/video as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas``.  The actual media codecs are NOT in this container, so
the decode step is STUBBED: ``decode_stub=True`` produces deterministic
pseudo-features from the bytes; ``decode_stub=False`` raises
NotImplementedError where a real libvips/ffmpeg call would go.  The
Spark-side plumbing — schema, batching, partition sizing — is real and
tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, duration_ms int"
)
FEATURE_DDL = (
    "doc_id long, media_type string, n_bytes int, checksum string, "
    "feat array<float>"
)


def attach_blob(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Demo payload builder: encode a text column to a binary blob +
    metadata struct (real pipelines read blobs from parquet/object
    storage; the schema is what matters)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, decode_stub: bool = True,
                     feat_dim: int = 8) -> DataFrame:
    """mapInPandas feature extractor over (doc_id, blob, meta).

    Arrow delivers the binary column zero-copy per batch; at 100 TB the
    unit of parallelism is the input file split, and
    spark.sql.files.maxPartitionBytes bounds per-task blob volume.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["blob"], pdf["meta"]):
                if not decode_stub:
                    raise NotImplementedError(
                        "real media decode requires libvips/ffmpeg; "
                        "not available in this container"
                    )
                digest = hashlib.md5(bytes(blob)).hexdigest()
                # deterministic pseudo-features from the digest
                feat = [
                    int(digest[2 * i: 2 * i + 2], 16) / 255.0
                    for i in range(feat_dim)
                ]
                rows.append((
                    doc_id, meta["media_type"], len(blob), digest, feat,
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "checksum", "feat"],
            )

    return df.mapInPandas(run, FEATURE_DDL)


RESIZED_DDL = "doc_id long, blob binary, meta struct<" + MEDIA_META_DDL + ">"
FRAME_DDL = ("doc_id long, frame_idx int, ts_ms int, frame binary, "
             "media_type string")


def resize_media(df: DataFrame, width: int = 224, height: int = 224,
                 decode_stub: bool = True) -> DataFrame:
    """mapInPandas resize stage: (doc_id, blob, meta) -> same schema
    with target dimensions.  Row-wise transform, no shuffle — at 100 TB
    this is a pure map over file splits.  The pixel work is stubbed
    (deterministic byte resampling standing in for libvips); the
    schema/batching contract is the real one."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["blob"],
                                          pdf["meta"]):
                if not decode_stub:
                    raise NotImplementedError(
                        "real resize requires libvips/PIL; "
                        "not available in this container")
                raw = bytes(blob)
                target = max(1, (width * height) // 64)
                out = (raw * (target // max(len(raw), 1) + 1))[:target]
                rows.append((doc_id, out, {
                    "media_type": meta["media_type"],
                    "width": width, "height": height,
                    "duration_ms": meta["duration_ms"]}))
            yield pd.DataFrame(rows, columns=["doc_id", "blob", "meta"])

    return df.mapInPandas(run, RESIZED_DDL)


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 decode_stub: bool = True) -> DataFrame:
    """mapInPandas frame sampler: one input video row fans out to one
    row PER SAMPLED FRAME (doc_id, frame_idx, ts_ms, frame bytes) — the
    explode-shaped stage a video pipeline feeds to per-frame encoders.
    Frame decode is stubbed (deterministic byte slices standing in for
    ffmpeg); the fan-out schema and Arrow batching are real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["blob"],
                                          pdf["meta"]):
                if not decode_stub:
                    raise NotImplementedError(
                        "real frame extraction requires ffmpeg; "
                        "not available in this container")
                dur = meta["duration_ms"] or 0
                n = max(1, int(dur) // every_ms)
                raw = bytes(blob)
                step = max(1, len(raw) // n)
                for i in range(n):
                    rows.append((doc_id, i, i * every_ms,
                                 raw[i * step:(i + 1) * step] or b"\0",
                                 meta["media_type"]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_idx", "ts_ms", "frame", "media_type"])

    return df.mapInPandas(run, FRAME_DDL)
