"""Multimodal column plumbing: image/audio/video as opaque ``binary``.

The Spark-side contract is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning — while the actual
media decode is STUBBED (this container has no image/audio libraries):
``decoder="fake"`` produces deterministic synthetic features from the
bytes (so pipelines are testable end-to-end); ``decoder="real"`` raises
``NotImplementedError`` at the exact point a PIL/ffmpeg call would go.

Pattern: media rows are big — keep them in their own table keyed by
``media_id``, repartition by size-aware ranges before the decode stage
so one Arrow batch holds a bounded number of bytes, and emit *features*
(small fixed-width arrays), never re-emit the blob.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, mime string, width int, "
                "height int, duration_ms int, payload binary")

FEATURE_DIM = 32


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table with typed metadata."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 8)
        rows.append((i, kind, f"{kind}/x-fake", 64 + i % 512, 64 + (i * 7) % 512,
                     (1000 + i * 37) if kind != "image" else 0, bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic 32-d feature per blob from its sha256 (the stub)."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, b in enumerate(payloads):
        d = hashlib.sha256(bytes(b)).digest()
        out[i] = np.frombuffer(d, dtype=np.uint8)[:FEATURE_DIM] / 255.0
    return out


def extract_features(media: DataFrame, decoder: str = "fake",
                     batch_bytes: int = 64 << 20) -> DataFrame:
    """media → (media_id, kind, n_bytes, feature: array<float>).

    Arrow-batched ``mapInPandas``; the decode step is the stub point.
    ``batch_bytes`` documents the sizing rule: upstream should
    ``repartition`` so a partition's blobs fit executor memory.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # PIL.Image.open / soundfile.read / ffmpeg frame-sample
                # would go here; not available in this environment.
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/ffmpeg")
            feats = _fake_features(pdf["payload"])
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "feature": list(feats),
            })

    return media.mapInPandas(
        fn, "media_id long, kind string, n_bytes long, feature array<float>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    — the pure-metadata explode is real; frame decode is the stub."""
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id",
                F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                                     F.lit(every_ms))).alias("frame_ts_ms"))
    )
