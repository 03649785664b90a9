"""Multimodal column plumbing: image/audio/video as opaque ``binary``.

The Spark-side contract is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning. The decode step
probes the EXECUTOR environment: image (PIL), audio (soundfile) and
video (the ``ffmpeg`` CLI) real feature paths run when the
library/binary is present; this container has none of them, so
``decoder="fake"`` produces deterministic synthetic features from the
bytes (pipelines testable end-to-end), ``decoder="auto"`` routes each
kind to its real decoder when the probe finds one and the stub
otherwise, and ``decoder="real"`` raises ``NotImplementedError`` at
the exact point the missing call would go.

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


def _probe_decoders() -> dict:
    """Runs ON THE EXECUTOR (inside the mapInPandas fn): which media
    libraries exist in this worker's environment. Video probes the
    ``ffmpeg`` CLI (the one decoder that is a binary, not a Python
    package) — PATH lookup, same per-worker cost class as the imports."""
    import shutil

    caps = {}
    try:
        from PIL import Image  # noqa: F401
        caps["image"] = True
    except ImportError:
        caps["image"] = False
    try:
        import soundfile  # noqa: F401
        caps["audio"] = True
    except ImportError:
        caps["audio"] = False
    caps["video"] = shutil.which("ffmpeg") is not None
    return caps


def _real_image_features(blob: bytes) -> "np.ndarray":
    """PIL path (only reached when the probe found PIL): grayscale
    8×4 thumbnail → 32 floats in [0,1] — deterministic, library-true."""
    import io

    from PIL import Image
    img = Image.open(io.BytesIO(blob)).convert("L").resize((8, 4))
    return np.asarray(img, dtype=np.float32).reshape(FEATURE_DIM) / 255.0


def _real_audio_features(blob: bytes) -> "np.ndarray":
    """soundfile path (only reached when the probe found soundfile):
    decode to mono float32, split the sample stream into FEATURE_DIM
    contiguous time slices, mean |amplitude| per slice → 32 floats —
    deterministic, library-true."""
    import io

    import soundfile
    data, _sr = soundfile.read(io.BytesIO(blob), dtype="float32",
                               always_2d=True)
    mono = np.abs(data).mean(axis=1) if data.size else np.zeros(1, "float32")
    return np.array([s.mean() if s.size else 0.0
                     for s in np.array_split(mono, FEATURE_DIM)],
                    dtype=np.float32)


def _real_video_features(blob: bytes) -> "np.ndarray":
    """ffmpeg-CLI path (only reached when the probe found ffmpeg):
    decode every frame scaled to 1×1 8-bit grayscale — ONE byte per
    frame over the rawvideo pipe, so the transfer is bounded by frame
    count, not resolution — then split the per-frame gray means into
    FEATURE_DIM contiguous time slices, mean per slice → 32 floats.
    The video analogue of the audio amplitude-slice features:
    deterministic, decoder-true."""
    import shutil
    import subprocess
    import tempfile

    ffmpeg = shutil.which("ffmpeg") or "ffmpeg"
    # seekable input file: many demuxers (mp4 moov-at-end) cannot read
    # from a pipe, and the blob is already executor-local
    with tempfile.NamedTemporaryFile(suffix=".media") as f:
        f.write(bytes(blob))
        f.flush()
        proc = subprocess.run(
            [ffmpeg, "-v", "error", "-i", f.name,
             "-vf", "scale=1:1", "-pix_fmt", "gray",
             "-f", "rawvideo", "-"],
            capture_output=True)
        if proc.returncode != 0:
            # surface ffmpeg's stderr in the executor log: the default
            # CalledProcessError message omits it, making a corrupt
            # blob undiagnosable. A corrupt blob FAILS THE STAGE under
            # decoder="auto"/"real" — same contract as the PIL /
            # soundfile real paths (a bad input is a data bug, not
            # something to silently stub over).
            raise RuntimeError(
                f"ffmpeg video decode failed (rc={proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[-2000:]}")
    means = np.frombuffer(proc.stdout, dtype=np.uint8) \
        .astype(np.float32) / 255.0
    if means.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    return np.array([s.mean() if s.size else 0.0
                     for s in np.array_split(means, FEATURE_DIM)],
                    dtype=np.float32)


def _decode_one(kind: str, blob: bytes, caps: dict, decoder: str
                ) -> "np.ndarray":
    """Per-blob decode routing (module-level so the routing is unit-
    testable without Spark executors): real decode where the executor
    probe found the library/CLI, deterministic sha256 stub otherwise;
    ``decoder="real"`` refuses to stub."""
    if decoder != "fake":
        if kind == "image" and caps.get("image"):
            return _real_image_features(bytes(blob))
        if kind == "audio" and caps.get("audio"):
            return _real_audio_features(bytes(blob))
        if kind == "video" and caps.get("video"):
            return _real_video_features(bytes(blob))
    if decoder == "real" and not caps.get(kind, False):
        raise NotImplementedError(
            f"real {kind} decode requires PIL/soundfile/ffmpeg "
            "(use decoder='auto' to fall back to the stub)")
    d = hashlib.sha256(bytes(blob)).digest()
    return (np.frombuffer(d, dtype=np.uint8)[:FEATURE_DIM]
            .astype(np.float32) / 255.0)


def extract_features(media: DataFrame, decoder: str = "fake",
                     batch_bytes: int = 64 << 20) -> DataFrame:
    """media → (media_id, kind, n_bytes, feature: array<float>).

    Arrow-batched ``mapInPandas``; the decode step is the stub point.
    ``batch_bytes`` documents the sizing rule: upstream should
    ``repartition`` so a partition's blobs fit executor memory.

    Decoders:

    - ``"fake"``  — deterministic sha256-derived features (the
      documented sandbox stub; value-oracle-able in SQL);
    - ``"real"``  — require the media libraries; raise if absent;
    - ``"auto"`` — probe the EXECUTOR environment per kind (PIL for
      images, soundfile for audio, the ffmpeg CLI for video) and use
      the real decode where available, the deterministic stub
      otherwise — the pipeline runs unchanged in both the stubbed
      sandbox and a real cluster image.
    """
    if decoder not in ("fake", "real", "auto"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        caps = _probe_decoders() if decoder in ("real", "auto") else {}

        for pdf in batches:
            if decoder == "fake":
                feats = list(_fake_features(pdf["payload"]))
            else:
                feats = [_decode_one(k, b, caps, decoder) for k, b in
                         zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "feature": feats,
            })

    # pre-project: Spark cannot see which columns the opaque fn touches,
    # so without this every media column (e.g. duration_ms) is read from
    # storage and shipped across the Arrow boundary (guide §4.1)
    return media.select("media_id", "kind", "payload").mapInPandas(
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
