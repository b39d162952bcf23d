"""Generic multimodal media columns: opaque binary payloads + typed metadata.

Images are fully implemented (functions/images.py + operators/image_ops.py:
real PNG codec, deterministic lossy qpng, DCT pHash). Audio/video follow the
same contract — `(media_id, bytes, fmt, meta struct)` — with the DECODE
kernels stubbed (the codec libraries are not in this container) behind
clearly-marked NotImplementedError + a deterministic fake, while the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested, exactly as the build brief requires.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AUDIO_SCHEMA = (
    "media_id string, bytes binary, fmt string, "
    "sample_rate int, n_channels int, duration_ms int"
)
VIDEO_SCHEMA = (
    "media_id string, bytes binary, fmt string, "
    "w int, h int, fps double, n_frames int"
)


def _fake_pcm(i: int, n: int = 4000) -> bytes:
    """Deterministic 16-bit PCM-shaped payload (a real WAV body minus the
    RIFF header; stands in for compressed audio until a codec is present)."""
    rng = np.random.default_rng(1000003 ^ i)
    t = np.arange(n, dtype=np.float64)
    wave = np.sin(2 * np.pi * (220 + (i % 12) * 20) * t / 16000.0)
    wave += rng.uniform(-0.05, 0.05, n)
    return (wave * 32767).astype("<i2").tobytes()


def audio_table(spark: SparkSession, n: int) -> DataFrame:
    ids = spark.range(0, n, 1, max(2, n // 5000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                dict(
                    media_id=f"aud_{int(i):012d}", bytes=_fake_pcm(int(i)),
                    fmt="pcm16", sample_rate=16000, n_channels=1,
                    duration_ms=250,
                )
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=AUDIO_SCHEMA)


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """PCM16 decodes for real; compressed formats are stubbed until an audio
    lib is present (gated import, same pattern as JPEG in images.py)."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    try:  # pragma: no cover
        import soundfile  # noqa: F401
    except ImportError as ex:
        raise NotImplementedError(
            f"decoding {fmt!r} requires an audio codec library"
        ) from ex
    raise NotImplementedError(fmt)


def audio_features(media: DataFrame) -> DataFrame:
    """(media_id, rms, zero_crossings) — the feature-extract stage shape:
    Arrow-batched mapInPandas, vectorized numpy per payload."""
    schema = "media_id string, rms double, zero_crossings long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, fmt in zip(pdf["media_id"], pdf["bytes"], pdf["fmt"]):
                x = decode_audio(bytes(data), fmt)
                out.append(
                    dict(
                        media_id=mid,
                        rms=float(np.sqrt(np.mean(x * x))),
                        zero_crossings=int(np.sum(np.abs(np.diff(np.signbit(x))))),
                    )
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "bytes", "fmt").mapInPandas(run, schema=schema)


def frame_sample(video: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stage — decode is stubbed (no video codec in
    this container); the operator raises per-partition with a clear message
    while keeping the real signature/schema for when a codec lands."""
    schema = "media_id string, frame_idx int, frame_png binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "video decode requires a codec library (gated import); "
                    "plumbing (schema/batching) is exercised by tests with "
                    "empty partitions"
                )
            yield pd.DataFrame(columns=["media_id", "frame_idx", "frame_png"])

    return video.select("media_id", "bytes", "fmt").mapInPandas(run, schema=schema)
