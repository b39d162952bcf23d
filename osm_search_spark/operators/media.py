"""Generic multimodal media columns: opaque binary payloads + typed metadata.

Images are fully implemented (functions/images.py + functions/jpeg.py:
real PNG and baseline-JPEG codecs, deterministic lossy qpng, DCT pHash).
Audio/video follow the same contract — `(media_id, bytes, fmt, meta)`:

- audio: PCM16 and REAL IMA-ADPCM (4-bit, the public IMA/DVI spec —
  encoder + decoder below, no codec library needed) decode for real;
  other compressed formats remain gated NotImplementedError stubs.
- video: REAL MJPEG elementary streams (concatenated JFIF frames) decode
  for real via functions/jpeg.py — frame_sample splits on frame
  boundaries and decodes every n-th frame; container formats needing
  external codecs remain gated stubs.
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


# --- IMA ADPCM (public IMA/DVI ADPCM spec; 4 bits/sample, mono) --------------

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)


def ima_adpcm_encode(pcm: np.ndarray) -> bytes:
    """int16 mono -> 4-byte header (predictor int16, index u8, pad) + one
    nibble per sample (low nibble first)."""
    pcm = np.asarray(pcm, dtype=np.int32)
    pred, idx = 0, 0
    nibbles = []
    for s in pcm:
        step = int(_IMA_STEPS[idx])
        diff = int(s) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        delta = step >> 3
        if diff >= step:
            code |= 4
            diff -= step
            delta += step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
            delta += step >> 1
        if diff >= step >> 2:
            code |= 1
            delta += step >> 2
        pred += -delta if code & 8 else delta
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX[code & 7])))
        nibbles.append(code)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
        for i in range(0, len(nibbles), 2)
    )
    import struct

    return struct.pack("<hBB", 0, 0, len(pcm) % 2) + packed


def ima_adpcm_decode(data: bytes) -> np.ndarray:
    """inverse of ima_adpcm_encode -> float32 in [-1, 1]."""
    import struct

    pred, idx, odd = struct.unpack("<hBB", data[:4])
    body = np.frombuffer(data[4:], dtype=np.uint8)
    codes = np.empty(len(body) * 2, dtype=np.uint8)
    codes[0::2] = body & 0xF
    codes[1::2] = body >> 4
    if odd:
        codes = codes[:-1]
    out = np.empty(len(codes), dtype=np.int32)
    pred = int(pred)
    idx = int(idx)
    for i, code in enumerate(codes):
        step = int(_IMA_STEPS[idx])
        delta = step >> 3
        if code & 4:
            delta += step
        if code & 2:
            delta += step >> 1
        if code & 1:
            delta += step >> 2
        pred += -delta if code & 8 else delta
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX[code & 7])))
        out[i] = pred
    return out.astype(np.float32) / 32767.0


def _fake_pcm(i: int, n: int = 4000) -> bytes:
    """Deterministic 16-bit PCM-shaped payload (a real WAV body minus the
    RIFF header; stands in for compressed audio until a codec is present)."""
    rng = np.random.default_rng(1000003 ^ i)
    t = np.arange(n, dtype=np.float64)
    wave = np.sin(2 * np.pi * (220 + (i % 12) * 20) * t / 16000.0)
    wave += rng.uniform(-0.05, 0.05, n)
    return (wave * 32767).astype("<i2").tobytes()


def audio_table(spark: SparkSession, n: int) -> DataFrame:
    """Alternating REAL pcm16 and REAL ima_adpcm payloads."""
    ids = spark.range(0, n, 1, max(4, min(64, n // 16)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                pcm = _fake_pcm(i)
                if i % 2:
                    fmt = "ima_adpcm"
                    data = ima_adpcm_encode(np.frombuffer(pcm, dtype="<i2"))
                else:
                    fmt, data = "pcm16", pcm
                rows.append(dict(
                    media_id=f"aud_{i:012d}", bytes=data, fmt=fmt,
                    sample_rate=16000, n_channels=1, duration_ms=250,
                ))
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=AUDIO_SCHEMA)


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """PCM16 and IMA-ADPCM decode for real; other compressed formats are
    stubbed until an audio lib is present (gated import, same pattern as
    the JPEG/PIL preference in images.py)."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    if fmt == "ima_adpcm":
        return ima_adpcm_decode(data)
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


def _mjpeg_frames(data: bytes) -> list[bytes]:
    """Split an MJPEG elementary stream (concatenated JFIF frames) on
    SOI..EOI boundaries. Within entropy data 0xFFD9 cannot occur (0xFF is
    always stuffed or an RSTn marker), so scanning for EOI is exact."""
    frames = []
    start = 0
    n = len(data)
    while start < n - 1:
        if data[start : start + 2] != b"\xff\xd8":
            break
        end = data.find(b"\xff\xd9", start + 2)
        if end < 0:
            break
        frames.append(data[start : end + 2])
        start = end + 2
    return frames


def video_table(spark: SparkSession, n: int, n_frames: int = 8,
                size: int = 32, fps: float = 4.0) -> DataFrame:
    """Deterministic MJPEG clips: each row is `n_frames` moving-gradient
    JFIF frames concatenated (a real MJPEG elementary stream decodable by
    functions/jpeg.py)."""
    ids = spark.range(0, n, 1, max(4, min(64, n // 8)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.jpeg import jpeg_encode

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(2000003 ^ i)
                frames = []
                for fidx in range(n_frames):
                    gx = np.linspace(0, 255, size)[None, :]
                    gy = np.linspace(0, 255, size)[:, None]
                    base = (gx + gy) / 2.0 + fidx * 8.0
                    px = (
                        (base + rng.uniform(-20, 20, (size, size)))[..., None]
                        + np.array([0.0, 30.0, 60.0])[None, None, :]
                    ).clip(0, 255).astype(np.uint8)
                    frames.append(jpeg_encode(px, quality=90))
                rows.append(dict(
                    media_id=f"vid_{i:012d}", bytes=b"".join(frames),
                    fmt="mjpeg", w=size, h=size, fps=fps, n_frames=n_frames,
                ))
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=VIDEO_SCHEMA)


def frame_sample(video: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stage. MJPEG decodes for REAL (split stream ->
    baseline JPEG decode -> re-encode sampled frames as lossless PNG);
    container formats that need external codecs stay gated stubs."""
    schema = "media_id string, frame_idx int, frame_png binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.images import png_encode
        from ..functions.jpeg import jpeg_decode

        for pdf in batches:
            out = []
            for mid, data, fmt in zip(pdf["media_id"], pdf["bytes"], pdf["fmt"]):
                if fmt != "mjpeg":
                    raise NotImplementedError(
                        f"video decode for {fmt!r} requires a codec library "
                        "(gated import); mjpeg decodes natively"
                    )
                for fidx, frame in enumerate(_mjpeg_frames(bytes(data))):
                    if fidx % every_n:
                        continue
                    out.append(dict(
                        media_id=mid, frame_idx=fidx,
                        frame_png=png_encode(jpeg_decode(frame)),
                    ))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_png"])

    return video.select("media_id", "bytes", "fmt").mapInPandas(run, schema=schema)
