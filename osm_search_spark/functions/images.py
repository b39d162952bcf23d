"""Image codec + perceptual-hash kernels — pure numpy/zlib (no PIL in this
container; the real decoders slot in behind the same API via import-try).

Covers the image-payload surface required by BASELINE.json input_hint:
- PNG encode/decode: real, lossless, deterministic (zlib level pinned).
- "qpng" (quantized PNG): a REAL lossy-but-deterministic stand-in for JPEG —
  pixel values quantized to step 6 before PNG encoding, giving PSNR ≈ 43 dB,
  which exercises the PSNR>=40dB allclose invariant honestly.
- Baseline JPEG (JFIF) encode/decode is REAL pure numpy — functions/jpeg.py
  (ITU-T T.81 Annex K tables, 4:4:4 + 4:2:0, LUT Huffman, batched IDCT);
  decode_image falls back to it for fmt="jpeg" rows.
- pHash: classic 64-bit DCT perceptual hash (32x32 grayscale -> DCT-II ->
  top-left 8x8 minus DC -> median threshold).
- PSNR for the decoded-pixel invariant.

Everything is vectorized numpy; these run inside mapInPandas over Arrow
batches (operators/image_ops.py) — never per-row Python at the Spark layer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
QUANT_STEP = 6  # "qpng" lossy quantization step -> PSNR ~= 43 dB


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> PNG bytes (8-bit truecolor, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> RGB uint8 (h, w, 3). Supports what png_encode emits
    (8-bit truecolor) plus filter types 0-2 for robustness."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * 3 + 1
    rows = raw.reshape(h, stride)
    filters, px = rows[:, 0], rows[:, 1:].astype(np.int16)
    out = np.zeros_like(px)
    for y in range(h):
        line = px[y].copy()
        f = filters[y]
        if f == 0:
            pass
        elif f == 1:  # Sub: out[x] = raw[x] + out[x-3] == running sum mod 256
            line = (
                np.cumsum(line.reshape(-1, 3).astype(np.int64), axis=0)
                .reshape(-1) & 0xFF
            ).astype(np.int16)
        elif f == 2:  # Up
            if y > 0:
                line = (line + out[y - 1]) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {f}")
        out[y] = line
    return out.astype(np.uint8).reshape(h, w, 3)


def qpng_encode(pixels: np.ndarray, step: int = QUANT_STEP) -> bytes:
    """Deterministic lossy codec: quantize then PNG-encode. MSE ~= step^2/12,
    PSNR = 10*log10(255^2*12/step^2) ~= 43 dB at step 6."""
    q = ((pixels.astype(np.int32) + step // 2) // step * step).clip(0, 255)
    return png_encode(q.astype(np.uint8))


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch by declared format."""
    if fmt in ("png", "qpng"):
        return png_decode(data)
    if fmt in ("jpeg", "jpg"):
        try:  # pragma: no cover - prefer libjpeg when present
            import io

            from PIL import Image  # noqa: F401

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        except ImportError:
            from .jpeg import jpeg_decode  # pure-numpy baseline decoder

            return jpeg_decode(data)
    raise ValueError(f"unknown format {fmt!r}")


def jpeg_encode(pixels: np.ndarray, quality: int = 95) -> bytes:
    """Baseline JFIF encode (functions/jpeg.py) — real lossy JPEG bytes."""
    from .jpeg import jpeg_encode as _enc

    return _enc(pixels, quality)


# --- perceptual hash ---------------------------------------------------------

def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def _resize_area_gray(pixels: np.ndarray, out: int = 32) -> np.ndarray:
    """Grayscale + area-mean resize to out x out (deterministic, no deps)."""
    g = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    ys = (np.arange(out + 1) * h // out).astype(int)
    xs = (np.arange(out + 1) * w // out).astype(int)
    res = np.empty((out, out))
    for a in range(out):
        rows = g[ys[a] : max(ys[a + 1], ys[a] + 1)]
        for b in range(out):
            res[a, b] = rows[:, xs[b] : max(xs[b + 1], xs[b] + 1)].mean()
    return res


def resize_exact(pixels: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Bit-exact integer resample of an (h, w[, c]) uint8 array to
    (th, tw[, c]) — the training-resize kernel (SDXL bucket resize,
    thumbnail corpora) with NO float arithmetic, so workers, the driver,
    and any engine re-running the same spec agree byte-for-byte.

    Per axis:
    - src a multiple of tgt (downscale): block MEAN over the integer
      factor, 2-D joint when both axes downscale (one round-half-up over
      the whole block — exact int64, no separable double rounding);
    - anything else (upscale or non-integral): center-aligned NEAREST via
      the pure-integer index map floor((2i+1)*src / (2*tgt)).

    uint8 in, uint8 out; int64 intermediates (max block sum 255*fh*fw
    stays far inside int64)."""
    if tw <= 0 or th <= 0:
        raise ValueError(f"target dims must be positive, got {tw}x{th}")
    h, w = pixels.shape[0], pixels.shape[1]
    a = pixels.astype(np.int64)
    fh = h // th if h >= th and h % th == 0 else 1
    fw = w // tw if w >= tw and w % tw == 0 else 1
    if fh > 1 or fw > 1:
        shape = (h // fh, fh, w // fw, fw) + a.shape[2:]
        a = a.reshape(shape).sum(axis=(1, 3))
        area = fh * fw
        a = (a + area // 2) // area  # round-half-up, exact
    if a.shape[0] != th:
        a = a[((2 * np.arange(th) + 1) * a.shape[0]) // (2 * th)]
    if a.shape[1] != tw:
        a = a[:, ((2 * np.arange(tw) + 1) * a.shape[1]) // (2 * tw)]
    return a.astype(np.uint8)


def phash64(pixels: np.ndarray) -> int:
    """Classic DCT pHash: signed 64-bit int (two's complement)."""
    small = _resize_area_gray(pixels, 32)
    d = _DCT32 @ small @ _DCT32.T
    block = d[:8, :8].flatten()
    med = np.median(block[1:])
    bits = block > med
    bits[0] = False
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
