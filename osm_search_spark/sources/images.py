"""Deterministic synthesis of the `images` input table.

Exactly the shape of BASELINE.json input_hint:
  (image_id:string, bytes:binary, w:int, h:int, fmt:string,
   caption:string, phash:long)
plus derived geotags (lat, lon) computed from phash over the Jabodetabek
box used throughout the reference tests (rtree_test.go:260,344,449), per
FIXTURES.md §1.

Pixels: seeded gradient+noise, rng = default_rng(seed ^ i) — every row is
reproducible from its index alone, so decode invariants (pixel allclose /
PSNR>=40dB, caption byte-exact, phash recompute) have a closed-form oracle.

Synthesis runs DISTRIBUTED via mapInPandas over an id range — at bench
scale nothing is generated on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions import images as I

SEED = 42
SIZES = (32, 64, 128)
# png lossless; qpng = quantized-PNG lossy; jpeg = REAL baseline JFIF
# (functions/jpeg.py pure-numpy codec — no PIL in this container)
FMTS = ("png", "qpng", "jpeg")
LAT0, LAT1 = -6.107481038495567, -5.995288834299442
LON0, LON1 = 106.13128828884481, 107.0509652831274

CAPTION_VOCAB = [
    "Dunia Fantasi", "Kebun Binatang Ragunan", "Monumen Nasional",
    "Taman Mini Indonesia", "Universitas Indonesia", "Taman Anggrek",
    "Stasiun Gambir", "Halim Perdana Kusuma", "Bandar Udara Internasional",
    "Buaya Lubang", "Mall Kelapa Gading", "TPU Tanah Kusir",
]

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lat double, lon double"
)


from functools import lru_cache


@lru_cache(maxsize=8192)
def make_row(i: int) -> dict:
    """Deterministic row for index i (memoized: the oracle builder and
    best-of-2 bench runs re-request identical rows; callers must not
    mutate the returned dict)."""
    rng = np.random.default_rng(SEED ^ i)
    w = SIZES[i % len(SIZES)]
    h = SIZES[(i // len(SIZES)) % len(SIZES)]
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    base = (gx + gy) / 2.0
    noise = rng.uniform(-30, 30, (h, w))
    chan_shift = np.array([0.0, 40.0, 80.0])
    pixels = (
        (base + noise)[..., None] + chan_shift[None, None, :]
    ).clip(0, 255).astype(np.uint8)
    fmt = FMTS[i % len(FMTS)]
    if fmt == "png":
        data = I.png_encode(pixels)
    elif fmt == "qpng":
        data = I.qpng_encode(pixels)
    else:
        # quality 97 keeps the noisy synthetic pixels comfortably above the
        # PSNR>=40dB decode invariant (the codec default 95 sits at ~40.0)
        data = I.jpeg_encode(pixels, quality=97)
    # phash of the DECODED pixels (what a consumer can verify)
    ph = I.phash64(I.decode(data, fmt))
    caption = CAPTION_VOCAB[i % len(CAPTION_VOCAB)] + f" foto {i}"
    lat = LAT0 + ((ph & 0xFFFF) / 0xFFFF) * (LAT1 - LAT0)
    lon = LON0 + (((ph >> 16) & 0xFFFF) / 0xFFFF) * (LON1 - LON0)
    return dict(
        image_id=f"img_{i:012d}", bytes=data, w=w, h=h, fmt=fmt,
        caption=caption, phash=ph, lat=lat, lon=lon,
    )


def expected_pixels(i: int) -> np.ndarray:
    """The pre-encoding pixel oracle for row i (for PSNR invariants)."""
    rng = np.random.default_rng(SEED ^ i)
    w = SIZES[i % len(SIZES)]
    h = SIZES[(i // len(SIZES)) % len(SIZES)]
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    base = (gx + gy) / 2.0
    noise = rng.uniform(-30, 30, (h, w))
    chan_shift = np.array([0.0, 40.0, 80.0])
    return (
        (base + noise)[..., None] + chan_shift[None, None, :]
    ).clip(0, 255).astype(np.uint8)


def images_table(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed synthesis: spark.range -> mapInPandas(make_row).

    Default partitioning targets ~16 rows per task so the Python codec
    work (zlib + jpeg) spreads across all cores even for small n."""
    ids = spark.range(0, n, 1, partitions or max(4, min(64, n // 16)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=SCHEMA)
