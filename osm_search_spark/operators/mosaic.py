"""Per-tile image mosaics (contact sheets) — compose the images geotagged
in each map tile into one canvas.

The tile-rendering / dataset-preview step of an image-corpus pipeline:
after the spatial join assigns every image a tile cell, each tile's
first `grid*grid` images (by image_id — deterministic, no scan-order
dependence) are decoded, thumbnailed with the bit-exact integer
resampler (functions/images.resize_exact), and placed row-major on a
zero-initialized RGB canvas. The reference serves one POI list per map
view (pkg/http); this is the raster analog for an image corpus — and the
same composition a WebDataset-style preview shard needs.

Plan shape (100 TB posture):
- tile assignment is pure Column arithmetic (cells.latlng_to_cell);
- the per-tile cap is a rank-filtered window (WindowGroupLimit pushes
  the top-k map-side, the repo's cap_per_group discipline), so a
  mega-tile never ships more than `grid*grid` payloads into the shuffle;
- composition payloads move through ONE groupBy(tile) shuffle as
  sort_array(collect_list(struct(image_id, bytes, fmt))) — bounded at
  grid*grid entries per row — and the kernel is a plain mapInPandas over
  whole Arrow batches (no per-group pandas overhead; round-8 rule).

Determinism: members = the grid*grid smallest image_ids per tile,
placed in ascending order; ties cannot occur (image_id is unique).
The mosaic bytes are byte-exact on any platform (integer resampler +
the repo's own PNG encoder), gated by px sums + crc32.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions import images as I

MOSAIC_SCHEMA = (
    "tile_id long, n_images int, px_sum long, px_sq_sum long, "
    "crc long, mosaic binary"
)


def mosaic_py(
    items: list[tuple[str, bytes, str]], grid: int = 4, thumb: int = 32
) -> tuple[int, int, int, int, bytes]:
    """Pure kernel shared by the operator and the oracle's driver-side
    VALUES builder: items = [(image_id, bytes, fmt), ...] ALREADY sorted
    by image_id and capped at grid*grid. Returns
    (n_images, px_sum, px_sq_sum, crc32(canvas bytes), png(canvas))."""
    side = grid * thumb
    canvas = np.zeros((side, side, 3), dtype=np.uint8)
    for idx, (_iid, b, fmt) in enumerate(items[: grid * grid]):
        t = I.resize_exact(I.decode(bytes(b), fmt), thumb, thumb)
        r, c = (idx // grid) * thumb, (idx % grid) * thumb
        canvas[r : r + thumb, c : c + thumb] = t
    flat = canvas.astype(np.int64)
    return (
        min(len(items), grid * grid),
        int(flat.sum()),
        int((flat * flat).sum()),
        int(zlib.crc32(canvas.tobytes())),
        I.png_encode(canvas),
    )


def tile_mosaic(
    images: DataFrame,
    res: int = C.TILE_RES,
    grid: int = 4,
    thumb: int = 32,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """One mosaic per occupied tile: MOSAIC_SCHEMA rows. Input needs
    (image_id, bytes, fmt, lat, lon)."""
    if grid < 1 or thumb < 1:
        raise ValueError("grid and thumb must be >= 1")
    cap = grid * grid
    tiled = images.select(
        "image_id", "bytes", "fmt",
        C.latlng_to_cell(lat, lon, res).alias("tile_id"),
    )
    w = Window.partitionBy("tile_id").orderBy("image_id")
    capped = (
        tiled.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
    grouped = capped.groupBy("tile_id").agg(
        F.sort_array(
            F.collect_list(F.struct("image_id", "bytes", "fmt"))
        ).alias("items")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["tile_id", "n_images", "px_sum", "px_sq_sum", "crc", "mosaic"]
        for pdf in batches:
            rows = [
                (int(t),)
                + mosaic_py(
                    [(it["image_id"], it["bytes"], it["fmt"]) for it in items],
                    grid,
                    thumb,
                )
                for t, items in zip(pdf["tile_id"], pdf["items"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return grouped.mapInPandas(run, schema=MOSAIC_SCHEMA)


# ---------------------------------------------------------------------------
# Mosaic pyramid — parent-tile contact sheets from child canvases
# ---------------------------------------------------------------------------

PYRAMID_SCHEMA = (
    "tile_id long, n_children int, px_sum long, crc long, mosaic binary"
)


def pyramid_merge_py(
    children: list[tuple[int, bytes]], side: int
) -> tuple[int, int, int, bytes]:
    """Pure kernel shared by the operator and the oracle: children =
    [(quadrant 0..3, png_bytes)] (quadrant = (1 - iy%2)*2 + ix%2 — the
    NORTHERN child row on top). Composes the 2x2 arrangement (missing
    quadrants stay black) and halves it with the bit-exact integer
    block mean (functions/images.resize_exact — integral 2x downscale,
    round-half-up). Returns (n_children, px_sum, crc32, png)."""
    canvas = np.zeros((2 * side, 2 * side, 3), dtype=np.uint8)
    for q, png in children:
        t = I.png_decode(bytes(png))
        r, c = (q // 2) * side, (q % 2) * side
        canvas[r : r + side, c : c + side] = t
    out = I.resize_exact(canvas, side, side)
    return (
        len(children),
        int(out.astype(np.int64).sum()),
        int(zlib.crc32(out.tobytes())),
        I.png_encode(out),
    )


def mosaic_pyramid(
    mosaics: DataFrame,
    max_res: int,
    min_res: int,
    side: int,
) -> DataFrame:
    """(res, tile_id, n_children, px_sum, crc, mosaic) for every level
    min_res..max_res-1, derived level by level from the res=max_res
    canvases in `mosaics` (tile_id, mosaic) — the image analog of
    compaction.tile_pyramid: each level is ONE bounded groupBy (<= 4
    children per parent) + a map-only compose/halve kernel, the source
    canvases are scanned once, and each level is localCheckpoint'd
    because it feeds both the output union and the next level
    (CLAUDE.md round-4; plain localCheckpoint so the ContextCleaner can
    reap it when the result goes out of scope). The downscale is the
    bit-exact integer block mean, so every level is byte-deterministic
    from the base canvases alone."""
    if min_res >= max_res:
        raise ValueError("min_res must be < max_res")
    cur = mosaics.select("tile_id", "mosaic")
    levels = []
    for r in range(max_res - 1, min_res - 1, -1):
        ix, iy = C.cell_ix("tile_id"), C.cell_iy("tile_id")
        q = (
            (F.lit(1) - F.pmod(iy, F.lit(2))) * 2 + F.pmod(ix, F.lit(2))
        ).cast("int")
        grouped = (
            cur.select(
                C.cell_to_parent("tile_id", r).alias("tile_id"),
                F.struct(q.alias("q"), F.col("mosaic").alias("png")).alias(
                    "ch"
                ),
            )
            .groupBy("tile_id")
            .agg(F.sort_array(F.collect_list("ch")).alias("children"))
        )

        def run(batches, _side=side):
            cols = ["tile_id", "n_children", "px_sum", "crc", "mosaic"]
            for pdf in batches:
                rows = [
                    (int(t),)
                    + pyramid_merge_py(
                        [(int(c["q"]), c["png"]) for c in ch], _side
                    )
                    for t, ch in zip(pdf["tile_id"], pdf["children"])
                ]
                yield pd.DataFrame(rows, columns=cols)

        lvl = grouped.mapInPandas(run, schema=PYRAMID_SCHEMA).localCheckpoint(
            eager=True
        )
        levels.append(lvl.withColumn("res", F.lit(r).cast("int")))
        cur = lvl.select("tile_id", "mosaic")
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "res", "tile_id", "n_children", "px_sum", "crc", "mosaic"
    )
