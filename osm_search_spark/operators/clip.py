"""Clip polygons to tile cells (Sutherland–Hodgman against cell bboxes).

The vector-tile materialization step between simplification
(operators/simplify.py) and the tile sink (operators/tiling.py):
published tile pipelines cut every feature to its tile's rectangle so a
tile is self-contained. The reference has no rendering path; this is a
north-rule capability for the tile-partitioned output.

Plan shape (the raster.py discipline):

- `spatial_join.classified_cover` gives (polygon_id, cell_id, full) with
  provably-outside cells already excluded (round-6 cover exclusion).
- FULL cells (entirely interior — hole-aware, so never inside a hole)
  need NO geometry work: the clip IS the cell rectangle, constructed in
  pure Column arithmetic from the cell id. This is the area-scaling bulk
  of a big polygon's tiles.
- PARTIAL cells join their polygon's rings (AQE picks broadcast for dim-
  sized sides) and run the Sutherland–Hodgman kernel in one Arrow-batched
  mapInPandas pass — work ∝ boundary tiles ∝ perimeter.

Semantics (pinned by tests):

- output rings are CLOSED (first == last); FULL-cell rectangles wind CCW.
- PARTIAL clips keep input orientation and vertex order; a polygon fully
  inside one cell round-trips identically.
- Sutherland–Hodgman is exact for convex clip windows: summed shoelace
  area over a polygon's tiles equals the polygon's area (float rounding
  aside) — the conservation test.
- hole rings clip independently against the same rectangle (a hole's
  clip is always contained in the outer clip); empty hole clips drop.
- PARTIAL cells whose clipped outer ring has zero area (edge-touch only)
  are dropped; boundary points are kept inside (closed-set semantics,
  matching the PIP join's boundary=inside).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from .spatial_join import classified_cover


def _clip_open(xs: list[float], ys: list[float], axis: int, bound: float, keep_ge: bool):
    """One Sutherland–Hodgman half-plane pass over an OPEN ring (no
    closing duplicate). axis 0 = x (lon), 1 = y (lat)."""
    out_x: list[float] = []
    out_y: list[float] = []
    n = len(xs)
    for i in range(n):
        j = (i + 1) % n
        cx, cy, nx_, ny_ = xs[i], ys[i], xs[j], ys[j]
        cv = cx if axis == 0 else cy
        nv = nx_ if axis == 0 else ny_
        c_in = cv >= bound if keep_ge else cv <= bound
        n_in = nv >= bound if keep_ge else nv <= bound
        if c_in:
            out_x.append(cx)
            out_y.append(cy)
        if c_in != n_in:
            t = (bound - cv) / (nv - cv)
            if axis == 0:
                out_x.append(bound)
                out_y.append(cy + t * (ny_ - cy))
            else:
                out_x.append(cx + t * (nx_ - cx))
                out_y.append(bound)
    return out_x, out_y


def _clip_ring_rect(lat, lon, minlat, minlon, maxlat, maxlon):
    """Clip one closed ring to a rectangle; returns closed (lat, lon)
    lists or None when the clip is empty / zero-area."""
    ys = list(lat)
    xs = list(lon)
    if ys and ys[0] == ys[-1] and xs[0] == xs[-1]:
        ys, xs = ys[:-1], xs[:-1]
    for axis, bound, keep_ge in (
        (0, minlon, True),
        (0, maxlon, False),
        (1, minlat, True),
        (1, maxlat, False),
    ):
        if not xs:
            return None
        xs, ys = _clip_open(xs, ys, axis, bound, keep_ge)
    if len(xs) < 3:
        return None
    area2 = 0.0
    for i in range(len(xs)):
        j = (i + 1) % len(xs)
        area2 += xs[i] * ys[j] - xs[j] * ys[i]
    if area2 == 0.0:
        return None
    return ys + ys[:1], xs + xs[:1]


def _cell_bounds(cell_id: int, res: int):
    size = C.cell_size_deg(res)
    ix = (cell_id % C.RES_BITS_SHIFT) // C.IX_SHIFT
    iy = cell_id % C.IX_SHIFT
    minlon = ix * size - 180.0
    minlat = iy * size - 90.0
    return minlat, minlon, minlat + size, minlon + size


def clip_polygon_cell_py(
    ring_lat, ring_lon, cell_id: int, res: int, holes_lat=None, holes_lon=None
):
    """Driver-side twin of the PARTIAL kernel for one (polygon, cell) —
    used by oracle builders (VALUES recipe) and tests. Returns
    (ring_lat, ring_lon, holes_lat, holes_lon) or None."""
    minlat, minlon, maxlat, maxlon = _cell_bounds(int(cell_id), res)
    outer = _clip_ring_rect(ring_lat, ring_lon, minlat, minlon, maxlat, maxlon)
    if outer is None:
        return None
    h_lat, h_lon = [], []
    if holes_lat is None:
        holes_lat, holes_lon = [], []
    for rl, ro in zip(holes_lat, holes_lon):
        h = _clip_ring_rect(rl, ro, minlat, minlon, maxlat, maxlon)
        if h is not None:
            h_lat.append(h[0])
            h_lon.append(h[1])
    return outer[0], outer[1], h_lat, h_lon


def clip_to_tiles(
    polys: DataFrame, res: int = C.TILE_RES
) -> DataFrame:
    """(polygon_id, cell_id, full, ring_lat, ring_lon, holes_lat,
    holes_lon): each polygon cut to every tile cell it covers. FULL cells
    are pure Column rectangles; PARTIAL cells run the Arrow kernel."""
    has_holes = "holes_lat" in polys.columns and "holes_lon" in polys.columns
    cover = classified_cover(polys, res).localCheckpoint(eager=True)
    size = C.cell_size_deg(res)
    ix = C.cell_ix("cell_id")
    iy = C.cell_iy("cell_id")
    minlon = ix.cast("double") * F.lit(size) - 180.0
    minlat = iy.cast("double") * F.lit(size) - 90.0
    maxlon = minlon + F.lit(size)
    maxlat = minlat + F.lit(size)
    full_out = cover.filter("full").select(
        "polygon_id",
        "cell_id",
        F.lit(True).alias("full"),
        F.array(minlat, minlat, maxlat, maxlat, minlat).alias("ring_lat"),
        F.array(minlon, maxlon, maxlon, minlon, minlon).alias("ring_lon"),
        F.array().cast("array<array<double>>").alias("holes_lat"),
        F.array().cast("array<array<double>>").alias("holes_lon"),
    )
    ring_cols = ["polygon_id", "ring_lat", "ring_lon"] + (
        ["holes_lat", "holes_lon"] if has_holes else []
    )
    part = cover.filter(~F.col("full")).join(
        polys.select(*ring_cols), "polygon_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                got = clip_polygon_cell_py(
                    r["ring_lat"],
                    r["ring_lon"],
                    r["cell_id"],
                    res,
                    r.get("holes_lat") if has_holes else None,
                    r.get("holes_lon") if has_holes else None,
                )
                if got is None:
                    continue
                rows.append(
                    (r["polygon_id"], r["cell_id"], False) + got
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "polygon_id", "cell_id", "full",
                    "ring_lat", "ring_lon", "holes_lat", "holes_lon",
                ],
            )

    schema = (
        "polygon_id long, cell_id long, full boolean, "
        "ring_lat array<double>, ring_lon array<double>, "
        "holes_lat array<array<double>>, holes_lon array<array<double>>"
    )
    part_out = part.mapInPandas(run, schema=schema)
    return full_out.unionByName(part_out)
