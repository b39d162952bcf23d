"""Hierarchical geo cell grid — the engine's spatial index, as data.

Replaces the reference's in-process R-tree (pkg/datastructure/rtree.go) with
an H3/S2-style hierarchical cell cover that is *pure integer arithmetic*, so
cell assignment runs JVM-side inside whole-stage codegen (no UDF at all), the
same formula can be emitted as ANSI SQL for the DuckDB correctness oracle,
and a `cells` table (object_id, cell_id) replaces R-tree serialization
(rtree.go:948-1017 — "load the index" becomes reading a table).

Grid definition
---------------
At resolution ``r`` the cell edge is ``180 / 2**r`` degrees:

    r=10 ≈ 19.5 km   r=12 ≈ 4.9 km   r=14 ≈ 1.2 km   r=16 ≈ 0.3 km

(res 12-16 here spans the same edge lengths as H3 res 7-12, the range named
in the north rule). Cell id packs (res, ix, iy) into one int64:

    size = 180 / 2**r
    ix   = clamp(floor((lon + 180) / size), 0, 2**(r+1) - 1)
    iy   = clamp(floor((lat +  90) / size), 0, 2**r    - 1)
    id   = r * 2**58 + ix * 2**29 + iy          (valid for r <= 28)

Parent/child moves are integer shifts; k-ring is (ix±dx, iy±dy) with
longitude wraparound. If the real `h3` package is importable the vectorized
helpers below can be swapped out behind the same API (import-try at bottom).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

RES_BITS_SHIFT = 2**58
IX_SHIFT = 2**29

# Engine defaults: coarse res for the polygon-cover hash join, fine res for
# tiling output. Tunable per call.
JOIN_RES = 12
TILE_RES = 14


def cell_size_deg(res: int) -> float:
    return 180.0 / (1 << res)


# ---------------------------------------------------------------------------
# Column-expression versions (JVM-side, codegen; the hot path)
# ---------------------------------------------------------------------------

def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def latlng_to_cell(lat: Column | str, lon: Column | str, res: int) -> Column:
    """Cell id of a point — pure Column arithmetic, no UDF."""
    size = cell_size_deg(res)
    nx, ny = 2 << res, 1 << res
    ix = F.least(
        F.greatest(F.floor((_col(lon) + 180.0) / size), F.lit(0)), F.lit(nx - 1)
    ).cast("long")
    iy = F.least(
        F.greatest(F.floor((_col(lat) + 90.0) / size), F.lit(0)), F.lit(ny - 1)
    ).cast("long")
    return (F.lit(res * RES_BITS_SHIFT) + ix * F.lit(IX_SHIFT) + iy).alias("cell_id")


def latlng_to_cell_sql(lat: str, lon: str, res: int) -> str:
    """Identical formula as SQL text (DuckDB oracle twin)."""
    size = cell_size_deg(res)
    nx, ny = 2 << res, 1 << res
    ix = f"least(greatest(cast(floor(({lon} + 180.0) / {size!r}) as bigint), 0), {nx - 1})"
    iy = f"least(greatest(cast(floor(({lat} + 90.0) / {size!r}) as bigint), 0), {ny - 1})"
    return f"({res} * {RES_BITS_SHIFT} + {ix} * {IX_SHIFT} + {iy})"


def cell_res(cell: Column | str) -> Column:
    # shiftright, not double division: a double rounds ids above 2^53 and
    # can bump the res across the 2^58 boundary (exact at every res).
    return F.shiftright(_col(cell), 58)


def cell_ix(cell: Column | str) -> Column:
    return F.shiftright(_col(cell) % F.lit(RES_BITS_SHIFT), 29)


def cell_iy(cell: Column | str) -> Column:
    return _col(cell) % F.lit(IX_SHIFT)


def cell_to_parent(cell: Column | str, parent_res: int) -> Column:
    """Coarsen a cell id — integer divide of both axes."""
    r = cell_res(cell)
    shift = F.pow(F.lit(2.0), (r - parent_res).cast("double")).cast("long")
    ix = (cell_ix(cell) / shift).cast("long")
    iy = (cell_iy(cell) / shift).cast("long")
    return F.lit(parent_res * RES_BITS_SHIFT) + ix * F.lit(IX_SHIFT) + iy


def k_ring(cell: Column | str, k: int, res: int) -> Column:
    """Array of all cell ids within Chebyshev distance k (incl. self).

    Expands to (2k+1)^2 ids via `sequence` + `transform` — still no Python.
    Longitude wraps modulo the row width; latitude clamps at the poles.
    ``res`` must match the resolution the cell ids were built at.
    """
    nx = F.lit(2 << res).cast("long")
    ny = F.lit(1 << res).cast("long")
    ix, iy = cell_ix(cell), cell_iy(cell)
    base = F.lit(res * RES_BITS_SHIFT)
    offs = F.sequence(F.lit(-k), F.lit(k))
    pairs = F.flatten(
        F.transform(offs, lambda dx: F.transform(offs, lambda dy: F.struct(dx.alias("dx"), dy.alias("dy"))))
    )
    def mk(p):
        wix = F.pmod(ix + p["dx"], nx)
        wiy = F.least(F.greatest(iy + p["dy"], F.lit(0).cast("long")), ny - 1)
        return base + wix * F.lit(IX_SHIFT) + wiy
    return F.array_distinct(F.transform(pairs, mk))


def annulus_cells(
    ix: Column, iy: Column, r_outer: int, r_inner: int, e: int, res: int
) -> Column:
    """Array of COARSE cell ids (resolution ``res - e``) covering the square
    annulus { |dx| <= r_outer or |dy| <= r_outer } \\ interior of the square
    of radius ``r_inner`` — all radii in BASE-res cell units around (ix, iy).

    This is the incremental k-ring: round N explores only the ring between
    the previous covered radius and the new one, and does so at a coarser
    resolution (``e`` = log2 scale factor) so the per-round cell count stays
    ~constant as the radius doubles (the fix for the full-disk re-explode —
    see VERDICT r01 item 1; contract matches rtree.go:675-713's incremental
    neighbor expansion). Pure Column arithmetic, no Python per row.

    r_inner < 0 means "nothing covered yet" (full square, no exclusion).
    A coarse cell straddling the inner boundary is re-emitted; callers
    dedup candidates on (probe, object). Longitude wraps; latitude clamps.
    """
    rc = res - e
    nx_c = F.lit(2 << rc).cast("long")
    ny_c = 1 << rc
    base = F.lit(rc * RES_BITS_SHIFT)
    # arithmetic shift right == floor division by 2**e (works for negatives)
    cx0 = F.shiftright((ix - r_outer).cast("long"), e)
    cx1 = F.shiftright((ix + r_outer).cast("long"), e)
    cy0 = F.shiftright((iy - r_outer).cast("long"), e)
    cy1 = F.shiftright((iy + r_outer).cast("long"), e)

    def interior(c, p):  # coarse cell fully inside the old covered square?
        lo = F.shiftleft(c, e)
        hi = F.shiftleft(c + 1, e) - 1
        return (lo >= p - r_inner) & (hi <= p + r_inner)

    def mk_row(cx):
        in_x = interior(cx, ix) if r_inner >= 0 else F.lit(False)

        def mk_cell(cy):
            in_y = interior(cy, iy) if r_inner >= 0 else F.lit(False)
            wcx = F.pmod(cx, nx_c)
            wcy = F.least(F.greatest(cy, F.lit(0).cast("long")), F.lit(ny_c - 1).cast("long"))
            cell = base + wcx * F.lit(IX_SHIFT) + wcy
            return F.when(in_x & in_y, F.lit(None).cast("long")).otherwise(cell)

        return F.transform(F.sequence(cy0, cy1), mk_cell)

    cells = F.flatten(F.transform(F.sequence(cx0, cx1), mk_row))
    return F.array_distinct(F.filter(cells, lambda c: c.isNotNull()))


def cell_center(cell: Column | str) -> Column:
    """struct(lat, lon) of the cell center."""
    r = cell_res(cell).cast("double")
    size = F.lit(180.0) / F.pow(F.lit(2.0), r)
    lat = (cell_iy(cell).cast("double") + 0.5) * size - 90.0
    lon = (cell_ix(cell).cast("double") + 0.5) * size - 180.0
    return F.struct(lat.alias("lat"), lon.alias("lon"))


# ---------------------------------------------------------------------------
# Numpy versions (driver-side polygon covers, refine stage, tests)
# ---------------------------------------------------------------------------

def np_latlng_to_cell(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    size = cell_size_deg(res)
    nx, ny = 2 << res, 1 << res
    ix = np.clip(np.floor((np.asarray(lon) + 180.0) / size).astype(np.int64), 0, nx - 1)
    iy = np.clip(np.floor((np.asarray(lat) + 90.0) / size).astype(np.int64), 0, ny - 1)
    return res * RES_BITS_SHIFT + ix * IX_SHIFT + iy


def np_cell_ixy(cell) -> tuple:
    """(ix, iy) integer grid coordinates of cell id(s) — the single source
    of truth for the id unpacking (scalar or ndarray)."""
    ix = (cell % RES_BITS_SHIFT) // IX_SHIFT
    iy = cell % IX_SHIFT
    return ix, iy


def np_cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(minlat, minlon, maxlat, maxlon) per cell."""
    cell = np.asarray(cell, dtype=np.int64)
    r = cell // RES_BITS_SHIFT
    size = 180.0 / (1 << r).astype(np.float64)
    ix = (cell % RES_BITS_SHIFT) // IX_SHIFT
    iy = cell % IX_SHIFT
    minlat = iy * size - 90.0
    minlon = ix * size - 180.0
    return minlat, minlon, minlat + size, minlon + size


def bbox_cover(
    minlat: float, minlon: float, maxlat: float, maxlon: float, res: int
) -> np.ndarray:
    """All cell ids at ``res`` overlapping a bbox (no wraparound handling —
    polygons here never cross the antimeridian; extend if they do)."""
    size = cell_size_deg(res)
    nx, ny = 2 << res, 1 << res
    ix0 = int(np.clip(math.floor((minlon + 180.0) / size), 0, nx - 1))
    ix1 = int(np.clip(math.floor((maxlon + 180.0) / size), 0, nx - 1))
    iy0 = int(np.clip(math.floor((minlat + 90.0) / size), 0, ny - 1))
    iy1 = int(np.clip(math.floor((maxlat + 90.0) / size), 0, ny - 1))
    ix = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iy = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ix, iy, indexing="ij")
    return (res * RES_BITS_SHIFT + gx.ravel() * IX_SHIFT + gy.ravel())


def polygon_cover(ring_lat, ring_lon, res: int) -> np.ndarray:
    """Cell cover of a polygon ring: bbox cells, keeping cells that either
    contain a ring vertex, intersect the ring, or whose center is inside.

    Conservative superset guarantee: any cell containing a point that is
    inside the polygon is kept. We keep it simple (and provably a superset)
    by returning the full bbox cover — the exact PIP refine stage removes
    false positives. Tighter covers are a pure optimization knob.
    """
    ring_lat = np.asarray(ring_lat, dtype=np.float64)
    ring_lon = np.asarray(ring_lon, dtype=np.float64)
    return bbox_cover(ring_lat.min(), ring_lon.min(), ring_lat.max(), ring_lon.max(), res)


# Optional: real H3 if present (not in this container) — same API surface.
try:  # pragma: no cover
    import h3 as _h3  # noqa: F401

    HAVE_H3 = True
except Exception:  # pragma: no cover
    HAVE_H3 = False
