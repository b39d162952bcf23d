"""Per-group convex hull — cluster footprints as ring polygons.

The natural composition on top of point clustering (dbscan.py) and the
per-tile point sets of the spatial join: reduce each group's point
cloud to its convex hull ring, in the same (lats, lons) ring shape every
vector operator here consumes (PIP join, overlap join, dissolve,
labels), so cluster footprints flow straight back into the polygon
pipeline.

Algorithm: Andrew monotone chain with STRICT turns — collinear boundary
points and duplicates are excluded — emitting the ring in CCW order
(x = lon, y = lat axes) starting at the lexicographic-min (lon, lat)
vertex, so the output is canonical regardless of partitioning or input
order. Degenerate groups pass through: 1 point -> 1-vertex "ring",
all-collinear -> the 2 extreme endpoints.

Scale shape (100 TB posture): the classic two-level reduction —

1. **Partition-local prune (map-only).** One mapInPandas over the input
   partitions computes the local hull of each group's points PER ARROW
   BATCH: output per (batch, group) is bounded by that subset's hull
   size, so the shuffle that follows moves hull-sized data, not the
   point cloud (hull(union of hulls) == hull(all points) by convexity).
2. **Per-group merge, batched.** repartition(group) +
   sortWithinPartitions + ONE batched mapInPandas with boundary-straddle
   buffering (the map_match.py kernel shape — groupBy().applyInPandas
   costs ~0.8ms/group at tiny groups, CLAUDE.md round-8).

All turn decisions are sign-of-cross-product over float64; for
coordinates with bounded mantissas (the fixture lattice, quantized
grids) every cross is IEEE-exact, which is what lets the oracle verify
the vertex SET through an entirely independent derivation (Carathéodory
triangle test) rather than a mirror of this walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

import pandas as pd


def hull_py(points) -> list:
    """Monotone-chain convex hull over (x, y) pairs. Returns the CCW
    ring (strict turns, no repeated closing vertex) starting at the
    lexicographic-min point; <=2 distinct points pass through sorted."""
    ps = sorted(set(points))
    if len(ps) <= 2:
        return ps

    def chain(seq):
        h: list = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = chain(ps)
    upper = chain(reversed(ps))
    return lower[:-1] + upper[:-1]


def _akl_prune(x, y):
    """Akl-Toussaint throw-away: drop points STRICTLY inside the
    quadrilateral of the 4 axis-extreme points (vectorized numpy; the
    python chain then runs on the ~O(sqrt n) survivors). Safe: a
    strictly interior point of the quad is strictly interior to the
    hull. Degenerate quads (duplicate extremes) prune nothing. Exact
    for exactly-representable cross products — the same bounded-
    mantissa caveat the module contract already carries."""
    import numpy as np

    quad_i = [int(np.argmin(x)), int(np.argmin(y)),
              int(np.argmax(x)), int(np.argmax(y))]
    qx = np.array([x[i] for i in quad_i])
    qy = np.array([y[i] for i in quad_i])
    inside = np.ones(len(x), dtype=bool)
    for i in range(4):
        ax, ay = qx[i], qy[i]
        bx, by = qx[(i + 1) % 4], qy[(i + 1) % 4]
        inside &= (bx - ax) * (y - ay) - (by - ay) * (x - ax) > 0
    return ~inside


def _local_kernel(group: str, lat: str, lon: str):
    def gen(batches):
        for pdf in batches:
            gs, las, los = [], [], []
            for g, sub in pdf.groupby(group, sort=False):
                x = sub[lon].to_numpy()
                y = sub[lat].to_numpy()
                if len(x) > 16:
                    keep = _akl_prune(x, y)
                    x, y = x[keep], y[keep]
                for px, py in hull_py(zip(x, y)):
                    gs.append(g)
                    las.append(py)
                    los.append(px)
            yield pd.DataFrame({group: gs, lat: las, lon: los})

    return gen


def _merge_kernel(group: str, lat: str, lon: str):
    cols = [group, "n_vertices", "hull_lats", "hull_lons"]

    def emit(g, pts, out):
        ring = hull_py(pts)
        out.append(
            (g, len(ring), [p[1] for p in ring], [p[0] for p in ring])
        )

    def gen(batches):
        leftover = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if pdf.empty:
                continue
            last = pdf[group].iloc[-1]
            done = pdf[pdf[group] != last]
            leftover = pdf[pdf[group] == last]
            if not done.empty:
                out: list = []
                for g, sub in done.groupby(group, sort=False):
                    emit(g, list(zip(sub[lon], sub[lat])), out)
                yield pd.DataFrame(out, columns=cols)
        if leftover is not None and not leftover.empty:
            out = []
            for g, sub in leftover.groupby(group, sort=False):
                emit(g, list(zip(sub[lon], sub[lat])), out)
            yield pd.DataFrame(out, columns=cols)

    return gen


def convex_hull(
    points: DataFrame,
    group: str = "cluster_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(group, n_vertices, hull_lats, hull_lons) — one canonical CCW
    hull ring per group (see module docstring for the exact contract).

    NULL-group rows are DROPPED (ADVICE r08): both kernels group via
    pandas groupby, whose dropna default discards them — pinned here as
    the contract rather than an accident. Feeding dbscan output straight
    in therefore hulls only clustered points; noise rows (cluster_id
    NULL) never contribute. Pre-filter explicitly if you need an error
    instead."""
    gtype = points.schema[group].dataType.simpleString()
    src = points.select(group, lat, lon)
    local = src.mapInPandas(
        _local_kernel(group, lat, lon),
        f"{group} {gtype}, {lat} double, {lon} double",
    )
    return (
        local.repartition(group)
        .sortWithinPartitions(group)
        .mapInPandas(
            _merge_kernel(group, lat, lon),
            f"{group} {gtype}, n_vertices int, "
            "hull_lats array<double>, hull_lons array<double>",
        )
    )
