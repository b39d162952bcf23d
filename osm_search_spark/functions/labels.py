"""Polygon labeling points: area-weighted centroid + point-on-surface.

Two standard cartographic row-wise functions the reference lacks (its
polygons only ever answer PIP; a tile renderer needs a label anchor):

- `centroid`: planar shoelace centroid in (x=lon, y=lat) space, holes
  subtracted (each ring's contribution is normalized as-if-CCW, so input
  ring orientation is irrelevant — the donut fixtures deliberately carry
  arbitrary hole orientation).
- `point_on_surface`: a point GUARANTEED interior (the centroid of a
  concave or holed polygon can fall outside): even-odd scanline at the
  bbox mid-latitude — collect the x-crossings of all rings (outer +
  holes, half-open rule so vertices on the line count once), sort, take
  the midpoint of the WIDEST inside interval (ties -> leftmost). The
  GEOS/Shapely representative-point construction.

Both are PURE Column arithmetic with no libm calls (+,-,*,/ only), so
the DuckDB twins hash-compare bit-exactly with NO rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ring_terms(rl, rn, y0, x0):
    """(cross_sum, num_x, num_y) shoelace terms of one closed ring in
    coordinates TRANSLATED to (y0, x0) — the conditioning trick: raw
    lon~110 coordinates lose ~1e-12 of the result to cancellation, local
    coordinates keep ~1e-15 of the polygon size. Normalized as-if-CCW
    (sign of the ring's own cross-sum applied)."""
    seq = F.when(
        F.size(rl) >= 2, F.sequence(F.lit(1), F.size(rl) - 1)
    ).otherwise(F.array().cast("array<int>"))

    def X(i):
        return F.element_at(rn, i) - x0

    def Y(i):
        return F.element_at(rl, i) - y0

    def cross(i):
        return X(i) * Y(i + 1) - X(i + 1) * Y(i)

    s = F.aggregate(seq, F.lit(0.0), lambda acc, i: acc + cross(i))
    nx = F.aggregate(
        seq, F.lit(0.0), lambda acc, i: acc + (X(i) + X(i + 1)) * cross(i)
    )
    ny = F.aggregate(
        seq, F.lit(0.0), lambda acc, i: acc + (Y(i) + Y(i + 1)) * cross(i)
    )
    sign = F.when(s < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return s * sign, nx * sign, ny * sign


def centroid(ring_lat, ring_lon, holes_lat=None, holes_lon=None):
    """(centroid_lat, centroid_lon) Columns. Holes subtract; rings of any
    orientation; null when the net area is zero."""
    rl, rn = F.col(ring_lat), F.col(ring_lon)
    y0, x0 = F.element_at(rl, 1), F.element_at(rn, 1)
    s, nx, ny = _ring_terms(rl, rn, y0, x0)
    if holes_lat is not None:
        hz = F.arrays_zip(F.col(holes_lat), F.col(holes_lon))

        # per-hole normalized terms, summed: fold over the zipped holes
        def hole_fold(which):
            def f(acc, h):
                hl, hn = h[holes_lat], h[holes_lon]
                seq = F.when(
                    F.size(hl) >= 2, F.sequence(F.lit(1), F.size(hl) - 1)
                ).otherwise(F.array().cast("array<int>"))

                def X(i):
                    return F.element_at(hn, i) - x0

                def Y(i):
                    return F.element_at(hl, i) - y0

                def cross(i):
                    return X(i) * Y(i + 1) - X(i + 1) * Y(i)

                s_h = F.aggregate(seq, F.lit(0.0), lambda a, i: a + cross(i))
                sign = F.when(s_h < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
                if which == "s":
                    term = s_h * sign
                elif which == "nx":
                    term = sign * F.aggregate(
                        seq,
                        F.lit(0.0),
                        lambda a, i: a + (X(i) + X(i + 1)) * cross(i),
                    )
                else:
                    term = sign * F.aggregate(
                        seq,
                        F.lit(0.0),
                        lambda a, i: a + (Y(i) + Y(i + 1)) * cross(i),
                    )
                return acc + term

            return f

        s = s - F.aggregate(hz, F.lit(0.0), hole_fold("s"))
        nx = nx - F.aggregate(hz, F.lit(0.0), hole_fold("nx"))
        ny = ny - F.aggregate(hz, F.lit(0.0), hole_fold("ny"))
    denom = F.lit(3.0) * s
    clat = F.when(s != 0, y0 + ny / denom)
    clon = F.when(s != 0, x0 + nx / denom)
    return clat, clon


def _crossings(rl, rn, y) -> Column:
    """x-coordinates where ring edges cross the horizontal line at y
    (half-open rule: edge counts iff (alat <= y) != (blat <= y))."""
    seq = F.when(
        F.size(rl) >= 2, F.sequence(F.lit(1), F.size(rl) - 1)
    ).otherwise(F.array().cast("array<int>"))

    def x_of(i):
        alat, blat = F.element_at(rl, i), F.element_at(rl, i + 1)
        alon, blon = F.element_at(rn, i), F.element_at(rn, i + 1)
        hit = (alat <= y) != (blat <= y)
        return F.when(
            hit, alon + (y - alat) / (blat - alat) * (blon - alon)
        )

    return F.array_compact(F.transform(seq, x_of))


def point_on_surface(ring_lat, ring_lon, holes_lat=None, holes_lon=None):
    """(pos_lat, pos_lon) Columns: midpoint of the widest inside interval
    on the bbox-mid-latitude scanline (ties -> leftmost interval). Null
    when no interval exists (degenerate ring)."""
    rl, rn = F.col(ring_lat), F.col(ring_lon)
    y = (F.array_min(rl) + F.array_max(rl)) / F.lit(2.0)
    xs = _crossings(rl, rn, y)
    if holes_lat is not None:
        hz = F.arrays_zip(F.col(holes_lat), F.col(holes_lon))
        xs = F.concat(
            xs,
            F.flatten(
                F.transform(
                    hz, lambda h: _crossings(h[holes_lat], h[holes_lon], y)
                )
            ),
        )
    xs = F.array_sort(xs)
    n_iv = (F.size(xs) / 2).cast("int")
    ks = F.when(n_iv >= 1, F.sequence(F.lit(1), n_iv)).otherwise(
        F.array().cast("array<int>")
    )
    best = F.aggregate(
        ks,
        F.struct(
            F.lit(-1.0).alias("w"), F.lit(None).cast("double").alias("mid")
        ),
        lambda acc, k: F.when(
            (F.element_at(xs, 2 * k) - F.element_at(xs, 2 * k - 1)) > acc["w"],
            F.struct(
                (F.element_at(xs, 2 * k) - F.element_at(xs, 2 * k - 1)).alias("w"),
                (
                    (F.element_at(xs, 2 * k - 1) + F.element_at(xs, 2 * k))
                    / F.lit(2.0)
                ).alias("mid"),
            ),
        ).otherwise(acc),
    )
    pos_lat = F.when(best["mid"].isNotNull(), y)
    return pos_lat, best["mid"]
