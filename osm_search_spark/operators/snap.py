"""Snap points to the nearest polyline SEGMENT — the map-matching
primitive (nearest-road snap with the exact foot-of-perpendicular, not
the reference's nearest street-POINT 1-NN, indexer.go:1032-1038, which
`build_places` reproduces for parity).

Plan shape (100 TB posture):

- segments are a narrow explode of the ways dim (way_id, seg_idx, a, b);
- each segment covers the grid cells of its bbox PADDED by the search
  radius (two chained explodes — bounded, dim-sized), so a point joins
  its own cell id against the broadcast cover: one hash join, no
  distance work outside the radius, cost ∝ points + dim cells;
- the exact refine is ONE shared SQL expression (equirectangular
  projection about the point — the reference's own approximation, P7
  geometry.go — for the perpendicular parameter t, then the engine's
  haversine for the snapped distance) evaluated via F.expr so the DuckDB
  twin runs the IDENTICAL text;
- per-point argmin = groupBy(min(struct(dist, way_id, seg_idx, ...))) —
  map-side combinable, no window sort (the repo's argmin discipline).

Points farther than `radius_km` from every segment get NO row (bounded
search — the property that keeps the join scale-safe; same contract as
the geofence join)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions.geodesy import haversine_km

# foot-of-perpendicular parameter along the segment, clamped to [0, 1]:
# planar dot products in degree space with longitudes scaled by
# cos(lat_point) — equirectangular about the point. NULLIF guards the
# degenerate zero-length segment (t -> 0).
T_EXPR = (
    "greatest(0.0, least(1.0, coalesce("
    "((plon - alon) * cos(radians(plat)) * (blon - alon) * cos(radians(plat))"
    " + (plat - alat) * (blat - alat))"
    " / nullif("
    "(blon - alon) * cos(radians(plat)) * (blon - alon) * cos(radians(plat))"
    " + (blat - alat) * (blat - alat), 0.0), 0.0)))"
)
SNAP_LAT_EXPR = f"(alat + {T_EXPR} * (blat - alat))"
SNAP_LON_EXPR = f"(alon + {T_EXPR} * (blon - alon))"


def way_segments(ways: DataFrame) -> DataFrame:
    """Explode assembled ways (id, lats, lons) into directed segments:
    (way_id, seg_idx, alat, alon, blat, blon). Narrow, no shuffle."""
    seq = F.when(
        F.size("lats") >= 2, F.sequence(F.lit(1), F.size("lats") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return ways.select(
        F.col("id").alias("way_id"),
        F.explode(
            F.transform(
                seq,
                lambda i: F.struct(
                    (i - 1).alias("seg_idx"),
                    F.element_at("lats", i).alias("alat"),
                    F.element_at("lons", i).alias("alon"),
                    F.element_at("lats", i + 1).alias("blat"),
                    F.element_at("lons", i + 1).alias("blon"),
                ),
            )
        ).alias("s"),
    ).select(
        "way_id", "s.seg_idx", "s.alat", "s.alon", "s.blat", "s.blon"
    )


def _segment_cover(segs: DataFrame, radius_km: float, res: int) -> DataFrame:
    """Cells of each segment's radius-padded bbox. Padding is
    conservative (1 deg lat >= 110.57 km; lon pad uses the bbox's worst
    |lat|), so no within-radius pair can be missed — the refine applies
    the exact radius."""
    size = C.cell_size_deg(res)
    nx, ny = 2 << res, 1 << res
    pad_lat = radius_km / 110.0
    lat_hi = F.greatest(F.abs("alat"), F.abs("blat")) + F.lit(pad_lat)
    pad_lon = F.lit(radius_km) / (
        F.lit(110.0)
        * F.greatest(F.cos(F.radians(F.least(lat_hi, F.lit(89.0)))), F.lit(0.01))
    )
    minlat = F.least("alat", "blat") - F.lit(pad_lat)
    maxlat = F.greatest("alat", "blat") + F.lit(pad_lat)
    minlon = F.least("alon", "blon") - pad_lon
    maxlon = F.greatest("alon", "blon") + pad_lon

    def clamp(v, hi):
        return F.least(
            F.greatest(v.cast("long"), F.lit(0)), F.lit(hi - 1)
        )

    ix0 = clamp(F.floor((minlon + 180.0) / size), nx)
    ix1 = clamp(F.floor((maxlon + 180.0) / size), nx)
    iy0 = clamp(F.floor((minlat + 90.0) / size), ny)
    iy1 = clamp(F.floor((maxlat + 90.0) / size), ny)
    with_x = segs.withColumns({"_iy0": iy0, "_iy1": iy1}).select(
        "*", F.explode(F.sequence(ix0, ix1)).alias("_cx")
    )
    return with_x.select(
        "*", F.explode(F.sequence("_iy0", "_iy1")).alias("_cy")
    ).select(
        F.col("way_id"), "seg_idx", "alat", "alon", "blat", "blon",
        (
            F.lit(res * C.RES_BITS_SHIFT)
            + F.col("_cx") * F.lit(C.IX_SHIFT)
            + F.col("_cy")
        ).alias("cell_id"),
    )


def snap_to_segments(
    points: DataFrame,
    ways: DataFrame,
    radius_km: float = 0.5,
    res: int = C.JOIN_RES,
    point_id: str = "point_id",
    lat: str = "lat",
    lon: str = "lon",
    broadcast_segments: bool = True,
) -> DataFrame:
    """Nearest segment within `radius_km` per point: (point_id, way_id,
    seg_idx, t, snap_lat, snap_lon, dist_km), floats rounded 6dp.
    Deterministic tie-break (dist, way_id, seg_idx). Set
    broadcast_segments=False for road networks too large to broadcast —
    the cover join becomes a shuffle hash join on cell_id."""
    cover = _segment_cover(way_segments(ways), radius_km, res)
    if broadcast_segments:
        cover = F.broadcast(cover)
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(lat).alias("plat"),
        F.col(lon).alias("plon"),
        C.latlng_to_cell(lat, lon, res).alias("cell_id"),
    )
    cand = pts.join(cover, "cell_id")
    # STACKED projections (round-3 discipline): t materializes once, the
    # snap point reads the materialized _t, the distance reads the
    # materialized snap point — inlining T_EXPR into all four would
    # re-evaluate the fold ~4x per candidate (measured ~2x wall). Values
    # are identical to the inlined twin text (same arithmetic on the
    # same t), so oracle parity is unaffected.
    with_t = cand.select(
        "point_id", "way_id", "seg_idx", "plat", "plon",
        "alat", "alon", "blat", "blon",
        F.expr(T_EXPR).alias("_t"),
    )
    with_snap = with_t.select(
        "point_id", "way_id", "seg_idx", "plat", "plon", "_t",
        (F.col("alat") + F.col("_t") * (F.col("blat") - F.col("alat"))).alias("_slat"),
        (F.col("alon") + F.col("_t") * (F.col("blon") - F.col("alon"))).alias("_slon"),
    )
    refined = with_snap.select(
        "point_id", "way_id", "seg_idx", "_t", "_slat", "_slon",
        haversine_km(
            F.col("plat"), F.col("plon"), F.col("_slat"), F.col("_slon")
        ).alias("_d"),
    ).filter(F.round("_d", 6) <= radius_km)
    best = refined.groupBy("point_id").agg(
        F.min(
            F.struct(
                F.col("_d").alias("d"),
                F.col("way_id").alias("way_id"),
                F.col("seg_idx").alias("seg_idx"),
                F.col("_t").alias("t"),
                F.col("_slat").alias("slat"),
                F.col("_slon").alias("slon"),
            )
        ).alias("b")
    )
    return best.select(
        "point_id",
        F.col("b.way_id").alias("way_id"),
        F.col("b.seg_idx").alias("seg_idx"),
        F.round("b.t", 6).alias("t"),
        F.round("b.slat", 6).alias("snap_lat"),
        F.round("b.slon", 6).alias("snap_lon"),
        F.round("b.d", 6).alias("dist_km"),
    )
