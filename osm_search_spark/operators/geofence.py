"""Geofencing: INSIDE/ENTER/EXIT/OUTSIDE/CROSS as batch window logic.

Reference: pkg/geofence/geofence.go:63-116 — for each new point of a tracked
entity, compare containment in each (nearby) fence circle against the
entity's previous point (persisted in bbolt, fence_index.go:56-67). The
batch re-expression replaces the KV round-trip with `lag()` over
(entity, seq) — removing the stateful store entirely — and the 3-NN fence
lookup with the same cell join used everywhere else (fences are few: a
broadcast cross join below a size threshold).

Status matrix (geofence.go:97-116):
  prev in  & now in  -> INSIDE
  prev out & now in  -> ENTER
  prev in  & now out -> EXIT
  prev out & now out -> CROSS if the segment prev->now intersects the
                        circle (circle.go:54-96), else OUTSIDE
First observation of an entity has no prev: reference treats missing prev
as "outside" (fence_index.go:56-67 returns zero point) -> ENTER/OUTSIDE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geodesy import EARTH_RADIUS_KM, haversine_km


def _line_circle_intersect(
    alat, alon, blat, blon, clat, clon, radius_km
) -> F.Column:
    """Segment AB vs circle C: equirectangular projection around the fence
    center then quadratic discriminant + segment-param check — the exact
    logic of circle.go:54-96, as Column arithmetic."""
    # project to km in the fence's tangent plane
    coslat = F.cos(F.radians(clat))
    ax = (F.radians(alon) - F.radians(clon)) * coslat * EARTH_RADIUS_KM
    ay = (F.radians(alat) - F.radians(clat)) * EARTH_RADIUS_KM
    bx = (F.radians(blon) - F.radians(clon)) * coslat * EARTH_RADIUS_KM
    by = (F.radians(blat) - F.radians(clat)) * EARTH_RADIUS_KM
    dx, dy = bx - ax, by - ay
    a = dx * dx + dy * dy
    b = 2.0 * (ax * dx + ay * dy)
    c = ax * ax + ay * ay - radius_km * radius_km
    disc = b * b - 4.0 * a * c
    sq = F.sqrt(F.abs(disc))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    on_seg = ((t1 >= 0.0) & (t1 <= 1.0)) | ((t2 >= 0.0) & (t2 <= 1.0))
    return (disc >= 0.0) & (a > 0.0) & on_seg


BROADCAST_FENCE_MAX = 10000


def geofence_status(
    tracks: DataFrame,
    fences: DataFrame,
    entity: str = "query_point_id",
    seq: str = "seq",
    nearest_n: int | None = None,
    fence_broadcast_threshold: int = BROADCAST_FENCE_MAX,
) -> DataFrame:
    """(entity, seq, fence_name, status) per track point × fence.

    `nearest_n` optionally restricts to the n nearest fences per point
    (reference uses 3-NN, geofence.go:63-95).

    Join strategy is picked by fence-dim size (bounded limit+count probe):
    below `fence_broadcast_threshold` fences broadcast and the nearest_n
    restriction is a window; above it the points NEVER cross-join the fence
    set — candidate fences come from the same incremental cell-ring kNN
    used everywhere else (knn_join over fence centers), reproducing the
    reference's nearest-fence prefilter (geofence.go:63-95) as a join
    strategy. The big path REQUIRES nearest_n: emitting a status for every
    (point, fence) pair is quadratic above the threshold, and silently
    truncating to a default would change semantics with data size — so
    nearest_n=None above the threshold raises instead.
    """
    w = Window.partitionBy(entity).orderBy(seq)
    t = tracks.withColumns(
        {
            "prev_lat": F.lag("lat").over(w),
            "prev_lon": F.lag("lon").over(w),
        }
    )
    fz = fences.select(
        "fence_name",
        F.col("lat").alias("flat"),
        F.col("lon").alias("flon"),
        "radius_km",
    )
    n_probe = fz.limit(fence_broadcast_threshold + 1).count()
    if n_probe > fence_broadcast_threshold:
        if nearest_n is None:
            raise ValueError(
                f"geofence_status: {n_probe}+ fences exceed the broadcast "
                f"threshold ({fence_broadcast_threshold}); all-fence statuses "
                "would be quadratic at this size. Pass nearest_n (the "
                "reference uses 3, geofence.go:63-95) or raise "
                "fence_broadcast_threshold explicitly."
            )
        return _geofence_status_knn(t, fz, entity, seq, nearest_n)

    j = t.crossJoin(F.broadcast(fz))
    if nearest_n is not None:
        # fence_name tiebreak matches knn_join's deterministic (dist, id)
        # order so the two size-selected strategies agree under ties
        wn = Window.partitionBy(entity, seq).orderBy(
            haversine_km("lat", "lon", "flat", "flon"), F.col("fence_name")
        )
        j = j.withColumn("_fr", F.row_number().over(wn)).filter(
            F.col("_fr") <= nearest_n
        ).drop("_fr")

    return _status_frame(j, entity, seq)


def _status_frame(j: DataFrame, entity: str, seq: str) -> DataFrame:
    """Status matrix (geofence.go:97-116) over candidate (point, fence)
    rows carrying lat/lon/prev_lat/prev_lon/flat/flon/radius_km."""
    now_in = haversine_km("lat", "lon", "flat", "flon") <= F.col("radius_km")
    prev_in = F.when(
        F.col("prev_lat").isNotNull(),
        haversine_km("prev_lat", "prev_lon", "flat", "flon") <= F.col("radius_km"),
    ).otherwise(F.lit(False))
    crosses = F.when(
        F.col("prev_lat").isNotNull(),
        _line_circle_intersect(
            F.col("prev_lat"), F.col("prev_lon"), F.col("lat"), F.col("lon"),
            F.col("flat"), F.col("flon"), F.col("radius_km"),
        ),
    ).otherwise(F.lit(False))

    status = (
        F.when(prev_in & now_in, "INSIDE")
        .when(~prev_in & now_in, "ENTER")
        .when(prev_in & ~now_in, "EXIT")
        .when(crosses, "CROSS")
        .otherwise("OUTSIDE")
    )
    return j.select(
        F.col(entity), F.col(seq), "fence_name", status.alias("status")
    )


def _geofence_status_knn(
    t: DataFrame, fz: DataFrame, entity: str, seq: str, nearest_n: int
) -> DataFrame:
    """Scale path: candidate fences per point via the incremental cell-ring
    kNN over fence centers (the reference's nearest-fence prefilter,
    geofence.go:63-95, as a join strategy) — points never see the full
    fence set. `t` already carries prev_lat/prev_lon."""
    from .knn import knn_join

    pt = t.withColumn(
        "_pt_id", F.concat_ws("\x1f", F.col(entity), F.col(seq).cast("string"))
    )
    cand = knn_join(
        pt.select("_pt_id", "lat", "lon"),
        fz,
        k=nearest_n,
        probe_id="_pt_id",
        plat="lat",
        plon="lon",
        obj_id="fence_name",
        olat="flat",
        olon="flon",
    ).select("_pt_id", "fence_name")
    j = (
        pt.join(cand, "_pt_id")
        .join(fz, "fence_name")
    )
    return _status_frame(j, entity, seq)


def fence_polygons(
    fences: DataFrame,
    n_vertices: int = 32,
    lat: str = "lat",
    lon: str = "lon",
    radius_km: str = "radius_km",
) -> DataFrame:
    """Convert circular fences to polygon rings (geodesic point buffer,
    ST_Buffer-for-points): adds ring_lat/ring_lon — a closed CCW
    n_vertices-gon per fence — so circles compose with the polygon stack
    (PIP spatial join, overlap join, clip_to_tiles, rasterize). Pure
    Column (one transform over a bounded sequence + two stacked
    projections to split the struct array); the inscribed-polygon radius
    undershoots the true circle by radius*(1-cos(pi/n)) — callers needing
    a cover (never-miss) semantics should inflate radius_km by
    1/cos(pi/n) first."""
    from ..functions.geodesy import buffer_ring

    ring = buffer_ring(lat, lon, F.col(radius_km), n_vertices)
    # stacked projections: build the struct array ONCE, split in a second
    # select (the spatial_join refine discipline — inlining the transform
    # into both array projections would evaluate it twice)
    with_ring = fences.withColumn("_ring", ring)
    return with_ring.select(
        *fences.columns,
        F.transform("_ring", lambda s: s["lat"]).alias("ring_lat"),
        F.transform("_ring", lambda s: s["lon"]).alias("ring_lon"),
    )
