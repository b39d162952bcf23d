"""Trajectory similarity join — exact Hausdorff distance under a threshold.

The similar-trajectory query of the trips/map-matching stack (reference
analog: the kNN/geofence family of pkg/index queries operates on point
sets; this operator lifts the same cell-grid candidate machinery to
whole polylines): given a frame of trips (trip_id, lats, lons), return
every unordered pair whose symmetric Hausdorff distance — in the same
squared-equirectangular metric the DBSCAN/snap operators use
(dbscan.dist2_expr) — is <= ``d_max`` degrees, together with the exact
squared distance ``hd2``.

    H(A, B) = max( max_a min_b d(a,b),  max_b min_a d(a,b) )

Scale shape (100 TB posture):

1. **Candidate pairs by cell co-occurrence.** H(A,B) <= d implies SOME
   point of A is within d of SOME point of B, so at ``pick_res(d_max)``
   (cell edge >= the d ellipse's lon semi-axis) A's raw point-cells must
   intersect B's 3x3-ring-padded point-cells. Both sides are DISTINCT
   (trip, cell) sets — duplication is bounded by cells-per-trip, not
   points-per-trip — and the join output is de-duplicated to unordered
   pairs. No all-pairs stage exists anywhere.
2. **BBox prune.** H <= d also requires each trip's bbox to lie inside
   the other's bbox padded by d (lat) / d/lon_scale (lon) — a plain
   Column predicate over per-trip array_min/array_max extents that kills
   most co-located-but-different pairs before any O(n*m) work.
3. **Exact refine, map-only.** Survivor pairs carry both vertex arrays
   (two hash joins on trip_id) into ONE vectorized numpy kernel
   (mapInPandas) computing the full min/max over the n x m distance
   matrix — no per-row Python arithmetic, no further shuffle. Each
   pairwise d2 is evaluated as ``dy*dy + (dx*dx)*s2`` — the identical
   operation order of ``dist2_expr`` — and Hausdorff is min/max
   SELECTION over those exact doubles, so the result is bit-exact
   against a SQL re-derivation (the oracle needs NO rounding).

Contracts: trip vertex counts must be task-bounded (the trips.py
contract — simplify megatrajectories first); a mega-hot cell (all trips
through one terminal) surfaces as one heavy candidate key — pick a
finer ``res`` so the bbox prune sees fewer, tighter candidates. Empty
trips are ignored (no pair can include them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..sources.synth import dlit
from .dbscan import LON_SCALE, pick_res


def dist2_points_expr(lon_scale: float = LON_SCALE) -> str:
    """dbscan.dist2_expr over point-pair column names (alat, alon) x
    (blat, blon) — re-stated here so the trajectory twin and the kernel
    share ONE documented operation order: dy*dy + (dx*dx)*s2."""
    s2 = dlit(lon_scale * lon_scale)
    return (
        "((alat - blat) * (alat - blat)"
        f" + ((alon - blon) * (alon - blon)) * {s2})"
    )


def _hausdorff_kernel(s2: float):
    """mapInPandas kernel: (trip_a, trip_b, alats, alons, blats, blons)
    -> (trip_a, trip_b, hd2). Vectorized over the n x m matrix per pair;
    arithmetic order pinned to dist2_points_expr."""

    def kern(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_d = [], [], []
            for ta, tb, al, ao, bl, bo in zip(
                pdf["trip_a"], pdf["trip_b"],
                pdf["alats"], pdf["alons"], pdf["blats"], pdf["blons"],
            ):
                al = np.asarray(al, dtype=np.float64)
                ao = np.asarray(ao, dtype=np.float64)
                bl = np.asarray(bl, dtype=np.float64)
                bo = np.asarray(bo, dtype=np.float64)
                if al.size == 0 or bl.size == 0:
                    continue
                dy = al[:, None] - bl[None, :]
                dx = ao[:, None] - bo[None, :]
                d2 = dy * dy + (dx * dx) * np.float64(s2)
                h_ab = d2.min(axis=1).max()
                h_ba = d2.min(axis=0).max()
                out_a.append(int(ta))
                out_b.append(int(tb))
                out_d.append(max(h_ab, h_ba))
            yield pd.DataFrame(
                {
                    "trip_a": pd.Series(out_a, dtype="int64"),
                    "trip_b": pd.Series(out_b, dtype="int64"),
                    "hd2": pd.Series(out_d, dtype="float64"),
                }
            )

    return kern


def hausdorff_join(
    trips: DataFrame,
    d_max: float,
    res: int | None = None,
    lon_scale: float = LON_SCALE,
    id_col: str = "trip_id",
    lats: str = "lats",
    lons: str = "lons",
) -> DataFrame:
    """(trip_a, trip_b, hd2): unordered pairs (trip_a < trip_b) with
    symmetric squared-equirect Hausdorff hd2 <= d_max^2 (exact)."""
    if res is None:
        res = pick_res(d_max, lon_scale)
    t = trips.select(
        F.col(id_col).cast("long").alias("trip_id"),
        F.col(lats).alias("lats"),
        F.col(lons).alias("lons"),
    ).filter(F.size("lats") > 0)

    pt = t.select(
        "trip_id", F.explode(F.arrays_zip("lats", "lons")).alias("p")
    ).select(
        "trip_id",
        C.latlng_to_cell(F.col("p.lats"), F.col("p.lons"), res).alias("cell"),
    )
    cells_a = pt.distinct()
    cells_b = (
        pt.distinct()
        .select(
            F.col("trip_id").alias("trip_b"),
            F.explode(C.k_ring("cell", 1, res)).alias("cell"),
        )
        .distinct()
    )
    # SHUFFLE_HASH, building on the UNPADDED side: both cell sets are
    # data-sized (the padded side ~9x so), but Catalyst's size estimate
    # cannot see the explode fan-out (a synthesized input estimated
    # "small" got BROADCAST at 1M trips -> driver OOM). Never broadcast
    # either side of the candidate join.
    cand = (
        cells_a.hint("shuffle_hash").join(cells_b, "cell")
        .filter(F.col("trip_id") < F.col("trip_b"))
        .select(F.col("trip_id").alias("trip_a"), "trip_b")
        .distinct()
    )

    ext = t.select(
        "trip_id",
        F.array_min("lats").alias("minlat"),
        F.array_max("lats").alias("maxlat"),
        F.array_min("lons").alias("minlon"),
        F.array_max("lons").alias("maxlon"),
    )
    pad_lat = F.lit(d_max)
    pad_lon = F.lit(d_max / lon_scale)
    ea = ext.select(
        F.col("trip_id").alias("trip_a"),
        *[F.col(c).alias(f"a_{c}") for c in ("minlat", "maxlat", "minlon", "maxlon")],
    )
    eb = ext.select(
        F.col("trip_id").alias("trip_b"),
        *[F.col(c).alias(f"b_{c}") for c in ("minlat", "maxlat", "minlon", "maxlon")],
    )
    # SHUFFLE_HASH on every per-trip dim: the trips table is data-sized
    # (arrays!), so letting AQE broadcast it OOMs the driver at scale —
    # measured at 1M trips x 32 vertices (512 MB "small" side). The
    # pair frame is the big, already-shuffled side; hash-joining the
    # trip dims shuffles each ONCE on trip_id.
    pruned = (
        cand.join(ea.hint("shuffle_hash"), "trip_a")
        .join(eb.hint("shuffle_hash"), "trip_b")
        .filter(
            (F.col("a_minlat") >= F.col("b_minlat") - pad_lat)
            & (F.col("a_maxlat") <= F.col("b_maxlat") + pad_lat)
            & (F.col("a_minlon") >= F.col("b_minlon") - pad_lon)
            & (F.col("a_maxlon") <= F.col("b_maxlon") + pad_lon)
            & (F.col("b_minlat") >= F.col("a_minlat") - pad_lat)
            & (F.col("b_maxlat") <= F.col("a_maxlat") + pad_lat)
            & (F.col("b_minlon") >= F.col("a_minlon") - pad_lon)
            & (F.col("b_maxlon") <= F.col("a_maxlon") + pad_lon)
        )
        .select("trip_a", "trip_b")
    )

    ta = t.select(
        F.col("trip_id").alias("trip_a"),
        F.col("lats").alias("alats"),
        F.col("lons").alias("alons"),
    )
    tb = t.select(
        F.col("trip_id").alias("trip_b"),
        F.col("lats").alias("blats"),
        F.col("lons").alias("blons"),
    )
    paired = pruned.join(
        ta.hint("shuffle_hash"), "trip_a"
    ).join(tb.hint("shuffle_hash"), "trip_b").select(
        "trip_a", "trip_b", "alats", "alons", "blats", "blons"
    )
    refined = paired.mapInPandas(
        _hausdorff_kernel(lon_scale * lon_scale),
        "trip_a long, trip_b long, hd2 double",
    )
    return refined.filter(F.col("hd2") <= F.lit(d_max * d_max))


def hausdorff_sql(
    trips_rel: str, d_max: float, lon_scale: float = LON_SCALE
) -> str:
    """DuckDB twin over a relation with (trip_id, lats, lons): full
    min/max re-derivation per unordered pair — candidate pruning is a
    Spark-side superset optimization, so the twin can skip it and the
    final row sets still agree exactly. d2 uses the IDENTICAL
    dist2_points_expr text; hd2 is exact (selections only)."""
    d2 = dist2_points_expr(lon_scale)
    return f"""
with trips as materialized (select * from {trips_rel} where len(lats) > 0),
pa as materialized (
  select trip_id, unnest(lats) as alat, unnest(lons) as alon from trips
),
pb as materialized (
  select trip_id, unnest(lats) as blat, unnest(lons) as blon from trips
),
pairs as (
  select a.trip_id as ta, b.trip_id as tb
  from trips a, trips b where a.trip_id < b.trip_id
),
mins_ab as (
  select p.ta, p.tb, pa.alat, pa.alon, min({d2}) as md2
  from pairs p
  join pa on pa.trip_id = p.ta
  join pb on pb.trip_id = p.tb
  group by 1, 2, 3, 4
),
h_ab as (select ta, tb, max(md2) as h2 from mins_ab group by 1, 2),
mins_ba as (
  select p.ta, p.tb, pb.blat, pb.blon, min({d2}) as md2
  from pairs p
  join pa on pa.trip_id = p.ta
  join pb on pb.trip_id = p.tb
  group by 1, 2, 3, 4
),
h_ba as (select ta, tb, max(md2) as h2 from mins_ba group by 1, 2)
select a.ta as trip_a, a.tb as trip_b, greatest(a.h2, b.h2) as hd2
from h_ab a join h_ba b on a.ta = b.ta and a.tb = b.tb
where greatest(a.h2, b.h2) <= {dlit(d_max * d_max)}
"""
