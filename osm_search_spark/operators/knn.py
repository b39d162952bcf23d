"""k-nearest-neighbor join via iterative k-ring expansion.

Replaces the reference's best-first R-tree traversal
(incrementalNearestNeighbor, pkg/datastructure/rtree.go:675-713; radius +
feature filter variant rtree.go:648-672) with the grid analog:

- objects are indexed once as (cell_id, …) at resolution ``res``;
- probes explode the k-ring of their cell at growing Chebyshev radius
  r ∈ {r0, 2·r0, 4·r0, …} and hash-join the object cells;
- after each round, a probe is **finalized** when its k-th nearest candidate
  is closer than the *guaranteed minimum distance* to any unexplored cell —
  the same "approximate rank, exact check" contract as the reference's PQ
  (minDist ordering rtree.go:541-566 with exact re-insertion :686-697);
- final ranking is exact Haversine with `row_number` per probe
  (the distance-bounded window re-rank).

Ring bound: all cells within Chebyshev distance r of the probe's cell are
explored, so any unexplored object is ≥ r cells away along lat or lon. The
lon direction is tighter (cells narrow by cos(lat)), hence

    bound_km(r) = r * cell_size_deg * 111.19492664455873 * cos_min * SAFETY

with cos_min = cos of the largest |lat| in the explored band and
SAFETY=0.995 absorbing sphere-vs-plane curvature (negligible at km cells).

Scale posture: the expensive side (objects) is shuffled once on cell_id and
can be a pre-bucketed table; each round only re-joins the *unfinished*
probes, so dense areas finish in round 1 and only sparse-area probes
escalate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions.geodesy import haversine_km

KM_PER_DEG = 111.19492664455873  # 2*pi*6371/360, R=6371 per distance.go:6
SAFETY = 0.995


def knn_join(
    probes: DataFrame,
    objects: DataFrame,
    k: int,
    res: int = C.TILE_RES,
    radius_km: float | None = None,
    feature: str | None = None,
    probe_id: str = "probe_id",
    plat: str = "plat",
    plon: str = "plon",
    obj_id: str = "obj_id",
    olat: str = "olat",
    olon: str = "olon",
    max_rounds: int = 12,
    initial_ring: int = 1,
    offset: int = 0,
) -> DataFrame:
    """Exact k-NN of each probe against objects.

    Returns (probe_id, rank, obj_id, olat, olon, dist_km), rank ∈
    [offset+1, offset+k], ties broken by obj_id (deterministic — the
    reference's PQ order for exact ties was heap-order-dependent).

    feature: optional column-expression string evaluated on the object side
    (e.g. "tags[1] = 1") — the tag filter of rtree.go:652-659 fused into the
    join.
    """
    spark = probes.sparkSession
    size = C.cell_size_deg(res)
    want = k + offset

    obj = objects
    if feature is not None:
        obj = obj.filter(F.expr(feature))
    obj = obj.withColumn("ocell", C.latlng_to_cell(olat, olon, res)).select(
        "ocell", obj_id, olat, olon, *[c for c in ([] if feature is None else [])]
    )
    obj = obj.persist()

    pend = probes.select(
        probe_id, plat, plon, C.latlng_to_cell(plat, plon, res).alias("pcell")
    ).persist()

    # max useful ring: covers the whole object domain (or the radius cap)
    if radius_km is not None:
        ring_cap = int(math.ceil(radius_km / (size * KM_PER_DEG * 0.5))) + 2
    else:
        ring_cap = 1 << 30

    done_parts: list[DataFrame] = []
    r = initial_ring
    for round_i in range(max_rounds):
        cand = (
            pend.withColumn("qcell", F.explode(C.k_ring("pcell", r, res)))
            .join(obj, F.col("qcell") == F.col("ocell"), "inner")
            .withColumn("dist_km", haversine_km(plat, plon, olat, olon))
        )
        if radius_km is not None:
            cand = cand.filter(F.col("dist_km") <= radius_km)

        w = Window.partitionBy(probe_id).orderBy("dist_km", obj_id)
        ranked = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= want)
            .select(probe_id, "rank", obj_id, olat, olon, "dist_km", plat, plon)
        )

        # guaranteed min distance to any unexplored cell, at each probe's lat
        bound = (
            F.lit(float(r) * size * KM_PER_DEG * SAFETY)
            * F.cos(F.radians(F.abs(F.col(plat)) + F.lit(size)))
        )
        stats = ranked.groupBy(probe_id).agg(
            F.count("*").alias("n_found"),
            F.max("dist_km").alias("kth_dist"),
            F.first(bound).alias("bound_km"),
        )
        exhausted = r >= ring_cap or (
            radius_km is not None and float(r) * size * KM_PER_DEG * SAFETY >= radius_km
        )
        finished_ids = stats.filter(
            ((F.col("n_found") >= want) & (F.col("kth_dist") <= F.col("bound_km")))
            | F.lit(exhausted)
        ).select(probe_id)

        done_parts.append(
            ranked.join(finished_ids, probe_id, "leftsemi").select(
                probe_id, "rank", obj_id, olat, olon, "dist_km"
            )
        )
        pend_new = pend.join(finished_ids, probe_id, "leftanti").persist()
        if exhausted or pend_new.isEmpty():
            pend_new.unpersist()
            break
        pend.unpersist()
        pend = pend_new
        r *= 2
    else:
        # max_rounds hit: emit best-effort results for leftovers
        cand = (
            pend.withColumn("qcell", F.explode(C.k_ring("pcell", r, res)))
            .join(obj, F.col("qcell") == F.col("ocell"), "inner")
            .withColumn("dist_km", haversine_km(plat, plon, olat, olon))
        )
        w = Window.partitionBy(probe_id).orderBy("dist_km", obj_id)
        done_parts.append(
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= want)
            .select(probe_id, "rank", obj_id, olat, olon, "dist_km")
        )

    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    if offset:
        out = out.filter(F.col("rank") > offset)
    # materialize before releasing the cached inputs the plan depends on
    out = out.persist()
    out.count()
    obj.unpersist()
    pend.unpersist()
    return out


def reverse_geocode(
    probes: DataFrame, objects: DataFrame, res: int = C.TILE_RES, **kw
) -> DataFrame:
    """1-NN over all objects (ReverseGeocoding, searcher.go:679-686)."""
    return knn_join(probes, objects, k=1, res=res, **kw)
