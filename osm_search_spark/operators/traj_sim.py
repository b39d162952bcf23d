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


# ---------------------------------------------------------------------------
# Discrete Frechet distance — the coupling metric of the same family
# ---------------------------------------------------------------------------

def frechet_dp_batch(al, ao, bl, bo, s2: float):
    """Squared discrete Frechet distance for a BATCH of pairs at once.

    al/ao/bl/bo: lists of 1-D float64 arrays (non-empty). Round-9
    (VERDICT r08 #5): the DP sweeps ANTIDIAGONALS of a padded
    (P, n_max, m_max) tensor — every dependency of diagonal s
    (ca[i-1,j], ca[i,j-1], ca[i-1,j-1]) lives on diagonals s-1/s-2, so
    each diagonal evaluates as one vectorized numpy expression across
    ALL pairs simultaneously; the former per-cell python j-loop is gone.
    A +inf ghost row/column realizes the boundary cases of the
    recurrence; padded cells compute garbage that no valid cell ever
    reads (dependencies point strictly down-index). The DP is min/max
    SELECTIONS only, so each cell — and fd2 — is bit-exact against the
    scalar loop (selection networks are associativity-free; asserted in
    test_traj_sim's loop-parity test)."""
    import numpy as np

    P = len(al)
    la = np.array([a.size for a in al], dtype=np.int64)
    lb = np.array([b.size for b in bl], dtype=np.int64)
    n, m = int(la.max()), int(lb.max())
    A_lat = np.zeros((P, n)); A_lon = np.zeros((P, n))
    B_lat = np.zeros((P, m)); B_lon = np.zeros((P, m))
    for p in range(P):
        A_lat[p, : la[p]] = al[p]; A_lon[p, : la[p]] = ao[p]
        B_lat[p, : lb[p]] = bl[p]; B_lon[p, : lb[p]] = bo[p]
    dy = A_lat[:, :, None] - B_lat[:, None, :]
    dx = A_lon[:, :, None] - B_lon[:, None, :]
    d2 = dy * dy + (dx * dx) * np.float64(s2)
    # ghost-padded dp: cell (i, j) lives at dp[:, i+1, j+1]
    dp = np.full((P, n + 1, m + 1), np.inf)
    dp[:, 1, 1] = d2[:, 0, 0]
    for s in range(1, n + m - 1):
        i = np.arange(max(0, s - m + 1), min(n - 1, s) + 1)
        j = s - i
        prev = np.minimum(
            np.minimum(dp[:, i, j + 1], dp[:, i + 1, j]), dp[:, i, j]
        )
        dp[:, i + 1, j + 1] = np.maximum(d2[:, i, j], prev)
    return dp[np.arange(P), la, lb]


def _frechet_kernel(s2: float):
    """mapInPandas kernel computing the squared discrete Frechet
    distance per candidate pair — one batched antidiagonal numpy DP per
    Arrow batch (frechet_dp_batch); no per-cell python."""

    def kern(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids_a, ids_b = [], []
            al_l, ao_l, bl_l, bo_l = [], [], [], []
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
                ids_a.append(int(ta)); ids_b.append(int(tb))
                al_l.append(al); ao_l.append(ao)
                bl_l.append(bl); bo_l.append(bo)
            if ids_a:
                fd2 = frechet_dp_batch(al_l, ao_l, bl_l, bo_l, s2)
            else:
                fd2 = []
            yield pd.DataFrame(
                {
                    "trip_a": pd.Series(ids_a, dtype="int64"),
                    "trip_b": pd.Series(ids_b, dtype="int64"),
                    "fd2": pd.Series(np.asarray(fd2, dtype=np.float64)),
                }
            )

    return kern


def frechet_join(
    trips: DataFrame,
    d_max: float,
    res: int | None = None,
    lon_scale: float = LON_SCALE,
    id_col: str = "trip_id",
    lats: str = "lats",
    lons: str = "lons",
) -> DataFrame:
    """(trip_a, trip_b, fd2): unordered pairs with squared discrete
    Frechet distance fd2 <= d_max^2 (exact). Frechet >= Hausdorff, so
    every Hausdorff candidate/prune condition stays necessary; on top,
    the coupling pins first<->first and last<->last, giving a cheap
    endpoint prune (element_at Column arithmetic) before the O(n*m) DP
    kernel. Same join hygiene as hausdorff_join: everything
    shuffle-hash, nothing broadcast."""
    if res is None:
        res = pick_res(d_max, lon_scale)
    d2lim = F.lit(d_max * d_max)
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
    cand = (
        cells_a.hint("shuffle_hash").join(cells_b, "cell")
        .filter(F.col("trip_id") < F.col("trip_b"))
        .select(F.col("trip_id").alias("trip_a"), "trip_b")
        .distinct()
    )
    s2 = lon_scale * lon_scale
    ends = t.select(
        "trip_id",
        F.element_at("lats", 1).alias("f_lat"),
        F.element_at("lons", 1).alias("f_lon"),
        F.element_at("lats", -1).alias("l_lat"),
        F.element_at("lons", -1).alias("l_lon"),
    )

    def _d2(a_lat, a_lon, b_lat, b_lon):
        dy = F.col(a_lat) - F.col(b_lat)
        dx = F.col(a_lon) - F.col(b_lon)
        return dy * dy + (dx * dx) * F.lit(s2)

    ea = ends.select(
        F.col("trip_id").alias("trip_a"),
        *[F.col(c).alias(f"a_{c}") for c in ("f_lat", "f_lon", "l_lat", "l_lon")],
    )
    eb = ends.select(
        F.col("trip_id").alias("trip_b"),
        *[F.col(c).alias(f"b_{c}") for c in ("f_lat", "f_lon", "l_lat", "l_lon")],
    )
    pruned = (
        cand.join(ea.hint("shuffle_hash"), "trip_a")
        .join(eb.hint("shuffle_hash"), "trip_b")
        .filter(
            (_d2("a_f_lat", "a_f_lon", "b_f_lat", "b_f_lon") <= d2lim)
            & (_d2("a_l_lat", "a_l_lon", "b_l_lat", "b_l_lon") <= d2lim)
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
        _frechet_kernel(s2), "trip_a long, trip_b long, fd2 double"
    )
    return refined.filter(F.col("fd2") <= d2lim)


def frechet_sql(
    trips_rel: str,
    d_max: float,
    n: int,
    lon_scale: float = LON_SCALE,
) -> str:
    """DuckDB twin of frechet_join over a relation of FIXED-length
    trips (len(lats) == n for every row — asserted by a guard CTE that
    errors the whole query on violation): the n x n DP fully unrolled
    as one MATERIALIZED CTE per DP cell (`as materialized` — NOT lateral
    column aliases, and not plain chained selects either: a DP cell
    references multiple previous cells, so any re-inlining form expands
    the prefix exponentially; the round-8 CLAUDE.md lesson). Each
    d2 cell uses the IDENTICAL dist2_points_expr text over list
    extracts; the DP is min/max selections, so fd2 is bit-exact."""
    d2t = dist2_points_expr(lon_scale)

    def d2cell(i, j):
        return (
            d2t.replace("alat", f"la[{i + 1}]")
            .replace("alon", f"lo[{i + 1}]")
            .replace("blat", f"lb[{j + 1}]")
            .replace("blon", f"lq[{j + 1}]")
        )

    ctes = [
        f"""t as materialized (
  select trip_id, lats, lons,
         case when len(lats) = {n} then 1
              else error('frechet_sql: trip length <> {n}') end as _g
  from {trips_rel} where len(lats) > 0
)""",
        """pairs as materialized (
  select a.trip_id as ta, b.trip_id as tb,
         a.lats as la, a.lons as lo, b.lats as lb, b.lons as lq
  from t a, t b where a.trip_id < b.trip_id
)""",
    ]
    # ONE CTE per DP cell, each a plain projection over the previous —
    # NEVER lateral column aliases: DuckDB expands those by
    # substitution, so an intra-select j-chain re-inlines its whole
    # prefix per reference (exponential; the first cut of this twin
    # planned for minutes on 496 pairs). Plain cross-CTE column
    # references inline linearly.
    prev = "pairs"
    for i in range(n):
        for j in range(n):
            if i == 0 and j == 0:
                expr = d2cell(0, 0)
            elif i == 0:
                expr = f"greatest(c0_{j - 1}, {d2cell(0, j)})"
            elif j == 0:
                expr = f"greatest(c{i - 1}_0, {d2cell(i, 0)})"
            else:
                expr = (
                    f"greatest({d2cell(i, j)}, least(c{i - 1}_{j}, "
                    f"c{i - 1}_{j - 1}, c{i}_{j - 1}))"
                )
            cur = f"s{i}_{j}"
            ctes.append(
                f"{cur} as materialized "
                f"(select *, {expr} as c{i}_{j} from {prev})"
            )
            prev = cur
    return (
        "with " + ",\n".join(ctes)
        + f"\nselect ta as trip_a, tb as trip_b, c{n - 1}_{n - 1} as fd2"
        + f"\nfrom {prev} where c{n - 1}_{n - 1} <= {dlit(d_max * d_max)}"
    )


# ---------------------------------------------------------------------------
# Probe -> corpus top-k similarity search
# ---------------------------------------------------------------------------

def hausdorff_topk(
    probes: DataFrame,
    corpus: DataFrame,
    d_max: float,
    k: int = 5,
    res: int | None = None,
    lon_scale: float = LON_SCALE,
    id_col: str = "trip_id",
    lats: str = "lats",
    lons: str = "lons",
) -> DataFrame:
    """(probe_id, corpus_id, hd2, rank): for each probe trip, the k
    most similar corpus trips by symmetric Hausdorff among those within
    ``d_max`` (the thresholded-kNN contract — a probe with fewer than k
    in-range neighbors returns fewer rows; raise d_max to see farther).
    Ties break on corpus_id. Same machinery and join hygiene as
    hausdorff_join (asymmetric: probe cells raw x corpus cells padded —
    pad symmetry makes the cover exact); the per-probe rank window is
    bounded by that probe's candidate count, never a global sort."""
    if res is None:
        res = pick_res(d_max, lon_scale)

    def prep(df, name):
        return df.select(
            F.col(id_col).cast("long").alias(name),
            F.col(lats).alias("lats"),
            F.col(lons).alias("lons"),
        ).filter(F.size("lats") > 0)

    p = prep(probes, "probe_id")
    c = prep(corpus, "corpus_id")

    def cells(df, name, pad):
        pt = df.select(
            name, F.explode(F.arrays_zip("lats", "lons")).alias("q")
        ).select(
            name,
            C.latlng_to_cell(
                F.col("q.lats"), F.col("q.lons"), res
            ).alias("cell"),
        ).distinct()
        if not pad:
            return pt
        return pt.select(
            name, F.explode(C.k_ring("cell", 1, res)).alias("cell")
        ).distinct()

    cand = (
        cells(p, "probe_id", False).hint("shuffle_hash")
        .join(cells(c, "corpus_id", True), "cell")
        .select("probe_id", "corpus_id")
        .distinct()
    )

    def ext(df, name, pfx):
        return df.select(
            name,
            F.array_min("lats").alias(f"{pfx}_minlat"),
            F.array_max("lats").alias(f"{pfx}_maxlat"),
            F.array_min("lons").alias(f"{pfx}_minlon"),
            F.array_max("lons").alias(f"{pfx}_maxlon"),
        )

    pad_lat, pad_lon = F.lit(d_max), F.lit(d_max / lon_scale)
    pruned = (
        cand.join(ext(p, "probe_id", "a").hint("shuffle_hash"), "probe_id")
        .join(ext(c, "corpus_id", "b").hint("shuffle_hash"), "corpus_id")
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
        .select("probe_id", "corpus_id")
    )
    paired = (
        pruned.join(
            p.select(
                F.col("probe_id"),
                F.col("lats").alias("alats"), F.col("lons").alias("alons"),
            ).hint("shuffle_hash"),
            "probe_id",
        )
        .join(
            c.select(
                F.col("corpus_id"),
                F.col("lats").alias("blats"), F.col("lons").alias("blons"),
            ).hint("shuffle_hash"),
            "corpus_id",
        )
        .select(
            F.col("probe_id").alias("trip_a"),
            F.col("corpus_id").alias("trip_b"),
            "alats", "alons", "blats", "blons",
        )
    )
    from pyspark.sql import Window

    refined = paired.mapInPandas(
        _hausdorff_kernel(lon_scale * lon_scale),
        "trip_a long, trip_b long, hd2 double",
    ).filter(F.col("hd2") <= F.lit(d_max * d_max))
    w = Window.partitionBy("trip_a").orderBy("hd2", "trip_b")
    return (
        refined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("trip_a").alias("probe_id"),
            F.col("trip_b").alias("corpus_id"),
            "hd2", "rank",
        )
    )


def hausdorff_topk_sql(
    probes_rel: str,
    corpus_rel: str,
    d_max: float,
    k: int = 5,
    lon_scale: float = LON_SCALE,
) -> str:
    """DuckDB twin: full min/max per (probe, corpus) pair — no pruning
    — then the same threshold + (hd2, corpus_id) rank."""
    d2 = dist2_points_expr(lon_scale)
    return f"""
with p as materialized (select * from {probes_rel} where len(lats) > 0),
c as materialized (select * from {corpus_rel} where len(lats) > 0),
pa as materialized (
  select trip_id, unnest(lats) as alat, unnest(lons) as alon from p
),
pb as materialized (
  select trip_id, unnest(lats) as blat, unnest(lons) as blon from c
),
pairs as (select a.trip_id as ta, b.trip_id as tb from p a, c b),
mins_ab as (
  select q.ta, q.tb, pa.alat, pa.alon, min({d2}) as md2
  from pairs q
  join pa on pa.trip_id = q.ta
  join pb on pb.trip_id = q.tb
  group by 1, 2, 3, 4
),
h_ab as (select ta, tb, max(md2) as h2 from mins_ab group by 1, 2),
mins_ba as (
  select q.ta, q.tb, pb.blat, pb.blon, min({d2}) as md2
  from pairs q
  join pa on pa.trip_id = q.ta
  join pb on pb.trip_id = q.tb
  group by 1, 2, 3, 4
),
h_ba as (select ta, tb, max(md2) as h2 from mins_ba group by 1, 2),
hd as (
  select a.ta, a.tb, greatest(a.h2, b.h2) as hd2
  from h_ab a join h_ba b on a.ta = b.ta and a.tb = b.tb
  where greatest(a.h2, b.h2) <= {dlit(d_max * d_max)}
)
select ta as probe_id, tb as corpus_id, hd2, cast(rk as int) as rank
from (
  select *, row_number() over (partition by ta order by hd2, tb) as rk
  from hd
) where rk <= {k}
"""
