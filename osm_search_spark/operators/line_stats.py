"""Line x polygon overlay length — "road km per district", the classic
zonal LINE statistic (the missing third overlay next to the PIP point
join and the polygon x polygon overlap join).

Exact semantics: for every (way, polygon) pair, the haversine length of
the way's portion inside the polygon (boundary => inside, winding-number
interior, holes subtract — the engine's PIP semantics applied to segment
midpoints). Each segment is split at its crossing parameters with every
polygon edge (outer + holes), and each piece contributes iff its
midpoint is inside.

Plan shape (100 TB posture):

- segments explode narrowly from the ways fact; candidates come from an
  equi-join of segment-bbox cells x polygon cover cells (both bounded,
  cover broadcast), deduped to (segment, polygon) pairs — no
  all-pairs, no theta join;
- the polygon dim precomputes closed edge structs ONCE (outer + holes,
  the refine_pip_expr discipline) and broadcasts them; the refine is
  pure Column HOF arithmetic — crossing params by 2x2 cross products,
  piece midpoint winding, haversine piece lengths — no Python;
- one groupBy (way, polygon) sums piece lengths (map-side combinable).

The DuckDB twin reruns the identical arithmetic brute-force over the
fixture (same expression structure), so the oracle hash-gates the
geometry end to end (libm -> 6dp rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions.geodesy import haversine_km
from .snap import way_segments


def _poly_edges_dim(polygons: DataFrame) -> DataFrame:
    """(polygon_id, edges array<struct alat,alon,blat,blon>) — closed
    outer ring + all hole rings flattened into ONE edge array. The
    nonzero-winding midpoint test needs holes wound OPPOSITE to the
    outer ring, and the engine's holes columns are orientation-free, so
    rings normalize here: outer CCW, holes CW (shoelace sign +
    conditional reverse)."""
    has_holes = "holes_lat" in polygons.columns

    def closed(arr, other):
        same = (F.element_at(arr, 1) == F.element_at(arr, -1)) & (
            F.element_at(other, 1) == F.element_at(other, -1)
        )
        return F.when(same, arr).otherwise(
            F.concat(arr, F.array(F.element_at(arr, 1)))
        )

    def shoe(clat, clon):
        return F.aggregate(
            F.sequence(F.lit(1), F.size(clat) - 1),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(clon, i) * F.element_at(clat, i + 1)
            - F.element_at(clon, i + 1) * F.element_at(clat, i),
        )

    def oriented(clat, clon, ccw: bool):
        s = shoe(clat, clon)
        flip = (s < 0) if ccw else (s > 0)
        return F.when(flip, F.reverse(clat)).otherwise(clat), F.when(
            flip, F.reverse(clon)
        ).otherwise(clon)

    def edges_of(clat, clon):
        return F.transform(
            F.sequence(F.lit(1), F.size(clat) - 1),
            lambda i: F.struct(
                F.element_at(clat, i).alias("alat"),
                F.element_at(clon, i).alias("alon"),
                F.element_at(clat, i + 1).alias("blat"),
                F.element_at(clon, i + 1).alias("blon"),
            ),
        )

    o_lat, o_lon = oriented(
        closed(F.col("ring_lat"), F.col("ring_lon")),
        closed(F.col("ring_lon"), F.col("ring_lat")),
        ccw=True,
    )
    base = polygons.select(
        "polygon_id",
        o_lat.alias("_rl"),
        o_lon.alias("_rn"),
        *(
            [F.col("holes_lat").alias("_hl"), F.col("holes_lon").alias("_hn")]
            if has_holes
            else []
        ),
    )
    edges = edges_of(F.col("_rl"), F.col("_rn"))
    if has_holes:
        seq1 = F.when(
            F.size("_hl") >= 1, F.sequence(F.lit(1), F.size("_hl"))
        ).otherwise(F.array().cast("array<int>"))

        def hole_edges_of(hi):
            hlat, hlon = oriented(
                closed(F.element_at("_hl", hi), F.element_at("_hn", hi)),
                closed(F.element_at("_hn", hi), F.element_at("_hl", hi)),
                ccw=False,
            )
            return edges_of(hlat, hlon)

        edges = F.concat(edges, F.flatten(F.transform(seq1, hole_edges_of)))
    return base.select("polygon_id", edges.alias("edges"))


def line_length_in_polygons(
    ways: DataFrame, polygons: DataFrame, res: int = C.JOIN_RES
) -> DataFrame:
    """(way_id, polygon_id, length_km): haversine length of each way's
    portion inside each polygon (6dp). Pairs with zero inside length are
    dropped."""
    segs = way_segments(ways)
    size = C.cell_size_deg(res)
    nx, ny = 2 << res, 1 << res

    def clamp(v, hi):
        return F.least(F.greatest(v.cast("long"), F.lit(0)), F.lit(hi - 1))

    ix0 = clamp(F.floor((F.least("alon", "blon") + 180.0) / size), nx)
    ix1 = clamp(F.floor((F.greatest("alon", "blon") + 180.0) / size), nx)
    iy0 = clamp(F.floor((F.least("alat", "blat") + 90.0) / size), ny)
    iy1 = clamp(F.floor((F.greatest("alat", "blat") + 90.0) / size), ny)
    seg_cells = (
        segs.withColumns({"_iy0": iy0, "_iy1": iy1})
        .select("*", F.explode(F.sequence(ix0, ix1)).alias("_cx"))
        .select("*", F.explode(F.sequence("_iy0", "_iy1")).alias("_cy"))
        .select(
            "way_id", "seg_idx", "alat", "alon", "blat", "blon",
            (
                F.lit(res * C.RES_BITS_SHIFT)
                + F.col("_cx") * F.lit(C.IX_SHIFT)
                + F.col("_cy")
            ).alias("cell_id"),
        )
    )
    from .spatial_join import polygon_cell_cover, with_bbox

    cover = F.broadcast(polygon_cell_cover(with_bbox(polygons), res))
    cand = (
        seg_cells.join(cover, "cell_id")
        .select("way_id", "seg_idx", "alat", "alon", "blat", "blon", "polygon_id")
        .distinct()
    )
    joined = cand.join(F.broadcast(_poly_edges_dim(polygons)), "polygon_id")

    salat, salon = F.col("alat"), F.col("alon")
    d1lat = F.col("blat") - salat
    d1lon = F.col("blon") - salon

    def cross_ts(e):
        # segment P(t) = A + t*d1 vs edge Q(u) = Ae + u*d2: crossing param
        # t where 0 <= u <= 1 (open t handled by the piece fold)
        d2lat = e["blat"] - e["alat"]
        d2lon = e["blon"] - e["alon"]
        den = d1lon * d2lat - d1lat * d2lon
        dflat = e["alat"] - salat
        dflon = e["alon"] - salon
        t = (dflon * d2lat - dflat * d2lon) / den
        u = (dflon * d1lat - dflat * d1lon) / den
        return F.when(
            (den != 0) & (u >= 0) & (u <= 1) & (t > 0) & (t < 1), t
        )

    ts = F.array_sort(
        F.concat(
            F.array(F.lit(0.0)),
            F.array_compact(F.transform(F.col("edges"), cross_ts)),
            F.array(F.lit(1.0)),
        )
    )

    def pt_lat(t):
        return salat + t * d1lat

    def pt_lon(t):
        return salon + t * d1lon

    def inside(plat, plon):
        def on_seg(e):
            return (
                (plon >= F.least(e["alon"], e["blon"]))
                & (plon <= F.greatest(e["alon"], e["blon"]))
                & (plat >= F.least(e["alat"], e["blat"]))
                & (plat <= F.greatest(e["alat"], e["blat"]))
            )

        def dwn(e):
            cr = (e["blon"] - e["alon"]) * (plat - e["alat"]) - (
                plon - e["alon"]
            ) * (e["blat"] - e["alat"])
            up = (e["alat"] <= plat) & (e["blat"] > plat) & (cr > 0)
            dn = (e["alat"] > plat) & (e["blat"] <= plat) & (cr < 0)
            return F.when(up, 1).when(dn, -1).otherwise(0)

        wn = F.aggregate(F.col("edges"), F.lit(0), lambda a, e: a + dwn(e))
        return F.exists(F.col("edges"), on_seg) | (wn != 0)

    pieces = F.when(
        F.size(ts) >= 2, F.sequence(F.lit(1), F.size(ts) - 1)
    ).otherwise(F.array().cast("array<int>"))
    length = F.aggregate(
        pieces,
        F.lit(0.0),
        lambda acc, k: acc
        + F.when(
            inside(
                pt_lat(
                    (F.element_at(ts, k) + F.element_at(ts, k + 1)) / 2.0
                ),
                pt_lon(
                    (F.element_at(ts, k) + F.element_at(ts, k + 1)) / 2.0
                ),
            ),
            haversine_km(
                pt_lat(F.element_at(ts, k)),
                pt_lon(F.element_at(ts, k)),
                pt_lat(F.element_at(ts, k + 1)),
                pt_lon(F.element_at(ts, k + 1)),
            ),
        ).otherwise(F.lit(0.0)),
    )
    per_seg = joined.select(
        "way_id", "polygon_id", length.alias("_len")
    )
    return (
        per_seg.groupBy("way_id", "polygon_id")
        .agg(F.round(F.sum("_len"), 6).alias("length_km"))
        .filter(F.col("length_km") > 0)
    )
