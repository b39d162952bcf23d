"""Spatial point-in-polygon join: cell-cover hash join + exact PIP refine.

Re-expresses the reference's two-phase spatial lookup — R-tree bbox probe
(pkg/datastructure/rtree.go:498-529) followed by exact winding-number PIP
(pkg/geo/geometry.go:86-122), as driven by the multi-level address join
GetFullAdress (pkg/index/indexer.go:1017-1170) — as:

1. **cover**: each polygon explodes into the grid cells overlapping its bbox
   (pure Column arithmetic — `sequence` × `sequence`, no Python);
2. **coarse join**: points compute their cell id (Column arithmetic) and
   equi-join the cover on `cell_id` — a hash join Catalyst can broadcast
   when the cover is small or shuffle (with AQE skew splitting) when not;
3. **refine**: exact winding-number PIP, vectorized in numpy inside
   `mapInPandas` with the polygon rings shipped as a broadcast dict (no ring
   duplication through the shuffle, no per-row Python);
4. **match policy**: first/last-match per admin level via a row_number
   window, reproducing indexer.go:1135-1139 (province = last match, all
   other levels = first match).

At 100 TB the points side is the big table: it never shuffles for the join
when the cover broadcasts (the common admin-boundary case); the refine is a
narrow map stage; the only wide stage is the optional window, partitioned by
point_id.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions import geometry as G


def polygon_cell_cover(polygons: DataFrame, res: int = C.JOIN_RES) -> DataFrame:
    """(polygon_id, cell_id) — bbox cover of each polygon at ``res``.

    Pure Column arithmetic; conservative superset (refine removes false
    positives). Input needs columns polygon_id, minlat, minlon, maxlat,
    maxlon (use `with_bbox` to derive them from rings).
    """
    size = C.cell_size_deg(res)
    nx, ny = 2 << res, 1 << res

    def idx(col, off, lim):
        return F.least(
            F.greatest(F.floor((F.col(col) + off) / size), F.lit(0)), F.lit(lim - 1)
        ).cast("long")

    return (
        polygons.select(
            "polygon_id",
            idx("minlon", 180.0, nx).alias("ix0"),
            idx("maxlon", 180.0, nx).alias("ix1"),
            idx("minlat", 90.0, ny).alias("iy0"),
            idx("maxlat", 90.0, ny).alias("iy1"),
        )
        .select(
            "polygon_id",
            F.explode(F.sequence("ix0", "ix1")).alias("ix"),
            "iy0",
            "iy1",
        )
        .select(
            "polygon_id",
            F.explode(F.sequence("iy0", "iy1")).alias("iy"),
            "ix",
        )
        .select(
            "polygon_id",
            (
                F.lit(res * C.RES_BITS_SHIFT)
                + F.col("ix") * F.lit(C.IX_SHIFT)
                + F.col("iy")
            ).alias("cell_id"),
        )
    )


def with_bbox(polygons: DataFrame) -> DataFrame:
    """Derive minlat/minlon/maxlat/maxlon from ring arrays if absent
    (NewBoundingBox semantics, geometry.go:21-40)."""
    if "minlat" in polygons.columns:
        return polygons
    return polygons.withColumns(
        {
            "minlat": F.array_min("ring_lat"),
            "maxlat": F.array_max("ring_lat"),
            "minlon": F.array_min("ring_lon"),
            "maxlon": F.array_max("ring_lon"),
        }
    )


def cell_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = C.JOIN_RES,
    lat: str = "lat",
    lon: str = "lon",
    broadcast_cover: bool = True,
) -> DataFrame:
    """Coarse candidate join: points × polygon covers on cell_id.

    Output: all point columns + polygon_id. Duplicate (point, polygon)
    candidates cannot arise — a point has exactly one cell at ``res`` and a
    polygon covers each cell at most once.
    """
    polygons = with_bbox(polygons)
    cover = polygon_cell_cover(polygons, res)
    if broadcast_cover:
        cover = F.broadcast(cover)
    pts = points.withColumn("cell_id", C.latlng_to_cell(lat, lon, res))
    return pts.join(cover, "cell_id", "inner")


def refine_pip(
    candidates: DataFrame,
    polygons: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Exact PIP refine with winding-number semantics (boundary => inside).

    Ships rings to executors as a broadcast dict {polygon_id: (lat[], lon[])}
    and filters candidate rows inside `mapInPandas` — Arrow-batched,
    vectorized over points per polygon group within each batch. Suitable
    whenever the polygon *dimension* fits in memory (admin boundaries: yes).
    For giant polygon sets see `refine_pip_grouped`.
    """
    spark = candidates.sparkSession
    ring_rows = polygons.select("polygon_id", "ring_lat", "ring_lon").collect()
    rings = {
        r["polygon_id"]: G.close_ring(
            np.array(r["ring_lat"]), np.array(r["ring_lon"])
        )
        for r in ring_rows
    }
    bc = spark.sparkContext.broadcast(rings)
    schema = candidates.schema

    def pip_filter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_map = bc.value
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            plat = pdf[lat].to_numpy(dtype=np.float64)
            plon = pdf[lon].to_numpy(dtype=np.float64)
            for pid, idx in pdf.groupby("polygon_id").indices.items():
                rl, rn = ring_map[pid]
                keep[idx] = G.winding_number(plat[idx], plon[idx], rl, rn) != 0
            yield pdf[keep]

    return candidates.mapInPandas(pip_filter, schema=schema)


def refine_pip_grouped(
    candidates: DataFrame,
    polygons: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Refine variant for polygon sets too large to broadcast: co-group
    candidates with rings by polygon_id via applyInPandas (one shuffle)."""
    joined = candidates.join(
        polygons.select("polygon_id", "ring_lat", "ring_lon"), "polygon_id"
    )
    out_schema = candidates.schema

    def pip_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rl, rn = G.close_ring(
            np.array(pdf["ring_lat"].iloc[0]), np.array(pdf["ring_lon"].iloc[0])
        )
        keep = (
            G.winding_number(
                pdf[lat].to_numpy(np.float64), pdf[lon].to_numpy(np.float64), rl, rn
            )
            != 0
        )
        return pdf.loc[keep, [f.name for f in out_schema.fields]]

    return joined.groupBy("polygon_id").applyInPandas(pip_group, schema=out_schema)


def spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = C.JOIN_RES,
    lat: str = "lat",
    lon: str = "lon",
    refine: bool = True,
    broadcast_cover: bool = True,
) -> DataFrame:
    """Full PIP join: point columns + (polygon_id). Exact when refine=True."""
    polygons = with_bbox(polygons)
    cand = cell_join(points, polygons, res, lat, lon, broadcast_cover)
    if not refine:
        return cand
    return refine_pip(cand, polygons, lat, lon)


def first_match_per_level(
    matched: DataFrame,
    polygons_dim: DataFrame,
    point_id: str = "point_id",
    last_match_levels: tuple[int, ...] = (4,),
) -> DataFrame:
    """Reproduce GetFullAdress match policy (indexer.go:1017-1170): for each
    admin level keep the first matching polygon (lowest id), except
    `last_match_levels` (province, level 4) which keeps the last
    (indexer.go:1135-1139). Deterministic — the reference's order was
    insertion order; ours is polygon_id order."""
    j = matched.join(
        F.broadcast(polygons_dim.select("polygon_id", "name", "admin_level")),
        "polygon_id",
    )
    order = F.when(
        F.col("admin_level").isin(*last_match_levels), -F.col("polygon_id")
    ).otherwise(F.col("polygon_id"))
    w = Window.partitionBy(point_id, "admin_level").orderBy(order)
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
