"""Grid-density hotspot clustering (DBSCAN-lite on the cell grid).

The standard scalable spatial-clustering recipe: instead of the
quadratic point-pair epsilon-neighborhood of textbook DBSCAN, quantize
points to grid cells (one map-side-combined groupBy), call a cell DENSE
when it holds >= min_count points, and merge 8-neighbor dense cells into
clusters with the repo's min-label connected components. Every step is
corpus-linear: the point stream is touched once, and everything after
operates on the (bounded) dense-cell dim.

Semantics (pinned by the oracle + tests):
- density is per CELL, not per epsilon-ball — the cluster boundary is
  grid-aligned (the documented approximation; halve the cell size to
  tighten it);
- adjacency is Chebyshev-1 (8 neighbors) with longitude wrap and
  latitude clamp exactly as functions/cells.k_ring does;
- cluster_id = the MIN dense cell_id in the component (deterministic);
  isolated dense cells are their own singleton cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from .dedup import connected_components


def hotspot_clusters(
    points: DataFrame,
    res: int = 13,
    min_count: int = 25,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(cell_id, n_points, cluster_id) for every DENSE cell (>= min_count
    points at grid resolution `res`); cluster_id labels 8-connected
    dense-cell components."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    dense = (
        points.groupBy(C.latlng_to_cell(lat, lon, res).alias("cell_id"))
        .agg(F.count("*").alias("n_points"))
        .filter(F.col("n_points") >= min_count)
        # consumed by three subtrees (edge build, edge semi-probe, final
        # join) and tiny by construction — pin it
        .localCheckpoint(eager=True)
    )
    nbrs = dense.select(
        "cell_id", F.explode(C.k_ring("cell_id", 1, res)).alias("nb")
    ).filter(F.col("nb") != F.col("cell_id"))
    edges = (
        nbrs.join(dense.select(F.col("cell_id").alias("nb")), "nb")
        .filter(F.col("cell_id") < F.col("nb"))
        .select("cell_id", "nb")
    )
    cc = connected_components(edges, a="cell_id", b="nb")
    return (
        dense.join(cc, dense["cell_id"] == cc["node"], "left")
        .select(
            dense["cell_id"],
            "n_points",
            F.coalesce("component_id", dense["cell_id"]).alias("cluster_id"),
        )
    )


def hotspot_sql(points_rel: str, res: int = 13, min_count: int = 25) -> str:
    """DuckDB twin over a relation with (lat, lon). Adjacency is plain
    |dix|<=1 and |diy|<=1 — equivalent to the wrapped k_ring on any
    region away from the dateline/poles (the fixture band); the wrap and
    clamp behavior itself is pinned by the k_ring pytests."""
    cell = C.latlng_to_cell_sql("lat", "lon", res)
    return f"""
with recursive pts as (select * from {points_rel}),
dense as (
  select {cell} as cell_id, count(*) as n_points
  from pts group by 1 having count(*) >= {min_count}
),
coords as (
  select cell_id, n_points,
         (cell_id % {C.RES_BITS_SHIFT}) // {C.IX_SHIFT} as ix,
         cell_id % {C.IX_SHIFT} as iy
  from dense
),
edges0 as (
  select a.cell_id as ea, b.cell_id as eb
  from coords a join coords b
    on abs(a.ix - b.ix) <= 1 and abs(a.iy - b.iy) <= 1
   and a.cell_id <> b.cell_id
),
cnodes as (select distinct ea as node from edges0),
reach(src, node) as (
  select node, node from cnodes
  union
  select r.src, e.eb from reach r join edges0 e on e.ea = r.node
),
cc as (select src as cell_id, min(node) as component_id from reach group by src)
select d.cell_id, d.n_points,
       coalesce(cc.component_id, d.cell_id) as cluster_id
from dense d left join cc using (cell_id)
"""
