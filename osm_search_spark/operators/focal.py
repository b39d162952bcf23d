"""Focal (neighborhood) statistics — raster map algebra on the cell grid.

Zonal stats (raster.py) aggregates a raster UNDER polygons; focal stats
aggregates each cell's (2k+1)x(2k+1) Chebyshev neighborhood — the
smoothing / gradient primitive behind density surfaces, terrain
derivatives, and convolution-style map algebra (ArcGIS "Focal
Statistics", PostGIS ST_MapAlgebra neighborhoods). The reference has no
raster layer at all; this extends its grid the same way zonal stats and
the IDW surface do.

Plan shape (100 TB posture): SCATTER formulation — every valued cell
explodes its own k-ring (the same bounded (2k+1)^2 explode as the IDW
surface) and contributions are combined with ONE map-side-combinable
groupBy on the target cell, then an inner join back to the input
restricts the output to valued cells (focal stats are defined on the
input mask, not on the dilated halo). No window over a global sort, no
self-join on range predicates; cost ∝ cells × (2k+1)^2.

Pinned semantics:
- neighborhood = functions/cells.k_ring (longitude wrap, latitude clamp,
  center cell INCLUDED — ArcGIS-style);
- at the latitude clamp the relation is scatter-defined: a clamped cell
  contributes once per DISTINCT ring cell (k_ring dedups), mirroring the
  IDW surface's contract; in-band (away from the poles) scatter ==
  gather == true convolution;
- focal_mean = focal_sum / focal_n, both engines dividing the identical
  exact integers (no rounding needed for integer-valued rasters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C


def focal_stats(
    raster: DataFrame,
    res: int,
    k: int = 1,
    cell: str = "cell_id",
    value: str = "value",
) -> DataFrame:
    """(cell_id, value, focal_n, focal_sum, focal_min, focal_max,
    focal_mean, focal_range) for every input cell; the neighborhood is
    the (2k+1)^2 k-ring. Input must hold ONE row per cell (the operator
    raises downstream nothing — enforce upstream via groupBy; duplicate
    cells would double-contribute)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    src = raster.select(
        F.col(cell).alias("cell_id"), F.col(value).alias("v")
    )
    scattered = src.select(
        F.col("v").alias("nv"),
        F.explode(C.k_ring("cell_id", k, res)).alias("cell_id"),
    )
    agg = scattered.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("focal_n"),
        F.sum("nv").alias("focal_sum"),
        F.min("nv").alias("focal_min"),
        F.max("nv").alias("focal_max"),
    )
    return src.join(agg, "cell_id").select(
        "cell_id",
        F.col("v").alias("value"),
        "focal_n",
        "focal_sum",
        "focal_min",
        "focal_max",
        (F.col("focal_sum") / F.col("focal_n")).alias("focal_mean"),
        (F.col("focal_max") - F.col("focal_min")).alias("focal_range"),
    )


# Getis-Ord Gi* with binary weights over the focal window, computed on
# the OCCUPIED-cell universe (absent cells are nonexistent, not zero —
# the choice that matches sparse rasters; document when comparing with
# tools that densify first). ONE text for F.expr and the twin: every
# subexpression is IEEE-exact (integer sums, correctly-rounded / and
# sqrt), so the gate needs NO rounding. nullif guards the flat raster
# (S = 0) -> NULL on both engines.
GI_EXPR = (
    "((focal_sum - (gsum / gn) * focal_n)"
    " / nullif("
    "sqrt((gsumsq / gn) - (gsum / gn) * (gsum / gn))"
    " * sqrt((gn * focal_n - focal_n * focal_n) / (gn - 1.0)), 0.0))"
)


def gi_star(
    raster: DataFrame,
    res: int,
    k: int = 1,
    cell: str = "cell_id",
    value: str = "value",
) -> DataFrame:
    """(cell_id, value, focal_n, focal_sum, gi_z) — the Getis-Ord Gi*
    z-score per cell (ArcGIS "Hot Spot Analysis"): how extreme the
    window sum is vs the raster's global mean/variance. |z| >= 1.96 ~
    95% hot/cold spot. Global moments ride a broadcast 1-row cross
    join — no collect, no second scan of the focal frame."""
    f = focal_stats(raster, res, k, cell=cell, value=value).select(
        "cell_id", "value", "focal_n", "focal_sum"
    )
    return _with_global_moments(f, raster, value).select(
        "cell_id", "value", "focal_n", "focal_sum",
        F.expr(GI_EXPR).alias("gi_z"),
    )


def _with_global_moments(f: DataFrame, raster: DataFrame, value: str):
    """Attach the 1-row (gn, gsum, gsumsq) dim via a constant-key
    broadcast HASH join — non-foldable keys (col*0+1, the round-3/8
    rule), never a BroadcastNestedLoopJoin: BNLJ is excluded from
    whole-stage codegen and would interpret the z-score projection."""
    g = raster.agg(
        F.count(F.lit(1)).alias("gn"),
        F.sum(F.col(value)).alias("gsum"),
        F.sum(F.col(value) * F.col(value)).alias("gsumsq"),
    )
    # NOT col*0+1 here: both keys are built from NON-NULLABLE aggregate
    # outputs, and Catalyst simplifies non-nullable x*0 to 0, folds the
    # key, and degrades to BNLJ anyway (the round-3/8 recipe only
    # survives on nullable columns). pmod(x, 1) + 1 is never simplified.
    key = lambda c: F.pmod(F.col(c), F.lit(1)) + F.lit(1)
    return f.withColumn("_k", key("focal_n")).join(
        F.broadcast(g.withColumn("_k", key("gn"))), "_k"
    )


def gi_star_sql(raster_rel: str, res: int, k: int = 1) -> str:
    """DuckDB twin of gi_star: the focal twin + the IDENTICAL GI_EXPR
    text over the same global-moment names (HUGEINT sums cast)."""
    return f"""
with focal as ({focal_sql(raster_rel, res, k)}),
gmom as (
  select cast(count(*) as bigint) as gn,
         cast(sum(value) as bigint) as gsum,
         cast(sum(value * value) as bigint) as gsumsq
  from {raster_rel}
)
select cell_id, value, focal_n, focal_sum,
       {GI_EXPR} as gi_z
from focal, gmom
"""


def focal_sql(raster_rel: str, res: int, k: int = 1) -> str:
    """DuckDB twin over a relation with (cell_id, value): identical
    ring enumeration (wrap/clamp + distinct = k_ring), integer-exact
    cell decode (// — never double division), and the HUGEINT-sum cast
    (CLAUDE.md round-6)."""
    nx, ny = 2 << res, 1 << res
    offs = ", ".join(f"({d})" for d in range(-k, k + 1))
    return f"""
with src as materialized (
  select cell_id, value,
         ((cell_id % {C.RES_BITS_SHIFT}) // {C.IX_SHIFT}) as ix,
         (cell_id % {C.IX_SHIFT}) as iy
  from {raster_rel}
),
scattered as (
  select distinct cell_id as src_cell, value as nv,
         ({res} * {C.RES_BITS_SHIFT}
          + (((ix + dx.d + {nx}) % {nx}) * {C.IX_SHIFT})
          + least(greatest(iy + dy.d, 0), {ny - 1})) as cell_id
  from src, (values {offs}) dx(d), (values {offs}) dy(d)
),
agg as (
  select cell_id as acell,
         cast(count(*) as bigint) as focal_n,
         cast(sum(nv) as bigint) as focal_sum,
         min(nv) as focal_min,
         max(nv) as focal_max
  from scattered group by cell_id
)
select s.cell_id, s.value, a.focal_n, a.focal_sum, a.focal_min,
       a.focal_max,
       a.focal_sum / a.focal_n as focal_mean,
       a.focal_max - a.focal_min as focal_range
from src s join agg a on a.acell = s.cell_id
"""


# Local Moran's I (Anselin LISA) — the spatial-autocorrelation sibling
# of Gi*: binary weights over the k-ring EXCLUDING self (Gi* includes
# it), row-standardized lag. All inputs reduce to exact integer moments
# (neighbor sum = focal_sum - value, neighbor count = focal_n - 1,
# global moments), so every double below is deterministic from ONE
# shared expression text: mean = gsum/gn, m2 = E[x^2] - mean^2,
#   z   = value - mean
#   lag = (nbr_sum - nbr_n * mean) / nbr_n
#   I   = (z / m2) * lag
# NULL I (-> quadrant 'na') when m2 = 0 (flat raster) or nbr_n = 0
# (isolated cell); exact-zero z or lag -> 'zero'.
_M_MEAN = "(gsum / gn)"
M_Z_EXPR = f"(value - {_M_MEAN})"
M_M2_EXPR = f"((gsumsq / gn) - {_M_MEAN} * {_M_MEAN})"
M_LAG_EXPR = (
    f"(((focal_sum - value) - (focal_n - 1) * {_M_MEAN})"
    " / nullif(cast(focal_n - 1 as double), 0.0))"
)
M_I_EXPR = f"(({M_Z_EXPR} / nullif({M_M2_EXPR}, 0.0)) * {M_LAG_EXPR})"
QUAD_EXPR = (
    "(case when moran_i is null then 'na'"
    " when z > 0 and lag > 0 then 'HH'"
    " when z < 0 and lag < 0 then 'LL'"
    " when z > 0 and lag < 0 then 'HL'"
    " when z < 0 and lag > 0 then 'LH'"
    " else 'zero' end)"
)


def moran_local(
    raster: DataFrame,
    res: int,
    k: int = 1,
    cell: str = "cell_id",
    value: str = "value",
) -> DataFrame:
    """(cell_id, value, nbr_n, z, lag, moran_i, quadrant) — local
    Moran's I per occupied cell with HH/LL/HL/LH quadrant labels
    (ArcGIS "Cluster and Outlier Analysis"). Same broadcast-moments
    shape as gi_star; no extra scan."""
    f = focal_stats(raster, res, k, cell=cell, value=value).select(
        "cell_id", "value", "focal_n", "focal_sum"
    )
    return (
        _with_global_moments(f, raster, value)
        .select(
            "cell_id", "value",
            (F.col("focal_n") - 1).alias("nbr_n"),
            F.expr(M_Z_EXPR).alias("z"),
            F.expr(M_LAG_EXPR).alias("lag"),
            F.expr(M_I_EXPR).alias("moran_i"),
        )
        .withColumn("quadrant", F.expr(QUAD_EXPR))
    )


def moran_sql(raster_rel: str, res: int, k: int = 1) -> str:
    """DuckDB twin of moran_local: focal twin + HUGEINT-cast global
    moments + the IDENTICAL expression texts."""
    return f"""
with focal as ({focal_sql(raster_rel, res, k)}),
gmom as (
  select cast(count(*) as bigint) as gn,
         cast(sum(value) as bigint) as gsum,
         cast(sum(value * value) as bigint) as gsumsq
  from {raster_rel}
),
m as (
  select cell_id, value,
         cast(focal_n - 1 as bigint) as nbr_n,
         {M_Z_EXPR} as z,
         {M_LAG_EXPR} as lag,
         {M_I_EXPR} as moran_i
  from focal, gmom
)
select cell_id, value, nbr_n, z, lag, moran_i, {QUAD_EXPR} as quadrant
from m
"""
