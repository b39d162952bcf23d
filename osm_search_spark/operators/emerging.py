"""Emerging hot-spot analysis — Mann-Kendall trend over per-bin Gi*.

The space-time extension of focal.gi_star (ArcGIS "Emerging Hot Spot
Analysis" over a space-time cube): per (cell, time-bin) values get a
Gi* z-score against THAT BIN's raster (per-bin focal window + per-bin
global moments), then each cell's z time series is tested for monotone
trend with the Mann-Kendall S statistic

    S = sum_{i<j} sign(z_j - z_i)

and classified into a documented SUBSET of the ArcGIS categories (the
full 17-class taxonomy needs the ArcGIS-specific variance/CI machinery;
this keeps the decisions integer/sign-exact so the oracle needs no
rounding): 'new' (last bin is the only hot bin), 'intensifying' /
'diminishing' (last bin hot, S > 0 / S < 0), 'persistent' (last bin
hot, no trend), 'historical' (hot before, not now), 'none'.

Exactness: z-scores come from the IDENTICAL GI_EXPR text on both
engines (integer sums + correctly-rounded / and sqrt -> bit-exact
doubles); every downstream decision is a comparison or a sign of those
exact doubles, so S, the hot/cold counts, and the category are exact.
Cells whose bin has zero global variance get NULL z (GI_EXPR's nullif)
and are EXCLUDED from that cell's series on both engines.

Scale shape (100 TB posture): the per-bin focal reuses the scatter
formulation (cost ∝ rows x (2k+1)^2, map-side-combinable groupBy on
(bin, cell)); per-bin global moments are a groupBy(bin) broadcast dim
(bins are bounded — the time axis of a cube is dozens, not millions).
The z frame feeds two subtrees (the MK pair self-join and the per-cell
stats), so it is localCheckpoint'd ONCE (CLAUDE.md round-4); the MK
self-join is bounded by bins^2 per cell. The checkpoint is unpersisted
after the small per-cell result is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..sources.synth import dlit
from .focal import GI_EXPR

Z_HOT = 1.96

# ONE category text for F.expr and the DuckDB twin (over columns
# last_hot, n_hot, s_stat).
CAT_EXPR = (
    "(case when last_hot and n_hot = 1 then 'new'"
    " when last_hot and s_stat > 0 then 'intensifying'"
    " when last_hot and s_stat < 0 then 'diminishing'"
    " when last_hot then 'persistent'"
    " when n_hot > 0 then 'historical'"
    " else 'none' end)"
)


def gi_star_binned(
    raster: DataFrame,
    res: int,
    k: int = 1,
    cell: str = "cell_id",
    bin_col: str = "bin",
    value: str = "value",
) -> DataFrame:
    """(bin, cell_id, gi_z) — focal.gi_star per time bin: window sums
    and global moments both scoped to the bin. NULL-z rows (flat bin)
    are dropped."""
    src = raster.select(
        F.col(bin_col).alias("bin"),
        F.col(cell).alias("cell_id"),
        F.col(value).alias("v"),
    )
    scattered = src.select(
        "bin",
        F.col("v").alias("nv"),
        F.explode(C.k_ring("cell_id", k, res)).alias("cell_id"),
    )
    agg = scattered.groupBy("bin", "cell_id").agg(
        F.count(F.lit(1)).alias("focal_n"),
        F.sum("nv").alias("focal_sum"),
    )
    gmom = src.groupBy("bin").agg(
        F.count(F.lit(1)).alias("gn"),
        F.sum("v").alias("gsum"),
        F.sum(F.col("v") * F.col("v")).alias("gsumsq"),
    )
    return (
        src.join(agg, ["bin", "cell_id"])
        .join(F.broadcast(gmom), "bin")
        .select("bin", "cell_id", F.expr(GI_EXPR).alias("gi_z"))
        .filter(F.col("gi_z").isNotNull())
    )


def emerging_hotspots(
    raster: DataFrame,
    res: int,
    k: int = 1,
    z_hot: float = Z_HOT,
    cell: str = "cell_id",
    bin_col: str = "bin",
    value: str = "value",
) -> DataFrame:
    """(cell_id, n_bins, s_stat, n_hot, n_cold, last_z, category) per
    cell that has at least one non-null-z bin."""
    z = gi_star_binned(raster, res, k, cell, bin_col, value).localCheckpoint(
        eager=True
    )
    a = z.select("cell_id", F.col("bin").alias("abin"), F.col("gi_z").alias("za"))
    b = z.select("cell_id", F.col("bin").alias("bbin"), F.col("gi_z").alias("zb"))
    mk = (
        a.join(b, "cell_id")
        .filter(F.col("abin") < F.col("bbin"))
        .groupBy("cell_id")
        .agg(
            F.sum(F.signum(F.col("zb") - F.col("za")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    stats = z.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum((F.col("gi_z") >= F.lit(z_hot)).cast("long")).alias("n_hot"),
        F.sum((F.col("gi_z") <= F.lit(-z_hot)).cast("long")).alias("n_cold"),
        F.max_by("gi_z", "bin").alias("last_z"),
    )
    out = (
        stats.join(mk, "cell_id", "left")
        .withColumns(
            {
                "s_stat": F.coalesce("s_stat", F.lit(0).cast("long")),
                "last_hot": F.col("last_z") >= F.lit(z_hot),
            }
        )
        .select(
            "cell_id", "n_bins", "s_stat", "n_hot", "n_cold", "last_z",
            F.expr(CAT_EXPR).alias("category"),
        )
    )
    result = out.localCheckpoint(eager=True)
    z.unpersist()
    return result


def emerging_sql(
    raster_rel: str, res: int, k: int = 1, z_hot: float = Z_HOT
) -> str:
    """DuckDB twin over a relation with (bin, cell_id, value): the
    focal_sql scatter with bin carried through, per-bin moments, the
    IDENTICAL GI_EXPR and CAT_EXPR texts, HUGEINT sums cast
    (CLAUDE.md round-6)."""
    nx, ny = 2 << res, 1 << res
    offs = ", ".join(f"({d})" for d in range(-k, k + 1))
    zh = dlit(z_hot)
    return f"""
with src as materialized (
  select bin, cell_id, value,
         ((cell_id % {C.RES_BITS_SHIFT}) // {C.IX_SHIFT}) as ix,
         (cell_id % {C.IX_SHIFT}) as iy
  from {raster_rel}
),
scattered as (
  select distinct bin, cell_id as src_cell, value as nv,
         ({res} * {C.RES_BITS_SHIFT}
          + (((ix + dx.d + {nx}) % {nx}) * {C.IX_SHIFT})
          + least(greatest(iy + dy.d, 0), {ny - 1})) as cell_id
  from src, (values {offs}) dx(d), (values {offs}) dy(d)
),
agg as (
  select bin, cell_id,
         cast(count(*) as bigint) as focal_n,
         cast(sum(nv) as bigint) as focal_sum
  from scattered group by 1, 2
),
gmom as (
  select bin, cast(count(*) as bigint) as gn,
         cast(sum(value) as bigint) as gsum,
         cast(sum(value * value) as bigint) as gsumsq
  from src group by 1
),
z as materialized (
  select * from (
    select s.bin, s.cell_id, {GI_EXPR} as gi_z
    from src s
    join agg a on a.bin = s.bin and a.cell_id = s.cell_id
    join gmom g on g.bin = s.bin
  ) where gi_z is not null
),
mk as (
  select a.cell_id,
         cast(sum(cast(sign(b.gi_z - a.gi_z) as bigint)) as bigint) as s_stat
  from z a join z b on a.cell_id = b.cell_id and a.bin < b.bin
  group by 1
),
stats as (
  select cell_id, cast(count(*) as bigint) as n_bins,
         cast(sum(case when gi_z >= {zh} then 1 else 0 end) as bigint) as n_hot,
         cast(sum(case when gi_z <= -{zh} then 1 else 0 end) as bigint) as n_cold,
         arg_max(gi_z, bin) as last_z
  from z group by 1
),
j as (
  select s.cell_id, s.n_bins, coalesce(m.s_stat, 0) as s_stat,
         s.n_hot, s.n_cold, s.last_z, (s.last_z >= {zh}) as last_hot
  from stats s left join mk m on m.cell_id = s.cell_id
)
select cell_id, n_bins, s_stat, n_hot, n_cold, last_z,
       {CAT_EXPR} as category
from j
"""
