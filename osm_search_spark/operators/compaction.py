"""Cell-cover compaction — the H3 `compact`/`uncompact` analog on the
engine's grid (functions/cells.py id packing: res * 2^58 + ix * 2^29 + iy).

A cover at one fine resolution wastes rows wherever large areas are
uniformly covered (a province's FULL tiles, a data-occupancy map): where
all 4 children of a parent cell are present, the parent represents them
exactly. `compact_cells` applies that rule bottom-up to a mixed-resolution
cover; `uncompact_cells` inverts it. Published use: H3 compactCells /
S2 CellUnion normalization; tile pipelines ship compacted covers to cut
broadcast size (the PIP join's cover and the decontamination bloom both
benefit at continental scale).

Plan shape: one groupBy per level (log2(res - min_res) levels, each a
count over a frame that SHRINKS 4x wherever compaction applies), kept
off the driver entirely; per-level frames localCheckpoint so the
iterative lineage stays flat (CLAUDE.md round-2 rule). Exact: pure
integer id arithmetic, same formula emitted to the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C


def _parent_expr(cell, r: int):
    """Parent id at res r-1 of a cell id at res r — EXACT integer
    arithmetic (shiftright with literal counts, per the round-4 rule).
    Double division here rounds for res >= ~23 (ix*2^29+iy > 2^53) and can
    put the parent ix off by one; shifts match the twin's // at every
    res."""
    ix = F.shiftright(cell % F.lit(C.RES_BITS_SHIFT), 29)
    iy = cell % F.lit(C.IX_SHIFT)
    return (
        F.lit((r - 1) * C.RES_BITS_SHIFT)
        + F.shiftright(ix, 1) * F.lit(C.IX_SHIFT)
        + F.shiftright(iy, 1)
    )


def parent_sql(cell: str, r: int) -> str:
    """DuckDB twin of _parent_expr (same integer ops)."""
    ix = f"(({cell}) % {C.RES_BITS_SHIFT}) // {C.IX_SHIFT}"
    iy = f"({cell}) % {C.IX_SHIFT}"
    return (
        f"({(r - 1) * C.RES_BITS_SHIFT} + (({ix}) // 2) * {C.IX_SHIFT}"
        f" + (({iy}) // 2))"
    )


def compact_cells(
    cells: DataFrame, res: int, min_res: int, cell: str = "cell_id"
) -> DataFrame:
    """Compact a DISTINCT single-resolution cover at ``res`` down to mixed
    resolutions >= ``min_res``: wherever all 4 siblings are present they
    are replaced by their parent, repeatedly. Output: one column
    ``cell_id`` (mixed res — the id encodes its resolution). Input rows
    must be unique cells at ``res`` (enforce with .distinct() upstream if
    unsure); idempotent on already-compacted input levels."""
    cur = cells.select(F.col(cell).alias("cell_id"))
    kept: list[DataFrame] = []
    for r in range(res, min_res, -1):
        with_p = cur.select(
            "cell_id", _parent_expr(F.col("cell_id"), r).alias("_p")
        ).localCheckpoint(eager=True)
        promoted = (
            with_p.groupBy("_p")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") == 4)
            .select("_p")
        )
        kept.append(
            with_p.join(promoted, "_p", "left_anti").select("cell_id")
        )
        cur = promoted.select(F.col("_p").alias("cell_id")).localCheckpoint(
            eager=True
        )
        if cur.isEmpty():
            break
    out = cur.select("cell_id")
    for k in kept:
        out = out.unionByName(k)
    return out


def uncompact_cells(
    cells: DataFrame, res: int, cell: str = "cell_id"
) -> DataFrame:
    """Expand a mixed-resolution cover to all descendant cells at ``res``
    (inverse of compact_cells). Two chained explodes over per-row child
    ranges — narrow, no shuffle."""
    c = F.col(cell)
    r = F.shiftright(c, 58)
    side = F.pow(F.lit(2.0), (F.lit(res) - r).cast("double")).cast("long")
    base_ix = F.shiftright(c % F.lit(C.RES_BITS_SHIFT), 29) * side
    base_iy = (c % F.lit(C.IX_SHIFT)) * side
    prepared = cells.select(
        base_ix.alias("_bx"), base_iy.alias("_by"), side.alias("_side")
    )
    # generators can't nest in expressions: one explode per select
    with_x = prepared.select(
        "_by", "_side",
        F.explode(F.sequence(F.lit(0), F.col("_side") - 1)).alias("_dx"),
        "_bx",
    )
    with_xy = with_x.select(
        "_bx", "_by", "_dx",
        F.explode(F.sequence(F.lit(0), F.col("_side") - 1)).alias("_dy"),
    )
    return with_xy.select(
        (
            F.lit(res * C.RES_BITS_SHIFT)
            + (F.col("_bx") + F.col("_dx")) * F.lit(C.IX_SHIFT)
            + F.col("_by")
            + F.col("_dy")
        ).alias("cell_id")
    )


def tile_pyramid(
    points: DataFrame,
    max_res: int,
    min_res: int,
    lat: str = "lat",
    lon: str = "lon",
    weight: str | None = None,
) -> DataFrame:
    """Overview-tile aggregation pyramid — the tiling-engine rollup that
    serves zoomed-out views without rescanning the corpus: counts (or
    weighted sums) per cell at max_res, then rolled up level by level
    through the parent relation (each level is ONE groupBy over a frame
    4x smaller than the last — the classic OLAP rollup, log depth, never
    re-touching the fact table). Output: (cell_id, res, n) for every
    level in [min_res, max_res]."""
    base = points.groupBy(
        C.latlng_to_cell(lat, lon, max_res).alias("cell_id")
    ).agg(
        (F.sum(weight) if weight else F.count(F.lit(1))).alias("n")
    )
    levels = [base.localCheckpoint(eager=True)]
    for r in range(max_res, min_res, -1):
        levels.append(
            levels[-1]
            .groupBy(_parent_expr(F.col("cell_id"), r).alias("cell_id"))
            .agg(F.sum("n").alias("n"))
            .localCheckpoint(eager=True)
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "cell_id",
        F.shiftright(F.col("cell_id"), 58).cast("int").alias("res"),
        "n",
    )
