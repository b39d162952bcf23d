"""Cell-cover compact/uncompact: block promotion, partial blocks,
roundtrip set-equality, idempotence."""

from pyspark.sql import functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.operators.compaction import compact_cells, uncompact_cells

RES = 14


def _cell(r, ix, iy):
    return r * C.RES_BITS_SHIFT + ix * C.IX_SHIFT + iy


def _df(spark, cells):
    return spark.createDataFrame([(c,) for c in cells], "cell_id long")


def test_full_block_promotes_two_levels(spark):
    # all 16 res-14 cells of one res-12 cell -> one res-12 cell
    cells = [
        _cell(RES, 4000 + dx, 2000 + dy) for dx in range(4) for dy in range(4)
    ]
    got = sorted(
        r["cell_id"]
        for r in compact_cells(_df(spark, cells), RES, 10).collect()
    )
    assert got == [_cell(12, 1000, 500)]


def test_partial_block_stays(spark):
    cells = [_cell(RES, 4000, 2000), _cell(RES, 4001, 2000), _cell(RES, 4000, 2001)]
    got = sorted(
        r["cell_id"]
        for r in compact_cells(_df(spark, cells), RES, 10).collect()
    )
    assert got == sorted(cells)


def test_roundtrip_and_idempotence(spark):
    # occupancy cover of the derived points: compact shrinks it, uncompact
    # restores it EXACTLY, compacting a second time is a no-op
    pts = synth_points(spark)
    cover = pts.select(
        C.latlng_to_cell("lat", "lon", RES).alias("cell_id")
    ).distinct()
    base = sorted(r["cell_id"] for r in cover.collect())
    compacted = compact_cells(cover, RES, 10).localCheckpoint(eager=True)
    comp = sorted(r["cell_id"] for r in compacted.collect())
    assert len(comp) < len(base)  # something promoted
    assert any(c < RES * C.RES_BITS_SHIFT for c in comp)  # mixed res
    back = sorted(
        r["cell_id"] for r in uncompact_cells(compacted, RES).collect()
    )
    assert back == base
    # idempotent per level: compacting the RES-level survivors again
    # promotes nothing new
    again = sorted(
        r["cell_id"]
        for r in compact_cells(
            compacted.filter(
                F.col("cell_id") >= RES * C.RES_BITS_SHIFT
            ),
            RES, 10,
        ).collect()
    )
    assert again == [c for c in comp if c >= RES * C.RES_BITS_SHIFT]


def synth_points(spark):
    from osm_search_spark.sources import synth

    return synth.derive_points(spark, "/root/testdata/sf0.01")


def test_tile_pyramid_invariants(spark):
    from osm_search_spark.operators.compaction import tile_pyramid

    pts = synth_points(spark)
    total = pts.count()
    pyr = tile_pyramid(pts, RES, 10).collect()
    by_res = {}
    for r in pyr:
        by_res.setdefault(r["res"], {})[r["cell_id"]] = r["n"]
    assert sorted(by_res) == [10, 11, 12, 13, 14]
    # mass conservation at every level
    for res, cells in by_res.items():
        assert sum(cells.values()) == total, res
    # every parent equals the sum of its children
    for r in range(RES, 10, -1):
        for cell, n in by_res[r - 1].items():
            ix = (cell % C.RES_BITS_SHIFT) // C.IX_SHIFT
            iy = cell % C.IX_SHIFT
            kids = sum(
                by_res[r].get(
                    r * C.RES_BITS_SHIFT + (2 * ix + dx) * C.IX_SHIFT
                    + 2 * iy + dy,
                    0,
                )
                for dx in (0, 1)
                for dy in (0, 1)
            )
            assert kids == n, (r, cell)
