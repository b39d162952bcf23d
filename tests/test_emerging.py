import math

import pytest

from osm_search_spark.functions.cells import (
    IX_SHIFT,
    RES_BITS_SHIFT,
)
from osm_search_spark.operators.emerging import emerging_hotspots

RES = 10


def cid(ix, iy):
    return RES * RES_BITS_SHIFT + ix * IX_SHIFT + iy


def grid_raster(values_by_bin):
    """values_by_bin: {bin: {(ix, iy): value}} -> rows (bin, cell_id, value)."""
    rows = []
    for b, cells in values_by_bin.items():
        for (ix, iy), v in cells.items():
            rows.append((b, cid(ix, iy), v))
    return rows


def base_grid(w=15, h=15, v=1):
    # interior-anchored grid (away from wrap/clamp); large enough that a
    # single hot cell does not dominate the GLOBAL moments (Gi* z
    # saturates when the outlier drives the variance it is scored
    # against — the ramp must register in z, not just in the raw value)
    return {(100 + x, 100 + y): v for x in range(w) for y in range(h)}


@pytest.fixture(scope="module")
def result(spark):
    # hot center cell ramps UP over 4 bins; a corner cell is hot in bin
    # 0 only; everything else flat background.
    bins = {}
    for b in range(4):
        g = dict(base_grid())
        g[(107, 107)] = [3, 5, 8, 12][b]   # growing hot spot
        g[(100, 100)] = [12, 1, 1, 1][b]   # historical hot spot
        bins[b] = g
    df = spark.createDataFrame(
        grid_raster(bins), "bin int, cell_id long, value long"
    )
    out = emerging_hotspots(df, RES, 1)
    return {r.cell_id: r for r in out.collect()}


def test_trending_center_is_intensifying(result):
    r = result[cid(107, 107)]
    assert r.n_bins == 4
    assert r.n_hot >= 2
    assert r.s_stat == 6  # strictly increasing z: C(4,2) concordant pairs
    assert r.category == "intensifying"


def test_historical_corner(result):
    r = result[cid(100, 100)]
    assert r.n_hot >= 1
    assert r.last_z < 1.96
    assert r.category == "historical"


def test_background_none(result):
    # a far background cell: never hot, category none
    r = result[cid(112, 112)]
    assert r.n_hot == 0 and r.n_cold == 0
    assert r.category == "none"


def test_flat_bin_excluded(spark):
    # bin 1 is perfectly flat -> zero variance -> NULL z -> excluded
    bins = {0: dict(base_grid()), 1: dict(base_grid())}
    bins[0][(107, 107)] = 30
    df = spark.createDataFrame(
        grid_raster(bins), "bin int, cell_id long, value long"
    )
    out = {r.cell_id: r for r in emerging_hotspots(df, RES, 1).collect()}
    assert all(r.n_bins == 1 for r in out.values())
    assert all(r.s_stat == 0 for r in out.values())


def test_new_category(spark):
    # hot only in the LAST bin -> 'new'
    bins = {b: dict(base_grid()) for b in range(3)}
    bins[2][(107, 107)] = 40
    df = spark.createDataFrame(
        grid_raster(bins), "bin int, cell_id long, value long"
    )
    out = {r.cell_id: r for r in emerging_hotspots(df, RES, 1).collect()}
    r = out[cid(107, 107)]
    assert r.n_hot == 1 and r.last_z >= 1.96
    assert r.category == "new"


def test_diminishing(spark):
    # hot throughout but falling, still hot in the last bin -> S < 0.
    # A lone fading cell will NOT do: its own value drives the global
    # variance it is scored against, so z saturates — a second,
    # constant-hot anchor cell pins the moments while this one fades.
    bins = {}
    for b in range(4):
        g = dict(base_grid())
        g[(102, 102)] = 30                   # constant anchor
        g[(110, 110)] = [28, 26, 24, 22][b]  # fading hot spot
        bins[b] = g
    df = spark.createDataFrame(
        grid_raster(bins), "bin int, cell_id long, value long"
    )
    out = {r.cell_id: r for r in emerging_hotspots(df, RES, 1).collect()}
    r = out[cid(110, 110)]
    assert r.s_stat == -6
    assert r.n_hot == 4 and r.last_z >= 1.96
    assert r.category == "diminishing"
