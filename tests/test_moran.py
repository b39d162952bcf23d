import pytest

from osm_search_spark.functions.cells import IX_SHIFT, RES_BITS_SHIFT
from osm_search_spark.operators.focal import moran_local

RES = 10


def cid(ix, iy):
    return RES * RES_BITS_SHIFT + ix * IX_SHIFT + iy


def raster(cells):
    return [(cid(ix, iy), v) for (ix, iy), v in cells.items()]


@pytest.fixture(scope="module")
def result(spark):
    # 11x11 background of 1s with: a 3x3 hot cluster (center + ring all
    # high -> HH), a lone spike in cold surroundings (HL), and a lone
    # dip next to the hot cluster's edge is avoided — keep cases clean.
    cells = {(100 + x, 100 + y): 1 for x in range(11) for y in range(11)}
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            cells[(102 + dx, 102 + dy)] = 9  # hot cluster
    cells[(108, 108)] = 9                    # lone spike
    cells[(108, 102)] = 0                    # lone dip (LH? surroundings=1)
    df = spark.createDataFrame(raster(cells), "cell_id long, value long")
    out = moran_local(df, RES, 1)
    return {r.cell_id: r for r in out.collect()}


def test_hot_cluster_center_hh(result):
    r = result[cid(102, 102)]
    assert r.z > 0 and r.lag > 0
    assert r.moran_i > 0
    assert r.quadrant == "HH"


def test_lone_spike_hl(result):
    r = result[cid(108, 108)]
    assert r.z > 0 and r.lag < 0
    assert r.moran_i < 0
    assert r.quadrant == "HL"


def test_cold_background_ll(result):
    # a background cell far from all features: below-mean value in a
    # below-mean neighborhood
    r = result[cid(104, 108)]
    assert r.z < 0 and r.lag < 0
    assert r.quadrant == "LL"
    assert r.moran_i > 0  # LL is POSITIVE autocorrelation


def test_lone_dip_lh(result):
    r = result[cid(108, 102)]
    assert r.z < 0
    # neighbors are background 1s; is the background above the mean?
    # mean > 1 because of the hot cells, so lag < 0 here -> LL actually.
    # Assert consistency instead of a hardcoded quadrant:
    expected = "LH" if r.lag > 0 else "LL"
    assert r.quadrant == expected


def test_neighbor_count_excludes_self(result):
    r = result[cid(102, 102)]
    assert r.nbr_n == 8  # interior cell: full ring minus self


def test_flat_raster_na(spark):
    cells = {(100 + x, 100 + y): 5 for x in range(4) for y in range(4)}
    df = spark.createDataFrame(raster(cells), "cell_id long, value long")
    out = moran_local(df, RES, 1).collect()
    assert all(r.moran_i is None and r.quadrant == "na" for r in out)


def test_isolated_cell_na(spark):
    cells = {(100, 100): 5, (200, 200): 1}  # far apart -> empty rings
    df = spark.createDataFrame(raster(cells), "cell_id long, value long")
    out = {r.cell_id: r for r in moran_local(df, RES, 1).collect()}
    assert all(r.nbr_n == 0 for r in out.values())
    assert all(r.moran_i is None and r.quadrant == "na" for r in out.values())


def test_moran_value_against_numpy(spark):
    import numpy as np

    cells = {(100 + x, 100 + y): (x * 7 + y * 3) % 5 for x in range(5)
             for y in range(5)}
    df = spark.createDataFrame(raster(cells), "cell_id long, value long")
    out = {r.cell_id: r for r in moran_local(df, RES, 1).collect()}
    vals = np.array(list(cells.values()), dtype=float)
    mean, m2 = vals.mean(), (vals * vals).mean() - vals.mean() ** 2
    for (ix, iy), v in cells.items():
        nbrs = [
            cells[(ix + dx, iy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (ix + dx, iy + dy) in cells
        ]
        exp = ((v - mean) / m2) * (
            (sum(nbrs) - len(nbrs) * mean) / len(nbrs)
        )
        got = out[cid(ix, iy)].moran_i
        assert got == pytest.approx(exp, rel=1e-12), (ix, iy)
