import math

import pytest

from osm_search_spark.functions.cells import IX_SHIFT, RES_BITS_SHIFT
from osm_search_spark.operators.terrain import terrain

RES = 10


def cid(i, j):
    return RES * RES_BITS_SHIFT + (800 + i) * IX_SHIFT + (400 + j)


def grid(w, h, f):
    return [(cid(i, j), f(i, j)) for i in range(w) for j in range(h)]


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "cell_id long, elev double")
    return {r.cell_id: r for r in terrain(df, RES, **kw).collect()}


def test_interior_mask(spark):
    out = run(spark, grid(5, 4, lambda i, j: 0.0))
    # only the (5-2) x (4-2) interior survives
    assert len(out) == 3 * 2
    assert cid(0, 0) not in out and cid(1, 1) in out


def test_flat_plane(spark):
    out = run(spark, grid(6, 6, lambda i, j: 7.0))
    for r in out.values():
        assert r.slope_rad == 0.0
        assert r.aspect_deg == -1.0
        assert r.d8 == 0  # sink/flat
        # hillshade of flat ground = 255 * cos(zenith)
        assert r.hillshade == pytest.approx(
            255.0 * math.cos(math.radians(45.0)), rel=1e-12
        )


def test_tilted_plane_east(spark):
    # elev rises to the EAST by 2/cell: gx = 2, gy = 0
    out = run(spark, grid(8, 6, lambda i, j: 2.0 * i))
    r = out[cid(3, 3)]
    assert r.slope_rad == pytest.approx(math.atan(2.0), rel=1e-12)
    assert r.aspect_deg == pytest.approx(270.0)  # steepest descent = W
    assert r.d8 == 16  # flows west


def test_tilted_plane_north(spark):
    # elev rises with j (north): gy = 3, descent points south (180)
    out = run(spark, grid(6, 8, lambda i, j: 3.0 * j))
    r = out[cid(3, 4)]
    assert r.slope_rad == pytest.approx(math.atan(3.0), rel=1e-12)
    assert r.aspect_deg == pytest.approx(180.0)
    assert r.d8 == 4  # flows south


def test_cone_d8_points_downhill(spark):
    # inverted cone centered at (5,5): flow points AWAY from the apex
    out = run(
        spark,
        grid(11, 11, lambda i, j: -math.hypot(i - 5, j - 5)),
    )
    # the apex (peak of -r is at r=0 -> elevation 0 = maximum)
    assert out[cid(6, 5)].d8 == 1  # east of apex flows further east
    assert out[cid(4, 5)].d8 == 16  # west flows west
    assert out[cid(5, 6)].d8 == 64  # north flows north
    assert out[cid(5, 4)].d8 == 4  # south flows south
    assert out[cid(6, 6)].d8 == 128  # NE flows NE
    assert out[cid(4, 4)].d8 == 8  # SW flows SW


def test_pit_is_sink(spark):
    rows = grid(5, 5, lambda i, j: 10.0)
    rows = [(c, 0.0 if c == cid(2, 2) else v) for c, v in rows]
    out = run(spark, rows)
    assert out[cid(2, 2)].d8 == 0


def test_hillshade_brightest_facing_sun(spark):
    # default sun from the NW (azimuth 315): a NW-facing slope is
    # brighter than the same slope facing SE
    nw = run(spark, grid(8, 8, lambda i, j: 1.0 * i - 1.0 * j))  # faces NW
    se = run(spark, grid(8, 8, lambda i, j: -1.0 * i + 1.0 * j))  # faces SE
    assert nw[cid(3, 3)].hillshade > se[cid(3, 3)].hillshade
