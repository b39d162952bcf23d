"""Tile-mosaic semantics (operators/mosaic.py)."""

import numpy as np
import pytest
import zlib

from osm_search_spark.functions import cells as C
from osm_search_spark.functions import images as I
from osm_search_spark.operators.mosaic import mosaic_py, tile_mosaic

GRID, THUMB = 2, 8


def _img(v, w=16, h=16):
    px = np.full((h, w, 3), v, dtype=np.uint8)
    return I.png_encode(px)


def test_kernel_places_row_major_and_caps(spark):
    items = [(f"im{i:02d}", _img(10 * (i + 1)), "png") for i in range(6)]
    n, s, sq, crc, png = mosaic_py(items, GRID, THUMB)
    assert n == 4  # capped at grid*grid
    canvas = I.png_decode(png)
    assert canvas.shape == (GRID * THUMB, GRID * THUMB, 3)
    # row-major placement: (0,0)=im00 val 10, (0,1)=im01 val 20,
    # (1,0)=im02 val 30, (1,1)=im03 val 40
    for idx, v in enumerate((10, 20, 30, 40)):
        r, c = (idx // GRID) * THUMB, (idx % GRID) * THUMB
        assert (canvas[r : r + THUMB, c : c + THUMB] == v).all()
    assert s == int(canvas.astype(np.int64).sum())
    assert crc == zlib.crc32(canvas.tobytes())


def test_kernel_pads_partial_tiles_with_zeros(spark):
    items = [("a", _img(100), "png")]
    n, s, _sq, _crc, png = mosaic_py(items, GRID, THUMB)
    assert n == 1
    canvas = I.png_decode(png)
    assert (canvas[:THUMB, :THUMB] == 100).all()
    assert (canvas[THUMB:, :] == 0).all() and (canvas[:THUMB, THUMB:] == 0).all()
    assert s == 100 * THUMB * THUMB * 3


def test_distributed_matches_kernel_and_orders_by_id(spark):
    res = 11
    size = C.cell_size_deg(res)
    # two tiles; tile A gets ids out of insertion order to prove the
    # sort, and more than cap images to prove the window cap
    lat_a, lon_a = -6.05, 106.5
    lat_b, lon_b = -6.05, 106.5 + 2 * size
    rows = []
    for i in (3, 0, 2, 1, 4):  # 5 > cap=4 -> id 'a4' must drop
        rows.append((f"a{i}", _img(10 * (i + 1)), "png", lat_a, lon_a))
    rows.append(("b0", _img(200), "png", lat_b, lon_b))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, lat double, lon double"
    )
    out = {
        r["tile_id"]: r.asDict()
        for r in tile_mosaic(df, res=res, grid=GRID, thumb=THUMB).collect()
    }
    assert len(out) == 2
    ta = int(C.np_latlng_to_cell(np.array([lat_a]), np.array([lon_a]), res)[0])
    got = out[ta]
    assert got["n_images"] == 4
    exp = mosaic_py(
        [(f"a{i}", _img(10 * (i + 1)), "png") for i in range(4)], GRID, THUMB
    )
    assert (got["px_sum"], got["px_sq_sum"], got["crc"]) == exp[1:4]
    assert bytes(got["mosaic"]) == exp[4]


def test_validation(spark):
    df = spark.createDataFrame(
        [], "image_id string, bytes binary, fmt string, lat double, lon double"
    )
    with pytest.raises(ValueError):
        tile_mosaic(df, grid=0)


def test_mosaic_pyramid_orientation_and_determinism(spark):
    import numpy as np

    from osm_search_spark.functions import cells as C
    from osm_search_spark.functions import images as I
    from osm_search_spark.operators.mosaic import mosaic_pyramid

    res, side = 11, 16
    def tid(ix, iy):
        return 11 * C.RES_BITS_SHIFT + ix * C.IX_SHIFT + iy

    def solid(v):
        return I.png_encode(np.full((side, side, 3), v, dtype=np.uint8))

    # four siblings of one parent: (ix%2, iy%2) -> value
    rows = [
        (tid(100, 200), solid(10)),   # west, south  -> bottom-left
        (tid(101, 200), solid(20)),   # east, south  -> bottom-right
        (tid(100, 201), solid(30)),   # west, north  -> top-left
        (tid(101, 201), solid(40)),   # east, north  -> top-right
    ]
    df = spark.createDataFrame(rows, "tile_id long, mosaic binary")
    out = mosaic_pyramid(df, res, res - 1, side).collect()
    assert len(out) == 1
    r = out[0]
    assert r.res == 10 and r.n_children == 4
    px = I.png_decode(bytes(r.mosaic))
    assert px.shape == (side, side, 3)
    h = side // 2
    # northern children on the TOP rows; block mean of a solid is itself
    assert int(px[0, 0, 0]) == 30 and int(px[0, side - 1, 0]) == 40
    assert int(px[side - 1, 0, 0]) == 10 and int(px[side - 1, side - 1, 0]) == 20
    # determinism under repartition
    out2 = mosaic_pyramid(df.repartition(5), res, res - 1, side).collect()[0]
    assert out2.crc == r.crc and bytes(out2.mosaic) == bytes(r.mosaic)


def test_mosaic_pyramid_missing_children_black(spark):
    import numpy as np

    from osm_search_spark.functions import cells as C
    from osm_search_spark.functions import images as I
    from osm_search_spark.operators.mosaic import mosaic_pyramid

    side = 16
    one = [(11 * C.RES_BITS_SHIFT + 100 * C.IX_SHIFT + 200,
            I.png_encode(np.full((side, side, 3), 100, dtype=np.uint8)))]
    df = spark.createDataFrame(one, "tile_id long, mosaic binary")
    r = mosaic_pyramid(df, 11, 10, side).collect()[0]
    assert r.n_children == 1
    px = I.png_decode(bytes(r.mosaic))
    h = side // 2
    # the lone SW child fills the bottom-left quadrant; rest black
    assert (px[h:, :h] == 100).all()
    assert (px[:h, :] == 0).all() and (px[h:, h:] == 0).all()
