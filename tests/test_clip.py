"""Sutherland–Hodgman tile clipping — area conservation, identity,
FULL-cell rectangles, hole clipping, and point-membership equivalence
against an independent even-odd ray cast."""

import math

import pytest

from osm_search_spark.functions import cells as C
from osm_search_spark.operators.clip import (
    _cell_bounds,
    clip_polygon_cell_py,
    clip_to_tiles,
)


def _shoelace(lat, lon):
    s = 0.0
    for i in range(len(lat) - 1):
        s += lon[i] * lat[i + 1] - lon[i + 1] * lat[i]
    return abs(s) / 2.0


def _jagged_ring(c_lat=-7.7, c_lon=110.5, n=40, phase=0, r0=0.15):
    lat, lon = [], []
    for k in range(n):
        ang = 2 * math.pi * k / n
        r = r0 + 0.03 * ((k * 7 + phase) % 4)
        lat.append(c_lat + r * math.sin(ang))
        lon.append(c_lon + r * math.cos(ang))
    lat.append(lat[0])
    lon.append(lon[0])
    return lat, lon


def _pip_even_odd(p_lat, p_lon, lat, lon):
    """Independent even-odd ray cast (open ring expected closed)."""
    inside = False
    for i in range(len(lat) - 1):
        y1, x1, y2, x2 = lat[i], lon[i], lat[i + 1], lon[i + 1]
        if (y1 > p_lat) != (y2 > p_lat):
            xint = x1 + (p_lat - y1) * (x2 - x1) / (y2 - y1)
            if xint > p_lon:
                inside = not inside
    return inside


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_area_conservation_across_tiles(spark):
    lat, lon = _jagged_ring()
    df = spark.createDataFrame(
        [(1, lat, lon)],
        "polygon_id long, ring_lat array<double>, ring_lon array<double>",
    )
    out = _rows(clip_to_tiles(df, res=10))
    assert len(out) >= 4
    total = sum(_shoelace(r["ring_lat"], r["ring_lon"]) for r in out)
    assert total == pytest.approx(_shoelace(lat, lon), rel=1e-9)


def test_full_cells_are_ccw_rectangles(spark):
    # big rectangle spanning many res-12 cells -> interior cells FULL
    lat = [-7.9, -7.9, -7.3, -7.3, -7.9]
    lon = [110.2, 110.9, 110.9, 110.2, 110.2]
    df = spark.createDataFrame(
        [(1, lat, lon)],
        "polygon_id long, ring_lat array<double>, ring_lon array<double>",
    )
    out = _rows(clip_to_tiles(df, res=12))
    fulls = [r for r in out if r["full"]]
    assert fulls
    size = C.cell_size_deg(12)
    for r in fulls[:20]:
        minlat, minlon, maxlat, maxlon = _cell_bounds(r["cell_id"], 12)
        assert r["ring_lat"] == [minlat, minlat, maxlat, maxlat, minlat]
        assert r["ring_lon"] == [minlon, maxlon, maxlon, minlon, minlon]
        # CCW: positive signed area
        s = sum(
            r["ring_lon"][i] * r["ring_lat"][i + 1]
            - r["ring_lon"][i + 1] * r["ring_lat"][i]
            for i in range(4)
        )
        assert s > 0
        assert maxlat - minlat == pytest.approx(size)
    total = sum(_shoelace(r["ring_lat"], r["ring_lon"]) for r in out)
    assert total == pytest.approx(_shoelace(lat, lon), rel=1e-9)


def test_polygon_inside_one_cell_roundtrips(spark):
    lat, lon = _jagged_ring(c_lat=-7.0, c_lon=110.0, r0=0.05)
    df = spark.createDataFrame(
        [(1, lat, lon)],
        "polygon_id long, ring_lat array<double>, ring_lon array<double>",
    )
    out = _rows(clip_to_tiles(df, res=6))
    assert len(out) == 1 and not out[0]["full"]
    assert out[0]["ring_lat"] == lat and out[0]["ring_lon"] == lon


def test_holes_clip_and_area_subtracts(spark):
    lat, lon = _jagged_ring()
    h_lat = [(-7.7 + (v + 7.7) * 0.4) for v in lat]
    h_lon = [(110.5 + (v - 110.5) * 0.4) for v in lon]
    df = spark.createDataFrame(
        [(1, lat, lon, [h_lat], [h_lon])],
        "polygon_id long, ring_lat array<double>, ring_lon array<double>, "
        "holes_lat array<array<double>>, holes_lon array<array<double>>",
    )
    out = _rows(clip_to_tiles(df, res=10))
    assert any(r["holes_lat"] for r in out)
    total = sum(
        _shoelace(r["ring_lat"], r["ring_lon"])
        - sum(_shoelace(hl, ho) for hl, ho in zip(r["holes_lat"], r["holes_lon"]))
        for r in out
    )
    want = _shoelace(lat, lon) - _shoelace(h_lat, h_lon)
    assert total == pytest.approx(want, rel=1e-9)


def test_membership_equivalence_on_lattice(spark):
    lat, lon = _jagged_ring()
    df = spark.createDataFrame(
        [(1, lat, lon)],
        "polygon_id long, ring_lat array<double>, ring_lon array<double>",
    )
    out = _rows(clip_to_tiles(df, res=10))
    by_cell = {r["cell_id"]: r for r in out}
    # sample strictly-interior lattice points of each covered cell
    for cid, r in by_cell.items():
        minlat, minlon, maxlat, maxlon = _cell_bounds(cid, 10)
        for fy in (0.25, 0.75):
            for fx in (0.25, 0.75):
                p_lat = minlat + fy * (maxlat - minlat)
                p_lon = minlon + fx * (maxlon - minlon)
                in_clip = _pip_even_odd(p_lat, p_lon, r["ring_lat"], r["ring_lon"])
                in_poly = _pip_even_odd(p_lat, p_lon, lat, lon)
                assert in_clip == in_poly, (cid, p_lat, p_lon)


def test_edge_touch_only_cells_dropped():
    # a polygon sharing only an edge with the cell clips to zero area
    minlat, minlon, maxlat, maxlon = _cell_bounds(
        int(10 * C.RES_BITS_SHIFT + 5 * C.IX_SHIFT + 7), 10
    )
    lat = [minlat, maxlat, maxlat, minlat, minlat]
    lon = [minlon - 0.1, minlon - 0.1, minlon, minlon, minlon - 0.1]
    got = clip_polygon_cell_py(
        lat, lon, int(10 * C.RES_BITS_SHIFT + 5 * C.IX_SHIFT + 7), 10
    )
    assert got is None


def test_vector_tile_pipeline_drive(spark, tmp_path):
    """simplify -> clip -> write_vector_tiles end-to-end: partitioned
    layout on disk, area conserved through the whole chain at the
    simplified polygon's area."""
    from osm_search_spark.operators.clip import clip_to_tiles
    from osm_search_spark.operators.simplify import (
        simplify_polygons,
        simplify_rings_py,
    )
    from osm_search_spark.operators.tiling import write_vector_tiles

    lat, lon = _jagged_ring()
    df = spark.createDataFrame(
        [(1, lat, lon)],
        "polygon_id long, ring_lat array<double>, ring_lon array<double>",
    )
    simp = simplify_polygons(df, 0.01).drop("n_points_before", "n_points_after")
    out = tmp_path / "vtiles"
    write_vector_tiles(clip_to_tiles(simp, res=10), str(out))
    assert any(p.name.startswith("tile_coarse=") for p in out.iterdir())
    back = spark.read.parquet(str(out))
    rows = [r.asDict() for r in back.collect()]
    slat, slon = simplify_rings_py(lat, lon, 0.01)
    total = sum(_shoelace(r["ring_lat"], r["ring_lon"]) for r in rows)
    assert total == pytest.approx(_shoelace(slat, slon), rel=1e-9)
