"""Line x polygon overlay length: golden crossings, concave splits,
holes subtract, brute-force additivity."""

import math

import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions.geodesy import EARTH_RADIUS_KM
from osm_search_spark.operators.line_stats import line_length_in_polygons
from osm_search_spark.sources import synth


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (1 - math.cos(p1 - p2)) / 2 + math.cos(p1) * math.cos(p2) * (
        1 - math.cos(math.radians(lon2 - lon1))
    ) / 2
    return EARTH_RADIUS_KM * 2 * math.asin(math.sqrt(a))


def _ways(spark, rows):
    return spark.createDataFrame(
        rows, "id long, lats array<double>, lons array<double>"
    )


def _polys(spark, rows, holes=False):
    schema = "polygon_id long, ring_lat array<double>, ring_lon array<double>"
    if holes:
        schema += ", holes_lat array<array<double>>, holes_lon array<array<double>>"
    return spark.createDataFrame(rows, schema)


def test_straight_crossing_golden(spark):
    # horizontal way crossing a unit square: inside portion = lon 10..11
    ways = _ways(spark, [(1, [0.5, 0.5], [9.0, 12.0])])
    polys = _polys(spark, [(7, [0.0, 0.0, 1.0, 1.0, 0.0], [10.0, 11.0, 11.0, 10.0, 10.0])])
    got = line_length_in_polygons(ways, polys).collect()
    assert len(got) == 1
    want = _hav(0.5, 10.0, 0.5, 11.0)
    assert got[0]["length_km"] == pytest.approx(want, abs=1e-6)


def test_concave_split_two_pieces(spark):
    # U-shaped polygon: a horizontal way at the notch height crosses arms
    # twice -> inside length = the two arm widths, notch excluded
    ring_lat = [0.0, 0.0, 2.0, 2.0, 0.5, 0.5, 2.0, 2.0, 0.0]
    ring_lon = [0.0, 3.0, 3.0, 2.0, 2.0, 1.0, 1.0, 0.0, 0.0]
    polys = _polys(spark, [(1, ring_lat, ring_lon)])
    ways = _ways(spark, [(1, [1.0, 1.0], [-1.0, 4.0])])
    got = line_length_in_polygons(ways, polys).collect()
    want = _hav(1.0, 0.0, 1.0, 1.0) + _hav(1.0, 2.0, 1.0, 3.0)
    assert len(got) == 1
    assert got[0]["length_km"] == pytest.approx(want, abs=1e-6)


def test_hole_subtracts(spark):
    polys = _polys(
        spark,
        [(
            1,
            [0.0, 0.0, 3.0, 3.0, 0.0], [0.0, 3.0, 3.0, 0.0, 0.0],
            [[1.0, 1.0, 2.0, 2.0, 1.0]], [[1.0, 2.0, 2.0, 1.0, 1.0]],
        )],
        holes=True,
    )
    ways = _ways(spark, [(1, [1.5, 1.5], [-1.0, 4.0])])
    got = line_length_in_polygons(ways, polys).collect()
    want = _hav(1.5, 0.0, 1.5, 1.0) + _hav(1.5, 2.0, 1.5, 3.0)
    assert got[0]["length_km"] == pytest.approx(want, abs=1e-6)


def test_way_fully_inside_and_fully_outside(spark):
    polys = _polys(spark, [(1, [0.0, 0.0, 2.0, 2.0, 0.0], [0.0, 2.0, 2.0, 0.0, 0.0])])
    ways = _ways(
        spark,
        [(1, [0.5, 1.5], [0.5, 1.5]),   # diagonal fully inside
         (2, [5.0, 6.0], [5.0, 6.0])],  # far away
    )
    got = {r["way_id"]: r["length_km"] for r in line_length_in_polygons(ways, polys).collect()}
    assert set(got) == {1}
    assert got[1] == pytest.approx(_hav(0.5, 0.5, 1.5, 1.5), abs=1e-6)


def test_streets_against_admin_fixture_additivity(spark):
    """Street length inside the 8 kecamatan sums to the street length
    inside the country (the kecamatan tile it exactly)."""
    from osm_search_spark.sources import osm as osm_src

    nodes, ways, _ = osm_src.synth_osm(spark)
    streets = (
        osm_src.assemble_ways(ways, nodes)
        .filter(F.map_contains_key("tags", "highway"))
        .select("id", "lats", "lons")
    )
    polys = synth.admin_polygons(spark)
    kec = line_length_in_polygons(streets, polys.filter(F.col("admin_level") == 7))
    country = line_length_in_polygons(streets, polys.filter(F.col("admin_level") == 2))
    kec_sum = {
        r["way_id"]: r["s"]
        for r in kec.groupBy("way_id").agg(F.sum("length_km").alias("s")).collect()
    }
    ctry = {r["way_id"]: r["length_km"] for r in country.collect()}
    assert set(kec_sum) == set(ctry)
    for wid in ctry:
        assert kec_sum[wid] == pytest.approx(ctry[wid], abs=1e-5)
