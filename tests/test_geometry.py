"""Geometry kernels vs reference golden tests.

- PIP polygon from pkg/geo/geometry_test.go:9-45 (the reference only
  asserts the bbox there; we additionally assert exact winding-number
  containment semantics incl. boundary=inside, geometry.go:86-122)
- Haversine goldens from pkg/datastructure/distance_test.go
- Circle contains from pkg/datastructure/circle_test.go:9-34
"""

import numpy as np
import pytest

from osm_search_spark.functions import geometry as G
from osm_search_spark.functions.geodesy import haversine_km

# geometry_test.go:10-18
POLY = [
    (-7.8236786093625454, 110.32093322132368),
    (-7.829740180582352, 110.35293804508764),
    (-7.826476268571158, 110.4094171458476),
    (-7.7821777971150485, 110.4098878050206),
    (-7.7821777971150485, 110.43012614945958),
    (-7.763058061783706, 110.43012614945958),
    (-7.742538353844481, 110.34211288410864),
]
PLAT = np.array([p[0] for p in POLY])
PLON = np.array([p[1] for p in POLY])


def test_pip_inside_outside():
    inside = G.points_in_polygon(
        np.array([-7.786841015007818]), np.array([110.35482068177964]), PLAT, PLON
    )
    assert inside[0]
    outside = G.points_in_polygon(
        np.array([-7.709038594647804]), np.array([110.5904486305967]), PLAT, PLON
    )
    assert not outside[0]


def test_pip_boundary_is_inside():
    # a polygon vertex and an on-edge point count as inside (geometry.go:102-106)
    lat = np.array([POLY[0][0], (POLY[3][0] + POLY[4][0]) / 2])
    lon = np.array([POLY[0][1], POLY[3][1]])  # vertical edge 3->4 has const lon
    assert G.points_in_polygon(lat, lon, PLAT, PLON).all()


def test_pip_vs_reference_scalar_port():
    # oracle 1: exact scalar port of the reference's windingNumber loop
    rng = np.random.default_rng(11)
    lat = rng.uniform(-7.85, -7.70, 2000)
    lon = rng.uniform(110.30, 110.45, 2000)
    got = G.points_in_polygon(lat, lon, PLAT, PLON)
    exp = np.array(
        [G.reference_pip_scalar(lat[j], lon[j], PLAT, PLON) for j in range(len(lat))]
    )
    assert (got == exp).all()


def test_pip_exact_mode_vs_crossing_number():
    # oracle 2: classic crossing-number ray cast vs boundary="exact" mode
    rng = np.random.default_rng(11)
    lat = rng.uniform(-7.85, -7.70, 5000)
    lon = rng.uniform(110.30, 110.45, 5000)
    got = G.points_in_polygon(lat, lon, PLAT, PLON, boundary="exact")

    rl, rn = G.close_ring(PLAT, PLON)
    exp = np.zeros(len(lat), dtype=bool)
    for j in range(len(lat)):
        c = False
        for i in range(len(rl) - 1):
            y1, x1, y2, x2 = rl[i], rn[i], rl[i + 1], rn[i + 1]
            if (y1 <= lat[j] < y2) or (y2 <= lat[j] < y1):
                xint = x1 + (lat[j] - y1) * (x2 - x1) / (y2 - y1)
                if lon[j] < xint:
                    c = not c
        exp[j] = c
    # random points are never exactly on a boundary; methods must agree
    assert (got == exp).all()


# distance_test.go:9-40 — expected values are rounded-ish in the reference
@pytest.mark.parametrize(
    "lat1,lon1,lat2,lon2,expected,tol",
    [
        (-7.557155997491524, 110.77170252731288, -7.550209300671982, 110.78942094938256, 2.1, 0.05),
        (-7.546196863318374, 110.7775170972345, -7.550209300671982, 110.78942094938256, 1.38, 0.05),
        (-7.759889166547908, 110.36689459108496, -7.760335932763678, 110.37671195413539, 1.08, 0.05),
    ],
)
def test_haversine_goldens(lat1, lon1, lat2, lon2, expected, tol):
    got = float(G.haversine_km_np(lat1, lon1, lat2, lon2))
    assert abs(got - expected) < tol


def test_haversine_column_matches_numpy(spark):
    rows = [(-7.557155997491524, 110.77170252731288, -7.550209300671982, 110.78942094938256)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    got = df.select(haversine_km("a", "b", "c", "d").alias("x")).collect()[0]["x"]
    exp = float(G.haversine_km_np(*rows[0]))
    assert abs(got - exp) < 1e-12


# circle_test.go:9-34
def test_circle_contains():
    c = (-7.5680354571554025, 110.81169121664644, 1.0)
    ins = [(-7.568015281898911, 110.81444088141711), (-7.572317914672147, 110.81118863253744)]
    outs = [(-7.559435821190102, 110.80760986341456), (-7.55888752969384, 110.81268429828974)]
    for la, lo in ins:
        assert float(G.haversine_km_np(la, lo, c[0], c[1])) <= c[2]
    for la, lo in outs:
        assert float(G.haversine_km_np(la, lo, c[0], c[1])) > c[2]


def test_midpoint_column(spark):
    # midpoint of two points on the same meridian is the average latitude
    df = spark.createDataFrame([(10.0, 20.0, 30.0, 20.0)], "a double, b double, c double, d double")
    from osm_search_spark.functions.geodesy import midpoint

    m = df.select(midpoint("a", "b", "c", "d").alias("m")).collect()[0]["m"]
    assert abs(m["lat"] - 20.0) < 1e-9
    assert abs(m["lon"] - 20.0) < 1e-9
    # midpoint is equidistant from both endpoints
    d1 = G.haversine_km_np(10.0, 20.0, m["lat"], m["lon"])
    d2 = G.haversine_km_np(30.0, 20.0, m["lat"], m["lon"])
    assert abs(float(d1) - float(d2)) < 1e-6


def test_destination_point_roundtrip(spark):
    from osm_search_spark.functions.geodesy import destination_point
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(-7.55, 110.78)], "lat double, lon double")
    d = df.select(
        destination_point("lat", "lon", F.lit(90.0), F.lit(10.0)).alias("p")
    ).collect()[0]["p"]
    # travelling 10 km must land exactly 10 km away (great-circle)
    back = float(G.haversine_km_np(-7.55, 110.78, d["lat"], d["lon"]))
    assert abs(back - 10.0) < 1e-6
    assert d["lon"] > 110.78  # bearing 90 deg = east


class TestRingMeasures:
    def test_rectangle_area_analytic_exact(self, spark):
        """Chamberlain-Duquette is exact for lat/lon-aligned rectangles:
        area = R^2 * dlam * (sin latN - sin latS)."""
        import math

        from osm_search_spark.functions.geodesy import (
            EARTH_RADIUS_KM,
            ring_area_km2,
        )
        from pyspark.sql import functions as F

        s, n, w, e = -7.9, -7.3, 110.2, 110.9
        df = spark.createDataFrame(
            [(1, [s, s, n, n, s], [w, e, e, w, w]),
             (2, [s, n, n, s, s], [w, w, e, e, w])],  # reversed winding
            "polygon_id long, ring_lat array<double>, ring_lon array<double>",
        )
        got = {r["polygon_id"]: r["a"] for r in df.select(
            "polygon_id", ring_area_km2("ring_lat", "ring_lon").alias("a")
        ).collect()}
        want = (
            EARTH_RADIUS_KM ** 2
            * math.radians(e - w)
            * (math.sin(math.radians(n)) - math.sin(math.radians(s)))
        )
        assert got[1] == pytest.approx(want, rel=1e-12)
        assert got[2] == pytest.approx(want, rel=1e-12)  # winding-invariant

    def test_perimeter_matches_python_haversine(self, spark):
        import math

        from osm_search_spark.functions.geodesy import ring_perimeter_km

        def hav(lat1, lon1, lat2, lon2):
            p1, p2 = math.radians(lat1), math.radians(lat2)
            a = (1 - math.cos(p1 - p2)) / 2 + math.cos(p1) * math.cos(p2) * (
                1 - math.cos(math.radians(lon1 - lon2))
            ) / 2
            return 6371.0 * 2 * math.asin(math.sqrt(a))

        lat = [-7.7 + 0.1 * math.sin(k) for k in range(9)]
        lon = [110.5 + 0.1 * math.cos(k) for k in range(9)]
        lat.append(lat[0])
        lon.append(lon[0])
        df = spark.createDataFrame(
            [(1, lat, lon)],
            "polygon_id long, ring_lat array<double>, ring_lon array<double>",
        )
        got = df.select(
            ring_perimeter_km("ring_lat", "ring_lon").alias("p")
        ).first()["p"]
        want = sum(
            hav(lat[i], lon[i], lat[i + 1], lon[i + 1])
            for i in range(len(lat) - 1)
        )
        assert got == pytest.approx(want, rel=1e-12)

    def test_short_rings_zero(self, spark):
        from osm_search_spark.functions.geodesy import (
            ring_area_km2,
            ring_perimeter_km,
        )

        df = spark.createDataFrame(
            [(1, [], []), (2, [1.0], [2.0])],
            "polygon_id long, ring_lat array<double>, ring_lon array<double>",
        )
        rows = df.select(
            ring_area_km2("ring_lat", "ring_lon").alias("a"),
            ring_perimeter_km("ring_lat", "ring_lon").alias("p"),
        ).collect()
        assert all(r["a"] == 0.0 and r["p"] == 0.0 for r in rows)
