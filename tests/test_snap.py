"""Snap-to-segment (map-matching primitive): golden geometry, brute-force
parity, radius exclusion."""

import math

import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.snap import snap_to_segments, way_segments
from osm_search_spark.sources import osm as osm_src


def _ways_df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, lats array<double>, lons array<double>"
    )


def test_perpendicular_foot_golden(spark):
    # horizontal segment at lat=0 from lon 10 to lon 11; point above middle
    ways = _ways_df(spark, [(1, [0.0, 0.0], [10.0, 11.0])])
    pts = spark.createDataFrame(
        [(1, 0.01, 10.25),   # foot at t=0.25
         (2, 0.01, 9.5),     # before start -> clamped t=0
         (3, 0.01, 11.5)],   # past end -> clamped t=1
        "point_id long, lat double, lon double",
    )
    got = {r["point_id"]: r for r in snap_to_segments(pts, ways, radius_km=60).collect()}
    assert got[1]["t"] == pytest.approx(0.25, abs=1e-6)
    assert got[1]["snap_lat"] == 0.0 and got[1]["snap_lon"] == pytest.approx(10.25)
    assert got[2]["t"] == 0.0 and got[2]["snap_lon"] == 10.0
    assert got[3]["t"] == 1.0 and got[3]["snap_lon"] == 11.0
    # perpendicular distance ~ 0.01 deg of latitude ~ 1.112 km
    assert got[1]["dist_km"] == pytest.approx(1.112, abs=2e-3)


def test_radius_excludes_far_points(spark):
    ways = _ways_df(spark, [(1, [0.0, 0.0], [10.0, 11.0])])
    pts = spark.createDataFrame(
        [(1, 0.001, 10.5), (2, 2.0, 10.5)],
        "point_id long, lat double, lon double",
    )
    got = snap_to_segments(pts, ways, radius_km=1.0).collect()
    assert [r["point_id"] for r in got] == [1]


def test_brute_force_parity_on_synth_streets(spark):
    """Cell-cover candidate generation finds the SAME nearest segment as a
    brute-force scan over all segments (within the radius)."""
    nodes, ways, _ = osm_src.synth_osm(spark)
    streets = osm_src.assemble_ways(ways, nodes).filter(
        F.map_contains_key("tags", "highway")
    ).select("id", "lats", "lons")
    segs = [
        (r["way_id"], r["seg_idx"], r["alat"], r["alon"], r["blat"], r["blon"])
        for r in way_segments(streets).collect()
    ]
    pts = [
        (i, -7.9 + 0.017 * i, 110.25 + 0.023 * (i % 29)) for i in range(30)
    ]
    pts_df = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    got = {
        r["point_id"]: (r["way_id"], r["seg_idx"], r["dist_km"])
        for r in snap_to_segments(pts_df, streets, radius_km=3.0).collect()
    }

    def hav(lat1, lon1, lat2, lon2):
        r = 6371.0
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp, dl = p2 - p1, math.radians(lon2 - lon1)
        a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * r * math.asin(math.sqrt(a))

    for pid, plat, plon in pts:
        best = None
        for wid, si, alat, alon, blat, blon in segs:
            kx = math.cos(math.radians(plat))
            den = ((blon - alon) * kx) ** 2 + (blat - alat) ** 2
            t = 0.0 if den == 0 else max(
                0.0, min(1.0, (((plon - alon) * kx * (blon - alon) * kx)
                               + (plat - alat) * (blat - alat)) / den)
            )
            d = hav(plat, plon, alat + t * (blat - alat), alon + t * (blon - alon))
            if d <= 3.0 and (best is None or (d, wid, si) < best):
                best = (d, wid, si)
        if best is None:
            assert pid not in got
        else:
            assert pid in got, pid
            assert got[pid][0] == best[1] and got[pid][1] == best[2]
            assert got[pid][2] == pytest.approx(best[0], abs=1e-3)
