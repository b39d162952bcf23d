"""Geofence status matrix vs the reference README example and
pkg/geofence/geofence.go:97-116 transition semantics."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.geofence import geofence_status
from osm_search_spark.sources import synth


def _run(spark, tracks):
    fences = spark.createDataFrame(
        [f for f in synth.FENCES if f[0] == "monumen_nasional"],
        "fence_name string, key string, lat double, lon double, radius_km double",
    )
    t = spark.createDataFrame(
        tracks, "query_point_id string, seq int, lat double, lon double"
    )
    rows = geofence_status(t, fences).collect()
    return {(r["query_point_id"], r["seq"]): r["status"] for r in rows}


def test_readme_enter_then_inside(spark):
    # ojol_budi: far away -> near monas (ENTER) -> at monas (INSIDE) -> away (EXIT)
    got = _run(spark, synth.TRACK_POINTS)
    assert got[("ojol_budi", 1)] == "OUTSIDE"  # first obs, outside fence
    assert got[("ojol_budi", 2)] == "ENTER"
    assert got[("ojol_budi", 3)] == "INSIDE"
    assert got[("ojol_budi", 4)] == "EXIT"


def test_first_observation_inside_is_enter(spark):
    got = _run(spark, [("x", 1, -6.175264826906892, 106.82716285437488)])
    assert got[("x", 1)] == "ENTER"


def test_cross_status(spark):
    # pass through the fence in one step: both endpoints outside, segment
    # crosses the circle (circle.go:54-96 semantics)
    got = _run(
        spark,
        [
            ("y", 1, -6.175264826906892, 106.86),
            ("y", 2, -6.175264826906892, 106.79),
        ],
    )
    assert got[("y", 1)] == "OUTSIDE"
    assert got[("y", 2)] == "CROSS"


def test_knn_scale_path_matches_broadcast(spark):
    # force the fence-side cell-ring kNN path (threshold=1) on a 60-fence
    # grid; with nearest_n=3 on both paths the statuses must agree
    import numpy as np

    rng = np.random.default_rng(7)
    fences = spark.createDataFrame(
        [
            (f"f{i}", -6.3 + 0.05 * (i % 10), 106.6 + 0.05 * (i // 10), 1.0)
            for i in range(60)
        ],
        "fence_name string, lat double, lon double, radius_km double",
    )
    tracks = spark.createDataFrame(
        [
            ("e%d" % (i % 5), i // 5,
             float(-6.3 + rng.uniform(0, 0.5)), float(106.6 + rng.uniform(0, 0.3)))
            for i in range(40)
        ],
        "query_point_id string, seq int, lat double, lon double",
    )
    small = geofence_status(tracks, fences, nearest_n=3)
    big = geofence_status(tracks, fences, nearest_n=3, fence_broadcast_threshold=1)
    k = ["query_point_id", "seq", "fence_name", "status"]
    a = {tuple(r) for r in small.select(k).collect()}
    b = {tuple(r) for r in big.select(k).collect()}
    assert a == b


def test_knn_path_requires_nearest_n(spark):
    # above the broadcast threshold, all-fence statuses are quadratic —
    # the engine must refuse rather than silently truncate to 3-NN
    import pytest

    fences = spark.createDataFrame(
        [(f"f{i}", -6.3 + 0.01 * i, 106.6, 1.0) for i in range(5)],
        "fence_name string, lat double, lon double, radius_km double",
    )
    tracks = spark.createDataFrame(
        [("e0", 1, -6.3, 106.6)],
        "query_point_id string, seq int, lat double, lon double",
    )
    with pytest.raises(ValueError, match="nearest_n"):
        geofence_status(tracks, fences, fence_broadcast_threshold=1)


class TestFencePolygons:
    def _fences(self, spark):
        rows = [(i, -7.5 + 0.1 * i, 110.4 + 0.07 * i, 0.5 + 0.25 * (i % 3))
                for i in range(6)]
        return spark.createDataFrame(
            rows, "fence_id long, lat double, lon double, radius_km double"
        )

    def test_vertices_at_radius_closed_ccw(self, spark):
        from osm_search_spark.functions.geodesy import haversine_km
        from osm_search_spark.operators.geofence import fence_polygons

        out = fence_polygons(self._fences(spark), n_vertices=24)
        ex = out.select(
            "fence_id", "lat", "lon", "radius_km",
            F.explode(F.arrays_zip("ring_lat", "ring_lon")).alias("v"),
        ).select(
            "fence_id", "radius_km",
            haversine_km("lat", "lon", F.col("v.ring_lat"), F.col("v.ring_lon")).alias("d"),
        )
        bad = ex.filter(F.abs(F.col("d") - F.col("radius_km")) > 1e-7).count()
        assert bad == 0
        rows = out.collect()
        for r in rows:
            assert len(r["ring_lat"]) == 25
            assert r["ring_lat"][0] == r["ring_lat"][-1]
            assert r["ring_lon"][0] == r["ring_lon"][-1]
            s = sum(
                r["ring_lon"][i] * r["ring_lat"][i + 1]
                - r["ring_lon"][i + 1] * r["ring_lat"][i]
                for i in range(24)
            )
            assert s > 0  # CCW

    def test_center_inside_and_clips(self, spark):
        from osm_search_spark.operators.clip import clip_to_tiles
        from osm_search_spark.operators.geofence import fence_polygons

        ring = fence_polygons(self._fences(spark), n_vertices=16).select(
            F.col("fence_id").alias("polygon_id"), "lat", "lon",
            "ring_lat", "ring_lon",
        )
        rows = ring.collect()
        for r in rows:
            # even-odd containment of the center
            inside = False
            la, lo = r["ring_lat"], r["ring_lon"]
            for i in range(len(la) - 1):
                if (la[i] > r["lat"]) != (la[i + 1] > r["lat"]):
                    x = lo[i] + (r["lat"] - la[i]) * (lo[i + 1] - lo[i]) / (la[i + 1] - la[i])
                    if x > r["lon"]:
                        inside = not inside
            assert inside
        # composes with the clip stack: area conserved across tiles
        clipped = clip_to_tiles(ring.drop("lat", "lon"), res=10).collect()
        def shoe(lat, lon):
            return abs(sum(lon[i] * lat[i + 1] - lon[i + 1] * lat[i]
                           for i in range(len(lat) - 1))) / 2
        by_poly = {}
        for c in clipped:
            by_poly.setdefault(c["polygon_id"], 0.0)
            by_poly[c["polygon_id"]] += shoe(c["ring_lat"], c["ring_lon"])
        for r in rows:
            assert by_poly[r["polygon_id"]] == pytest.approx(
                shoe(r["ring_lat"], r["ring_lon"]), rel=1e-9
            )
