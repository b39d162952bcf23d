"""Geofence status matrix vs the reference README example and
pkg/geofence/geofence.go:97-116 transition semantics."""

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
