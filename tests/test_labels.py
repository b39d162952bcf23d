"""Polygon labeling points: centroid exactness on rectangles, hole
subtraction, and the point-on-surface interiority guarantee."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions import geometry as G
from osm_search_spark.functions.labels import centroid, point_on_surface
from osm_search_spark.sources import synth


def _with_labels(df, holes=False):
    h = ("holes_lat", "holes_lon") if holes else (None, None)
    clat, clon = centroid("ring_lat", "ring_lon", *h)
    plat, plon = point_on_surface("ring_lat", "ring_lon", *h)
    return df.select(
        "polygon_id",
        clat.alias("clat"), clon.alias("clon"),
        plat.alias("pos_lat"), plon.alias("pos_lon"),
    )


def test_rectangle_centroid_is_center(spark):
    rows = _with_labels(
        synth.admin_polygons(spark).filter(F.col("admin_level") == 6)
    ).collect()
    polys = {p["polygon_id"]: p for p in synth.admin_polygons(spark).collect()}
    for r in rows:
        p = polys[r["polygon_id"]]
        assert r["clat"] == pytest.approx((p["minlat"] + p["maxlat"]) / 2, abs=1e-12)
        assert r["clon"] == pytest.approx((p["minlon"] + p["maxlon"]) / 2, abs=1e-12)
        # rectangle: POS == center too
        assert r["pos_lat"] == pytest.approx(r["clat"], abs=1e-12)
        assert r["pos_lon"] == pytest.approx(r["clon"], abs=1e-12)


def test_donut_centroid_shifts_and_pos_avoids_hole(spark):
    donuts = synth.donut_polygons_df(spark)
    rows = {r["polygon_id"]: r for r in _with_labels(donuts, holes=True).collect()}
    geo = {r["polygon_id"]: r for r in donuts.collect()}
    for pid, r in rows.items():
        g = geo[pid]
        rl, rn = G.close_ring(np.array(g["ring_lat"]), np.array(g["ring_lon"]))
        holes = [
            G.close_ring(np.array(a), np.array(b))
            for a, b in zip(g["holes_lat"], g["holes_lon"])
        ]
        inside = G.points_in_polygon_with_holes(
            np.array([r["pos_lat"]]), np.array([r["pos_lon"]]), rl, rn, holes
        )
        assert inside[0], (pid, r["pos_lat"], r["pos_lon"])
    # donut 0: hole is off-center toward the west -> centroid shifts EAST
    # of the plain-rectangle center
    g0 = geo[0]
    rect_clon = (min(g0["ring_lon"]) + max(g0["ring_lon"])) / 2
    assert rows[0]["clon"] > rect_clon


def test_concave_pos_inside_where_centroid_may_not_be(spark):
    polys = synth.concave_polygons_df(spark)
    rows = _with_labels(polys).collect()
    geo = {r["polygon_id"]: r for r in polys.collect()}
    for r in rows:
        g = geo[r["polygon_id"]]
        rl, rn = G.close_ring(np.array(g["ring_lat"]), np.array(g["ring_lon"]))
        inside = G.points_in_polygon(
            np.array([r["pos_lat"]]), np.array([r["pos_lon"]]), rl, rn
        )
        assert inside[0], (r["polygon_id"], r["pos_lat"], r["pos_lon"])
