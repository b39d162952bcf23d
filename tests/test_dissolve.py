"""Vector dissolve/union-by-attribute: shared-edge cancellation + ring
chaining (operators/dissolve.py). The admin fixture is a noded coverage by
construction (kecamatan tile their city exactly), so dissolving kecamatan
by city key must reproduce each city polygon's geometry."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions import geodesy as GD
from osm_search_spark.operators.dissolve import dissolve, dissolve_edges
from osm_search_spark.sources import synth


def _kec_with_city_key(spark):
    polys = synth.admin_polygons(spark).filter(F.col("admin_level") == 7)
    return polys.withColumn(
        "group_key",
        F.concat(
            F.lit("kota_"),
            F.regexp_extract("name", "kecamatan_([0-9]+)_([0-9]+)_", 1),
            F.lit("_"),
            F.regexp_extract("name", "kecamatan_([0-9]+)_([0-9]+)_", 2),
        ),
    )


def test_dissolve_kecamatan_reproduces_cities(spark):
    rings = dissolve(_kec_with_city_key(spark)).collect()
    by_key = {}
    for r in rings:
        by_key.setdefault(r["group_key"], []).append(r)
    assert sorted(by_key) == ["kota_0_0", "kota_0_1", "kota_1_0", "kota_1_1"]
    # one outer ring per city, no holes
    assert all(len(v) == 1 and not v[0]["is_hole"] for v in by_key.values())

    cities = {
        r["name"]: r
        for r in synth.admin_polygons(spark)
        .filter(F.col("admin_level") == 6)
        .withColumn("area_km2", F.round(GD.ring_area_km2("ring_lat", "ring_lon"), 6))
        .withColumn("perim_km", F.round(GD.ring_perimeter_km("ring_lat", "ring_lon"), 6))
        .collect()
    }
    got = (
        spark.createDataFrame(
            [(r["group_key"], r["ring_lat"], r["ring_lon"]) for r in rings],
            "group_key string, ring_lat array<double>, ring_lon array<double>",
        )
        .withColumn("area_km2", F.round(GD.ring_area_km2("ring_lat", "ring_lon"), 6))
        .withColumn("perim_km", F.round(GD.ring_perimeter_km("ring_lat", "ring_lon"), 6))
        .collect()
    )
    for g in got:
        want = cities[g["group_key"]]
        assert g["area_km2"] == pytest.approx(want["area_km2"], abs=2e-6)
        # dissolved rings keep the T-junction vertices; haversine along a
        # PARALLEL is not additive through a mid-vertex (a parallel is not
        # a geodesic), so perimeter agrees to ~mm, not bit-exactly
        assert g["perim_km"] == pytest.approx(want["perim_km"], abs=1e-4)
        # dissolved ring passes through the city's 4 corners
        corners = set(zip(want["ring_lat"], want["ring_lon"]))
        assert corners <= set(zip(g["ring_lat"], g["ring_lon"]))


def test_dissolve_picture_frame_makes_hole(spark):
    # four noded rectangles forming a frame around a central 1x1 hole:
    # shared borders carry the T-junction vertices in BOTH rings
    def ring(pts):  # pts = [(lat, lon)] CCW, open
        closed = pts + [pts[0]]
        return [p[0] for p in closed], [p[1] for p in closed]

    frames = [
        ring([(0.0, 0.0), (0.0, 3.0), (1.0, 3.0), (1.0, 2.0), (1.0, 1.0), (1.0, 0.0)]),   # bottom
        ring([(2.0, 0.0), (2.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 3.0), (3.0, 0.0)]),   # top
        ring([(1.0, 0.0), (1.0, 1.0), (2.0, 1.0), (2.0, 0.0)]),                            # left
        ring([(1.0, 2.0), (1.0, 3.0), (2.0, 3.0), (2.0, 2.0)]),                            # right
    ]
    polys = spark.createDataFrame(
        [("frame", rl, rn) for rl, rn in frames],
        "group_key string, ring_lat array<double>, ring_lon array<double>",
    )
    rings = dissolve(polys).collect()
    assert len(rings) == 2
    outer = next(r for r in rings if not r["is_hole"])
    hole = next(r for r in rings if r["is_hole"])
    assert {(0.0, 0.0), (0.0, 3.0), (3.0, 3.0), (3.0, 0.0)} <= set(
        zip(outer["ring_lat"], outer["ring_lon"])
    )
    assert set(zip(hole["ring_lat"], hole["ring_lon"])) == {
        (1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0),
    }
    # surviving edge count: 12 outer segments (8 T-split + 4... per ring
    # construction) is implementation detail; the invariant is NO interior
    # edge survives: every surviving edge lies on the outer square or hole
    edges = dissolve_edges(polys).collect()
    for e in edges:
        on_outer = (
            e["alat"] in (0.0, 3.0) and e["blat"] in (0.0, 3.0)
        ) or (e["alon"] in (0.0, 3.0) and e["blon"] in (0.0, 3.0))
        on_hole = (
            e["alat"] in (1.0, 2.0)
            and e["blat"] in (1.0, 2.0)
            and e["alon"] in (1.0, 2.0)
            and e["blon"] in (1.0, 2.0)
        )
        assert on_outer or on_hole, e


def test_dissolve_disjoint_islands_two_rings(spark):
    polys = spark.createDataFrame(
        [
            ("isles", [0.0, 0.0, 1.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0, 0.0]),
            ("isles", [5.0, 5.0, 6.0, 6.0, 5.0], [5.0, 6.0, 6.0, 5.0, 5.0]),
        ],
        "group_key string, ring_lat array<double>, ring_lon array<double>",
    )
    rings = dissolve(polys).collect()
    assert len(rings) == 2
    assert not any(r["is_hole"] for r in rings)


def test_dissolve_cw_input_normalized(spark):
    # same two squares, one given CW — orientation normalization makes
    # cancellation direction-consistent
    polys = spark.createDataFrame(
        [
            ("k", [0.0, 0.0, 1.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0, 0.0]),  # CCW
            ("k", [0.0, 1.0, 1.0, 0.0, 0.0], [1.0, 1.0, 2.0, 2.0, 1.0]),  # CW
        ],
        "group_key string, ring_lat array<double>, ring_lon array<double>",
    )
    rings = dissolve(polys).collect()
    assert len(rings) == 1 and not rings[0]["is_hole"]
    # 1x2 rectangle: corners present, shared border (lon=1) cancelled
    pts = set(zip(rings[0]["ring_lat"], rings[0]["ring_lon"]))
    assert {(0.0, 0.0), (0.0, 2.0), (1.0, 2.0), (1.0, 0.0)} <= pts
