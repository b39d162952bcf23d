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


def _misaligned_two_source(spark, shift=1e-10):
    """Two unit squares that SHOULD share the lon=1 border, but source B's
    copy of the border sits `shift` degrees east (the two-agencies case —
    violates the noded-coverage contract)."""
    return spark.createDataFrame(
        [
            ("k", [0.0, 0.0, 1.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0, 0.0]),
            (
                "k",
                [0.0, 1.0, 1.0, 0.0, 0.0],
                [1.0 + shift, 1.0 + shift, 2.0, 2.0, 1.0 + shift],
            ),
        ],
        "group_key string, ring_lat array<double>, ring_lon array<double>",
    )


def test_dissolve_misaligned_fails_loud_without_snap(spark):
    # interior border doesn't bit-match -> both copies survive -> the
    # near-duplicate-vertex validator raises (inline raise_error, fires
    # at materialization) instead of silently keeping a doubled border
    with pytest.raises(Exception, match="snap_res"):
        dissolve_edges(_misaligned_two_source(spark)).collect()


def test_dissolve_misaligned_snap_res_nodes_and_dissolves(spark):
    # snap_res=30 (lattice ~1.7e-7 deg) puts both copies of the border on
    # the same lattice points -> cancellation works, one 1x2 rectangle
    rings = dissolve(_misaligned_two_source(spark), snap_res=30).collect()
    assert len(rings) == 1 and not rings[0]["is_hole"]
    pts = set(zip(rings[0]["ring_lat"], rings[0]["ring_lon"]))
    for clat, clon in [(0.0, 0.0), (0.0, 2.0), (1.0, 2.0), (1.0, 0.0)]:
        assert any(
            abs(p[0] - clat) < 2e-7 and abs(p[1] - clon) < 2e-7 for p in pts
        ), (clat, clon)
    # the interior border EDGE is gone (collinear pass-through vertices at
    # lon~1 are kept by contract): no surviving edge runs along lon~1
    edges = dissolve_edges(
        _misaligned_two_source(spark), snap_res=30
    ).collect()
    assert not any(
        0.5 < e["alon"] < 1.5 and 0.5 < e["blon"] < 1.5 for e in edges
    )


def test_dissolve_snap_res_noop_on_aligned_coverage(spark):
    # an already-noded coverage on lattice-representable coords dissolves
    # to the same ring multiset with and without snapping at a fine res
    polys = _kec_with_city_key(spark)
    plain = {
        (r["group_key"], r["ring_id"], tuple(r["ring_lat"]), tuple(r["ring_lon"]))
        for r in dissolve(polys).collect()
    }
    snapped = dissolve(polys, snap_res=36).collect()
    # same group/ring structure; vertices within half a res-36 lattice step
    assert {(r["group_key"], r["ring_id"]) for r in snapped} == {
        (g, i) for g, i, _, _ in plain
    }
    step = 180.0 / (1 << 36)
    by_gr = {(g, i): (la, lo) for g, i, la, lo in plain}
    for r in snapped:
        la, lo = by_gr[(r["group_key"], r["ring_id"])]
        assert len(la) == len(r["ring_lat"])
        assert all(abs(a - b) <= step for a, b in zip(la, r["ring_lat"]))
        assert all(abs(a - b) <= step for a, b in zip(lo, r["ring_lon"]))


def test_dissolve_overlap_fails_loud(spark):
    # two IDENTICAL squares in one group: every edge appears twice in the
    # SAME direction (overlap, not a coverage) -> multiset validator raises
    sq = ([0.0, 0.0, 1.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0, 0.0])
    polys = spark.createDataFrame(
        [("k", *sq), ("k", *sq)],
        "group_key string, ring_lat array<double>, ring_lon array<double>",
    )
    with pytest.raises(Exception, match="not a planar coverage"):
        dissolve_edges(polys).collect()
