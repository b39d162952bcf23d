"""Exact DBSCAN semantics on planted fixtures (operators/dbscan.py).

Geometry is laid out in the fixture band (lat ~ -7.7) on a 0.001-degree
scale with eps = 0.0015, min_pts = 3 unless stated. With LON_SCALE =
0.991, lon deltas scale by ~0.991 — spacings are chosen far from the
eps boundary so the intended adjacency is unambiguous."""

import pytest

from osm_search_spark.operators.dbscan import dbscan, pick_res

EPS = 0.0015
BASE_LAT, BASE_LON = -7.70, 110.50


def _pts(spark, rows):
    return spark.createDataFrame(
        [(i, BASE_LAT + dy, BASE_LON + dx) for i, dy, dx in rows],
        "point_id long, lat double, lon double",
    )


def _run(spark, rows, eps=EPS, min_pts=3):
    out = dbscan(_pts(spark, rows), eps, min_pts)
    return {
        r["point_id"]: (r["role"], r["cluster_id"])
        for r in out.collect()
    }


def test_single_cluster_core_border_noise(spark):
    # 0,1,2 mutually within eps (triangle, spacing 0.001) -> each has 2
    # neighbors + self = 3 = min_pts -> all core.
    # 3 is within eps of 2 only -> 1 neighbor -> border of the cluster.
    # 4 is isolated -> noise.
    rows = [
        (0, 0.0, 0.0),
        (1, 0.001, 0.0),
        (2, 0.0, 0.001),
        (3, 0.0, 0.0023),  # 0.0013 deg lon from 2: within eps of 2 only
        (4, 0.02, 0.02),
    ]
    got = _run(spark, rows)
    assert got[0] == ("core", 0)
    assert got[1] == ("core", 0)
    assert got[2] == ("core", 0)
    assert got[3] == ("border", 0)
    assert got[4] == ("noise", None)


def test_chain_connectivity_merges_clusters(spark):
    # two tight triangles whose nearest cores are within eps of each
    # other -> ONE cluster labeled by the min core id
    tri = [(0.0, 0.0), (0.001, 0.0), (0.0, 0.001)]
    rows = [(i, dy, dx) for i, (dy, dx) in enumerate(tri)]
    rows += [(10 + i, dy, dx + 0.0012) for i, (dy, dx) in enumerate(tri)]
    got = _run(spark, rows)
    assert all(got[i] == ("core", 0) for i in got)


def test_border_tie_breaks_to_min_cluster(spark):
    # min_pts=4: two separated tight 4-point squares (each member has 3
    # neighbors + self = 4 -> core); one extra point within eps of
    # exactly one core from EACH square (2 neighbors + self = 3 < 4 ->
    # NOT core) -> border, assigned to the min cluster id
    sq = [(0.0, 0.0), (0.001, 0.0), (0.0, 0.001), (0.001, 0.001)]
    rows = [(i, dy, dx) for i, (dy, dx) in enumerate(sq)]
    rows += [(10 + i, dy, dx + 0.0028) for i, (dy, dx) in enumerate(sq)]
    # bridge -> 2 (0.0, 0.001) and -> 10 (0.0, 0.0028), symmetric:
    # sqrt(0.0012^2 + (0.0009*0.991)^2) = 0.001495 < eps; every other
    # point is farther (dlat >= 0.0022 or dlon >= 0.0019).
    rows.append((20, -0.0012, 0.0019))
    got = _run(spark, rows, min_pts=4)
    assert got[0][1] == 0 and got[10][1] == 10  # two distinct clusters
    assert got[20] == ("border", 0)


def test_min_pts_two_pairs_are_clusters(spark):
    # min_pts=2: any within-eps pair is two cores
    rows = [(0, 0.0, 0.0), (1, 0.001, 0.0), (2, 0.05, 0.05)]
    got = _run(spark, rows, min_pts=2)
    assert got[0] == ("core", 0)
    assert got[1] == ("core", 0)
    assert got[2] == ("noise", None)


def test_validation(spark):
    df = _pts(spark, [(0, 0.0, 0.0)])
    with pytest.raises(ValueError):
        dbscan(df, EPS, 1)
    with pytest.raises(ValueError):
        dbscan(df, 0.0, 3)
    with pytest.raises(ValueError):
        dbscan(df, EPS, 3, res=pick_res(EPS) + 1)  # cell edge < eps reach


def test_ring_cover_is_complete_across_cell_edges(spark):
    # two points straddling a cell boundary at the chosen res, closer
    # than eps -> must still pair up (k_ring candidate completeness)
    res = pick_res(EPS)
    size = 180.0 / (1 << res)
    # place one point just left of a lon cell edge, one just right
    edge_lon = (int((BASE_LON + 180.0) / size) + 1) * size - 180.0
    rows = [
        (0, 0.0, edge_lon - BASE_LON - 0.0001),
        (1, 0.0, edge_lon - BASE_LON + 0.0001),
    ]
    got = _run(spark, rows, min_pts=2)
    assert got[0] == ("core", 0)
    assert got[1] == ("core", 0)


def test_pick_res_degenerate_grid_clamped(spark):
    """ADVICE r08: eps large enough that reach > 90 deg used to pick
    res 0 (nx=2), where the dx=+1 forward probes from ix=0 and ix=1 wrap
    onto each other and every cross-column pair is emitted twice by the
    symmetrizing explode. pick_res must clamp to res >= 1, and a
    huge-eps run must still count each neighbor once (3 points all
    mutually in range -> all cores of one cluster, not double-counted)."""
    assert pick_res(100.0) >= 1
    assert pick_res(1e9) >= 1
    # reach > 90 deg now raises (res-0 grids no longer reachable) ...
    with pytest.raises(ValueError):
        _run(spark, [(0, 0.0, 0.0)], eps=100.0, min_pts=2)
    # ... while the largest valid reach (90 deg at res 1, nx=4: forward
    # probes distinct from sources) still counts each neighbor once
    from osm_search_spark.operators.dbscan import LON_SCALE

    out = _run(
        spark,
        [(0, 0.0, 0.0), (1, 0.0, 0.001), (2, 0.001, 0.0)],
        eps=89.9 * LON_SCALE,
        min_pts=3,
    )
    assert out == {0: ("core", 0), 1: ("core", 0), 2: ("core", 0)}
