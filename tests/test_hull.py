import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.hull import convex_hull, hull_py


def gift_wrap(points):
    """Independent hull: Jarvis march (gift wrapping), strict turns —
    a different algorithm than the operator's monotone chain."""
    ps = sorted(set(points))
    if len(ps) <= 2:
        return ps
    start = ps[0]  # lexicographic min
    hull = [start]
    cur = start
    while True:
        cand = None
        for p in ps:
            if p == cur:
                continue
            if cand is None:
                cand = p
                continue
            c = (cand[0] - cur[0]) * (p[1] - cur[1]) - (
                cand[1] - cur[1]
            ) * (p[0] - cur[0])
            far = (
                (p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
                > (cand[0] - cur[0]) ** 2 + (cand[1] - cur[1]) ** 2
            )
            # keep the most clockwise candidate; on ties the farther one
            if c < 0 or (c == 0 and far):
                cand = p
        if cand == start:
            break
        hull.append(cand)
        cur = cand
    return hull


def lattice(g, n):
    pts = []
    for i in range(n):
        x = (g * 37 + i * 101 + i * i * 13) % 64
        y = (g * 53 + i * 29 + i * i * 7) % 64
        pts.append((110.25 + x / 64.0, -7.5 + y / 64.0))
    return pts


def test_kernel_matches_gift_wrap():
    for g in range(8):
        pts = lattice(g, 30)
        chain = hull_py(pts)
        wrap = gift_wrap(pts)
        # the march's "most clockwise next candidate" selection walks
        # the ring CCW from the same start as the chain
        assert chain == wrap, g


def test_kernel_degenerate():
    assert hull_py([(1.0, 2.0)]) == [(1.0, 2.0)]
    assert hull_py([(1.0, 2.0), (1.0, 2.0)]) == [(1.0, 2.0)]
    # all collinear -> the two extremes
    assert hull_py([(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.5, 0.5)]) == [
        (0.0, 0.0),
        (2.0, 2.0),
    ]
    # collinear point on a hull edge is excluded
    assert hull_py([(0.0, 0.0), (2.0, 0.0), (1.0, 0.0), (1.0, 1.0)]) == [
        (0.0, 0.0),
        (2.0, 0.0),
        (1.0, 1.0),
    ]


def inside_or_on(hull, p):
    n = len(hull)
    if n == 1:
        return p == hull[0]
    for i in range(n):
        a, b = hull[i], hull[(i + 1) % n]
        c = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        if c < 0:
            return False
    return True


@pytest.fixture(scope="module")
def clusters(spark):
    rows = []
    for g in range(5):
        for x, y in lattice(g, 25):
            rows.append((g, y, x))
    rows.append((9, -7.0, 111.0))  # singleton group
    return spark.createDataFrame(rows, "g long, lat double, lon double")


def test_operator_properties(spark, clusters):
    out = {r.g: r for r in convex_hull(clusters, group="g").collect()}
    assert set(out) == {0, 1, 2, 3, 4, 9}
    assert out[9].n_vertices == 1
    pts = clusters.collect()
    for g, r in out.items():
        hull = list(zip(r.hull_lons, r.hull_lats))
        assert r.n_vertices == len(hull)
        if len(hull) >= 3:
            # CCW: positive signed area
            area = sum(
                hull[i][0] * hull[(i + 1) % len(hull)][1]
                - hull[(i + 1) % len(hull)][0] * hull[i][1]
                for i in range(len(hull))
            )
            assert area > 0, g
        # canonical start: lexicographic min (lon, lat)
        assert hull[0] == min(hull)
        # every input point of the group is inside or on the hull
        for p in pts:
            if p.g == g:
                assert inside_or_on(hull, (p.lon, p.lat)), (g, p)


def test_partition_invariance(spark, clusters):
    base = convex_hull(clusters, group="g").collect()
    shuffled = convex_hull(
        clusters.repartition(7, "lat"), group="g"
    ).collect()
    key = lambda r: r.g
    assert sorted(
        [(r.g, r.hull_lats, r.hull_lons) for r in base]
    ) == sorted([(r.g, r.hull_lats, r.hull_lons) for r in shuffled])


def test_two_level_prune_reduces(spark):
    # the local stage must shrink a dense single-group cloud: hull of a
    # 1000-point cloud has far fewer vertices than points, and the merge
    # sees only local hull points (asserted indirectly: result correct
    # over many partitions)
    rows = [
        (1, -7.5 + ((i * 29 + i * i * 7) % 997) / 997.0,
         110.0 + ((i * 101 + i * i * 13) % 991) / 991.0)
        for i in range(1000)
    ]
    df = spark.createDataFrame(
        rows, "g long, lat double, lon double"
    ).repartition(16)
    out = convex_hull(df, group="g").collect()
    assert len(out) == 1
    hull = list(zip(out[0].hull_lons, out[0].hull_lats))
    exp = hull_py([(lo, la) for _, la, lo in rows])
    assert hull == exp
