"""Grid-cell index invariants (replaces the reference's R-tree property
tests, pkg/datastructure/rtree_test.go:14-61 — our 'index' is arithmetic,
so the invariants are encode/decode + containment + ring coverage)."""

import numpy as np
from pyspark.sql import functions as F

from osm_search_spark.functions import cells as C


def test_np_roundtrip_bounds():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89, 89, 1000)
    lon = rng.uniform(-180, 180, 1000)
    for res in (8, 12, 14, 16):
        cell = C.np_latlng_to_cell(lat, lon, res)
        minlat, minlon, maxlat, maxlon = C.np_cell_bounds(cell)
        assert (lat >= minlat).all() and (lat <= maxlat).all()
        assert (lon >= minlon).all() and (lon <= maxlon).all()
        size = C.cell_size_deg(res)
        assert np.allclose(maxlat - minlat, size)


def test_column_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = [
        (float(la), float(lo))
        for la, lo in zip(rng.uniform(-89, 89, 500), rng.uniform(-180, 180, 500))
    ]
    df = spark.createDataFrame(rows, "lat double, lon double")
    for res in (10, 14):
        got = np.array(
            df.select(C.latlng_to_cell("lat", "lon", res).alias("c"))
            .toPandas()["c"]
        )
        lat = np.array([r[0] for r in rows])
        lon = np.array([r[1] for r in rows])
        assert (got == C.np_latlng_to_cell(lat, lon, res)).all()


def test_parent_child(spark):
    df = spark.createDataFrame([(-7.55, 110.78)], "lat double, lon double")
    child = df.select(C.latlng_to_cell("lat", "lon", 14).alias("c"))
    parent = child.select(C.cell_to_parent("c", 12).alias("p")).collect()[0]["p"]
    direct = df.select(C.latlng_to_cell("lat", "lon", 12).alias("p")).collect()[0]["p"]
    assert parent == direct


def test_k_ring_size_and_membership(spark):
    df = spark.createDataFrame([(-7.55, 110.78)], "lat double, lon double")
    cell_df = df.select(C.latlng_to_cell("lat", "lon", 14).alias("c"))
    for k in (1, 2, 3):
        ring = cell_df.select(F.explode(C.k_ring("c", k, 14)).alias("r")).collect()
        ids = {r["r"] for r in ring}
        assert len(ids) == (2 * k + 1) ** 2
        assert cell_df.collect()[0]["c"] in ids


def test_bbox_cover_superset():
    # every point inside the bbox must land in a covered cell
    rng = np.random.default_rng(3)
    lat = rng.uniform(-7.9, -7.4, 2000)
    lon = rng.uniform(110.2, 110.9, 2000)
    cover = set(C.bbox_cover(-7.9, 110.2, -7.4, 110.9, 12).tolist())
    cells = C.np_latlng_to_cell(lat, lon, 12)
    assert set(cells.tolist()) <= cover


def test_cell_center_inside(spark):
    df = spark.createDataFrame([(-7.55, 110.78)], "lat double, lon double")
    row = (
        df.select(C.latlng_to_cell("lat", "lon", 14).alias("c"))
        .select(F.col("c"), C.cell_center("c").alias("ctr"))
        .collect()[0]
    )
    minlat, minlon, maxlat, maxlon = C.np_cell_bounds(np.array([row["c"]]))
    assert minlat[0] <= row["ctr"]["lat"] <= maxlat[0]
    assert minlon[0] <= row["ctr"]["lon"] <= maxlon[0]


def test_annulus_union_covers_square_exactly(spark):
    """Load-bearing kNN invariant: after rounds at radii 1, 4, 16, 64 (x4
    growth, coarse-parent escalation), the union of the explored coarse
    cells' BASE cells must cover every base cell within Chebyshev distance
    of the final radius — the finalization bound is only sound if coverage
    is complete."""
    import numpy as np
    from pyspark.sql import functions as F

    from osm_search_spark.functions import cells as C
    from osm_search_spark.operators.knn import _coarse_scale

    res = 14
    pix, piy = 16100, 8050
    one = spark.createDataFrame([(pix, piy)], "pix long, piy long")
    covered = set()
    r_prev = -1
    for r in (1, 4, 16, 64):
        e = _coarse_scale(r)
        ids = one.select(
            C.annulus_cells(F.col("pix"), F.col("piy"), r, r_prev, e, res).alias("a")
        ).collect()[0]["a"]
        rc = res - e
        for cid in ids:
            cix = (cid % C.RES_BITS_SHIFT) // C.IX_SHIFT
            ciy = cid % C.IX_SHIFT
            for bx in range(cix << e, ((cix + 1) << e)):
                for by in range(ciy << e, ((ciy + 1) << e)):
                    covered.add((bx, by))
        r_prev = r
    R = 64
    want = {
        (x, y)
        for x in range(pix - R, pix + R + 1)
        for y in range(piy - R, piy + R + 1)
    }
    missing = want - covered
    assert not missing, f"{len(missing)} base cells uncovered, e.g. {sorted(missing)[:5]}"
