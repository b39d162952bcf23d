"""Space-filling-curve keys: round-trip, adjacency, three-way parity
(Column ↔ numpy ↔ DuckDB), and the bbox range planner's exactness."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.functions import sfc


def test_hilbert_roundtrip():
    rng = np.random.RandomState(7)
    for nbits in (1, 2, 5, 15, 29):
        n = np.int64(1) << nbits
        x = rng.randint(0, int(n), size=500).astype(np.int64)
        y = rng.randint(0, int(min(n, np.int64(1) << max(nbits - 1, 1))), size=500).astype(np.int64)
        d = sfc.np_xy2d(x, y, nbits)
        assert d.min() >= 0 and d.max() < np.int64(1) << (2 * nbits)
        rx, ry = sfc.np_d2xy(d, nbits)
        np.testing.assert_array_equal(rx, x)
        np.testing.assert_array_equal(ry, y)


def test_hilbert_small_order():
    # The canonical 2x2 curve: (0,0) -> (0,1) -> (1,1) -> (1,0)
    x, y = sfc.np_d2xy(np.arange(4), 1)
    assert list(zip(x.tolist(), y.tolist())) == [(0, 0), (0, 1), (1, 1), (1, 0)]


def test_hilbert_adjacency_exhaustive():
    # Consecutive keys are 4-neighbors, and the curve visits every cell
    # exactly once (exhaustive at nbits=5: 1024 cells).
    nbits = 5
    d = np.arange(1 << (2 * nbits), dtype=np.int64)
    x, y = sfc.np_d2xy(d, nbits)
    assert len(set(zip(x.tolist(), y.tolist()))) == d.size
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    np.testing.assert_array_equal(step, np.ones(d.size - 1))


def test_morton_numpy_known():
    # interleave: x=0b11, y=0b01 -> z = 0b1011 = 11
    assert sfc.np_morton(np.array([3]), np.array([1]))[0] == 11
    assert sfc.np_morton(np.array([0]), np.array([0]))[0] == 0
    # top bit of a 29-bit x lands at position 57
    assert sfc.np_morton(np.array([1 << 28]), np.array([0]))[0] == 1 << 57


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.RandomState(11)
    rows = [
        (int(i), float(lat), float(lon))
        for i, (lat, lon) in enumerate(
            zip(rng.uniform(-89, 89, 400), rng.uniform(-179.9, 179.9, 400))
        )
    ]
    return spark.createDataFrame(rows, "point_id long, lat double, lon double")


def test_column_vs_numpy_parity(spark, pts):
    res = 14
    df = pts.withColumn("cell_id", C.latlng_to_cell("lat", "lon", res))
    df = sfc.with_hilbert_key(df, "cell_id", res=res, out="hkey")
    got = (
        df.withColumn("zkey", sfc.morton_key("cell_id", res))
        .select("point_id", "cell_id", "hkey", "zkey")
        .toPandas()
        .sort_values("point_id")
    )
    ix = ((got["cell_id"] % C.RES_BITS_SHIFT) // C.IX_SHIFT).to_numpy()
    iy = (got["cell_id"] % C.IX_SHIFT).to_numpy()
    np.testing.assert_array_equal(
        got["hkey"].to_numpy(), sfc.np_xy2d(ix, iy, res + 1)
    )
    np.testing.assert_array_equal(got["zkey"].to_numpy(), sfc.np_morton(ix, iy))


def test_duckdb_twin_parity():
    res = 6
    rng = np.random.RandomState(3)
    nx, ny = 2 << res, 1 << res
    x = rng.randint(0, nx, 300).astype(np.int64)
    y = rng.randint(0, ny, 300).astype(np.int64)
    con = duckdb.connect()
    con.execute("create table g as select * from (values " + ",".join(
        f"({i},{int(a)},{int(b)})" for i, (a, b) in enumerate(zip(x, y))
    ) + ") t(id, ix, iy)")
    hc, hf = sfc.hilbert_cte_sql("g", "id", "ix", "iy", res)
    hd = con.execute(f"with {hc} {hf} order by id").fetchnumpy()["hkey"]
    np.testing.assert_array_equal(hd, sfc.np_xy2d(x, y, res + 1))
    mc, mf = sfc.morton_cte_sql("g", "id", "ix", "iy")
    zd = con.execute(f"with {mc} {mf} order by id").fetchnumpy()["zkey"]
    np.testing.assert_array_equal(zd, sfc.np_morton(x, y))


def test_bbox_ranges_exact():
    # Union of planner ranges == exact key set of the bbox cells — nothing
    # missing, nothing extra (exhaustive over a small grid).
    res = 4
    bbox = (-20.0, 10.0, 35.0, 80.0)
    ix0, ix1, iy0, iy1 = sfc.bbox_cell_bounds(res, *bbox)
    want = set()
    for ix in range(ix0, ix1 + 1):
        for iy in range(iy0, iy1 + 1):
            want.add(int(sfc.np_xy2d(np.array([ix]), np.array([iy]), res + 1)[0]))
    ranges = sfc.bbox_key_ranges(res, *bbox, curve="hilbert")
    got = set()
    for lo, hi in ranges:
        got.update(range(lo, hi + 1))
    assert got == want
    # merged: strictly fewer ranges than cells, and sorted/disjoint
    assert len(ranges) < len(want)
    assert all(r0[1] < r1[0] for r0, r1 in zip(ranges, ranges[1:]))


def test_locality_ordering():
    # Two complementary locality metrics over a deterministic bbox sample:
    # (1) merged key ranges (≈ row-group seeks on a key-sorted layout):
    #     Hilbert strictly beats Morton. Row-major scores LOW here too
    #     (one contiguous iy-run per bbox column) — but its runs are 2^29
    #     apart, which metric (2) exposes.
    # (2) range-partitions touched (rank-based blocks over all occupied
    #     cells, P=256): Hilbert ≈ Morton ≪ row-major — the metric that
    #     governs shuffle fan-in / file pruning at cluster scale.
    rng = np.random.RandomState(5)
    res = 12
    ranges_tot = {"hilbert": 0, "morton": 0, "rowmajor": 0}
    for _ in range(20):
        lat = rng.uniform(-60, 55)
        lon = rng.uniform(-170, 165)
        dlat = rng.uniform(0.3, 1.5)
        dlon = rng.uniform(0.3, 1.5)
        for curve in ranges_tot:
            ranges_tot[curve] += len(
                sfc.bbox_key_ranges(res, lat, lon, lat + dlat, lon + dlon, curve=curve)
            )
    assert ranges_tot["hilbert"] < ranges_tot["morton"]

    res, parts = 9, 256
    nx, ny = 2 << res, 1 << res
    gx, gy = np.meshgrid(
        np.arange(nx, dtype=np.int64), np.arange(ny, dtype=np.int64), indexing="ij"
    )
    gx, gy = gx.ravel(), gy.ravel()
    full = {
        "hilbert": np.sort(sfc.np_xy2d(gx, gy, res + 1)),
        "morton": np.sort(sfc.np_morton(gx, gy)),
        "rowmajor": np.sort(gx * np.int64(C.IX_SHIFT) + gy),
    }
    n_cells = gx.size
    rng = np.random.RandomState(5)
    touched = {c: 0 for c in full}
    for _ in range(20):
        x0 = rng.randint(0, nx - 40)
        y0 = rng.randint(0, ny - 40)
        w, h = rng.randint(6, 36), rng.randint(6, 36)
        bx, by = np.meshgrid(
            np.arange(x0, x0 + w, dtype=np.int64),
            np.arange(y0, y0 + h, dtype=np.int64),
            indexing="ij",
        )
        bx, by = bx.ravel(), by.ravel()
        bk = {
            "hilbert": sfc.np_xy2d(bx, by, res + 1),
            "morton": sfc.np_morton(bx, by),
            "rowmajor": bx * np.int64(C.IX_SHIFT) + by,
        }
        for c in full:
            ranks = np.searchsorted(full[c], bk[c])
            touched[c] += len(np.unique(ranks // (n_cells // parts)))
    assert touched["hilbert"] <= touched["morton"]
    assert touched["hilbert"] * 2 < touched["rowmajor"]


def test_quadtree_prefix_property():
    # parent key == child key >> 2 — what makes coarse planning (plan_res)
    # sound for both curves.
    rng = np.random.RandomState(1)
    for nbits in (6, 13):
        x = rng.randint(0, 1 << nbits, 1000).astype(np.int64)
        y = rng.randint(0, 1 << (nbits - 1), 1000).astype(np.int64)
        for e in (1, 3):
            np.testing.assert_array_equal(
                sfc.np_xy2d(x, y, nbits) >> (2 * e),
                sfc.np_xy2d(x >> e, y >> e, nbits - e),
            )
            np.testing.assert_array_equal(
                sfc.np_morton(x, y) >> (2 * e), sfc.np_morton(x >> e, y >> e)
            )


def test_fold_expr_matches_chain(spark, pts):
    # hilbert_key_expr (fold, filter-safe) == with_hilbert_key (chained
    # codegen projections, write path) — same key, two plan shapes.
    # (compared driver-side: a Filter referencing the chain column IS the
    # hazard this pair of implementations exists to avoid)
    res = 12
    df = pts.withColumn("cell_id", C.latlng_to_cell("lat", "lon", res))
    got = (
        sfc.with_hilbert_key(df, "cell_id", res=res, out="hkey")
        .withColumn("hfold", sfc.hilbert_key_expr("cell_id", res))
        .select("hkey", "hfold")
        .toPandas()
    )
    assert (got["hkey"] == got["hfold"]).all()


def test_key_range_filter_matches_bbox(spark, pts):
    # Coarse-planned range prefilter + exact refine == plain bbox
    # predicate. The filter uses the FOLD key expression — a filter above
    # the chained projections is the documented exponential-pushdown
    # hazard (sfc.py), which this test originally reproduced as an
    # optimizer hang.
    res = 10
    bbox = (-30.0, -60.0, 10.0, 20.0)
    df = pts.withColumn("cell_id", C.latlng_to_cell("lat", "lon", res))
    ranges = sfc.bbox_key_ranges(res, *bbox, curve="hilbert", plan_res=5)
    assert len(ranges) <= sfc.MAX_FILTER_RANGES
    exact = (
        (F.col("lat") >= bbox[0]) & (F.col("lon") >= bbox[1])
        & (F.col("lat") <= bbox[2]) & (F.col("lon") <= bbox[3])
    )
    key = sfc.hilbert_key_expr("cell_id", res)
    via_ranges = sorted(
        r.point_id
        for r in df.filter(sfc.key_range_filter(key, ranges)).filter(exact).collect()
    )
    plain = sorted(r.point_id for r in df.filter(exact).collect())
    assert via_ranges == plain and len(plain) > 0
