"""IDW interpolation: constant-field reproduction, nearest-sample
dominance, coverage = k-ring of samples."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.operators.interpolate import idw_interpolate

RES = 12


def test_constant_field_reproduced(spark):
    pts = spark.createDataFrame(
        [(0.01 * i, 110.0 + 0.013 * i, 7.5) for i in range(40)],
        "lat double, lon double, value double",
    )
    out = idw_interpolate(pts, RES, k=1).collect()
    assert out
    for r in out:
        assert r["value"] == pytest.approx(7.5, abs=1e-6)


def test_nearest_sample_dominates(spark):
    # one hot sample near a cell center, one cold far away in the ring
    size = C.cell_size_deg(RES)
    clat = (2000 + 0.5) * size - 90.0
    clon = (4000 + 0.5) * size - 180.0
    pts = spark.createDataFrame(
        [(clat + 1e-4, clon, 100.0), (clat + 1.8 * size, clon, 0.0)],
        "lat double, lon double, value double",
    )
    cell = RES * C.RES_BITS_SHIFT + 4000 * C.IX_SHIFT + 2000
    got = {r["cell_id"]: r for r in idw_interpolate(pts, RES, k=2).collect()}
    assert got[cell]["n_samples"] == 2
    assert got[cell]["value"] > 95.0  # near sample dominates


def test_coverage_is_kring_of_samples(spark):
    pts = spark.createDataFrame(
        [(0.0, 110.0, 1.0)], "lat double, lon double, value double"
    )
    out = idw_interpolate(pts, RES, k=2).collect()
    assert len(out) == 25  # (2k+1)^2 cells, all with n_samples == 1
    assert all(r["n_samples"] == 1 for r in out)
