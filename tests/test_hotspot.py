"""Grid-density hotspot clustering — planted blobs, cluster separation,
singleton labels, and the density threshold."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.operators.hotspot import hotspot_clusters

RES = 13
SIZE = C.cell_size_deg(RES)


def _blob(c_lat, c_lon, n, spread_cells):
    """n points deterministically spread over a spread_cells-wide block."""
    out = []
    for i in range(n):
        out.append(
            (
                c_lat + SIZE * spread_cells * ((i * 31) % 97) / 97.0,
                c_lon + SIZE * spread_cells * ((i * 17) % 89) / 89.0,
            )
        )
    return out


def test_two_blobs_two_clusters_sparse_ignored(spark):
    # blob A: 3x3 cells, ~55 points per cell; blob B: 2x2 cells far away;
    # blob C: too sparse to be dense anywhere
    rows = (
        _blob(-7.70, 110.50, 1500, 3)
        + _blob(-6.20, 111.80, 700, 2)
        + _blob(-5.00, 109.00, 40, 4)
    )
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = hotspot_clusters(df, res=RES, min_count=25).collect()
    clusters = {}
    for r in out:
        clusters.setdefault(r["cluster_id"], []).append(r["cell_id"])
    assert len(clusters) == 2  # A and B; C never dense
    sizes = sorted(len(v) for v in clusters.values())
    # blobs straddle cell boundaries, so exact counts depend on
    # alignment; the 3x3-spread blob must be the bigger cluster
    assert sizes[0] >= 4 and sizes[1] > sizes[0]
    # labels are the min member cell id
    for cid, members in clusters.items():
        assert cid == min(members)
    # every dense cell meets the threshold
    assert all(r["n_points"] >= 25 for r in out)


def test_isolated_dense_cell_is_singleton(spark):
    # one tight blob inside ONE cell plus scattered noise
    rows = [(-7.7 + SIZE * 0.4, 110.5 + SIZE * 0.4)] * 30 + [
        (-6.0 + 0.5 * k, 108.0 + 0.3 * k) for k in range(10)
    ]
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = hotspot_clusters(df, res=RES, min_count=25).collect()
    assert len(out) == 1
    assert out[0]["cluster_id"] == out[0]["cell_id"]
    assert out[0]["n_points"] == 30


def test_min_count_validation(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    with pytest.raises(ValueError):
        hotspot_clusters(df, min_count=0)
