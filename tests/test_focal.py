"""Focal statistics semantics on a planted grid (operators/focal.py)."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.operators.focal import focal_stats

RES = 13
# a grid-interior anchor cell in the fixture band
ANCHOR_LAT, ANCHOR_LON = -7.70, 110.50


def _cell(spark, dix, diy):
    size = C.cell_size_deg(RES)
    ix = int((ANCHOR_LON + 180.0) / size) + dix
    iy = int((ANCHOR_LAT + 90.0) / size) + diy
    return RES * C.RES_BITS_SHIFT + ix * C.IX_SHIFT + iy


def _run(spark, cells_vals, k=1):
    df = spark.createDataFrame(cells_vals, "cell_id long, value long")
    out = focal_stats(df, RES, k)
    return {r["cell_id"]: r.asDict() for r in out.collect()}


def test_full_3x3_neighborhood(spark):
    # 3x3 block valued 1..9 (row-major by (diy, dix)); center gets all 9
    vals = {}
    rows = []
    v = 1
    for diy in (-1, 0, 1):
        for dix in (-1, 0, 1):
            c = _cell(spark, dix, diy)
            rows.append((c, v))
            vals[c] = v
            v += 1
    got = _run(spark, rows)
    center = _cell(spark, 0, 0)
    r = got[center]
    assert r["focal_n"] == 9
    assert r["focal_sum"] == 45
    assert r["focal_min"] == 1 and r["focal_max"] == 9
    assert r["focal_mean"] == 5.0
    assert r["focal_range"] == 8
    # a corner of the block sees only the 4 cells of its quadrant
    corner = _cell(spark, -1, -1)  # value 1; ring mates: 1,2,4,5
    r = got[corner]
    assert r["focal_n"] == 4
    assert r["focal_sum"] == 1 + 2 + 4 + 5
    assert r["value"] == 1


def test_isolated_cell_is_its_own_neighborhood(spark):
    c = _cell(spark, 0, 0)
    got = _run(spark, [(c, 7)])
    assert got[c]["focal_n"] == 1
    assert got[c]["focal_sum"] == 7
    assert got[c]["focal_mean"] == 7.0
    assert got[c]["focal_range"] == 0


def test_k2_reach(spark):
    # two cells 2 apart in ix: outside each other's k=1 ring, inside k=2
    a, b = _cell(spark, 0, 0), _cell(spark, 2, 0)
    got1 = _run(spark, [(a, 1), (b, 10)], k=1)
    assert got1[a]["focal_sum"] == 1 and got1[b]["focal_sum"] == 10
    got2 = _run(spark, [(a, 1), (b, 10)], k=2)
    assert got2[a]["focal_sum"] == 11 and got2[b]["focal_sum"] == 11
    assert got2[a]["focal_n"] == 2


def test_k_validation(spark):
    df = spark.createDataFrame([(1, 1)], "cell_id long, value long")
    with pytest.raises(ValueError):
        focal_stats(df, RES, 0)


def test_output_restricted_to_input_mask(spark):
    # the dilated halo (cells with contributions but no own value) must
    # NOT appear in the output
    c = _cell(spark, 0, 0)
    got = _run(spark, [(c, 3)])
    assert set(got) == {c}
