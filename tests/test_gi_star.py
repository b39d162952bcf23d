"""Getis-Ord Gi* semantics on a planted raster (operators/focal.py)."""

import math

from osm_search_spark.functions import cells as C
from osm_search_spark.operators.focal import gi_star

RES = 13
ANCHOR_LAT, ANCHOR_LON = -7.70, 110.50


def _cell(dix, diy):
    size = C.cell_size_deg(RES)
    ix = int((ANCHOR_LON + 180.0) / size) + dix
    iy = int((ANCHOR_LAT + 90.0) / size) + diy
    return RES * C.RES_BITS_SHIFT + ix * C.IX_SHIFT + iy


def test_gi_star_matches_hand_formula(spark):
    # 3x3 block: center 10, everything else 1 — the center is hot
    rows = [
        (_cell(dix, diy), 10 if (dix, diy) == (0, 0) else 1)
        for diy in (-1, 0, 1)
        for dix in (-1, 0, 1)
    ]
    df = spark.createDataFrame(rows, "cell_id long, value long")
    got = {r["cell_id"]: r for r in gi_star(df, RES, 1).collect()}
    n = 9
    xs = [v for _, v in rows]
    mean = sum(xs) / n
    s = math.sqrt(sum(x * x for x in xs) / n - mean * mean)
    center = got[_cell(0, 0)]
    # center's window = all 9 cells -> focal_sum = 18, focal_n = 9
    assert center["focal_sum"] == 18 and center["focal_n"] == 9
    denom = s * math.sqrt((n * 9 - 81) / (n - 1))
    # window == universe -> variance term is 0 -> NULL (pinned contract)
    assert denom == 0.0
    assert center["gi_z"] is None
    # a corner's window = its 2x2 quadrant (4 cells incl. center value 10)
    corner = got[_cell(-1, -1)]
    assert corner["focal_n"] == 4 and corner["focal_sum"] == 13
    w = 4
    z = (13 - mean * w) / (s * math.sqrt((n * w - w * w) / (n - 1)))
    assert abs(corner["gi_z"] - z) < 1e-12
    # hot: the corner window holds the spike -> clearly positive
    assert corner["gi_z"] > 1.0


def test_flat_raster_yields_null_z(spark):
    rows = [(_cell(d, 0), 5) for d in range(5)]
    df = spark.createDataFrame(rows, "cell_id long, value long")
    out = gi_star(df, RES, 1).collect()
    assert all(r["gi_z"] is None for r in out)  # S = 0 -> nullif
