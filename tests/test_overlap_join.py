"""Polygon x polygon overlap join: exact kernel vs independent oracles
(interval algebra on rectangles, hand-derived concave cases), and the
distributed cover-join plan vs all-pairs kernel application."""

import numpy as np
import pytest

from osm_search_spark.operators.overlap_join import (
    polygon_overlap_join,
    rings_intersect,
)


def _rect(x0, y0, x1, y1):
    # (ring_lat, ring_lon) closed rectangle
    return [y0, y0, y1, y1, y0], [x0, x1, x1, x0, x0]


def test_rings_intersect_rectangles_vs_interval_algebra():
    rng = np.random.default_rng(11)
    rects = []
    for _ in range(40):
        x0, y0 = rng.integers(0, 40, 2)
        w, h = rng.integers(1, 12, 2)
        rects.append((float(x0), float(y0), float(x0 + w), float(y0 + h)))
    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            ax0, ay0, ax1, ay1 = rects[i]
            bx0, by0, bx1, by1 = rects[j]
            want = ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1
            la, na = _rect(ax0, ay0, ax1, ay1)
            lb, nb = _rect(bx0, by0, bx1, by1)
            got = rings_intersect(la, na, lb, nb)
            assert got == want, (rects[i], rects[j])


@pytest.mark.parametrize(
    "a,b,want",
    [
        # containment (no boundary crossing)
        (_rect(0, 0, 10, 10), _rect(2, 2, 4, 4), True),
        # identical
        (_rect(0, 0, 5, 5), _rect(0, 0, 5, 5), True),
        # shared edge only
        (_rect(0, 0, 5, 5), _rect(5, 0, 9, 5), True),
        # shared corner only
        (_rect(0, 0, 5, 5), _rect(5, 5, 8, 8), True),
        # disjoint
        (_rect(0, 0, 5, 5), _rect(6, 6, 8, 8), False),
        # plus-sign crossing: edges cross, no vertex inside the other
        (_rect(-1, 4, 11, 6), _rect(4, -1, 6, 11), True),
    ],
)
def test_rings_intersect_degenerate_cases(a, b, want):
    assert rings_intersect(a[0], a[1], b[0], b[1]) == want


def test_rings_intersect_concave_cases():
    # U: outer rect 0..10 x 0..10 with a notch cut from the top middle —
    # its bbox contains a small rect that sits entirely in the notch
    ring = [(0, 0), (10, 0), (10, 10), (7, 10), (7, 3), (3, 3), (3, 10), (0, 10), (0, 0)]
    u_lon = [p[0] for p in ring]
    u_lat = [p[1] for p in ring]
    # small rect entirely inside the notch: bboxes overlap, no intersection
    nla, nno = _rect(4, 5, 6, 9)
    assert not rings_intersect(u_lat, u_lon, nla, nno)
    # rect dipping into the U's left arm: intersects
    ala, ano = _rect(1, 5, 2, 9)
    assert rings_intersect(u_lat, u_lon, ala, ano)
    # rect touching the notch floor from above
    tla, tno = _rect(4, 3, 6, 9)
    assert rings_intersect(u_lat, u_lon, tla, tno)


def test_polygon_overlap_join_matches_allpairs_kernel(spark):
    rng = np.random.default_rng(3)
    layers = []
    for seed_off in (0, 1):
        rows = []
        for i in range(30):
            # degrees-scale shapes near the fixture area; mix rectangles
            # and concave stars
            cx = float(rng.uniform(110.3, 110.8))
            cy = float(rng.uniform(-7.9, -7.5))
            if i % 3 == seed_off % 2:
                w = float(rng.uniform(0.01, 0.12))
                h = float(rng.uniform(0.01, 0.12))
                la, no = _rect(cx, cy, cx + w, cy + h)
            else:
                ang = np.linspace(0, 2 * np.pi, 13)[:-1]
                r = np.where(np.arange(12) % 2 == 0, 0.06, 0.02)
                no = [float(x) for x in cx + r * np.cos(ang)] + [float(cx + r[0])]
                la = [float(y) for y in cy + r * np.sin(ang)] + [float(cy)]
            rows.append((i, [float(v) for v in la], [float(v) for v in no]))
        layers.append(
            spark.createDataFrame(
                rows, "polygon_id long, ring_lat array<double>, ring_lon array<double>"
            )
        )
    got = {
        (r["polygon_id_a"], r["polygon_id_b"])
        for r in polygon_overlap_join(layers[0], layers[1], res=10).collect()
    }
    # grouped refine (heavy side cogrouped) must be pair-identical
    for heavy in ("a", "b"):
        grouped = {
            (r["polygon_id_a"], r["polygon_id_b"])
            for r in polygon_overlap_join(
                layers[0], layers[1], res=10, heavy=heavy
            ).collect()
        }
        assert grouped == got, heavy
    a_rows = {r["polygon_id"]: (r["ring_lat"], r["ring_lon"]) for r in layers[0].collect()}
    b_rows = {r["polygon_id"]: (r["ring_lat"], r["ring_lon"]) for r in layers[1].collect()}
    want = {
        (ia, ib)
        for ia, (la, na) in a_rows.items()
        for ib, (lb, nb) in b_rows.items()
        if rings_intersect(la, na, lb, nb)
    }
    assert got == want and len(want) > 5


def test_polygon_overlap_self_join_mode(spark):
    rows = [
        (1, *_rect(0.0, 0.0, 1.0, 1.0)),
        (2, *_rect(0.5, 0.5, 1.5, 1.5)),  # overlaps 1
        (3, *_rect(5.0, 5.0, 6.0, 6.0)),  # disjoint
        (4, *_rect(5.5, 5.5, 6.5, 6.5)),  # overlaps 3
    ]
    layer = spark.createDataFrame(
        [(i, la, no) for i, la, no in rows],
        "polygon_id long, ring_lat array<double>, ring_lon array<double>",
    )
    got = {
        (r["polygon_id_a"], r["polygon_id_b"])
        for r in polygon_overlap_join(
            layer, layer, res=8, same_layer=True
        ).collect()
    }
    assert got == {(1, 2), (3, 4)}
