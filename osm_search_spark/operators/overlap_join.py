"""Polygon x polygon overlap join — the layer-vs-layer companion of the
point-in-polygon spatial join (beyond the reference, which only serves
point queries over its R-tree; same cover machinery, spatial_join.py).

Semantics: closed-set intersection — pairs whose polygons share at least
one point, boundary contact included (the predicate a tile/parcel/admin
overlay wants, and the one an axis-aligned oracle can state as `<=`
interval tests).

Plan (the 100 TB shape):
  1. classified cell cover of BOTH layers at `res` (bbox cover + FULL /
     PARTIAL classification, computed distributed — spatial_join.py);
  2. equi hash join on cell_id -> candidate pairs; a pair sharing any
     cell that is FULL on both sides is DECIDED (two full covers of one
     cell must intersect) with no exact work — for large overlapping
     polygons the decided bulk scales with AREA while the exact refine
     below scales with PERIMETER;
  3. undecided pairs join their ring arrays and run the exact test in
     one Arrow batch pass: closed polygons intersect iff a vertex of one
     is in-or-on the other OR any boundary segments intersect (proper
     crossing, collinear overlap, and endpoint touches all count — the
     orientation + on-segment test). Candidate pairs are bounded by the
     cover join, so the O(edges_a x edges_b) kernel only ever sees
     boundary-adjacent pairs.

The DuckDB gate oracle states the same predicate on axis-aligned
rectangles as pure interval algebra; concave and degenerate cases are
covered by a numpy brute-force pytest oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions import geometry as G
from .spatial_join import classified_cover


def _orient(plat, plon, qlat, qlon, rlat, rlon):
    return (qlon - plon) * (rlat - plat) - (qlat - plat) * (rlon - plon)


def _on_collinear_seg(o, plat, plon, qlat, qlon, rlat, rlon):
    """o == 0 (r collinear with pq) and r within pq's bbox => r on pq."""
    return (
        (o == 0.0)
        & (rlat >= np.minimum(plat, qlat))
        & (rlat <= np.maximum(plat, qlat))
        & (rlon >= np.minimum(plon, qlon))
        & (rlon <= np.maximum(plon, qlon))
    )


def _any_segments_intersect(rlA, rnA, rlB, rnB) -> bool:
    """Any boundary segment of closed ring A intersects any of B —
    vectorized all-pairs orientation test, touches and collinear overlap
    included."""
    a1la, a1lo = rlA[:-1, None], rnA[:-1, None]
    a2la, a2lo = rlA[1:, None], rnA[1:, None]
    b1la, b1lo = rlB[None, :-1], rnB[None, :-1]
    b2la, b2lo = rlB[None, 1:], rnB[None, 1:]
    o1 = _orient(a1la, a1lo, a2la, a2lo, b1la, b1lo)
    o2 = _orient(a1la, a1lo, a2la, a2lo, b2la, b2lo)
    o3 = _orient(b1la, b1lo, b2la, b2lo, a1la, a1lo)
    o4 = _orient(b1la, b1lo, b2la, b2lo, a2la, a2lo)
    hit = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )
    hit |= _on_collinear_seg(o1, a1la, a1lo, a2la, a2lo, b1la, b1lo)
    hit |= _on_collinear_seg(o2, a1la, a1lo, a2la, a2lo, b2la, b2lo)
    hit |= _on_collinear_seg(o3, b1la, b1lo, b2la, b2lo, a1la, a1lo)
    hit |= _on_collinear_seg(o4, b1la, b1lo, b2la, b2lo, a2la, a2lo)
    return bool(hit.any())


def rings_intersect(
    ring_lat_a, ring_lon_a, ring_lat_b, ring_lon_b,
    holes_a=(), holes_b=(),
) -> bool:
    """Exact closed-set intersection of two polygons, holes included.

    A polygon is its outer ring's closed set MINUS the strict interior of
    each hole (hole boundaries belong to the polygon). Decision rule: the
    two intersect iff any vertex of any A ring (outer or hole — all are
    points of A) lies in B (hole-aware, boundary counts), or vice versa,
    or any boundary segments of any ring pair intersect. If closed sets
    meet with no boundary crossing at all, one's boundary ring sits inside
    the other's point set and its vertices test positive — so the three
    checks are complete. A polygon entirely inside the other's HOLE
    correctly reports no intersection (its vertices are strictly in the
    hole; no segments cross)."""
    rlA, rnA = G.close_ring(np.asarray(ring_lat_a), np.asarray(ring_lon_a))
    rlB, rnB = G.close_ring(np.asarray(ring_lat_b), np.asarray(ring_lon_b))
    # bbox reject (cheap; candidates are cover-adjacent already)
    if (
        rlA.max() < rlB.min() or rlB.max() < rlA.min()
        or rnA.max() < rnB.min() or rnB.max() < rnA.min()
    ):
        return False
    hA = [
        G.close_ring(np.asarray(a), np.asarray(b)) for a, b in holes_a
    ]
    hB = [
        G.close_ring(np.asarray(a), np.asarray(b)) for a, b in holes_b
    ]
    rings_a = [(rlA, rnA)] + hA
    rings_b = [(rlB, rnB)] + hB
    for rl, rn in rings_a:
        if G.points_in_polygon_with_holes(
            rl[:-1], rn[:-1], rlB, rnB, hB, boundary="exact"
        ).any():
            return True
    for rl, rn in rings_b:
        if G.points_in_polygon_with_holes(
            rl[:-1], rn[:-1], rlA, rnA, hA, boundary="exact"
        ).any():
            return True
    return any(
        _any_segments_intersect(ra[0], ra[1], rb[0], rb[1])
        for ra in rings_a
        for rb in rings_b
    )


def polygon_overlap_join(
    layer_a: DataFrame,
    layer_b: DataFrame,
    res: int = C.JOIN_RES,
    heavy: str | None = None,
    same_layer: bool = False,
) -> DataFrame:
    """(polygon_id_a, polygon_id_b) pairs of intersecting polygons. Both
    inputs need (polygon_id, ring_lat, ring_lon).

    same_layer=True: self-overlap mode (pass the SAME frame twice — the
    parcel-overlap / conflation shape): self-pairs drop and each
    unordered pair reports once as (lower_id, higher_id), with the
    restriction applied BEFORE the pair aggregation and refine so no
    duplicate exact work runs.

    heavy: None | "a" | "b" — the refine stage joins ring arrays onto the
    undecided pair frame, so by default each ring rides once per
    candidate pair. For a PERIMETER-HEAVY layer (long rings, dense
    adjacency) pass that side as `heavy`: its rings then ship ONCE PER
    POLYGON via an applyInPandas cogroup keyed on its polygon_id (the
    rasterize-grouped pattern), and only the light side's rings ride per
    pair. Identical output (tested)."""
    cov_a = classified_cover(layer_a, res).select(
        F.col("polygon_id").alias("polygon_id_a"),
        "cell_id",
        F.col("full").alias("full_a"),
    )
    cov_b = classified_cover(layer_b, res).select(
        F.col("polygon_id").alias("polygon_id_b"),
        "cell_id",
        F.col("full").alias("full_b"),
    )
    joined = cov_a.join(cov_b, "cell_id")
    if same_layer:
        # drop self-pairs and keep one order BEFORE aggregating: halves
        # the pair frame and the exact refine work
        joined = joined.filter(F.col("polygon_id_a") < F.col("polygon_id_b"))
    pairs = joined.groupBy("polygon_id_a", "polygon_id_b").agg(
        F.max(F.col("full_a") & F.col("full_b")).alias("decided")
    )
    sure = pairs.filter("decided").select("polygon_id_a", "polygon_id_b")
    undecided = pairs.filter(~F.col("decided")).select(
        "polygon_id_a", "polygon_id_b"
    )

    if heavy in ("a", "b"):
        checked = _refine_grouped(undecided, layer_a, layer_b, heavy)
    elif heavy is None:
        checked = _refine_joined(undecided, layer_a, layer_b)
    else:
        raise ValueError("heavy must be None, 'a', or 'b'")
    return sure.unionByName(checked)


def _hole_pairs(hl, hn):
    """zip an optional holes_lat/holes_lon pair into [(lat, lon), ...]."""
    if hl is None or hn is None:
        return ()
    return list(zip(hl, hn))


def _ring_select(layer: DataFrame, key: str, suffix: str):
    cols = [
        F.col("polygon_id").alias(key),
        F.col("ring_lat").alias(f"rl{suffix}"),
        F.col("ring_lon").alias(f"rn{suffix}"),
    ]
    if "holes_lat" in layer.columns:
        cols += [
            F.col("holes_lat").alias(f"hl{suffix}"),
            F.col("holes_lon").alias(f"hn{suffix}"),
        ]
    else:
        cols += [
            F.lit(None).cast("array<array<double>>").alias(f"hl{suffix}"),
            F.lit(None).cast("array<array<double>>").alias(f"hn{suffix}"),
        ]
    return layer.select(*cols)


def _refine_joined(
    undecided: DataFrame, layer_a: DataFrame, layer_b: DataFrame
) -> DataFrame:
    cand = undecided.join(
        _ring_select(layer_a, "polygon_id_a", "a"), "polygon_id_a"
    ).join(_ring_select(layer_b, "polygon_id_b", "b"), "polygon_id_b")

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = [
                rings_intersect(
                    rla, rna, rlb, rnb,
                    _hole_pairs(hla, hna), _hole_pairs(hlb, hnb),
                )
                for rla, rna, hla, hna, rlb, rnb, hlb, hnb in zip(
                    pdf["rla"], pdf["rna"], pdf["hla"], pdf["hna"],
                    pdf["rlb"], pdf["rnb"], pdf["hlb"], pdf["hnb"],
                )
            ]
            yield pdf.loc[keep, ["polygon_id_a", "polygon_id_b"]]

    return cand.mapInPandas(
        refine, schema="polygon_id_a long, polygon_id_b long"
    )


def _refine_grouped(
    undecided: DataFrame, layer_a: DataFrame, layer_b: DataFrame, heavy: str
) -> DataFrame:
    """Cogroup refine: the heavy side's rings shuffle once per POLYGON
    (group payload), the light side's rings ride per pair."""
    light_layer = layer_b if heavy == "a" else layer_a
    heavy_layer = layer_a if heavy == "a" else layer_b
    light_key = "polygon_id_b" if heavy == "a" else "polygon_id_a"
    heavy_key = "polygon_id_a" if heavy == "a" else "polygon_id_b"
    # holes cross the cogroup boundary as JSON strings: pyarrow's cogroup
    # serializer segfaults on array<array<double>> columns (nested lists
    # through applyInPandas.cogroup), while plain strings are safe; the
    # mapInPandas path in _refine_joined keeps the native nested arrays
    def holes_json(layer):
        if "holes_lat" in layer.columns:
            return F.to_json(
                F.struct(
                    F.col("holes_lat").alias("hl"),
                    F.col("holes_lon").alias("hn"),
                )
            )
        return F.lit(None).cast("string")

    light_sel = [
        F.col("polygon_id").alias(light_key),
        F.col("ring_lat").alias("rl_light"),
        F.col("ring_lon").alias("rn_light"),
        holes_json(light_layer).alias("holes_light_json"),
    ]
    cand = undecided.join(light_layer.select(*light_sel), light_key)
    heavy_grouped = heavy_layer.select(
        "polygon_id", "ring_lat", "ring_lon",
        holes_json(heavy_layer).alias("holes_json"),
    ).groupBy("polygon_id")

    def parse_holes(js):
        import json as _json

        if js is None or (isinstance(js, float) and pd.isna(js)):
            return ()
        d = _json.loads(js)
        return _hole_pairs(d.get("hl"), d.get("hn"))

    def refine_group(key, pairs_pdf: pd.DataFrame, heavy_pdf: pd.DataFrame):
        if pairs_pdf.empty or heavy_pdf.empty:
            return pd.DataFrame(
                {"polygon_id_a": [], "polygon_id_b": []}
            ).astype("int64")
        hl = heavy_pdf["ring_lat"].iloc[0]
        hn = heavy_pdf["ring_lon"].iloc[0]
        h_holes = parse_holes(heavy_pdf["holes_json"].iloc[0])
        keep = [
            rings_intersect(hl, hn, rl, rn, h_holes, parse_holes(js))
            for rl, rn, js in zip(
                pairs_pdf["rl_light"], pairs_pdf["rn_light"],
                pairs_pdf["holes_light_json"],
            )
        ]
        return pairs_pdf.loc[keep, ["polygon_id_a", "polygon_id_b"]]

    return (
        cand.groupBy(heavy_key)
        .cogroup(heavy_grouped)
        .applyInPandas(refine_group, "polygon_id_a long, polygon_id_b long")
    )
