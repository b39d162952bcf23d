"""Vector dissolve / union-by-attribute (cartographic merge).

Merge adjacent polygons that share a group key — kecamatan -> city,
city -> province — by SHARED-EDGE CANCELLATION: explode every ring into
directed vertex-to-vertex edges, annihilate edges that appear twice with
opposite directions in the same group (one groupBy, the exact trick
`raster.cancel_edges` uses on lattice edges), then chain the surviving
edges back into closed rings. Cost scales with total boundary length,
never with polygon area, and the cancellation is a single shuffle on the
undirected edge key — 100 TB-safe.

Precondition (standard coverage-union contract, cf. GEOS CoverageUnion /
PostGIS ST_UnaryUnion on a noded coverage): the input is a NODED planar
partition — a border shared by two polygons appears in BOTH rings as the
identical vertex sequence (bit-equal doubles, e.g. both derived from the
same upstream split or the same quantized extract). Rings of any
orientation are accepted (normalized to CCW first); open rings are
closed. Outer rings only (the admin fixture has no holes; dissolving a
coverage cannot create hole-side sharing anyway — holes come OUT of the
chaining step as negative-area rings).

No reference analog: the reference stores each admin level separately
(pkg/index/indexer.go:1017-1170 joins levels, never merges geometries).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _closed_ccw(polygons: DataFrame, key: str) -> DataFrame:
    """(key, rl, rn): rings closed (first == last) and normalized CCW in
    the (x=lon, y=lat) plane via the planar shoelace sign."""
    la, lo = F.col("ring_lat"), F.col("ring_lon")
    is_open = (F.element_at(la, 1) != F.element_at(la, -1)) | (
        F.element_at(lo, 1) != F.element_at(lo, -1)
    )
    closed = polygons.select(
        key,
        F.when(is_open, F.concat(la, F.array(F.element_at(la, 1))))
        .otherwise(la).alias("_rl"),
        F.when(is_open, F.concat(lo, F.array(F.element_at(lo, 1))))
        .otherwise(lo).alias("_rn"),
    )
    rl, rn = F.col("_rl"), F.col("_rn")
    shoe = F.aggregate(
        F.sequence(F.lit(1), F.size(rl) - 1),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(rn, i) * F.element_at(rl, i + 1)
        - F.element_at(rn, i + 1) * F.element_at(rl, i),
    )
    return closed.select(
        key,
        F.when(shoe < 0, F.reverse(rl)).otherwise(rl).alias("rl"),
        F.when(shoe < 0, F.reverse(rn)).otherwise(rn).alias("rn"),
    )


def dissolve_edges(polygons: DataFrame, key: str = "group_key") -> DataFrame:
    """Surviving directed boundary edges of each group's union:
    (key, alat, alon, blat, blon).

    An edge interior to the group appears exactly twice (once per adjacent
    polygon, opposite directions — all rings CCW) and is annihilated by
    count; a true boundary edge appears once and keeps its direction.
    Exact double equality on endpoints is the noded-coverage contract."""
    ccw = _closed_ccw(polygons, key)
    rl, rn = F.col("rl"), F.col("rn")
    edges = ccw.select(
        key,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(rl) - 1),
                lambda i: F.struct(
                    F.element_at(rl, i).alias("alat"),
                    F.element_at(rn, i).alias("alon"),
                    F.element_at(rl, i + 1).alias("blat"),
                    F.element_at(rn, i + 1).alias("blon"),
                ),
            )
        ).alias("e"),
    ).select(key, "e.alat", "e.alon", "e.blat", "e.blon")
    va = F.struct(F.col("alat").alias("vlat"), F.col("alon").alias("vlon"))
    vb = F.struct(F.col("blat").alias("vlat"), F.col("blon").alias("vlon"))
    keyed = edges.withColumns(
        {"_k1": F.least(va, vb), "_k2": F.greatest(va, vb)}
    )
    g = keyed.groupBy(key, "_k1", "_k2").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(F.struct("alat", "alon", "blat", "blon")).alias("_e"),
    )
    return g.filter(F.col("_c") == 1).select(
        key,
        F.col("_e.alat").alias("alat"),
        F.col("_e.alon").alias("alon"),
        F.col("_e.blat").alias("blat"),
        F.col("_e.blon").alias("blon"),
    )


_RING_SCHEMA_TMPL = (
    "{key} string, ring_id int, is_hole boolean, "
    "ring_lat array<double>, ring_lon array<double>"
)


def dissolve(polygons: DataFrame, key: str = "group_key") -> DataFrame:
    """Dissolved rings per group: (key, ring_id, is_hole, ring_lat,
    ring_lon), rings closed (first == last), collinear vertices KEPT (the
    edge multiset is preserved exactly, so measures computed over rings
    equal measures computed over `dissolve_edges`).

    Chaining runs per group in one task (`raster.chain_rings` discipline:
    a group's dissolved boundary is dim-bounded — admin hierarchies,
    cadastre sheets; for a group whose boundary outgrows one task, chain
    per coarse cell first, as PLANS.md's hierarchical-stitching note).
    Deterministic: walks start from the smallest unused directed edge; at
    a multi-degree vertex the LEFTMOST turn (max CCW angle from the
    incoming direction) is taken, which splits pinch-touching loops into
    non-crossing rings. Outer rings come out CCW (positive shoelace),
    holes CW (is_hole = true)."""

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        gkey = pdf[key].iloc[0]
        es = sorted(
            zip(pdf["alat"], pdf["alon"], pdf["blat"], pdf["blon"])
        )
        out_map: dict[tuple, list] = {}
        for alat, alon, blat, blon in es:
            out_map.setdefault((alat, alon), []).append((blat, blon))
        for v in out_map.values():
            v.sort()
        used: set[tuple] = set()
        rows = []
        for e in es:
            if e in used:
                continue
            start = (e[0], e[1])
            verts = [start]
            cur = e
            shoe = 0.0
            while True:
                used.add(cur)
                a = (cur[0], cur[1])
                v = (cur[2], cur[3])
                # x = lon, y = lat: x1*y2 - x2*y1
                shoe += a[1] * v[0] - v[1] * a[0]
                if v == start:
                    break
                verts.append(v)
                cands = [
                    w
                    for w in out_map.get(v, ())
                    if (v[0], v[1], w[0], w[1]) not in used
                ]
                if not cands:
                    raise ValueError(
                        f"open boundary at {v} (group {gkey}): input is "
                        "not a noded coverage"
                    )
                if len(cands) == 1:
                    nxt = cands[0]
                else:
                    din = math.atan2(v[0] - a[0], v[1] - a[1])

                    def turn(w, _din=din, _v=v):
                        # CCW turn angle in (-pi, pi]: left > straight >
                        # right; an exact REVERSE (u = pi, a zero-width
                        # spike) ranks last, as in raster.chain_rings
                        ang = math.atan2(w[0] - _v[0], w[1] - _v[1])
                        u = ang - _din
                        while u > math.pi:
                            u -= 2 * math.pi
                        while u <= -math.pi:
                            u += 2 * math.pi
                        return -4.0 if u > math.pi - 1e-12 else u

                    nxt = max(cands, key=turn)
                cur = (v[0], v[1], nxt[0], nxt[1])
            verts.append(start)  # close
            rows.append(
                (
                    gkey,
                    len(rows),
                    shoe < 0.0,
                    [p[0] for p in verts],
                    [p[1] for p in verts],
                )
            )
        return pd.DataFrame(
            rows, columns=[key, "ring_id", "is_hole", "ring_lat", "ring_lon"]
        )

    return (
        dissolve_edges(polygons, key)
        .groupBy(key)
        .applyInPandas(chain, schema=_RING_SCHEMA_TMPL.format(key=key))
    )
