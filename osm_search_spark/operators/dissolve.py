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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _snap_rings(polygons: DataFrame, snap_res: int) -> DataFrame:
    """Quantize every ring vertex to the aligned lattice of step
    s = 180 / 2**snap_res (the raster stack's exact-integer trick: s and
    index*s are exactly representable doubles for snap_res <= 36, so two
    near-coincident vertices from DIFFERENT sources land on the SAME
    bit-equal double — the noding pre-step for inputs that violate the
    noded-coverage contract). Consecutive duplicates created by the
    quantization are dropped; a ring that collapses below 3 distinct
    vertices self-cancels downstream (zero-area)."""
    s = 180.0 / (1 << snap_res)

    def q(arr):
        return F.transform(
            arr, lambda v: F.floor(v / F.lit(s) + F.lit(0.5)) * F.lit(s)
        )

    pts = F.zip_with(
        q(F.col("ring_lat")),
        q(F.col("ring_lon")),
        lambda a, b: F.struct(a.alias("qlat"), b.alias("qlon")),
    )
    others = [c for c in polygons.columns if c not in ("ring_lat", "ring_lon")]
    with_pts = polygons.select(*others, pts.alias("_pts"))
    # drop consecutive duplicates (i is 0-based in the HOF; element_at is
    # 1-based, so element_at(_pts, i) IS the previous element)
    dedup = F.filter(
        F.col("_pts"),
        lambda p, i: (i == F.lit(0))
        | (p != F.element_at(F.col("_pts"), i.cast("int"))),
    )
    return with_pts.select(
        *others,
        F.transform(dedup, lambda p: p["qlat"]).alias("ring_lat"),
        F.transform(dedup, lambda p: p["qlon"]).alias("ring_lon"),
    )


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


def dissolve_edges(
    polygons: DataFrame,
    key: str = "group_key",
    snap_res: int | None = None,
    validate: bool = True,
    near_eps: float = 1e-9,
) -> DataFrame:
    """Surviving directed boundary edges of each group's union:
    (key, alat, alon, blat, blon).

    An edge interior to the group appears exactly twice (once per adjacent
    polygon, opposite directions — all rings CCW) and is annihilated by
    count; a true boundary edge appears once and keeps its direction.
    Exact double equality on endpoints is the noded-coverage contract.

    snap_res: quantize vertices to the 180/2**snap_res lattice first
    (`_snap_rings`) — the noding pre-step for inputs from two sources
    whose shared borders don't bit-match (two agencies' extracts).

    validate (contract check, fail-loud instead of silently wrong — both
    checks are INLINE `raise_error` columns, so they cost ZERO extra jobs
    and fire at materialization time, surfacing as a Spark exception whose
    message starts with "dissolve:"):
      * an undirected edge key seen > 2 times, or seen exactly twice in
        the SAME direction (overlapping polygons, not a coverage) raises
        during the cancellation filter;
      * two SURVIVING out-vertices within `near_eps` degrees of each
        other but not bit-equal raise, naming snap_res as the remedy —
        that is the signature of a misaligned coverage, whose interior
        borders would otherwise silently survive as doubled boundary
        rings. (Adjacency probe: vertices are compared to their
        lag-neighbor in (alat, alon) sort order per group — the doubled-
        border signature always sorts adjacent in generic position;
        every surviving vertex has an outgoing edge because cancellation
        preserves in==out degree, so scanning a-vertices covers all.)
    The near probe's lag window hash-partitions on `key`, the same
    partitioning `dissolve`'s chaining groupBy needs — the Exchange is
    reused, so validation adds no shuffle to the dissolve plan either."""
    if snap_res is not None:
        polygons = _snap_rings(polygons, snap_res)
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
    e_struct = F.struct("alat", "alon", "blat", "blon")
    aggs = [F.count(F.lit(1)).alias("_c"), F.min(e_struct).alias("_e")]
    if validate:
        # min==max over the directed-edge struct <=> both copies have the
        # SAME direction (no count_distinct: that would add an Expand)
        aggs.append(F.max(e_struct).alias("_e2"))
    g = keyed.groupBy(key, "_k1", "_k2").agg(*aggs)

    if validate:
        bad_multiset = (F.col("_c") > 2) | (
            (F.col("_c") == 2) & (F.col("_e") == F.col("_e2"))
        )
        multiset_msg = F.concat(
            F.lit("dissolve: edge between ("),
            F.col("_k1.vlat").cast("string"), F.lit(", "),
            F.col("_k1.vlon").cast("string"), F.lit(") and ("),
            F.col("_k2.vlat").cast("string"), F.lit(", "),
            F.col("_k2.vlon").cast("string"), F.lit(") in group "),
            F.col(key).cast("string"),
            F.lit(
                " appears >2 times or twice in the same direction - input"
                " is not a planar coverage (overlap or >2-fold shared"
                " border); pass validate=False to accept as-is"
            ),
        )
        keep = F.when(
            bad_multiset, F.raise_error(multiset_msg).cast("boolean")
        ).otherwise(F.col("_c") == 1)
    else:
        keep = F.col("_c") == 1

    surv = g.filter(keep).select(
        key,
        F.col("_e.alat").alias("alat"),
        F.col("_e.alon").alias("alon"),
        F.col("_e.blat").alias("blat"),
        F.col("_e.blon").alias("blon"),
    )
    if validate:
        w = Window.partitionBy(key).orderBy("alat", "alon")
        near = (
            F.col("_plat").isNotNull()
            & (F.abs(F.col("alat") - F.col("_plat")) <= near_eps)
            & (F.abs(F.col("alon") - F.col("_plon")) <= near_eps)
            & (
                (F.col("alat") != F.col("_plat"))
                | (F.col("alon") != F.col("_plon"))
            )
        )
        near_msg = F.concat(
            F.lit("dissolve: surviving boundary vertices ("),
            F.col("_plat").cast("string"), F.lit(", "),
            F.col("_plon").cast("string"), F.lit(") and ("),
            F.col("alat").cast("string"), F.lit(", "),
            F.col("alon").cast("string"), F.lit(") in group "),
            F.col(key).cast("string"),
            F.lit(
                f" differ by <= {near_eps!r} deg but are not bit-equal -"
                " misaligned coverage (interior borders would silently"
                " survive); re-run with snap_res to node the inputs, or"
                " validate=False to accept as-is"
            ),
        )
        surv = (
            surv.withColumns(
                {
                    "_plat": F.lag("alat").over(w),
                    "_plon": F.lag("alon").over(w),
                }
            )
            .filter(
                F.when(
                    near, F.raise_error(near_msg).cast("boolean")
                ).otherwise(F.lit(True))
            )
            .drop("_plat", "_plon")
        )
    return surv


_RING_SCHEMA_TMPL = (
    "{key} string, ring_id int, is_hole boolean, "
    "ring_lat array<double>, ring_lon array<double>"
)


def dissolve(
    polygons: DataFrame,
    key: str = "group_key",
    snap_res: int | None = None,
    validate: bool = True,
    near_eps: float = 1e-9,
) -> DataFrame:
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
        dissolve_edges(
            polygons, key,
            snap_res=snap_res, validate=validate, near_eps=near_eps,
        )
        .groupBy(key)
        .applyInPandas(chain, schema=_RING_SCHEMA_TMPL.format(key=key))
    )
