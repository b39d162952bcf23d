"""OSM-shaped tables: deterministic synthesis + assembly joins.

The reference parses an .osm.pbf in three passes (ParseOSM,
pkg/geo/parse_osm.go:123-461). Our source is OSM-shaped parquet/Iceberg
tables (`osm_nodes`, `osm_ways`, `osm_relations`); the three passes become
three filtered DataFrames over one scan, and the hand-rolled map lookups
become real joins:

- way assembly (J1): explode(node_ids) -> join osm_nodes -> ordered
  collect_list (reference nodeMap lookup, indexer.go:168-176)
- relation polygon assembly (J2): explode(member_way_ids) -> join ways ->
  flatten ordered coords (parse_osm.go:348-368)

Synthesis mirrors FIXTURES.md §2: a nested admin hierarchy (1 country, 2
provinces, 4 cities, 8 kecamatan) whose boundary rings are real ways/nodes,
plus a grid of named streets and tagged POI nodes. Seeded, closed-form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .synth import admin_polygons_py

# Exact allowlists from parse_osm.go:34-75
VALID_SEARCH_TAGS = [
    "amenity", "building", "sport", "tourism", "leisure", "boundary",
    "landuse", "craft", "aeroway", "historic", "residential", "railway",
    "shop", "junction", "route", "ferry", "highway", "motorcar",
    "motor_vehicle", "access", "industrial", "service", "healthcare",
    "office", "public_transport", "waterway", "water", "telecom", "power",
    "place", "geological", "emergency", "bulding", "aerialway", "barrier",
]
VALID_NODE_SEARCH_TAGS = ["historic", "name"]

# Type precedence chain, GetOSMObjectType (parse_osm.go:481-533)
TYPE_PRECEDENCE = [
    "amenity", "highway", "historic", "sport", "tourism", "leisure",
    "landuse", "craft", "aeroway", "residential", "industrial", "shop",
]

STREET_NAMES = [
    "Jalan Sentosa Harapan", "Jalan Dunia Baru", "Jalan Mulwo Apel",
    "Jalan Kebun Jeruk Apel", "Jalan Pantai Ancol", "Jalan Gambir",
    "Jalan Pasar Minggu", "Jalan Adi Sucipto", "Jalan Ahmad Yani",
    "Jalan Dani",
]
POI_NAMES = [
    ("Dunia Fantasi", "tourism", "theme_park"),
    ("Kebun Binatang Ragunan", "tourism", "zoo"),
    ("Monumen Nasional", "historic", "monument"),
    ("Taman Mini Indonesia", "leisure", "park"),
    ("Universitas Indonesia", "amenity", "university"),
    ("Stasiun Gambir", "railway", "station"),
]


def synth_osm_py(n_streets: int = 10, n_pois_per_kec: int = 3):
    """Pure-python synthesis -> (nodes, ways, relations) row lists."""
    polys = admin_polygons_py()
    nodes, ways, relations = [], [], []
    nid, wid = 1, 1

    # admin boundary rings as ways of nodes
    for p in polys:
        ring_node_ids = []
        for la, lo in zip(p["ring_lat"], p["ring_lon"]):
            nodes.append(dict(id=nid, lat=la, lon=lo, tags={}))
            ring_node_ids.append(nid)
            nid += 1
        ways.append(
            dict(id=wid, node_ids=ring_node_ids, tags={"boundary": "administrative"})
        )
        relations.append(
            dict(
                id=1000 + p["polygon_id"], name=p["name"],
                admin_level=str(p["admin_level"]),
                postal_code=f"5{p['polygon_id']:04d}",
                member_way_ids=[wid],
            )
        )
        wid += 1

    # streets: horizontal polylines across the country box
    minlat, minlon, maxlat, maxlon = (
        polys[0]["minlat"], polys[0]["minlon"], polys[0]["maxlat"], polys[0]["maxlon"]
    )
    for s in range(n_streets):
        lat = minlat + (s + 0.5) * (maxlat - minlat) / n_streets
        node_ids = []
        for seg in range(5):
            lon = minlon + (seg + 0.5) * (maxlon - minlon) / 5
            nodes.append(dict(id=nid, lat=lat, lon=lon, tags={}))
            node_ids.append(nid)
            nid += 1
        ways.append(
            dict(
                id=wid, node_ids=node_ids,
                tags={
                    "highway": "residential",
                    "name": STREET_NAMES[s % len(STREET_NAMES)],
                    "addr:street": STREET_NAMES[s % len(STREET_NAMES)],
                },
            )
        )
        wid += 1

    # POI nodes inside each kecamatan
    kecs = [p for p in polys if p["admin_level"] == 7]
    for ki, kec in enumerate(kecs):
        for j in range(n_pois_per_kec):
            name, key, val = POI_NAMES[(ki * n_pois_per_kec + j) % len(POI_NAMES)]
            la = kec["minlat"] + (j + 1) * (kec["maxlat"] - kec["minlat"]) / (n_pois_per_kec + 1)
            lo = kec["minlon"] + (j + 1) * (kec["maxlon"] - kec["minlon"]) / (n_pois_per_kec + 1)
            nodes.append(
                dict(
                    id=nid, lat=la, lon=lo,
                    tags={"name": f"{name} {ki}_{j}", key: val},
                )
            )
            nid += 1
    return nodes, ways, relations


def synth_osm(spark: SparkSession):
    nodes, ways, relations = synth_osm_py()
    nodes_df = spark.createDataFrame(
        nodes, "id long, lat double, lon double, tags map<string,string>"
    )
    ways_df = spark.createDataFrame(
        ways, "id long, node_ids array<long>, tags map<string,string>"
    )
    rel_df = spark.createDataFrame(
        relations,
        "id long, name string, admin_level string, postal_code string, "
        "member_way_ids array<long>",
    )
    return nodes_df, ways_df, rel_df


# --- assembly joins ----------------------------------------------------------

def assemble_ways(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J1: way -> ordered coord arrays. explode + shuffle join + re-collect
    (the classic OSM way-assembly join). Output: id, tags, lats, lons."""
    exploded = ways.select(
        F.col("id").alias("way_id"), "tags",
        F.posexplode("node_ids").alias("pos", "node_id"),
    )
    joined = exploded.join(
        nodes.select(F.col("id").alias("node_id"), "lat", "lon"), "node_id"
    )
    return (
        joined.groupBy("way_id", "tags")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "lat", "lon"))
            ).alias("pts")
        )
        .select(
            F.col("way_id").alias("id"),
            "tags",
            F.col("pts.lat").alias("lats"),
            F.col("pts.lon").alias("lons"),
        )
    )


def admin_relation_filter(relations: DataFrame) -> DataFrame:
    """S2: boundary=administrative relations with admin_level in [2,7]
    and a usable name (parse_osm.go:179-196: empty or UNKNOWN-containing
    names are dropped, non-numeric / out-of-range admin_level is dropped).
    The boundary=administrative tag check itself happens where the tags
    still exist — `pbf.admin_relations` for real extracts; our synth
    relations are admin-shaped by construction."""
    return relations.filter(
        F.col("name").isNotNull()
        & (F.col("name") != "")
        & ~F.col("name").contains("UNKNOWN")
        & F.col("admin_level").cast("int").between(2, 7)
    )


MAX_RINGS_PER_RELATION = 1024  # polygon_id = rel_id * 1024 + ring_idx


def _ring_contains(rl, rn, plat, plon):
    """Winding-number interior test as a pure Column expression (same
    semantics as refine_pip_expr's fold, geometry.go:86-122 minus the
    boundary quirk — used only for hole->outer-ring ASSIGNMENT on the
    dim-sized relation frame, where a hole on a ring boundary is malformed
    input either way)."""

    def term(i):
        alat, alon = F.element_at(rl, i), F.element_at(rn, i)
        blat, blon = F.element_at(rl, i + 1), F.element_at(rn, i + 1)
        cross = (blon - alon) * (plat - alat) - (plon - alon) * (blat - alat)
        return (
            F.when((alat <= plat) & (blat > plat) & (cross > 0), 1)
            .when((alat > plat) & (blat <= plat) & (cross < 0), -1)
            .otherwise(0)
        )

    idx = F.when(
        F.size(rl) >= 2, F.sequence(F.lit(1), F.size(rl) - 1)
    ).otherwise(F.array().cast("array<int>"))  # sequence(1,0) is DESCENDING
    return F.aggregate(idx, F.lit(0), lambda acc, i: acc + term(i)) != 0


def assemble_relation_polygons(
    relations: DataFrame,
    ways: DataFrame,
    nodes: DataFrame,
    multi_outer: bool = False,
) -> DataFrame:
    """J2: relation -> polygon ring (ordered member ways' coords flattened,
    parse_osm.go:348-368). Output: polygon_id, name, admin_level,
    postal_code, ring_lat, ring_lon.

    multi_outer=False (default, reference parity): ALL outer member ways
    splice into ONE ring in member order — exactly the reference's
    assembly, which is wrong for relations with several disjoint outer
    rings (archipelago provinces). multi_outer=True (opt-in,
    beyond-reference correctness): outer ways chain in member order and a
    polygon row is cut per CLOSED ring — output gains rel_id + ring_idx,
    with polygon_id = rel_id * 1024 + ring_idx (fail-loud past 1024 rings)
    so every downstream operator keyed on polygon_id works unchanged; a
    trailing unclosed chain is kept as a final ring (the reference-splice
    fallback for non-closing data). Holes are assigned to the outer ring
    containing their first vertex.

    If the relation frame carries `member_inner_way_ids` (the role=`inner`
    members `pbf.admin_relations` now projects), the inner ways are
    assembled into hole rings and emitted as holes_lat/holes_lon
    (array<array<double>>) — the engine's multipolygon-hole columns that
    every PIP/cover/raster consumer already honors. Inner ways are chained
    in member order and a ring is cut whenever the running chain closes
    (first point == last point), which covers both closed-way holes (the
    common case) and holes split across consecutive ways. The reference
    silently DROPS inner members (parse_osm.go:201 keeps only `outer`);
    routing them into holes is strictly more correct and changes nothing
    for hole-free relations (holes = [])."""
    assembled = assemble_ways(ways, nodes)
    filtered = admin_relation_filter(relations)
    member = filtered.select(
        F.col("id").alias("rel_id"), "name",
        F.col("admin_level").cast("int").alias("admin_level"), "postal_code",
        F.posexplode("member_way_ids").alias("wpos", "way_id"),
    )
    joined = member.join(
        assembled.select(F.col("id").alias("way_id"), "lats", "lons"), "way_id"
    )
    empty_d = F.array().cast("array<double>")
    empty_dd = F.array().cast("array<array<double>>")
    has_inner = "member_inner_way_ids" in relations.columns

    def _chain(acc, w):
        # append this way's coords to the running chain; cut a ring when
        # the chain closes (node coords are 100-nanodegree quantized, so a
        # shared endpoint node compares exactly equal)
        nl = F.concat(acc["cur_lat"], w["lats"])
        nn = F.concat(acc["cur_lon"], w["lons"])
        closed = (
            (F.size(nl) >= 4)
            & (F.element_at(nl, 1) == F.element_at(nl, -1))
            & (F.element_at(nn, 1) == F.element_at(nn, -1))
        )
        return F.struct(
            F.when(closed, F.concat(acc["rings_lat"], F.array(nl)))
            .otherwise(acc["rings_lat"]).alias("rings_lat"),
            F.when(closed, F.concat(acc["rings_lon"], F.array(nn)))
            .otherwise(acc["rings_lon"]).alias("rings_lon"),
            F.when(closed, empty_d).otherwise(nl).alias("cur_lat"),
            F.when(closed, empty_d).otherwise(nn).alias("cur_lon"),
        )

    _chain_zero = F.struct(
        empty_dd.alias("rings_lat"), empty_dd.alias("rings_lon"),
        empty_d.alias("cur_lat"), empty_d.alias("cur_lon"),
    )

    def _rings_of(grouped):
        """ws (wpos-sorted way structs) -> rings_lat/rings_lon, a trailing
        unclosed chain kept as a final ring."""
        with_acc = grouped.select(
            "*", F.aggregate("ws", _chain_zero, _chain).alias("_acc")
        )
        leftover = F.size("_acc.cur_lat") > 0
        return with_acc.select(
            *[c for c in grouped.columns if c != "ws"],
            F.when(
                leftover, F.concat("_acc.rings_lat", F.array("_acc.cur_lat"))
            ).otherwise(F.col("_acc.rings_lat")).alias("rings_lat"),
            F.when(
                leftover, F.concat("_acc.rings_lon", F.array("_acc.cur_lon"))
            ).otherwise(F.col("_acc.rings_lon")).alias("rings_lon"),
        )

    def _holes_frame():
        inner_m = filtered.select(
            F.col("id").alias("rel_id"),
            F.posexplode("member_inner_way_ids").alias("wpos", "way_id"),
        )
        inner_j = inner_m.join(
            assembled.select(F.col("id").alias("way_id"), "lats", "lons"),
            "way_id",
        )
        return _rings_of(
            inner_j.groupBy("rel_id").agg(
                F.array_sort(
                    F.collect_list(F.struct("wpos", "lats", "lons"))
                ).alias("ws")
            )
        ).select(
            "rel_id",
            F.col("rings_lat").alias("holes_lat"),
            F.col("rings_lon").alias("holes_lon"),
        )

    if not multi_outer:
        outer = (
            joined.groupBy("rel_id", "name", "admin_level", "postal_code")
            .agg(
                F.flatten(
                    F.array_sort(F.collect_list(F.struct("wpos", "lats"))).getField("lats")
                ).alias("ring_lat"),
                F.flatten(
                    F.array_sort(F.collect_list(F.struct("wpos", "lons"))).getField("lons")
                ).alias("ring_lon"),
            )
            .select(
                F.col("rel_id").alias("polygon_id"), "name", "admin_level",
                "postal_code", "ring_lat", "ring_lon",
            )
        )
        if not has_inner:
            return outer
        holes = _holes_frame().withColumnRenamed("rel_id", "polygon_id")
        return (
            outer.join(F.broadcast(holes), "polygon_id", "left")
            .withColumn("holes_lat", F.coalesce("holes_lat", empty_dd))
            .withColumn("holes_lon", F.coalesce("holes_lon", empty_dd))
        )

    # --- multi_outer: one polygon row per closed outer ring -----------------
    rings = _rings_of(
        joined.groupBy("rel_id", "name", "admin_level", "postal_code").agg(
            F.array_sort(
                F.collect_list(F.struct("wpos", "lats", "lons"))
            ).alias("ws")
        )
    )
    per_ring = rings.select(
        "rel_id", "name", "admin_level", "postal_code",
        F.posexplode(F.arrays_zip("rings_lat", "rings_lon")).alias(
            "ring_idx", "_r"
        ),
    ).select(
        F.when(
            F.col("ring_idx") < MAX_RINGS_PER_RELATION,
            F.col("rel_id") * MAX_RINGS_PER_RELATION + F.col("ring_idx"),
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "relation %d has >= 1024 outer rings; polygon_id "
                    "packing would collide", F.col("rel_id"),
                )
            )
        ).alias("polygon_id"),
        "rel_id", "ring_idx", "name", "admin_level", "postal_code",
        F.col("_r.rings_lat").alias("ring_lat"),
        F.col("_r.rings_lon").alias("ring_lon"),
    )
    if not has_inner:
        return per_ring
    # assign each hole to the outer ring containing its first vertex
    hz = F.arrays_zip("holes_lat", "holes_lon")
    mine = F.filter(
        hz,
        lambda h: _ring_contains(
            F.col("ring_lat"), F.col("ring_lon"),
            F.element_at(h["holes_lat"], 1), F.element_at(h["holes_lon"], 1),
        ),
    )
    return (
        per_ring.join(F.broadcast(_holes_frame()), "rel_id", "left")
        .withColumn("holes_lat", F.coalesce("holes_lat", empty_dd))
        .withColumn("holes_lon", F.coalesce("holes_lon", empty_dd))
        .withColumn("_mine", mine)
        .select(
            "polygon_id", "rel_id", "ring_idx", "name", "admin_level",
            "postal_code", "ring_lat", "ring_lon",
            F.col("_mine.holes_lat").alias("holes_lat"),
            F.col("_mine.holes_lon").alias("holes_lon"),
        )
    )
