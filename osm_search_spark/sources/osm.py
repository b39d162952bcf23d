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
    """S2: boundary=administrative relations with admin_level in [2,7].
    (parse_osm.go:173-219 — our synth relations are already admin-shaped,
    the filter still applies the level/name rules.)"""
    return relations.filter(
        F.col("name").isNotNull()
        & F.col("admin_level").cast("int").between(2, 7)
    )


def assemble_relation_polygons(
    relations: DataFrame, ways: DataFrame, nodes: DataFrame
) -> DataFrame:
    """J2: relation -> polygon ring (ordered member ways' coords flattened,
    parse_osm.go:348-368). Output: polygon_id, name, admin_level,
    postal_code, ring_lat, ring_lon."""
    assembled = assemble_ways(ways, nodes)
    member = admin_relation_filter(relations).select(
        F.col("id").alias("rel_id"), "name",
        F.col("admin_level").cast("int").alias("admin_level"), "postal_code",
        F.posexplode("member_way_ids").alias("wpos", "way_id"),
    )
    joined = member.join(
        assembled.select(F.col("id").alias("way_id"), "lats", "lons"), "way_id"
    )
    return (
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
