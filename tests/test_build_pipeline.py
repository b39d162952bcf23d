"""End-to-end build fixture golden — the 5-way + 6-node case of
pkg/index/indexer_test.go:408-650: expected places ids 0-10 with
address = street name and median-centroid coordinates."""

from pyspark.sql import functions as F

from osm_search_spark.plans import build_pipeline as bp
from osm_search_spark.sources import osm as osm_src

WAYS = [
    (1, [1], {"addr:street": "Jalan Sentosa Harapan", "name": "Jalan Sentosa Harapan", "highway": "residential"}),
    (2, [2], {"addr:street": "Jalan Dunia Baru", "name": "Jalan Dunia Baru", "highway": "residential"}),
    (3, [3], {"addr:street": "Jalan Mulwo Apel", "name": "Jalan Mulwo Apel", "highway": "residential"}),
    (4, [4], {"addr:street": "Jalan Kebun Jeruk Apel", "name": "Jalan Kebun Jeruk Apel", "highway": "residential"}),
    (5, [5], {"addr:street": "Jalan Pantai Ancol", "name": "Jalan Pantai Ancol", "highway": "residential"}),
]
WAY_NODES = [(i, float(i), float(i), {}) for i in range(1, 6)]
TAGGED_NODES = [
    (6, 1.0, 1.0, {"addr:street": "Jalan Gambir", "name": "Jalan Gambir"}),
    (7, 3.0, 3.0, {"addr:street": "Jalan Pasar Minggu", "name": "Jalan Pasar Minggu"}),
    (8, 4.0, 4.0, {"addr:street": "Jalan Adi Sucipto", "name": "Jalan Adi Sucipto"}),
    (9, 5.0, 5.0, {"addr:street": "Jalan Ahmad Yani", "name": "Jalan Ahmad Yani"}),
    (10, 6.0, 6.0, {"addr:street": "Jalan Dani", "name": "Jalan Dani"}),
    (11, 6.0, 6.0, {"addr:street": "Jalan Dani Jadul", "name": "Jalan Dani Jadul"}),
]
# indexer_test.go:487-527
EXPECTED = {
    0: ("Jalan Sentosa Harapan", 1.0, 1.0),
    1: ("Jalan Dunia Baru", 2.0, 2.0),
    2: ("Jalan Mulwo Apel", 3.0, 3.0),
    3: ("Jalan Kebun Jeruk Apel", 4.0, 4.0),
    4: ("Jalan Pantai Ancol", 5.0, 5.0),
    5: ("Jalan Gambir", 1.0, 1.0),
    6: ("Jalan Pasar Minggu", 3.0, 3.0),
    7: ("Jalan Adi Sucipto", 4.0, 4.0),
    8: ("Jalan Ahmad Yani", 5.0, 5.0),
    9: ("Jalan Dani", 6.0, 6.0),
    10: ("Jalan Dani Jadul", 6.0, 6.0),
}


def _dfs(spark):
    nodes = spark.createDataFrame(
        WAY_NODES + TAGGED_NODES,
        "id long, lat double, lon double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        WAYS, "id long, node_ids array<long>, tags map<string,string>"
    )
    return ways, nodes


def test_fixture_places_golden(spark):
    ways, nodes = _dfs(spark)
    places = bp.build_places(ways, nodes)
    rows = {r["id"]: r for r in places.collect()}
    assert set(rows) == set(EXPECTED)
    for pid, (name, lat, lon) in EXPECTED.items():
        r = rows[pid]
        assert r["name"] == name
        assert (r["lat"], r["lon"]) == (lat, lon)
        assert r["address"] == name  # addr:street == name in this fixture


def test_median_centroid_is_middle_element(spark):
    # 4 nodes: sorted lats [1,2,3,10] -> middle element idx len/2 = 3 (0-idx 2)
    nodes = spark.createDataFrame(
        [(1, 1.0, 2.0, {}), (2, 2.0, 1.0, {}), (3, 3.0, 10.0, {}), (4, 10.0, 3.0, {})],
        "id long, lat double, lon double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [(1, [1, 2, 3, 4], {"name": "X", "highway": "residential"})],
        "id long, node_ids array<long>, tags map<string,string>",
    )
    r = bp.way_docs(ways, nodes).collect()[0]
    assert (r["lat"], r["lon"]) == (3.0, 3.0)


def test_dedup_same_name_contained(spark):
    # node at same spot with same name as an earlier way -> dropped
    nodes = spark.createDataFrame(
        [(1, 1.0, 1.0, {}), (2, 2.0, 2.0, {}),
         (50, 1.5, 1.5, {"name": "Dup Park"}),
         (51, 9.0, 9.0, {"name": "Dup Park"})],
        "id long, lat double, lon double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [(1, [1, 2], {"name": "Dup Park", "leisure": "park"})],
        "id long, node_ids array<long>, tags map<string,string>",
    )
    places = bp.build_places(ways, nodes)
    names = [(r["id"], r["lat"]) for r in places.filter(F.col("name") == "Dup Park").collect()]
    # way survives; node 50 (inside way bbox) dropped; node 51 (outside) kept
    assert len(names) == 2
    lats = {la for _, la in names}
    assert lats == {2.0, 9.0}  # way median lat=2.0 (middle of [1,2] idx 1), node51 9.0


def test_type_precedence(spark):
    nodes = spark.createDataFrame(
        [(1, 1.0, 1.0, {"name": "A", "amenity": "cafe", "tourism": "museum"}),
         (2, 2.0, 2.0, {"name": "B", "tourism": "museum", "shop": "bakery"})],
        "id long, lat double, lon double, tags map<string,string>",
    )
    got = {r["name"]: r["type"] for r in bp.node_docs(nodes).collect()}
    assert got == {"A": "cafe", "B": "museum"}


def test_relation_polygon_assembly(spark):
    nodes_df, ways_df, rel_df = osm_src.synth_osm(spark)
    polys = osm_src.assemble_relation_polygons(rel_df, ways_df, nodes_df)
    rows = polys.collect()
    assert len(rows) == 15  # 1 country + 2 prov + 4 cities + 8 kecamatan
    for r in rows:
        assert len(r["ring_lat"]) == 5  # closed rectangle ring
        assert r["ring_lat"][0] == r["ring_lat"][-1]


def test_full_synth_build_with_admin_address(spark):
    nodes_df, ways_df, rel_df = osm_src.synth_osm(spark)
    polys = osm_src.assemble_relation_polygons(rel_df, ways_df, nodes_df)
    streets = (
        bp.way_docs(ways_df, nodes_df)
        .filter(F.col("type") == "residential")
        .select(F.col("src_id").alias("id"), "name", "lat", "lon")
    )
    places = bp.build_places(
        ways_df, nodes_df, streets=streets, admin_polygons=polys
    ).cache()
    pois = places.filter(F.col("name").startswith("Dunia Fantasi"))
    assert pois.count() > 0
    r = pois.collect()[0]
    # POIs have no addr:street -> nearest street + admin suffix
    assert "Jalan" in r["address"]
    assert "kecamatan" in r["address"] or "kota" in r["address"] or "provinsi" in r["address"]
