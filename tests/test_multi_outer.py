"""Multi-outer multipolygon assembly (beyond-reference correctness):
the reference splices ALL outer member ways into ONE ring
(parse_osm.go:348-368) — wrong for relations with several disjoint outer
rings (archipelago provinces). `assemble_relation_polygons(...,
multi_outer=True)` emits one polygon row per closed outer ring instead;
the spliced mode stays the reference-parity default."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.spatial_join import spatial_join
from osm_search_spark.sources import osm as osm_src

# two disjoint island rings (rel 501), a ring with a hole (rel 502), and a
# ring split across two OPEN ways that chain to closure (rel 503)
ISLAND_A = ([-7.88, -7.88, -7.80, -7.80, -7.88], [110.30, 110.40, 110.40, 110.30, 110.30])
ISLAND_B = ([-7.88, -7.88, -7.80, -7.80, -7.88], [110.50, 110.60, 110.60, 110.50, 110.50])
HOLED = ([-7.60, -7.60, -7.46, -7.46, -7.60], [110.60, 110.85, 110.85, 110.60, 110.60])
HOLE = ([-7.56, -7.56, -7.50, -7.50, -7.56], [110.68, 110.78, 110.78, 110.68, 110.68])
# split ring: way A = south + east edge, way B = north + west edge
SPLIT_A = ([-7.75, -7.75, -7.65], [110.70, 110.95, 110.95])
SPLIT_B = ([-7.65, -7.65, -7.75], [110.95, 110.70, 110.70])


@pytest.fixture(scope="module")
def tables(spark):
    nodes, ways = [], []
    nid = [1]

    def way(wid, ring_lat, ring_lon, closed):
        ids = []
        pts = zip(ring_lat[:-1], ring_lon[:-1]) if closed else zip(ring_lat, ring_lon)
        for la, lo in pts:
            nodes.append((nid[0], la, lo))
            ids.append(nid[0])
            nid[0] += 1
        ways.append((wid, ids + [ids[0]] if closed else ids, {}))
        return wid

    wa = way(11, *ISLAND_A, closed=True)
    wb = way(12, *ISLAND_B, closed=True)
    wh = way(13, *HOLED, closed=True)
    wi = way(14, *HOLE, closed=True)
    ws1 = way(15, *SPLIT_A, closed=False)
    ws2 = way(16, *SPLIT_B, closed=False)

    nodes_df = spark.createDataFrame(nodes, "id long, lat double, lon double")
    ways_df = spark.createDataFrame(
        ways, "id long, node_ids array<long>, tags map<string,string>"
    )
    rels_df = spark.createDataFrame(
        [
            (501, "Kepulauan A", "4", "11111", [wa, wb], []),
            (502, "Pulau Berlubang", "6", "22222", [wh], [wi]),
            (503, "Pulau Belah", "6", "33333", [ws1, ws2], []),
        ],
        "id long, name string, admin_level string, postal_code string, "
        "member_way_ids array<long>, member_inner_way_ids array<long>",
    )
    return nodes_df, ways_df, rels_df


def test_default_mode_splices_reference_parity(spark, tables):
    nodes_df, ways_df, rels_df = tables
    polys = {
        r["polygon_id"]: r
        for r in osm_src.assemble_relation_polygons(
            rels_df, ways_df, nodes_df
        ).collect()
    }
    # one row per relation; 501's ring is BOTH islands spliced (the
    # reference's wrong-but-faithful shape)
    assert set(polys) == {501, 502, 503}
    assert len(polys[501]["ring_lat"]) == len(ISLAND_A[0]) + len(ISLAND_B[0])
    # the hole still routes into holes_lat (round-7 S2 fix)
    assert len(polys[502]["holes_lat"]) == 1


def test_multi_outer_rings_and_pip(spark, tables):
    nodes_df, ways_df, rels_df = tables
    polys = osm_src.assemble_relation_polygons(
        rels_df, ways_df, nodes_df, multi_outer=True
    )
    rows = {r["polygon_id"]: r for r in polys.collect()}
    # 501 -> two rows; 502/503 -> one each; packed ids
    assert set(rows) == {501 * 1024, 501 * 1024 + 1, 502 * 1024, 503 * 1024}
    assert rows[501 * 1024]["rel_id"] == 501 and rows[501 * 1024]["ring_idx"] == 0
    assert list(rows[501 * 1024]["ring_lat"]) == ISLAND_A[0]
    assert list(rows[501 * 1024 + 1]["ring_lon"]) == ISLAND_B[1]
    # the hole landed on 502's (only) ring, nowhere else
    assert len(rows[502 * 1024]["holes_lat"]) == 1
    assert list(rows[502 * 1024]["holes_lat"][0]) == HOLE[0]
    assert len(rows[501 * 1024]["holes_lat"]) == 0
    # the split open ways chained into one closed ring
    assert len(rows[503 * 1024]["ring_lat"]) == 6
    assert rows[503 * 1024]["ring_lat"][0] == rows[503 * 1024]["ring_lat"][-1]

    points = spark.createDataFrame(
        [
            (1, -7.84, 110.35),   # island A
            (2, -7.84, 110.55),   # island B
            (3, -7.84, 110.45),   # sea between the islands
            (4, -7.53, 110.73),   # inside 502's hole
            (5, -7.58, 110.62),   # 502 annulus
            (6, -7.70, 110.80),   # inside the split ring
        ],
        "point_id long, lat double, lon double",
    )
    got = sorted(
        (r["point_id"], r["rel_id"], r["ring_idx"])
        for r in spatial_join(points, polys)
        .join(polys.select("polygon_id", "rel_id", "ring_idx"), "polygon_id")
        .collect()
    )
    assert got == [(1, 501, 0), (2, 501, 1), (5, 502, 0), (6, 503, 0)]
