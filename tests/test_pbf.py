"""Real .osm.pbf ingestion: encode the synth OSM fixture as an actual
.pbf (zlib blobs, DenseNodes delta coding, protobuf wire format), parse it
back DISTRIBUTED (blob-index + mapInPandas), and drive the full indexing
program from it — closing the 'no converter exists' gap (ParseOSM parity,
pkg/geo/parse_osm.go:123-461)."""

import os

import pytest
from pyspark.sql import functions as F

from osm_search_spark.sources import osm as osm_src
from osm_search_spark.sources import pbf


@pytest.fixture(scope="module")
def pbf_path(tmp_path_factory):
    nodes, ways, relations = osm_src.synth_osm_py()
    rels_pbf = [
        dict(
            id=r["id"],
            member_ids=list(r["member_way_ids"]),
            member_types=[1] * len(r["member_way_ids"]),
            member_roles=["outer"] * len(r["member_way_ids"]),
            tags={
                "type": "boundary", "boundary": "administrative",
                "name": r["name"], "admin_level": r["admin_level"],
                "postal_code": r["postal_code"],
            },
        )
        for r in relations
    ]
    path = str(tmp_path_factory.mktemp("pbf") / "fixture.osm.pbf")
    pbf.write_pbf(path, nodes, ways, rels_pbf, blob_nodes=50)  # multi-blob
    return path


def test_blob_index_and_multiblob(pbf_path):
    idx = pbf.scan_blob_index(pbf_path)
    types = [t for _, _, t in idx]
    assert types[0] == "OSMHeader"
    assert types.count("OSMData") >= 3  # nodes chunked at 50/blob


def test_pbf_roundtrip_tables(spark, pbf_path):
    nodes0, ways0, rels0 = osm_src.synth_osm_py()
    nodes, ways, rels = pbf.osm_pbf(spark, pbf_path)

    got_nodes = {r["id"]: r for r in nodes.collect()}
    assert len(got_nodes) == len(nodes0)
    for n in nodes0:
        g = got_nodes[n["id"]]
        # coordinates quantized to the standard 100-nanodegree granularity
        assert abs(g["lat"] - n["lat"]) < 1e-7 + 1e-12
        assert abs(g["lon"] - n["lon"]) < 1e-7 + 1e-12
        assert dict(g["tags"]) == n["tags"]

    got_ways = {r["id"]: r for r in ways.collect()}
    assert len(got_ways) == len(ways0)
    for w in ways0:
        g = got_ways[w["id"]]
        assert list(g["node_ids"]) == w["node_ids"]
        assert dict(g["tags"]) == w["tags"]

    got_rels = {r["id"]: r for r in pbf.admin_relations(rels).collect()}
    assert len(got_rels) == len(rels0)
    for r in rels0:
        g = got_rels[r["id"]]
        assert g["name"] == r["name"]
        assert g["admin_level"] == r["admin_level"]
        assert g["postal_code"] == r["postal_code"]
        assert list(g["member_way_ids"]) == r["member_way_ids"]


def test_pbf_drives_build_places(spark, pbf_path):
    """End to end: .pbf file -> distributed parse -> build_places output
    identical to building from the in-memory synth tables (coordinates are
    quantized, so compare ids/names/addresses and coords at 1e-6)."""
    from osm_search_spark.plans import build_pipeline as bp

    nodes, ways, rels = pbf.osm_pbf(spark, pbf_path)
    polys = osm_src.assemble_relation_polygons(pbf.admin_relations(rels), ways, nodes)
    got = {
        r["id"]: r
        for r in bp.build_places(ways, nodes, admin_polygons=polys).collect()
    }

    n0, w0, r0 = osm_src.synth_osm(spark)
    polys0 = osm_src.assemble_relation_polygons(r0, w0, n0)
    want = {
        r["id"]: r
        for r in bp.build_places(w0, n0, admin_polygons=polys0).collect()
    }
    assert got.keys() == want.keys()
    for i in want:
        assert got[i]["name"] == want[i]["name"]
        assert got[i]["address"] == want[i]["address"]
        assert got[i]["type"] == want[i]["type"]
        assert abs(got[i]["lat"] - want[i]["lat"]) < 1e-6
        assert abs(got[i]["lon"] - want[i]["lon"]) < 1e-6
