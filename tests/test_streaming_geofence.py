"""Streaming geofence: same status matrix as batch, state carried across
micro-batches (the bbolt prev-point store re-expressed as stream state)."""

import json
import time

from osm_search_spark.sources import synth
from osm_search_spark.streaming.geofence_stream import geofence_stream

FENCES = [("monumen_nasional", -6.175264826906892, 106.82716285437488, 1.2)]


def _write_batch(d, name, rows):
    path = d / name
    path.write_text("\n".join(json.dumps(r) for r in rows))


def test_stream_matches_batch_semantics(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # batch 1: two points (outside -> enter); batch 2: inside -> away
    _write_batch(src, "b1.json", [
        dict(query_point_id="ojol_budi", seq=1, lat=synth.TRACK_POINTS[0][2], lon=synth.TRACK_POINTS[0][3]),
        dict(query_point_id="ojol_budi", seq=2, lat=synth.TRACK_POINTS[1][2], lon=synth.TRACK_POINTS[1][3]),
    ])
    stream = (
        spark.readStream.schema(
            "query_point_id string, seq int, lat double, lon double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = geofence_stream(stream, FENCES)
    q = (
        out.writeStream.format("memory")
        .queryName("fence_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(src, "b2.json", [
            dict(query_point_id="ojol_budi", seq=3, lat=synth.TRACK_POINTS[2][2], lon=synth.TRACK_POINTS[2][3]),
            dict(query_point_id="ojol_budi", seq=4, lat=synth.TRACK_POINTS[3][2], lon=synth.TRACK_POINTS[3][3]),
        ])
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline and len(got) < 4:
            q.processAllAvailable()
            got = {
                r["seq"]: r["status"]
                for r in spark.sql("select * from fence_out").collect()
            }
            time.sleep(0.5)
    finally:
        q.stop()
    # state must persist across micro-batches: seq3 sees prev=seq2 (ENTER->INSIDE)
    assert got == {1: "OUTSIDE", 2: "ENTER", 3: "INSIDE", 4: "EXIT"}
