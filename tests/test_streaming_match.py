"""Streaming HMM map matching: cross-micro-batch buffered trips must
reproduce the BATCH hmm_match output row-for-row once closed — the DP
inputs are the same JVM-rounded candidate values and the selection +
Viterbi code is shared, so the parity is exact, not approximate."""

import json

from pyspark.sql import functions as F

from osm_search_spark.operators.map_match import hmm_match
from osm_search_spark.sources import synth
from osm_search_spark.streaming.match_stream import match_trips_stream


def _ping_json(rows):
    return "\n".join(
        json.dumps(
            dict(trip_id=t, seq=s, lat=lat, lon=lon, is_last=(s == synth.MM_TRIP_LEN - 1))
        )
        for t, s, lat, lon in rows
    )


def test_streaming_match_equals_batch(spark, tmp_path):
    pings = synth.map_match_pings_py()
    # split mid-trip: batch 1 = seqs 0-2, batch 2 = seqs 3-5, batch 3 =
    # the closing seqs 6-7 — every trip spans all three micro-batches
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text(_ping_json([r for r in pings if r[1] <= 2]))
    (src / "b2.json").write_text(_ping_json([r for r in pings if 3 <= r[1] <= 5]))
    (src / "b3.json").write_text(_ping_json([r for r in pings if r[1] >= 6]))
    # FileStreamSource orders pre-existing files by MILLISECOND-truncated
    # mtime with NO tiebreak — three files written in the same ms get a
    # nondeterministic batch order (when b3's close markers land first,
    # trips close on 2-ping fragments and the later pings are dropped).
    # Pin distinct mtimes so the batches replay in written order.
    import os
    import time

    now = time.time()
    for k, name in enumerate(("b1.json", "b2.json", "b3.json")):
        os.utime(src / name, (now + k, now + k))

    streets = synth.map_match_streets(spark)
    schema = "trip_id long, seq int, lat double, lon double, is_last boolean"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        match_trips_stream(stream, streets)
        .writeStream.format("memory")
        .queryName("match_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["trip_id"], r["seq"]): (
            r["way_id"], r["seg_idx"], r["t"], r["snap_lat"],
            r["snap_lon"], r["dist_km"], r["score"],
        )
        for r in spark.table("match_out").collect()
    }
    want = {
        (r["trip_id"], r["seq"]): (
            r["way_id"], r["seg_idx"], r["t"], r["snap_lat"],
            r["snap_lon"], r["dist_km"], r["score"],
        )
        for r in hmm_match(
            synth.map_match_pings(spark), streets
        ).collect()
    }
    assert got == want  # exact, including scores


def test_streaming_match_waits_for_close(spark, tmp_path):
    """Trips without a close marker emit nothing (state buffers); only
    the closed trip appears."""
    pings = synth.map_match_pings_py()
    rows = [
        dict(trip_id=t, seq=s, lat=lat, lon=lon,
             is_last=(t == 0 and s == synth.MM_TRIP_LEN - 1))
        for t, s, lat, lon in pings
    ]
    src = tmp_path / "in2"
    src.mkdir()
    (src / "all.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "trip_id long, seq int, lat double, lon double, is_last boolean"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        match_trips_stream(stream, synth.map_match_streets(spark))
        .writeStream.format("memory")
        .queryName("match_out2")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("match_out2").collect()
    assert {r["trip_id"] for r in out} == {0}
    assert len(out) == synth.MM_TRIP_LEN
