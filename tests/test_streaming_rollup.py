"""Streaming continuous rollup: cross-micro-batch merge equals the batch
rollup of all rows; replayed batches merge exactly once; a corrupted
table root fails loud instead of silently re-initialising."""

import json
import time

import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.rollup import time_rollup
from osm_search_spark.streaming.rollup_stream import (
    read_rollup,
    start_rollup_stream,
)


def _rows(lo, hi):
    return [
        dict(
            event_id=i,
            ts=f"2024-01-01 0{i % 4}:0{i % 6}:00",
            event_type=["view", "click"][i % 2],
            value=round(1.01 * i, 2),
        )
        for i in range(lo, hi)
    ]


def test_streaming_rollup_matches_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in _rows(0, 40)))
    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    table = str(tmp_path / "rollup")
    q = start_rollup_stream(stream, table, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        (src / "b2.json").write_text(
            "\n".join(json.dumps(r) for r in _rows(40, 90))
        )
        deadline = time.time() + 60
        q.processAllAvailable()
        got = {
            (r["bucket_ts"], r["event_type"]): (r["n_events"], r["sum_cents"])
            for r in read_rollup(spark, table).collect()
        }
        assert time.time() < deadline
    finally:
        q.stop()
    all_rows = spark.createDataFrame(
        [tuple(r.values()) for r in _rows(0, 90)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = {
        (r["bucket_ts"], r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in time_rollup(all_rows).collect()
    }
    assert got == want and len(want) >= 4


def test_streaming_rollup_replay_is_exactly_once(spark, tmp_path):
    """A replayed micro-batch (same batch_id) must NOT double-merge: a
    second stream over the same source with a FRESH checkpoint re-delivers
    batch ids 0..n, and the committed table is unchanged."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in _rows(0, 40)))
    schema = "event_id long, ts timestamp, event_type string, value double"

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )

    table = str(tmp_path / "rollup")
    q = start_rollup_stream(stream(), table, str(tmp_path / "ckpt1"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    before = sorted(map(tuple, read_rollup(spark, table).collect()))
    # fresh checkpoint => Spark replays batch 0 over the same committed table
    q2 = start_rollup_stream(stream(), table, str(tmp_path / "ckpt2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    after = sorted(map(tuple, read_rollup(spark, table).collect()))
    assert after == before


def test_streaming_rollup_missing_pointer_fails_loud(spark, tmp_path):
    """Version dirs without a CURRENT pointer = corruption: reads and new
    commits must raise, never silently re-initialise over history."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in _rows(0, 10)))
    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    table = tmp_path / "rollup"
    q = start_rollup_stream(stream, str(table), str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    (table / "CURRENT").unlink()
    with pytest.raises(RuntimeError, match="no CURRENT pointer"):
        read_rollup(spark, str(table))
