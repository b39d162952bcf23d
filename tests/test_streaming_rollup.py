"""Streaming continuous rollup: cross-micro-batch merge equals the batch
rollup of all rows."""

import json
import time

from pyspark.sql import functions as F

from osm_search_spark.operators.rollup import time_rollup
from osm_search_spark.streaming.rollup_stream import start_rollup_stream


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
            for r in spark.read.parquet(table).collect()
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
