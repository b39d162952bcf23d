"""Streaming sessionization: cross-micro-batch state must reproduce the
batch lag/gap/running-count result row-for-row for in-order streams —
including sessions that SPAN a micro-batch boundary."""

import json

from pyspark.sql import Window
from pyspark.sql import functions as F

from osm_search_spark.streaming.session_stream import sessionize_stream


def _rows(lo, hi):
    # per-user CUMULATIVE timelines (in-order delivery, the operator's
    # contract): mostly 10-minute steps with a >30-minute jump every 4th
    # event of that user => multiple sessions per user, and the batch
    # split at i=12 lands mid-session for every user
    clock = {}
    out = []
    for i in range(lo, hi):
        user = i % 3
        seq = i // 3
        clock[user] = clock.get(user, 0) + (40 if seq and seq % 4 == 0 else 10)
        out.append(dict(event_id=i, user_id=user, minutes=clock[user]))
    return out


def _json(rows):
    return "\n".join(
        json.dumps(
            dict(
                event_id=r["event_id"],
                user_id=r["user_id"],
                ts=f"2024-01-01 {r['minutes'] // 60:02d}:{r['minutes'] % 60:02d}:00",
            )
        )
        for r in rows
    )


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    all_rows = _rows(0, 24)
    (src / "b1.json").write_text(_json(all_rows[:12]))
    (src / "b2.json").write_text(_json(all_rows[12:]))
    # pin distinct ms-level mtimes: FileStreamSource has no tiebreak for
    # same-millisecond files, so pre-written batches can replay out of
    # order (see test_streaming_match for the full story)
    import os
    import time

    now = time.time()
    os.utime(src / "b1.json", (now, now))
    os.utime(src / "b2.json", (now + 1, now + 1))
    schema = "event_id long, user_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        sessionize_stream(stream, gap_sec=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["event_id"]): r["session_id"]
            for r in spark.sql("select * from sess_out").collect()
        }
    finally:
        q.stop()

    # recompute the batch truth with the same lag/gap/cumsum window
    bdf = spark.read.schema(schema).json(str(src))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    want = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in (
            bdf.withColumn(
                "new_sess",
                F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
            )
            .withColumn(
                "session_id",
                F.sum("new_sess")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("long"),
            )
            .collect()
        )
    }
    assert got == want and len(want) == 24
    # the fixture really exercises multi-session users
    assert max(want.values()) >= 2


def test_streaming_sessionize_string_keys(spark, tmp_path):
    # output key/event types follow the input schema (not hardcoded longs)
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"event_id": "e1", "user_id": "alice", "ts": "2024-01-01 00:00:00"},
        {"event_id": "e2", "user_id": "alice", "ts": "2024-01-01 01:10:00"},
        {"event_id": "e3", "user_id": "bob", "ts": "2024-01-01 00:05:00"},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("event_id string, user_id string, ts timestamp")
        .json(str(src))
    )
    q = (
        sessionize_stream(stream, gap_sec=1800)
        .writeStream.format("memory")
        .queryName("sess_str")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["event_id"]): r["session_id"]
            for r in spark.sql("select * from sess_str").collect()
        }
    finally:
        q.stop()
    assert got == {("alice", "e1"): 1, ("alice", "e2"): 2, ("bob", "e3"): 1}
