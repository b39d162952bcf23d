"""Multimodal media plumbing + streaming windowed aggregation."""

import json

import numpy as np
import pytest

from osm_search_spark.operators import media
from osm_search_spark.streaming.event_windows import windowed_event_counts


def test_audio_features_real_pcm_path(spark):
    df = media.audio_table(spark, 16)
    feats = {r["media_id"]: r for r in media.audio_features(df).collect()}
    assert len(feats) == 16
    for r in feats.values():
        assert 0.0 < r["rms"] < 1.0
        assert r["zero_crossings"] > 0
    # determinism
    again = {r["media_id"]: r["rms"] for r in media.audio_features(df).collect()}
    assert all(abs(again[k] - feats[k]["rms"]) < 1e-12 for k in feats)


def test_compressed_audio_is_gated_stub():
    with pytest.raises(NotImplementedError):
        media.decode_audio(b"\x00\x01", "opus")


def test_frame_sample_plumbing_schema(spark):
    video = spark.createDataFrame(
        [], media.VIDEO_SCHEMA
    )
    out = media.frame_sample(video)
    # schema is real; empty input flows through the Arrow plumbing
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["media_id", "frame_idx", "frame_png"]


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        dict(ts="2026-01-01T10:01:00", event_type="click", value=1.0),
        dict(ts="2026-01-01T10:04:00", event_type="click", value=2.0),
        dict(ts="2026-01-01T10:12:00", event_type="view", value=5.0),
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .json(str(src))
    )
    out = windowed_event_counts(stream, window="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("ev_out")
        .outputMode("complete").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("select * from ev_out").collect()
        }
    finally:
        q.stop()
    assert got[("2026-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2026-01-01 10:10:00", "view")] == (1, 5.0)
