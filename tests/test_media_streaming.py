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


def test_ima_adpcm_roundtrip():
    import numpy as np

    rng = np.random.default_rng(9)
    t = np.arange(4000)
    pcm = (np.sin(2 * np.pi * 300 * t / 16000.0) * 20000
           + rng.uniform(-500, 500, 4000)).astype(np.int16)
    dec = media.ima_adpcm_decode(media.ima_adpcm_encode(pcm)) * 32767.0
    ref = pcm.astype(np.float64)
    snr = 10 * np.log10(np.mean(ref**2) / np.mean((ref - dec) ** 2))
    assert snr >= 20.0, snr  # 4-bit ADPCM on a noisy sine


def test_audio_features_mixed_formats(spark):
    # audio_table alternates pcm16 / ima_adpcm; both decode for real and
    # produce near-identical features for the same source clip
    import numpy as np

    df = media.audio_table(spark, 8)
    fmts = {r["media_id"]: r["fmt"] for r in df.select("media_id", "fmt").collect()}
    assert set(fmts.values()) == {"pcm16", "ima_adpcm"}
    feats = {r["media_id"]: r["rms"] for r in media.audio_features(df).collect()}
    assert len(feats) == 8 and all(v > 0.1 for v in feats.values())


def test_mjpeg_frame_sample_real_decode(spark):
    from osm_search_spark.functions import images as I

    video = media.video_table(spark, 3, n_frames=6, size=32)
    out = media.frame_sample(video, every_n=2).collect()
    # 3 clips x frames {0, 2, 4}
    assert len(out) == 9
    assert sorted({r["frame_idx"] for r in out}) == [0, 2, 4]
    px = I.png_decode(bytes(out[0]["frame_png"]))
    assert px.shape == (32, 32, 3)


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


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    import pandas as pd

    from osm_search_spark.streaming.dedup_stream import streaming_exact_dedup

    src = tmp_path / "docs"
    src.mkdir()
    pd.DataFrame(
        [dict(doc_id=1, text="alpha beta"), dict(doc_id=2, text="gamma")]
    ).to_parquet(src / "a.parquet")
    pd.DataFrame(
        [dict(doc_id=3, text="alpha beta"),  # cross-file duplicate
         dict(doc_id=4, text="delta")]
    ).to_parquet(src / "b.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .parquet(str(src))
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_out").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha beta", "delta", "gamma"]  # duplicate dropped
