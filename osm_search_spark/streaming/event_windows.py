"""Streaming windowed aggregation with watermark + late-data handling.

The reference has no streaming surface (SURVEY §2.10); this is the engine's
Structured Streaming face for the events-shaped table: sliding event-time
windows with a watermark bounding state, the standard readStream ->
transform -> writeStream shape from the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """events: streaming DF with (ts timestamp, event_type string, value
    double). Returns per-window per-type count + sum; events later than the
    watermark are dropped, windows finalize once the watermark passes."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )
