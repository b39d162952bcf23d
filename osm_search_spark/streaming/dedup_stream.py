"""Streaming deduplication — the training-data ingest shape.

Batch dedup (operators/dedup.py) is a hash groupBy; on an unbounded
document stream the same contract is stateful: keep the FIRST occurrence
of each content hash. Spark's dropDuplicates state store IS the dedup
index; with an event-time watermark the state is bounded (duplicates
arriving later than the delay are passed through — the standard
at-least-once ingest trade documented to callers).

Scale posture: state is hash-partitioned by content hash across
executors; nothing collects; the watermark bounds state size by time,
`dropDuplicatesWithinWatermark` prunes eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream_df: DataFrame,
    text: str = "text",
    event_time: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """First-occurrence-wins exact dedup over a streaming DataFrame.

    Without `event_time`: unbounded dedup state (exact forever — fine for
    bounded backfills via availableNow). With `event_time`: state bounded
    by the watermark; duplicates separated by more than `delay` can both
    survive (documented trade, same as every watermark dedup).
    """
    hashed = stream_df.withColumn("text_hash", F.md5(F.col(text)))
    if event_time is None:
        return hashed.dropDuplicates(["text_hash"])
    return hashed.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )
