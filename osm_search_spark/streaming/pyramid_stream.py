"""Streaming tile-pyramid maintenance: continuous overview tiles.

A live map needs per-zoom tile counts that stay current as geotagged
records arrive. Each micro-batch builds its OWN pyramid
(operators/compaction.tile_pyramid — one scan of the batch, then
log-depth parent rollups) and folds it into the committed pyramid with
an additive merge keyed on (cell_id, res) — history is never
re-aggregated from raw points, so per-batch cost is O(batch) + a merge
over the touched cells. Counts are integers, so merge(pyramid(A), B) ==
pyramid(A ∪ B) EXACTLY at every level (the same invariant the batch
test proves per level: parents equal the sum of their children).

Exactly-once via the shared snapshot-pointer protocol
(streaming/commit.py): version dir per batch + atomic CURRENT replace,
replayed (stream_id, batch_id) skipped, fail-loud on a missing pointer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .commit import read_table, start_merge_stream


def read_pyramid(spark: SparkSession, table_dir: str) -> DataFrame:
    """The committed pyramid snapshot (resolves the CURRENT pointer)."""
    return read_table(spark, table_dir)


def _make_merge_batch(
    max_res: int, min_res: int, lat: str = "lat", lon: str = "lon"
):
    from ..operators.compaction import tile_pyramid

    def merge_batch(committed: DataFrame | None, batch_df: DataFrame):
        delta = tile_pyramid(batch_df, max_res, min_res, lat=lat, lon=lon)
        if committed is None:
            return delta
        return (
            committed.unionByName(delta)
            .groupBy("cell_id", "res")
            .agg(F.sum("n").alias("n"))
        )

    return merge_batch


def _merge_batch(committed, batch_df):
    """Default-parameter merge step (importable for direct commit_batch
    use and tests)."""
    return _make_merge_batch(14, 10)(committed, batch_df)


def start_pyramid_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    max_res: int = 14,
    min_res: int = 10,
    lat: str = "lat",
    lon: str = "lon",
):
    """writeStream.foreachBatch handle maintaining `table_dir` as the
    continuous tile pyramid; returns the StreamingQuery."""
    return start_merge_stream(
        stream_df, table_dir, checkpoint_dir,
        _make_merge_batch(max_res, min_res, lat, lon),
    )
