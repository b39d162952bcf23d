"""Streaming continuous aggregate: the hypertable rollup maintained per
micro-batch via foreachBatch + the SAME merge the batch path uses.

Each micro-batch aggregates only its own rows (operators/rollup.time_rollup)
and folds into the committed rollup table with merge_rollup — history is
never re-aggregated from raw events, so per-batch cost is O(batch) + a
merge keyed on the touched buckets.

Exactly-once comes from the shared snapshot-pointer commit protocol in
streaming/commit.py (version dir per batch + atomic CURRENT replace,
replayed batch_ids skipped, fail-loud on a missing pointer). Read the
table with ``read_rollup``. merge == full recompute equality is proven
in batch (test_rollup_range); the streaming test proves the same
invariant ACROSS micro-batches, plus replay idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .commit import read_table, start_merge_stream


def read_rollup(spark: SparkSession, table_dir: str) -> DataFrame:
    """The committed rollup snapshot (resolves the CURRENT pointer)."""
    return read_table(spark, table_dir)


def _make_merge_batch(
    bucket: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
):
    from ..operators.rollup import merge_rollup, time_rollup

    def merge_batch(committed: DataFrame | None, batch_df: DataFrame):
        if committed is None:
            return time_rollup(batch_df, bucket, keys, ts, value)
        return merge_rollup(committed, batch_df, bucket, keys, ts, value)

    return merge_batch


def _merge_batch(committed, batch_df):
    """Default-parameter merge step (importable for direct commit_batch
    use and tests)."""
    return _make_merge_batch()(committed, batch_df)


def start_rollup_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    bucket: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
    ts: str = "ts",
    value: str = "value",
):
    """writeStream.foreachBatch handle maintaining `table_dir` as the
    continuous rollup; returns the StreamingQuery."""
    return start_merge_stream(
        stream_df, table_dir, checkpoint_dir,
        _make_merge_batch(bucket, keys, ts, value),
    )
