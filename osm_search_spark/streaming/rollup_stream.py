"""Streaming continuous aggregate: the hypertable rollup maintained per
micro-batch via foreachBatch + the SAME merge the batch path uses.

Each micro-batch aggregates only its own rows (operators/rollup.time_rollup)
and folds into the committed rollup table with merge_rollup — history is
never re-aggregated from raw events, so per-batch cost is O(batch) + a
merge keyed on the touched buckets. The committed table lives as parquet
with an atomic swap (write new -> replace), the sandbox stand-in for an
Iceberg MERGE (same mapping as plans/lineage.py documents); exactly-once
comes from Spark's foreachBatch checkpointing + the idempotent swap.

merge == full-recompute equality is proven in batch (test_rollup_range);
the streaming test proves the same invariant ACROSS micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


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
    from ..operators.rollup import merge_rollup, time_rollup

    spark = stream_df.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(f"{table_dir}/_SUCCESS"):
            committed = spark.read.parquet(table_dir)
            merged = merge_rollup(committed, batch_df, bucket, keys, ts, value)
        else:
            merged = time_rollup(batch_df, bucket, keys, ts, value)
        staged = f"{table_dir}__staging"
        merged.write.mode("overwrite").parquet(staged)
        # atomic-enough swap: the committed dir is replaced only after the
        # staging write fully succeeded (Iceberg MERGE on a cluster)
        spark.read.parquet(staged).write.mode("overwrite").parquet(table_dir)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
