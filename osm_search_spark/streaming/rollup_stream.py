"""Streaming continuous aggregate: the hypertable rollup maintained per
micro-batch via foreachBatch + the SAME merge the batch path uses.

Each micro-batch aggregates only its own rows (operators/rollup.time_rollup)
and folds into the committed rollup table with merge_rollup — history is
never re-aggregated from raw events, so per-batch cost is O(batch) + a
merge keyed on the touched buckets.

Exactly-once despite foreachBatch being at-least-once:

- **Snapshot-pointer commits** (the Iceberg model, stood in locally the
  same way plans/lineage.py documents): every commit writes a NEW version
  directory ``<table_dir>/v<batch_id>`` and then atomically replaces the
  ``CURRENT`` pointer file (write tmp + ``os.replace``, atomic on POSIX).
  A crash mid-write leaves the previous pointer — and therefore the
  previous committed snapshot — fully intact; no committed history can be
  lost to a partially-rewritten directory.
- **Replay skip**: the pointer records the ``batch_id`` that produced the
  snapshot. A replayed micro-batch (same or older batch_id) is skipped,
  so the additive merge is applied exactly once per batch.
- **Fail loud on corruption**: a table root that exists with version dirs
  but no readable pointer raises instead of silently re-initialising the
  rollup from the current batch alone.

Read the table with ``read_rollup`` (resolves the pointer). merge == full
recompute equality is proven in batch (test_rollup_range); the streaming
test proves the same invariant ACROSS micro-batches, plus replay
idempotence.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "CURRENT"
_KEEP_VERSIONS = 2  # current + previous (crash-recovery window)


def _read_pointer(table_dir: str) -> dict | None:
    """Parse <table_dir>/CURRENT, or None if the table was never committed.

    Raises RuntimeError if the root holds version dirs but no pointer —
    that is a half-deleted/corrupted table, not an empty one.
    """
    ptr = os.path.join(table_dir, _POINTER)
    if os.path.exists(ptr):
        with open(ptr) as f:
            return json.load(f)
    if os.path.isdir(table_dir) and any(
        e.startswith("v") for e in os.listdir(table_dir)
    ):
        raise RuntimeError(
            f"rollup table {table_dir!r} has version directories but no "
            f"{_POINTER} pointer; refusing to re-initialise over committed "
            "history — restore the pointer or remove the table root"
        )
    return None


def read_rollup(spark: SparkSession, table_dir: str) -> DataFrame:
    """The committed rollup snapshot (resolves the CURRENT pointer)."""
    rec = _read_pointer(table_dir)
    if rec is None:
        raise FileNotFoundError(f"no committed rollup at {table_dir!r}")
    return spark.read.parquet(os.path.join(table_dir, rec["version"]))


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
        rec = _read_pointer(table_dir)
        if rec is not None and batch_id <= rec["batch_id"]:
            return  # replayed micro-batch: merge already committed
        if rec is not None:
            committed = spark.read.parquet(
                os.path.join(table_dir, rec["version"])
            )
            merged = merge_rollup(committed, batch_df, bucket, keys, ts, value)
        else:
            merged = time_rollup(batch_df, bucket, keys, ts, value)
        version = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(table_dir, version)
        )
        # commit = atomic pointer replace; readers never see a partial table
        tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
        with open(tmp, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, os.path.join(table_dir, _POINTER))
        # retire snapshots older than the recovery window
        versions = sorted(
            (e for e in os.listdir(table_dir) if e.startswith("v")),
            key=lambda e: int(e[1:]),
        )
        for old in versions[:-_KEEP_VERSIONS]:
            shutil.rmtree(os.path.join(table_dir, old), ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
