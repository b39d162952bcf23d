"""Exactly-once merge-into-table protocol for foreachBatch sinks —
snapshot-pointer commits, shared by every streaming operator that
maintains a mergeable table (continuous rollup, streaming sketches).

foreachBatch is at-least-once; an additive/mergeable table needs:

- **Snapshot-pointer commits** (the Iceberg model, stood in locally the
  same way plans/lineage.py documents): every commit writes a NEW version
  directory ``<table_dir>/v<batch_id>`` and then atomically replaces the
  ``CURRENT`` pointer file (write tmp + ``os.replace``, atomic on POSIX).
  A crash mid-write leaves the previous pointer — and the previous
  committed snapshot — fully intact.
- **Replay skip**: the pointer records the ``batch_id`` that produced the
  snapshot; a replayed micro-batch (same or older id) is skipped, so the
  merge applies exactly once per batch.
- **Fail loud on corruption**: a table root with version dirs but no
  readable pointer raises instead of silently re-initialising.

`start_merge_stream` is the generic operator: callers supply ONE
function `merge_batch(committed_or_None, batch_df) -> new snapshot` and
get the full protocol; `read_table` resolves the pointer for readers.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "CURRENT"
# Snapshot-expiry window: current + previous survive; older versions are
# retired at the next commit. A reader pinned to a snapshot older than
# the window can lose its files — the standard Iceberg expire-snapshots
# trade; raise for long-running readers.
_KEEP_VERSIONS = 2


def read_pointer(table_dir: str) -> dict | None:
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
            f"streaming table {table_dir!r} has version directories but no "
            f"{_POINTER} pointer; refusing to re-initialise over committed "
            "history — restore the pointer or remove the table root"
        )
    return None


def read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """The committed snapshot (resolves the CURRENT pointer)."""
    rec = read_pointer(table_dir)
    if rec is None:
        raise FileNotFoundError(f"no committed table at {table_dir!r}")
    return spark.read.parquet(os.path.join(table_dir, rec["version"]))


def commit_batch(
    spark: SparkSession, table_dir: str, batch_id: int, merge_batch, batch_df
) -> None:
    """One exactly-once fold step (usable directly from any foreachBatch)."""
    rec = read_pointer(table_dir)
    if rec is not None and batch_id <= rec["batch_id"]:
        return  # replayed micro-batch: merge already committed
    committed = (
        spark.read.parquet(os.path.join(table_dir, rec["version"]))
        if rec is not None
        else None
    )
    merged = merge_batch(committed, batch_df)
    version = f"v{batch_id}"
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, version))
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


def start_merge_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    merge_batch,
):
    """writeStream.foreachBatch handle maintaining `table_dir` as the
    exactly-once merged table; returns the StreamingQuery.

    merge_batch(committed: DataFrame | None, batch_df) -> the new full
    snapshot (committed is None on the first ever batch)."""
    spark = stream_df.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch(spark, table_dir, batch_id, merge_batch, batch_df)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
