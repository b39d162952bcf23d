"""Exactly-once merge-into-table protocol for foreachBatch sinks —
snapshot-pointer commits, shared by every streaming operator that
maintains a mergeable table (continuous rollup, streaming sketches).

foreachBatch is at-least-once; an additive/mergeable table needs:

- **Snapshot-pointer commits** (the Iceberg model, stood in locally the
  same way plans/lineage.py documents): every commit stages a NEW version
  directory under ``_staging_v<seq>``, renames it to
  ``<table_dir>/v<seq>`` (atomic on POSIX), and then atomically replaces
  the ``CURRENT`` pointer file (write tmp + ``os.replace``). A crash at
  any point leaves the previous pointer — and the previous committed
  snapshot — fully intact; a crash during the data write leaves only a
  staging dir that the next attempt overwrites.
- **Replay skip keyed on (stream_id, batch_id)** — the Delta
  (appId, batchId) idempotence key. A replayed micro-batch from the SAME
  stream (same id, same or older batch id) is skipped, so the merge
  applies exactly once per batch. A DIFFERENT stream (fresh checkpoint →
  batch ids restart at 0) is new data and merges normally; its batches
  are never silently discarded. `start_merge_stream` uses the normalized
  checkpoint path as the stream identity (stable across restarts, unique
  per logical stream).
- **Fail loud on corruption**: a table root with committed version dirs
  but no readable pointer raises for READERS instead of silently
  re-initialising. The one recoverable writer case: a crash between the
  FIRST commit's dir rename and its pointer write leaves exactly `v0`,
  no pointer, and the `_first_commit_inflight` marker written just
  before the rename — the replaying writer clears the orphan and redoes
  the merge. Without the marker (pointer lost externally on a committed
  one-batch table) writers fail loud like readers.

`start_merge_stream` is the generic operator: callers supply ONE
function `merge_batch(committed_or_None, batch_df) -> new snapshot` and
get the full protocol; `read_table` resolves the pointer for readers.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "CURRENT"
_VERSION_RE = re.compile(r"^v(\d+)$")
_STAGING_PREFIX = "_staging_"
# Written immediately before the FIRST commit's dir rename, removed after
# its pointer write: its presence is positive evidence the v0-no-pointer
# state came from a writer crash (not external pointer loss), gating the
# writer-side auto-recovery below (ADVICE r05).
_FIRST_COMMIT_MARKER = "_first_commit_inflight"
# Snapshot-expiry window: current + previous survive; older versions are
# retired at the next commit. A reader pinned to a snapshot older than
# the window can lose its files — the standard Iceberg expire-snapshots
# trade; raise for long-running readers.
_KEEP_VERSIONS = 2


def _version_dirs(table_dir: str) -> list[str]:
    """Committed-shape version dirs (v<seq>), sorted by seq. Staging dirs
    are uncommitted garbage and never count."""
    if not os.path.isdir(table_dir):
        return []
    return sorted(
        (e for e in os.listdir(table_dir) if _VERSION_RE.match(e)),
        key=lambda e: int(e[1:]),
    )


def read_pointer(table_dir: str) -> dict | None:
    """Parse <table_dir>/CURRENT, or None if the table was never committed.

    Raises RuntimeError if the root holds version dirs but no pointer —
    that is a half-deleted/corrupted table, not an empty one. (Staging
    dirs from a crashed data write don't trip this; they were never
    committed.)
    """
    ptr = os.path.join(table_dir, _POINTER)
    if os.path.exists(ptr):
        with open(ptr) as f:
            return json.load(f)
    if _version_dirs(table_dir):
        raise RuntimeError(
            f"streaming table {table_dir!r} has version directories but no "
            f"{_POINTER} pointer; refusing to re-initialise over committed "
            "history — restore the pointer or remove the table root"
        )
    return None


def read_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The committed snapshot (resolves the CURRENT pointer), or — with
    ``version`` — a TIME-TRAVEL read of a retained older snapshot (the
    Iceberg `VERSION AS OF` shape). Only the last _KEEP_VERSIONS
    snapshots survive commits (expire-snapshots trade, module doc);
    asking for an expired or never-committed version raises with the
    retained list. A version NEWER than the pointer is refused even if
    its directory exists: an orphaned rename from a crash mid-commit is
    not committed data."""
    rec = read_pointer(table_dir)
    if rec is None:
        raise FileNotFoundError(f"no committed table at {table_dir!r}")
    if version is None:
        return spark.read.parquet(os.path.join(table_dir, rec["version"]))
    retained = [
        v for v in _version_dirs(table_dir) if int(v[1:]) <= _rec_seq(rec)
    ]
    name = f"v{version}"
    if name not in retained:
        raise FileNotFoundError(
            f"version {version} of {table_dir!r} is expired or was never "
            f"committed; retained snapshots: {retained}"
        )
    return spark.read.parquet(os.path.join(table_dir, name))


def _rec_seq(rec: dict) -> int:
    # legacy pointers (pre round 5) recorded no seq; their version name
    # was v<batch_id>, which is still a valid monotonic seq for them
    return rec["seq"] if "seq" in rec else int(rec["version"][1:])


def _should_skip(rec: dict | None, stream_id, batch_id: int) -> bool:
    """The (stream_id, batch_id) idempotence rule. Legacy pointers (or
    direct callers passing stream_id=None) fall back to batch-id-only —
    the pre-round-5 behavior, which cannot tell a fresh-checkpoint
    restart from a replay; pass a stream_id to get the real key."""
    if rec is None:
        return False
    if stream_id is None or "stream_id" not in rec:
        return batch_id <= rec["batch_id"]
    return rec["stream_id"] == stream_id and batch_id <= rec["batch_id"]


def commit_batch(
    spark: SparkSession,
    table_dir: str,
    batch_id: int,
    merge_batch,
    batch_df,
    stream_id: str | None = None,
) -> None:
    """One exactly-once fold step (usable directly from any foreachBatch).

    stream_id identifies the logical stream (e.g. its checkpoint path);
    the replay skip fires only for (same stream, same-or-older batch) —
    a new stream whose batch ids restart at 0 merges normally."""
    try:
        rec = read_pointer(table_dir)
    except RuntimeError:
        # Writer-side recovery: a crash between the FIRST commit's dir
        # rename and its pointer write leaves exactly v0, no pointer, and
        # the in-flight marker (written just before the rename). All
        # three conditions must hold — a one-batch table whose pointer
        # was lost EXTERNALLY has no marker and stays fail-loud, so the
        # committed snapshot is never silently destroyed.
        vs = _version_dirs(table_dir)
        marker = os.path.join(table_dir, _FIRST_COMMIT_MARKER)
        if [int(e[1:]) for e in vs] == [0] and os.path.exists(marker):
            shutil.rmtree(os.path.join(table_dir, vs[0]), ignore_errors=True)
            os.remove(marker)
            rec = None
        else:
            raise
    if _should_skip(rec, stream_id, batch_id):
        return  # replayed micro-batch: merge already committed
    committed = (
        spark.read.parquet(os.path.join(table_dir, rec["version"]))
        if rec is not None
        else None
    )
    merged = merge_batch(committed, batch_df)
    seq = _rec_seq(rec) + 1 if rec is not None else 0
    version = f"v{seq}"
    final = os.path.join(table_dir, version)
    staging = os.path.join(table_dir, f"{_STAGING_PREFIX}{version}")
    # stage the data write: a crash here leaves only uncommitted staging
    merged.write.mode("overwrite").parquet(staging)
    # a crashed PREVIOUS attempt of this same seq may have left the final
    # dir (rename done, pointer not) — it was never committed, clear it
    if os.path.exists(final):
        shutil.rmtree(final, ignore_errors=True)
    if seq == 0:
        # crash-evidence marker for the one recoverable writer state
        with open(os.path.join(table_dir, _FIRST_COMMIT_MARKER), "w") as f:
            f.write(str(batch_id))
    os.replace(staging, final)
    # commit = atomic pointer replace; readers never see a partial table
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": version,
                "seq": seq,
                "batch_id": batch_id,
                "stream_id": stream_id,
            },
            f,
        )
    os.replace(tmp, os.path.join(table_dir, _POINTER))
    marker = os.path.join(table_dir, _FIRST_COMMIT_MARKER)
    if os.path.exists(marker):
        os.remove(marker)
    # retire snapshots older than the recovery window + stale staging dirs
    versions = _version_dirs(table_dir)
    for old in versions[:-_KEEP_VERSIONS]:
        shutil.rmtree(os.path.join(table_dir, old), ignore_errors=True)
    for e in os.listdir(table_dir):
        if e.startswith(_STAGING_PREFIX) and e != f"{_STAGING_PREFIX}{version}":
            shutil.rmtree(os.path.join(table_dir, e), ignore_errors=True)


def start_merge_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    merge_batch,
):
    """writeStream.foreachBatch handle maintaining `table_dir` as the
    exactly-once merged table; returns the StreamingQuery.

    merge_batch(committed: DataFrame | None, batch_df) -> the new full
    snapshot (committed is None on the first ever batch). The stream's
    identity for the replay-skip key is its normalized checkpoint path —
    restarting from the same checkpoint dedupes replays; a fresh
    checkpoint is a new stream whose batches all merge."""
    spark = stream_df.sparkSession
    stream_id = os.path.abspath(checkpoint_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch(
            spark, table_dir, batch_id, merge_batch, batch_df,
            stream_id=stream_id,
        )

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
