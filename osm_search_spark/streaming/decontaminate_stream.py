"""Streaming benchmark decontamination — per-micro-batch doc verdicts
maintained as an exactly-once table.

A corpus INGEST stream (docs arriving continuously) is screened against a
static benchmark dim with the SAME `decontaminate_flags` the batch path
uses; verdict rows append into a snapshot-pointer table via the shared
exactly-once commit protocol (streaming/commit.py) — replays of a
micro-batch from the same stream never double-append, a new stream's
batches are never dropped, and readers only ever see committed
snapshots. The committed table therefore equals the batch
`decontaminate_flags` of every row ever ingested (tested across
batches).

Scale shape: per batch the work is exactly one batch decontamination
(benchmark grams broadcast/Bloom-pruned — see operators/decontaminate);
the snapshot rewrite is the verdict table only (doc_id + flag + count),
never the documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .commit import read_table, start_merge_stream

read_verdicts = read_table


def start_decontaminate_stream(
    stream_df: DataFrame,
    benchmark: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    n: int = 13,
    batch_partitions: int | None = None,
    **decontaminate_kw,
):
    """writeStream.foreachBatch handle maintaining `table_dir` as the
    exactly-once (doc_id, contaminated, n_bench_matches) verdict table;
    returns the StreamingQuery. `benchmark` is a static bounded dim,
    prepared ONCE up front (gram pass + boilerplate cap + Bloom build +
    word collect) so each micro-batch pays only the corpus-side work —
    without this the per-batch fixed cost is ~4 extra jobs and a
    driver-side word collect of pure recomputation.

    A micro-batch's partitioning is inherited from the SOURCE (one
    arriving file = one partition regardless of size), so the CPU-heavy
    gram pass would run near-serial on file-per-batch sources; each
    batch is therefore repartitioned to `batch_partitions` (default:
    defaultParallelism) before decontamination — one narrow local
    shuffle per batch, pass 0 to disable."""
    from ..operators.decontaminate import decontaminate_flags, prepare_benchmark

    prep = prepare_benchmark(benchmark, n=n, **decontaminate_kw)
    if batch_partitions is None:
        batch_partitions = stream_df.sparkSession.sparkContext.defaultParallelism

    def merge_batch(committed: DataFrame | None, batch_df: DataFrame):
        if batch_partitions:
            batch_df = batch_df.repartition(batch_partitions)
        flags = decontaminate_flags(batch_df, prep, n=n)
        if committed is None:
            return flags
        return committed.unionByName(flags)

    return start_merge_stream(stream_df, table_dir, checkpoint_dir, merge_batch)
