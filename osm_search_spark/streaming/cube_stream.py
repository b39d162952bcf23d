"""Streaming space-time cube maintenance: live emerging-hot-spot input.

Emerging hot-spot analysis (operators/emerging.py) consumes a
(bin, cell_id, value) space-time cube. This maintainer keeps that cube
current as geotagged pings arrive: each micro-batch is counted into its
own (bin, cell) delta — one groupBy of the batch — and folded into the
committed cube with an additive merge, so history is never
re-aggregated from raw pings and per-batch cost is O(batch) + a merge
over the touched (bin, cell) keys. Counts are integers, so
merge(cube(A), B) == cube(A ∪ B) EXACTLY, and therefore
emerging_hotspots(committed cube) == emerging_hotspots(batch cube of
everything ever ingested) — the z-scores, Mann-Kendall S, and
categories are all deterministic functions of the cube.

Exactly-once via the shared snapshot-pointer protocol
(streaming/commit.py): version dir per batch + atomic CURRENT replace,
replayed (stream_id, batch_id) skipped, fail-loud on a missing pointer.

Scale note: the cube is the ROLLUP, not the pings — bins x occupied
cells. The analysis step (per-bin Gi* + MK) runs on demand over the
committed cube (`analyze_cube`), not inside the micro-batch loop; a
dashboard refresh triggers one bounded job over cube-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as C
from .commit import read_table, start_merge_stream


def cube_of(
    pings: DataFrame,
    res: int,
    bin_width_s: int,
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(bin, cell_id, value) counts of a ping frame — the batch-side
    cube derivation shared by the stream delta and the parity oracle.
    ``ts`` is numeric epoch seconds (or castable to long)."""
    return (
        pings.groupBy(
            F.floor(F.col(ts).cast("long") / bin_width_s).alias("bin"),
            C.latlng_to_cell(lat, lon, res).alias("cell_id"),
        )
        .agg(F.count(F.lit(1)).alias("value"))
    )


def _make_merge_batch(res: int, bin_width_s: int, ts: str, lat: str, lon: str):
    def merge_batch(committed: DataFrame | None, batch_df: DataFrame):
        delta = cube_of(batch_df, res, bin_width_s, ts=ts, lat=lat, lon=lon)
        if committed is None:
            return delta
        return (
            committed.unionByName(delta)
            .groupBy("bin", "cell_id")
            .agg(F.sum("value").alias("value"))
        )

    return merge_batch


def read_cube(spark: SparkSession, table_dir: str) -> DataFrame:
    """The committed cube snapshot (resolves the CURRENT pointer)."""
    return read_table(spark, table_dir)


def analyze_cube(
    spark: SparkSession, table_dir: str, res: int, k: int = 1
) -> DataFrame:
    """Emerging hot-spot analysis over the committed cube — the
    on-demand consumer of this maintainer."""
    from ..operators.emerging import emerging_hotspots

    return emerging_hotspots(read_cube(spark, table_dir), res, k)


def start_cube_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    res: int,
    bin_width_s: int = 3600,
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
):
    """writeStream.foreachBatch handle maintaining `table_dir` as the
    continuous space-time cube; returns the StreamingQuery."""
    return start_merge_stream(
        stream_df, table_dir, checkpoint_dir,
        _make_merge_batch(res, bin_width_s, ts, lat, lon),
    )
