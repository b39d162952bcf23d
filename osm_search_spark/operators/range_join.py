"""Range (interval) join: points x intervals containment without a theta
join.

Spark compiles `lo <= p AND p <= hi` join conditions to
BroadcastNestedLoopJoin (or a full cartesian when neither side broadcasts)
— O(|P| x |I|). This operator is the 1-D analog of the engine's cell-cover
spatial join (operators/spatial_join.py): intervals explode into the
fixed-width buckets they overlap, points hash to their bucket, and the
containment test runs only on the bucket-collocated candidates — an
EQUI-join Catalyst can broadcast or shuffle-hash, never a nested loop.
Candidate count per point is bounded by the intervals overlapping its
bucket, so cost scales with true selectivity + interval_width/bucket_width
duplication, the identical trade the polygon cover makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """All point columns + all interval columns for pairs with
    lo <= point < hi (half-open, the convention that tiles a line without
    double-matching shared edges). Pick ``bucket_width`` near the median
    interval length: wider buckets duplicate less but admit more false
    candidates."""
    if not bucket_width > 0:
        raise ValueError("bucket_width must be positive")
    cover = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # conservative superset: when hi sits exactly on a bucket
                # edge this emits one spurious bucket whose candidates the
                # exact `p < hi` filter removes — same contract as the
                # polygon bbox cover (correct first, tight second)
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ).alias("_bucket"),
    )
    if broadcast_intervals:
        cover = F.broadcast(cover)
    pts = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    return (
        pts.join(cover, "_bucket")
        .filter(
            (F.col(lo_col) <= F.col(point_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bucket")
    )
