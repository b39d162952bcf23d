"""Trajectory segmentation — split per-entity point streams into trips.

The standard GPS-track preprocessing op (trip/stay segmentation): within
each entity's time-ordered ping stream, a new trip starts when the time
gap since the previous ping exceeds ``max_gap_s`` OR the great-circle
jump exceeds ``max_jump_km`` (teleports = data glitches or untracked
travel). Downstream analytics (distance, duration, speed) then aggregate
per trip.

Scale shape: ONE window per entity (lag over (entity order by ts)) and
one groupBy — the shuffle key is the entity id, the natural partitioning
for track data. Per-entity history must fit a task (the same contract as
applyInPandasWithState sessionize — documented there); entities with
unbounded histories should be pre-split by day before this operator.
The trip index is a windowed cumulative sum of new-trip flags — per
entity, never global, so no single-partition funnel exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geodesy import haversine_km


def segment_trips(
    pings: DataFrame,
    max_gap_s: int = 1800,
    max_jump_km: float = 25.0,
    entity: str = "entity_id",
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Adds (trip_seq, trip_start, step_s, step_km): trip_seq numbers
    each entity's trips from 1 in time order, trip_start marks the first
    ping of each trip; step_s/step_km are the gap to the previous ping
    (NULL on each entity's first ping; a trip_start row's step crosses
    the trip boundary and belongs to no trip). ``ts`` is numeric (epoch
    seconds) or castable to it."""
    w = Window.partitionBy(entity).orderBy(ts)
    plat = F.lag(lat).over(w)
    plon = F.lag(lon).over(w)
    pts = F.lag(ts).over(w)
    step_s = (F.col(ts).cast("long") - pts.cast("long")).alias("step_s")
    step_km = haversine_km(plat, plon, F.col(lat), F.col(lon))
    new_trip = F.when(
        pts.isNull()
        | (F.col(ts).cast("long") - pts.cast("long") > max_gap_s)
        | (step_km > max_jump_km),
        1,
    ).otherwise(0)
    out = pings.withColumns(
        {
            "step_s": step_s,
            "step_km": F.when(pts.isNotNull(), step_km),
            "_new": new_trip,
        }
    )
    return (
        out.withColumn("trip_seq", F.sum("_new").over(w).cast("long"))
        .withColumn("trip_start", F.col("_new") == 1)
        .drop("_new")
    )


def trip_stats(
    trips: DataFrame,
    entity: str = "entity_id",
    ts: str = "ts",
) -> DataFrame:
    """(entity, trip_seq, n_pings, duration_s, total_km) per trip.
    Distances crossing a trip boundary belong to NO trip (the first ping
    of a trip contributes no step), so per-trip totals sum only
    within-trip movement."""
    return (
        trips.groupBy(entity, "trip_seq")
        .agg(
            F.count("*").alias("n_pings"),
            (
                F.max(F.col(ts).cast("long")) - F.min(F.col(ts).cast("long"))
            ).alias("duration_s"),
            F.sum(
                F.when(~F.col("trip_start"), F.col("step_km")).otherwise(0.0)
            ).alias("total_km"),
        )
    )


def stay_points(
    pings: DataFrame,
    res: int = 13,
    min_duration_s: int = 900,
    entity: str = "entity_id",
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Stay-point detection, grid flavor: maximal runs of consecutive
    pings inside the SAME grid cell lasting >= min_duration_s become
    stays — (entity, cell_id, enter_ts, exit_ts, duration_s, n_pings).
    The grid quantization replaces the textbook anchor-scan radius test
    (halve the cell for a tighter radius); runs are found with one lag
    window + a per-entity change cumsum, the same shape as
    segment_trips — entity-keyed shuffle only."""
    from ..functions import cells as C

    w = Window.partitionBy(entity).orderBy(ts)
    cell = C.latlng_to_cell(lat, lon, res)
    with_cell = pings.withColumn("_cell", cell)
    changed = F.when(
        F.lag("_cell").over(w).isNull()
        | (F.lag("_cell").over(w) != F.col("_cell")),
        1,
    ).otherwise(0)
    runs = with_cell.withColumn(
        "_run", F.sum(changed).over(w).cast("long")
    )
    return (
        runs.groupBy(entity, "_run", F.col("_cell").alias("cell_id"))
        .agg(
            F.min(F.col(ts).cast("long")).alias("enter_ts"),
            F.max(F.col(ts).cast("long")).alias("exit_ts"),
            F.count("*").alias("n_pings"),
        )
        .withColumn("duration_s", F.col("exit_ts") - F.col("enter_ts"))
        .filter(F.col("duration_s") >= min_duration_s)
        .drop("_run")
        .select(entity, "cell_id", "enter_ts", "exit_ts", "duration_s", "n_pings")
    )


def od_matrix(
    trips: DataFrame,
    res: int = 11,
    entity: str = "entity_id",
    ts: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(o_cell, d_cell, n_trips) — the origin-destination matrix over
    segment_trips output: each trip's first/last ping cell (min_by /
    max_by on ts; ts must be unique per entity for a deterministic pick)
    counted per (origin, destination) pair. Two groupBys, both on
    natural keys."""
    from ..functions import cells as C

    cell = C.latlng_to_cell(lat, lon, res)
    ends = (
        trips.withColumn("_cell", cell)
        .groupBy(entity, "trip_seq")
        .agg(
            F.min_by("_cell", F.col(ts)).alias("o_cell"),
            F.max_by("_cell", F.col(ts)).alias("d_cell"),
        )
    )
    return ends.groupBy("o_cell", "d_cell").agg(
        F.count("*").alias("n_trips")
    )
