"""spark-submit entrypoint: end-to-end mobility analytics over a ping
stream — the geospatial composition DAG (the vector/mobility sibling of
curate_images.py), each step a committed lineage stage with resume +
parameter re-gating:

  1. trips      — gap-rule trip segmentation + per-trip rollup with
                  origin/destination cells (operators/trips)
  2. od         — origin-destination flow matrix over the trip rollup
  3. density    — per-cell ping counts at the analysis resolution
  4. hotspots   — Getis-Ord Gi* z-scores + local Moran's I quadrants
                  over the density raster (operators/focal)
  5. clusters   — exact point-level DBSCAN over trip origins
                  (operators/dbscan; eps/min_pts in the snapshot)
  6. footprints — convex hull ring per cluster (operators/hull),
                  ready for the PIP/overlap joins downstream

  spark-submit --py-files dist/osm_search_spark.zip jobs/analyze_mobility.py \
      --base /data/mobility [--pings pings.parquet | --synth-entities 500] \
      [--res 13] [--eps 0.004] [--min-pts 4]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth_pings(spark: SparkSession, n_entities: int, pings_each: int = 40):
    """Deterministic walk pings: each entity random-walks (hash-driven)
    from a hashed start inside the fixture band; every 4th step pauses
    long enough (>1800s) to split a trip."""
    u = "(cast(xxhash64({c}, {s}) as double) / 9.223372036854776e18 + 1.0) / 2.0"
    e, i = "(id div {m})".format(m=pings_each), f"(id % {pings_each})"
    step = (
        "aggregate(sequence(0, cast({i} as int)), cast(0.0 as double), "
        "(acc, j) -> acc + (case when xxhash64({e}, j, {s}) % 2 = 0 "
        "then 0.002 else -0.002 end))"
    )
    # monotonic per entity; the accumulated offset jumps by 3600s
    # (> the 1800s gap rule) between i=3->4, 7->8, ... -> exact 4-ping
    # trips
    gap = f"({i} * 300 + ({i} div 4) * 3600)"
    return spark.range(0, n_entities * pings_each, 1, 32).select(
        F.expr(e).alias("entity_id"),
        F.expr(f"cast({e} * 100000 + {gap} as long)").alias("ts"),
        F.expr(
            f"-7.9 + {u.format(c=e, s=1)} * 0.4 + {step.format(i=i, e=e, s=3)}"
        ).alias("lat"),
        F.expr(
            f"110.25 + {u.format(c=e, s=2)} * 0.6 + {step.format(i=i, e=e, s=4)}"
        ).alias("lon"),
    )


def run(
    spark: SparkSession,
    base: str,
    pings_path: str | None = None,
    synth_entities: int = 0,
    res: int = 13,
    eps: float = 0.004,
    min_pts: int = 4,
    max_gap_s: int = 1800,
    snapshot: str = "",
):
    from osm_search_spark.functions import cells as C
    from osm_search_spark.operators.dbscan import dbscan
    from osm_search_spark.operators.focal import gi_star, moran_local
    from osm_search_spark.operators.hull import convex_hull
    from osm_search_spark.operators.trips import segment_trips
    from osm_search_spark.plans.lineage import run_stage

    if synth_entities:
        pings = synth_pings(spark, synth_entities)
        snap = f"synth|n={synth_entities}"
    else:
        pings = spark.read.parquet(pings_path)
        snap = f"{pings_path}|{snapshot}"
    snap = f"{snap}|res={res}|gap={max_gap_s}"

    def build_trips():
        seg = segment_trips(pings, max_gap_s=max_gap_s, max_jump_km=1.0e12)
        cell = C.latlng_to_cell("lat", "lon", res)
        return seg.groupBy("entity_id", "trip_seq").agg(
            F.count(F.lit(1)).alias("n_pings"),
            (F.max("ts") - F.min("ts")).alias("duration_s"),
            F.round(F.sum(F.when(~F.col("trip_start"), F.col("step_km"))), 6)
            .alias("total_km"),
            F.min_by(cell, F.struct("ts", "lat", "lon")).alias("o_cell"),
            F.max_by(cell, F.struct("ts", "lat", "lon")).alias("d_cell"),
            F.min_by(F.col("lat"), F.struct("ts", "lat", "lon")).alias("o_lat"),
            F.min_by(F.col("lon"), F.struct("ts", "lat", "lon")).alias("o_lon"),
        )

    trips = run_stage(spark, base, "trips", build_trips, input_snapshot=snap)

    od = run_stage(
        spark, base, "od",
        lambda: trips.groupBy("o_cell", "d_cell").agg(
            F.count(F.lit(1)).alias("flows"),
            F.sum("n_pings").alias("pings"),
        ),
        input_snapshot=snap, cell_col="o_cell",
    )

    density = run_stage(
        spark, base, "density",
        lambda: pings.groupBy(
            C.latlng_to_cell("lat", "lon", res).alias("cell_id")
        ).agg(F.count(F.lit(1)).alias("value")),
        input_snapshot=snap, cell_col="cell_id",
    )

    hotspots = run_stage(
        spark, base, "hotspots",
        lambda: gi_star(density, res, 1)
        .select("cell_id", "value", F.round("gi_z", 6).alias("gi_z"))
        .join(
            moran_local(density, res, 1).select(
                "cell_id", F.round("moran_i", 6).alias("moran_i"), "quadrant"
            ),
            "cell_id",
        ),
        input_snapshot=snap, cell_col="cell_id",
    )

    clusters = run_stage(
        spark, base, "clusters",
        lambda: dbscan(
            trips.select(
                # unique point id per trip origin: entity * 2^20 + seq
                (F.col("entity_id") * F.lit(1 << 20) + F.col("trip_seq"))
                .alias("point_id"),
                F.col("o_lat").alias("lat"),
                F.col("o_lon").alias("lon"),
            ),
            eps, min_pts,
        ),
        input_snapshot=f"{snap}|eps={eps}|min_pts={min_pts}",
    )

    def build_footprints():
        # dbscan emits (point_id, role, cluster_id) — join the origin
        # coordinates back from the trips stage
        pts = trips.select(
            (F.col("entity_id") * F.lit(1 << 20) + F.col("trip_seq"))
            .alias("point_id"),
            F.col("o_lat").alias("lat"),
            F.col("o_lon").alias("lon"),
        )
        cl = clusters.filter(F.col("cluster_id").isNotNull()).join(
            pts, "point_id"
        )
        return convex_hull(cl, group="cluster_id")

    footprints = run_stage(
        spark, base, "footprints", build_footprints,
        input_snapshot=f"{snap}|eps={eps}|min_pts={min_pts}",
    )
    return trips, od, density, hotspots, clusters, footprints


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True)
    ap.add_argument("--pings")
    ap.add_argument("--synth-entities", type=int, default=0)
    ap.add_argument("--res", type=int, default=13)
    ap.add_argument("--eps", type=float, default=0.004)
    ap.add_argument("--min-pts", type=int, default=4)
    ap.add_argument("--snapshot", default="")
    args = ap.parse_args()
    spark = SparkSession.builder.appName("analyze-mobility").getOrCreate()
    outs = run(
        spark, args.base, args.pings, args.synth_entities,
        args.res, args.eps, args.min_pts, snapshot=args.snapshot,
    )
    for name, df in zip(
        ("trips", "od", "density", "hotspots", "clusters", "footprints"),
        outs,
    ):
        print(f"{name}: {df.count()} rows")


if __name__ == "__main__":
    main()
