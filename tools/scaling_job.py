"""One scaling-run of the flagship job at a given parallelism level.

The job is the north-rule pipeline: points (scaled x MULT via explode to get
a measurable working set) -> cell-cover hash join vs admin polygons -> exact
PIP refine -> tile assignment -> full materialization (noop sink, so the
measurement is compute+shuffle, not disk variance).

Prints ONE json line: {"cpus": N, "rows": R, "sec": S, "rows_per_sec": T,
"checksum": X}. The checksum (order-insensitive xor of row hashes) proves
both parallelism levels produced IDENTICAL output.

Usage: SPARK_GRAFT_CPUS=8 python tools/scaling_job.py [sf_dir] [mult]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_search_spark.functions import cells as C  # noqa: E402
from osm_search_spark.operators.spatial_join import spatial_join  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402
from osm_search_spark.sources import synth  # noqa: E402


def scaled_points(spark, sf_dir: str, mult: int, partitions: int):
    """MULT deterministic variants of each derived point (slight lat/lon
    shifts) — scales the working set without changing the join shape.

    The sf0.1 parquet is ONE small file = one input split, which would make
    the whole narrow pipeline a single task at any core count; at 100 TB the
    scan has thousands of splits. `repartition` simulates those splits so
    the measurement reflects the real parallel shape."""
    base = synth.derive_points(spark, sf_dir).repartition(partitions, "point_id")
    return base.select(
        "point_id", "lat", "lon",
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep"),
    ).select(
        (F.col("point_id") * mult + F.col("rep")).alias("point_id"),
        "lat", "lon",
    ).select(
        "point_id",
        (F.col("lat") + (F.col("point_id") % 1000) * 1e-7).alias("lat"),
        (F.col("lon") + (F.col("point_id") % 997) * 1e-7).alias("lon"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    spark = get_spark(f"scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # split count is a property of the DATA (fixed across parallelism levels,
    # like file splits on a real cluster), not of the core count. The points
    # are cached + materialized BEFORE timing: sf0.1 is one tiny parquet file,
    # so its scan is an inherently-serial sandbox artifact — on the real
    # layout (tile-partitioned Iceberg) the scan parallelizes by split.
    points = scaled_points(spark, sf_dir, mult, partitions=128).persist()
    points.count()
    polys = synth.admin_polygons(spark)

    def run():
        joined = spatial_join(points, polys, res=C.JOIN_RES)
        tiled = joined.select(
            "point_id", "polygon_id",
            C.latlng_to_cell("lat", "lon", C.TILE_RES).alias("tile_id"),
        )
        return tiled

    # warmup (JIT, parquet footers, broadcast) — small slice
    run().limit(1000).write.format("noop").mode("overwrite").save()

    sec = float("inf")
    for _ in range(2):  # best-of-2: 2-3x run-to-run host contention
        t0 = time.perf_counter()
        out = run()
        agg = out.agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64("point_id", "polygon_id", "tile_id")).alias("checksum"),
        ).collect()[0]
        sec = min(sec, time.perf_counter() - t0)
    print(
        json.dumps(
            dict(
                cpus=cpus, rows=agg["rows"], sec=round(sec, 3),
                rows_per_sec=round(agg["rows"] / sec, 1),
                checksum=int(agg["checksum"]), mult=mult, sf_dir=sf_dir,
            )
        )
    )


if __name__ == "__main__":
    main()
