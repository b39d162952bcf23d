"""spark-submit entrypoint: the flagship spatial-join + tiling pipeline.

  spark-submit --py-files dist/osm_search_spark.zip jobs/tile_pipeline.py \
      --points points.parquet --polygons polygons.parquet --out /data/tiles

points:   (point_id, lat, lon, ...) — e.g. the geotagged images table
polygons: (polygon_id, name, admin_level, ring_lat, ring_lon)
output:   PIP-joined rows, tile-assigned, range-partitioned on tile id with
          salted dense cells, written partitioned by the coarse parent cell.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True)
    ap.add_argument("--polygons", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--join-res", type=int, default=12)
    ap.add_argument("--tile-res", type=int, default=14)
    ap.add_argument("--max-rows-per-task", type=int, default=500_000)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("osm-search-tile-pipeline").getOrCreate()

    from osm_search_spark.operators.spatial_join import spatial_join
    from osm_search_spark.operators.tiling import write_tiles

    points = spark.read.parquet(args.points)
    polygons = spark.read.parquet(args.polygons)
    joined = spatial_join(points, polygons, res=args.join_res)
    write_tiles(
        joined, args.out, res=args.tile_res,
        max_rows_per_task=args.max_rows_per_task,
    )
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} tiled rows to {args.out}")


if __name__ == "__main__":
    main()
