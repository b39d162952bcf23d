"""spark-submit entrypoint: vector-tile materialization.

  spark-submit --py-files dist/osm_search_spark.zip jobs/vector_tile_pipeline.py \
      --polygons polygons.parquet --out /data/vtiles --tile-res 12 \
      --tolerance 0.0005

polygons: (polygon_id, ring_lat, ring_lon[, holes_lat, holes_lon], ...)
output:   per-(polygon, tile-cell) clipped geometry — Douglas-Peucker
          simplified at --tolerance degrees, Sutherland-Hodgman cut to
          each covered cell (FULL cells as zero-work rectangles),
          range-partitioned on cell id and directory-partitioned by the
          coarse parent cell (the write_tiles layout contract).

Typical zoom ladder: run once per tile-res with tolerance ≈ half a pixel
at that zoom (e.g. cell_size_deg(res)/512).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--polygons", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tile-res", type=int, default=12)
    ap.add_argument("--tolerance", type=float, default=0.0)
    ap.add_argument("--coarse-partition-res", type=int, default=8)
    args = ap.parse_args()

    spark = SparkSession.builder.appName(
        "osm-search-vector-tile-pipeline"
    ).getOrCreate()

    from osm_search_spark.operators.clip import clip_to_tiles
    from osm_search_spark.operators.simplify import simplify_polygons
    from osm_search_spark.operators.tiling import write_vector_tiles

    polygons = spark.read.parquet(args.polygons)
    if args.tolerance > 0:
        polygons = simplify_polygons(polygons, args.tolerance).drop(
            "n_points_before", "n_points_after"
        )
    clipped = clip_to_tiles(polygons, res=args.tile_res)
    write_vector_tiles(
        clipped, args.out, coarse_partition_res=args.coarse_partition_res
    )
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} clipped geometries to {args.out}")


if __name__ == "__main__":
    main()
