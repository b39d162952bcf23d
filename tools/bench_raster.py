"""Raster<->vector scale bench: rasterize + vectorize a star-polygon layer.

Usage: python tools/bench_raster.py [n_polys=1000] [res=14] [px=16] [cpus=32]

Synthesizes ``n_polys`` deterministic 12-point star polygons (concave —
every tile ring is PARTIAL-heavy) across the fixture country box, then:
  1. rasterize_polygons at (res, px)   -> tiles, set pixels, sec
  2. vectorize_masks on the result     -> rings, sec
  3. exact invariant at scale: sum(shoelace area2) == 2 * sum(n_set)

Prints one JSON line. Run at two cpu counts for scaling evidence
(BENCH/BASELINE.md protocol: best-of-2, fresh JVM per level).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def star_polygons(spark, n: int):
    """Deterministic concave 12-gons over the country box (no RNG)."""
    from pyspark.sql import functions as F

    # centers on a 40-col grid inside (-7.88..-7.47, 110.27..110.88)
    base = spark.range(n).select(
        F.col("id").alias("polygon_id"),
        (F.lit(-7.88) + (F.col("id") % 40) * F.lit(0.0102)).alias("clat"),
        (F.lit(110.27) + (F.col("id") / 40).cast("long") * F.lit(0.0137)).alias("clon"),
        # radii vary deterministically: 0.012..0.030 deg
        (F.lit(0.012) + (F.col("id") % 7) * F.lit(0.0026)).alias("r1"),
    )
    ks = F.sequence(F.lit(0), F.lit(12))  # 13 vertices: closed ring
    two_pi = 2.0 * math.pi

    def vert(lat: bool):
        def mk(k):
            ang = k.cast("double") * F.lit(two_pi / 12.0)
            r = F.when(k % 2 == 0, F.col("r1")).otherwise(F.col("r1") * 0.45)
            return F.col("clat") + r * F.cos(ang) if lat else F.col("clon") + r * F.sin(ang)

        return F.transform(ks, mk)

    return base.select("polygon_id", vert(True).alias("ring_lat"), vert(False).alias("ring_lon"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    px = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from pyspark.sql import functions as F

    from osm_search_spark.operators import raster as R
    from osm_search_spark.session import get_spark

    spark = get_spark("bench_raster", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    polys = star_polygons(spark, n)

    def once():
        t0 = time.monotonic()
        rast = R.rasterize_polygons(polys, res=res, px=px)
        rast.write.mode("overwrite").parquet("/tmp/bench_raster_masks")
        t_rast = time.monotonic() - t0
        rastp = spark.read.parquet("/tmp/bench_raster_masks")
        stats = rastp.agg(
            F.count(F.lit(1)).alias("tiles"), F.sum("n_set").alias("set_px")
        ).collect()[0]
        t0 = time.monotonic()
        rings = R.vectorize_masks(rastp, res, px)
        ring_stats = rings.agg(
            F.count(F.lit(1)).alias("rings"), F.sum("area2").alias("area2")
        ).collect()[0]
        t_vec = time.monotonic() - t0
        assert ring_stats["area2"] == 2 * stats["set_px"], "shoelace != 2*pixels"
        return t_rast, t_vec, stats, ring_stats

    # best-of-2 (host-contention protocol)
    r1 = once()
    r2 = once()
    t_rast = min(r1[0], r2[0])
    t_vec = min(r1[1], r2[1])
    stats, ring_stats = r2[2], r2[3]
    print(
        json.dumps(
            {
                "n_polys": n, "res": res, "px": px, "cpus": cpus,
                "tiles": stats["tiles"], "set_px": int(stats["set_px"]),
                "rings": ring_stats["rings"],
                "rasterize_sec": round(t_rast, 3),
                "vectorize_sec": round(t_vec, 3),
                "tiles_per_sec": round(stats["tiles"] / t_rast, 1),
                "invariant": "area2 == 2*set_px",
            }
        )
    )


if __name__ == "__main__":
    main()
