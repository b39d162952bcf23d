"""Grouped-refine fallback at its trigger size: 25k polygons.

spatial_join auto-switches from the broadcast "expr" plan to the
non-broadcast "grouped" (applyInPandas co-group) plan above
AUTO_GROUPED_DIM_THRESHOLD (20k) polygons. Round-2 verdict item 6: measure
the fallback AT fallback scale and prove output parity on overlapping
polygons.

Synthesizes a 25k-quad overlapping grid + n_points deterministic points,
runs both refine plans, checksums the (point_id, polygon_id) output
(bit_xor of xxhash64 — order-insensitive), and times each.

Usage: python tools/bench_grouped_refine.py [n_polys] [n_points]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_search_spark.operators.spatial_join import spatial_join  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402


def main():
    n_polys = int(sys.argv[1]) if len(sys.argv) > 1 else 25000
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
    spark = get_spark("bench-grouped")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    base_lat, base_lon, step, ext = -7.9, 110.2, 0.02, 0.03  # ext > step: overlap
    cols = 160
    polys = (
        spark.range(n_polys)
        .select(
            F.col("id").alias("polygon_id"),
            (F.lit(base_lat) + (F.col("id") % cols) * step).alias("la"),
            (F.lit(base_lon) + (F.col("id") / cols).cast("long") * step).alias("lo"),
        )
        .select(
            "polygon_id",
            F.array("la", "la", F.col("la") + ext, F.col("la") + ext, "la")
            .alias("ring_lat"),
            F.array("lo", F.col("lo") + ext, F.col("lo") + ext, "lo", "lo")
            .alias("ring_lon"),
        )
        .repartition(cpus)
        .persist()
    )
    polys.count()

    lat_span = cols * step + ext
    lon_span = (n_polys // cols) * step + ext
    pts = (
        spark.range(n_points)
        .select(
            F.col("id").alias("point_id"),
            (F.lit(base_lat) + F.pmod(
                F.xxhash64("id") / F.lit(2.0 ** 63) + 1.0, F.lit(1.0)
            ) * lat_span).alias("lat"),
            (F.lit(base_lon) + F.pmod(
                F.xxhash64(F.col("id") + 1) / F.lit(2.0 ** 63) + 1.0, F.lit(1.0)
            ) * lon_span).alias("lon"),
        )
        .repartition(cpus)
        .persist()
    )
    pts.count()

    def run(label, **kw):
        out = spatial_join(pts, polys, **kw).select("point_id", "polygon_id")
        t0 = time.perf_counter()
        row = out.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("point_id", "polygon_id")).alias("chk"),
        ).collect()[0]
        return round(time.perf_counter() - t0, 3), row["n"], row["chk"]

    # warm
    run("warm", refine="expr", dim_threshold=None)
    expr_sec, expr_n, expr_chk = run("expr", refine="expr", dim_threshold=None)
    grp_sec, grp_n, grp_chk = run("grouped")  # auto-falls back at 25k
    assert (expr_n, expr_chk) == (grp_n, grp_chk), (
        "parity failure", expr_n, grp_n, expr_chk, grp_chk)
    print(json.dumps(dict(
        n_polys=n_polys, n_points=n_points, joined_rows=expr_n,
        parity="checksum-identical",
        expr_sec=expr_sec, grouped_sec=grp_sec,
        grouped_rows_per_sec=round(expr_n / grp_sec, 1),
    )))


if __name__ == "__main__":
    main()
