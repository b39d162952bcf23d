"""Polygon overlap join at scale: two synthetic rectangle layers, wall
time + the decided/refined split (how much work the FULL∧FULL shortcut
removes).

Usage: python tools/bench_overlap.py [n_per_layer] [res]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_search_spark.operators.overlap_join import polygon_overlap_join  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402


def _layer(spark, n, salt, cpus):
    k = F.col("id") + 1
    # spread over ~125 x 78 degrees; sides up to 1.25 deg; exact 1/32 steps
    x0 = F.pmod(k * (7919 + salt), 4000) * 0.03125
    y0 = F.pmod(k * (104729 + 2 * salt), 2500) * 0.03125
    x1 = x0 + (F.pmod(k, 40) + 1) * 0.03125
    y1 = y0 + (F.pmod(k * 31, 40) + 1) * 0.03125
    return (
        spark.range(n)
        .repartition(cpus)
        .select(
            k.cast("long").alias("polygon_id"),
            F.array(y0, y0, y1, y1, y0).alias("ring_lat"),
            F.array(x0, x1, x1, x0, x0).alias("ring_lon"),
        )
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-overlap")
    spark.sparkContext.setLogLevel("ERROR")

    a = _layer(spark, n, 0, cpus).persist()
    b = _layer(spark, n, 17, cpus).persist()
    a.count(), b.count()

    t0 = time.perf_counter()
    pairs = polygon_overlap_join(a, b, res=res)
    n_pairs = pairs.count()
    sec = round(time.perf_counter() - t0, 3)

    # decided/refined split (re-derives the pair classification)
    from osm_search_spark.operators.spatial_join import classified_cover

    cov_a = classified_cover(a, res).select(
        F.col("polygon_id").alias("pa"), "cell_id", F.col("full").alias("fa")
    )
    cov_b = classified_cover(b, res).select(
        F.col("polygon_id").alias("pb"), "cell_id", F.col("full").alias("fb")
    )
    split = (
        cov_a.join(cov_b, "cell_id")
        .groupBy("pa", "pb")
        .agg(F.max(F.col("fa") & F.col("fb")).alias("decided"))
        .groupBy("decided")
        .count()
        .collect()
    )
    by = {r["decided"]: r["count"] for r in split}
    print(json.dumps(dict(
        n_per_layer=n, res=res, pairs_out=n_pairs, sec=sec,
        pairs_per_sec=round(n_pairs / sec, 1),
        candidates_decided=by.get(True, 0),
        candidates_refined=by.get(False, 0),
    )))


if __name__ == "__main__":
    main()
