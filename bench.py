"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "throughput_rows_per_sec": ...}

The flagship metric is spatial-join + tile-assignment throughput (rows/sec)
per BASELINE.json. Scaling-efficiency evidence (local[N] vs local[4N]) is
produced by tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "spatial_tile_join",
    "tile_assign",
    "admin_first_match",
    "knn_k5",
    "bm25_search",
    "minhash_signatures",
    "embedding_topk",
    "image_tile_join",
    "bulk_reverse_geocode",
]


def run_noop(df) -> int:
    """Force full materialization of every column (count() would let Spark
    prune the computed columns)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    import __spark_entry__ as entrymod
    from osm_search_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warm the JVM + parquet footers once with the cheapest query
    queries["tile_assign"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-2 per query: the sandbox VM shows 2-3x run-to-run variance
    # from host contention; min-of-N is the standard noise damper
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run_noop(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    # flagship throughput from the best timed run of the same query
    n_rows = entrymod.q_spatial_tile_join(spark, sf_dir).count()
    flagship_sec = times["spatial_tile_join"]
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "spatial_join_tile_assign_total_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "flagship_rows": n_rows,
        "throughput_rows_per_sec": round(n_rows / flagship_sec, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
