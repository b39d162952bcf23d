"""Round-9 optimization harness (bench.py stays FROZEN — guide §1.4).

Per query: noop-sink timing (N repeats, min+median), Spark JOB COUNT per
invocation (statusTracker over a job group — the latency proxy for
driver-synchronized iterative operators), and `.explain("formatted")` dumps
into plans/r09/<query>_<tag>.txt.

Usage:
  python bench_extra.py time  [q1,q2,...] [repeats] [sf_dir]
  python bench_extra.py plan  <tag> [q1,q2,...] [sf_dir]
  python bench_extra.py jobs  [q1,q2,...] [sf_dir]
"""

from __future__ import annotations

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


def get_session():
    from osm_search_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("bench_extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    if mode == "plan":
        tag = sys.argv[2]
        names = sys.argv[3].split(",") if len(sys.argv) > 3 else HEADLINE
        sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
        spark = get_session()
        os.makedirs("plans/r09", exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r09/{name}_{tag}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
        return

    names = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else HEADLINE
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    spark = get_session()
    sc = spark.sparkContext

    # warm the JVM + parquet footers (same as bench.py)
    noop(queries["tile_assign"](spark, sf_dir))

    results = {}
    for name in names:
        fn = queries[name]
        times = []
        n_jobs = []
        for i in range(repeats):
            group = f"{name}-r{i}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
            n_jobs.append(
                len(sc.statusTracker()._jtracker.getJobIdsForGroup(group))
            )
            sc.setJobGroup("idle", "idle")
        times_sorted = sorted(times)
        results[name] = {
            "min": times_sorted[0],
            "med": times_sorted[len(times_sorted) // 2],
            "all": times,
            "jobs": n_jobs[-1],
        }
        print(
            f"{name:24s} min={times_sorted[0]:7.3f} "
            f"med={times_sorted[len(times_sorted)//2]:7.3f} "
            f"jobs={n_jobs[-1]:3d}  all={times}",
            flush=True,
        )
    total_min = round(sum(v["min"] for v in results.values()), 3)
    print(f"TOTAL(min) {total_min}")


if __name__ == "__main__":
    main()
