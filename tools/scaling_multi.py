"""Scaling evidence for the other two workload classes, N vs 4N cores:

- text: batch BM25 (explode + join + agg + window; shuffle-bound)
- image: synthesize + decode + pHash-verify (Arrow/Python CPU-bound —
  the image-payload axis)

Same protocol as tools/bench_scaling.py: fresh subprocess per level, same
input, checksum equality, efficiency = T(4N)/(4*T(N)).

Usage: python tools/scaling_multi.py [N] [text|image ...]
(default: both workloads; name one to re-measure it alone)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r'''
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from osm_search_spark.session import get_spark
cpus = int(os.environ["SPARK_GRAFT_CPUS"])
spark = get_spark(f"scale-%(kind)s-{cpus}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

if %(kind)r == "text":
    from osm_search_spark.operators import search
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").repartition(64).cache()
    n_docs = docs.count()
    vocab = [r["term"] for r in search.build_postings(search.doc_tokens(docs))
             .groupBy("term").count().orderBy(F.desc("count"), "term").limit(40).collect()]
    queries = spark.range(8000).select(
        F.col("id").alias("query_id"),
        F.array(*[F.element_at(F.array(*[F.lit(v) for v in vocab]),
                 (F.pmod(F.col("id") * m + 7, F.lit(len(vocab))) + 1).cast("int"))
                 for m in (13, 29, 47)]).alias("terms"))
    def run():
        return search.batch_bm25_search(docs, queries, k=15).select(
            "query_id", "doc_id", F.round("score", 6).alias("s"))
    run().limit(100).write.format("noop").mode("overwrite").save()
    sec = float("inf")
    for _ in range(2):  # best-of-2: 2-3x run-to-run host contention on this VM
        t0 = time.perf_counter()
        agg = run().agg(F.count("*").alias("rows"),
                        F.bit_xor(F.xxhash64("query_id", "doc_id", "s")).alias("ck")).collect()[0]
        sec = min(sec, time.perf_counter() - t0)
else:
    from osm_search_spark.operators import image_ops
    from osm_search_spark.sources import images as img_src
    imgs = img_src.images_table(spark, 4000, partitions=64)
    def run():
        return image_ops.verify_phash(imgs)
    run().limit(50).write.format("noop").mode("overwrite").save()
    sec = float("inf")
    for _ in range(2):  # best-of-2, same protocol as the text workload
        t0 = time.perf_counter()
        agg = run().agg(F.count("*").alias("rows"),
                        F.bit_xor(F.xxhash64("image_id", "phash_recomputed", "hamming")).alias("ck")).collect()[0]
        sec = min(sec, time.perf_counter() - t0)

print(json.dumps(dict(cpus=cpus, rows=agg["rows"], sec=round(sec, 3),
                      rows_per_sec=round(agg["rows"] / sec, 1),
                      checksum=int(agg["ck"]))))
'''


def run_level(kind: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "-c", JOB % dict(repo=REPO, kind=kind)],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    kinds = tuple(sys.argv[2:]) or ("text", "image")
    results = {}
    for kind in kinds:
        lo, hi = run_level(kind, n), run_level(kind, 4 * n)
        assert lo["checksum"] == hi["checksum"] and lo["rows"] == hi["rows"]
        results[kind] = dict(
            n=lo, n4=hi,
            efficiency=round(hi["rows_per_sec"] / (4.0 * lo["rows_per_sec"]), 3),
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
