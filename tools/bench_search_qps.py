"""Batch-search throughput: N queries scored as ONE join plan.

The reference's benchmark is per-request latency (FreeFormQuery 360us/op ~
2,777 q/s single-thread, searcher_test.go:208). A Spark engine doesn't do
per-request loops — it scores a whole query BATCH in one plan. This tool
measures amortized queries/sec for a batch of synthetic queries against the
documents corpus.

Usage: python tools/bench_search_qps.py [sf_dir] [n_queries]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_search_spark.operators import search  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    spark = get_spark("bench-qps")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()

    vocab = [
        r["term"]
        for r in search.build_postings(search.doc_tokens(docs))
        .groupBy("term").count().orderBy(F.desc("count"), "term").limit(60).collect()
    ]
    # deterministic 3-term queries from the corpus vocabulary
    queries = spark.range(n_q).select(
        F.col("id").alias("query_id"),
        F.array(
            *[F.element_at(F.array(*[F.lit(v) for v in vocab]),
                           (F.pmod(F.col("id") * m + 7, F.lit(len(vocab))) + 1).cast("int"))
              for m in (13, 29, 47)]
        ).alias("terms"),
    )
    # warmup
    search.batch_bm25_search(docs, queries.limit(100), k=15).write.format(
        "noop").mode("overwrite").save()
    t0 = time.perf_counter()
    search.batch_bm25_search(docs, queries, k=15).write.format("noop").mode(
        "overwrite").save()
    sec = time.perf_counter() - t0
    # NB: the synthetic corpus has ~31 distinct words, so EVERY query term
    # matches ~every doc — each query scores the whole corpus (worst-case
    # selectivity). scored_pairs/sec is the engine-side metric; qps scales
    # with real-world term selectivity.
    n_pairs = n_q * 3 * n_docs
    print(json.dumps(dict(
        n_queries=n_q, corpus_docs=n_docs, sec=round(sec, 3),
        queries_per_sec=round(n_q / sec, 1),
        scored_pairs_per_sec=round(n_pairs / sec, 1),
        reference_single_thread_qps=2777,
    )))


if __name__ == "__main__":
    main()
