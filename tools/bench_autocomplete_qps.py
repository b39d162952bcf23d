"""Autocomplete throughput: per-query loop vs the batched path.

Round-2 verdict item 2: autocomplete must derive its AND-intersection from
the prebuilt postings (no corpus re-tokenize per interpretation) and a
batched form must run a CONSTANT number of Spark jobs in both query count
and interpretation count. This tool measures:

  - batch_autocomplete queries/sec at n queries (one plan family);
  - the per-query autocomplete loop at min(n, 25) queries (extrapolated);
  - Spark job counts for batch runs at n and n/4 queries (constancy).

Usage: python tools/bench_autocomplete_qps.py [sf_dir] [n_queries]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_search_spark.operators import ngram_lm, search, spell  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("bench-ac")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.lower("text"), " ")
    places = docs.select(
        F.col("doc_id").alias("id"),
        F.concat_ws(" ", F.slice(words, 1, 3)).alias("name"),
        F.concat_ws(" ", F.slice(words, 4, 3)).alias("address"),
        F.lit(0.0).alias("lat"), F.lit(0.0).alias("lon"),
        F.lit("place").alias("type"),
    ).cache()
    places.count()

    toks = search.doc_tokens(
        places.select("id", F.concat_ws(" ", "name", "address").alias("text")),
        doc_id="id",
    ).cache()
    term_dict = search.term_dict(toks).cache()
    term_dict.count()
    counts = ngram_lm.ngram_counts(toks, max_n=4, oov_threshold=None).cache()
    counts.count()
    idx = spell.BM25FIndex(places)
    vocab = sorted(r["term"] for r in term_dict.select("term").collect())

    queries = []
    for i in range(n_q):
        a = vocab[(i * 7) % len(vocab)]
        b = vocab[(i * 13 + 3) % len(vocab)]
        queries.append(f"{a} {b[: max(2, len(b) // 2)]}")  # last token = prefix

    def run_batch(qs, group):
        sc.setJobGroup(group, group)
        t0 = time.perf_counter()
        spell.batch_autocomplete(
            spark, places, term_dict, counts, qs, k=10, index=idx
        ).write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        sc.setJobGroup("other", "other")
        return sec, len(sc.statusTracker().getJobIdsForGroup(group))

    run_batch(queries[:8], "warm")  # one-time broadcast/cache warm-up
    quarter_sec, quarter_jobs = run_batch(queries[: max(1, n_q // 4)], "ac_q")
    batch_sec, batch_jobs = run_batch(queries, "ac_full")

    n_loop = min(n_q, 25)
    t0 = time.perf_counter()
    for q in queries[:n_loop]:
        spell.autocomplete(
            spark, places, term_dict, counts, q, k=10, index=idx
        ).write.format("noop").mode("overwrite").save()
    loop_sec = time.perf_counter() - t0

    print(json.dumps(dict(
        n_queries=n_q,
        batch_sec=round(batch_sec, 3),
        batch_qps=round(n_q / batch_sec, 1),
        batch_jobs=batch_jobs,
        quarter_batch_jobs=quarter_jobs,
        jobs_constant=batch_jobs == quarter_jobs,
        loop_queries=n_loop,
        loop_sec=round(loop_sec, 3),
        loop_qps=round(n_loop / loop_sec, 1),
        batch_vs_loop_speedup=round((n_q / batch_sec) / (n_loop / loop_sec), 1),
    )))


if __name__ == "__main__":
    main()
