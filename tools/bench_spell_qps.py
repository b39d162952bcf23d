"""Spell-correction throughput: per-query loop vs the batched path.

The per-query path costs O(jobs) per query (vocab probe + levenshtein scan
per OOV token + one LM job); batch_correct_queries runs a CONSTANT number
of jobs for the whole batch. This tool measures both at n queries and
prints the speedup (VERDICT r01 item 8: batch >= 5x at 100 queries).

Usage: python tools/bench_spell_qps.py [sf_dir] [n_queries]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_search_spark.operators import ngram_lm, search, spell  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("bench-spell")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = search.doc_tokens(docs).cache()
    term_dict = search.term_dict(toks).cache()
    term_dict.count()
    counts = ngram_lm.ngram_counts(toks, max_n=4, oov_threshold=None).cache()
    counts.count()
    vocab = sorted(r["term"] for r in term_dict.select("term").collect())

    def mangle(t, i):  # deterministic 1-edit misspelling
        return t[:-1] + "zq"[i % 2] if len(t) > 3 else t

    queries = []
    for i in range(n_q):
        a = vocab[(i * 7) % len(vocab)]
        b = vocab[(i * 13 + 3) % len(vocab)]
        queries.append(f"{a} {mangle(b, i)}" if i % 2 else f"{mangle(a, i)} {b}")

    # batched path
    t0 = time.perf_counter()
    batch = spell.batch_correct_queries(spark, queries, term_dict, counts)
    batch_sec = time.perf_counter() - t0

    # per-query loop
    t0 = time.perf_counter()
    loop = [
        spell.correct_query(spark, q, term_dict, counts, top=1)[0]
        for q in queries
    ]
    loop_sec = time.perf_counter() - t0

    assert batch == loop, "batch/loop divergence"
    print(json.dumps(dict(
        n_queries=n_q,
        loop_sec=round(loop_sec, 2),
        batch_sec=round(batch_sec, 2),
        loop_qps=round(n_q / loop_sec, 1),
        batch_qps=round(n_q / batch_sec, 1),
        speedup=round(loop_sec / batch_sec, 1),
    )))


if __name__ == "__main__":
    main()
