"""Jaccard gram-join skew: justify the default gram-frequency cap and the
pushed-down candidate prefilter.

A stopword/boilerplate n-gram shared by f docs contributes f^2/2 rows to
the gram self-join while carrying zero dedup signal — quadratic with no
cap. This tool plants one boilerplate trigram into `dup_frac` of the sf
documents corpus (replicated `reps`x) and measures ngram_jaccard_pairs
three ways: default cap, uncapped, and candidate-restricted (a tiny
candidate pair set, exercising the pushed-down semi-join).

Usage: python tools/bench_jaccard_skew.py [sf_dir] [reps] [dup_frac]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_search_spark.operators import dedup  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dup_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
    spark = get_spark("bench-jaccard-skew")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = (
        docs.select(
            F.explode(F.array(*[F.lit(i) for i in range(reps)])).alias("rep"),
            "doc_id", "text",
        )
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            # plant the skew: dup_frac of docs APPEND one shared trigram
            F.when(
                F.pmod(F.col("doc_id") * reps + F.col("rep"),
                       F.lit(int(1 / dup_frac))) == 0,
                F.concat(F.col("text"), F.lit(" please try again")),
            ).otherwise(F.col("text")).alias("text"),
        )
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .persist()
    )
    n_docs = big.count()

    def run(cap, candidates=None):
        t0 = time.perf_counter()
        n = dedup.ngram_jaccard_pairs(
            big, n=3, threshold=0.8, candidates=candidates, max_gram_freq=cap
        ).count()
        return round(time.perf_counter() - t0, 3), n

    capped_sec, capped_pairs = run(dedup.DEFAULT_LSH_MAX_BUCKET)
    uncapped_sec, uncapped_pairs = run(None)
    # candidate-restricted: the replicas of the first 50 originals — the
    # shape an LSH prefilter hands the verifier
    cand = (
        big.filter((F.col("doc_id") / reps).cast("long") < 50)
        .select(F.col("doc_id").alias("doc_a"))
        .crossJoin(
            big.filter((F.col("doc_id") / reps).cast("long") < 50)
            .select(F.col("doc_id").alias("doc_b"))
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .persist()
    )
    n_cand = cand.count()
    t0 = time.perf_counter()
    cand_pairs = dedup.ngram_jaccard_pairs(
        big, n=3, threshold=0.8, candidates=cand
    ).count()
    cand_sec = round(time.perf_counter() - t0, 3)

    print(json.dumps(dict(
        n_docs=n_docs, planted_gram_docs=int(n_docs * dup_frac),
        default_cap=dedup.DEFAULT_LSH_MAX_BUCKET,
        capped_sec=capped_sec, capped_pairs=capped_pairs,
        uncapped_sec=uncapped_sec, uncapped_pairs=uncapped_pairs,
        cap_speedup=round(uncapped_sec / capped_sec, 2),
        n_candidates=n_cand, cand_sec=cand_sec, cand_pairs=cand_pairs,
        cand_speedup_vs_uncapped=round(uncapped_sec / cand_sec, 2),
    )))


if __name__ == "__main__":
    main()
