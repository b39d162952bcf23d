"""LSH mega-bucket skew: justify the default bucket cap.

A web corpus with boilerplate (error pages, templates) puts thousands of
docs in ONE band bucket; the band self-join then emits m^2/2 useless pairs
from that single bucket. This tool plants a `dup_frac` mega-bucket into the
sf documents corpus (replicated `reps`x) and measures lsh_candidate_pairs
with the default cap vs uncapped.

Usage: python tools/bench_lsh_skew.py [sf_dir] [reps] [dup_frac]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dup_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02
    spark = get_spark("bench-lsh-skew")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = (
        docs.select(
            F.explode(F.array(*[F.lit(i) for i in range(reps)])).alias("rep"),
            "doc_id", "text",
        )
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            # plant the mega-bucket: dup_frac of docs share ONE boilerplate
            F.when(
                F.pmod(F.col("doc_id") * reps + F.col("rep"), F.lit(int(1 / dup_frac))) == 0,
                F.lit("server error page please try again later contact support"),
            ).otherwise(F.col("text")).alias("text"),
        )
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .persist()
    )
    n_docs = big.count()
    sigs = dedup.minhash_signatures(big).persist()
    sigs.count()

    def run(cap):
        t0 = time.perf_counter()
        n = dedup.lsh_candidate_pairs(sigs, max_bucket_size=cap).count()
        return round(time.perf_counter() - t0, 3), n

    capped_sec, capped_pairs = run(dedup.DEFAULT_LSH_MAX_BUCKET)
    uncapped_sec, uncapped_pairs = run(None)
    print(json.dumps(dict(
        n_docs=n_docs, planted_bucket=int(n_docs * dup_frac),
        default_cap=dedup.DEFAULT_LSH_MAX_BUCKET,
        capped_sec=capped_sec, capped_pairs=capped_pairs,
        uncapped_sec=uncapped_sec, uncapped_pairs=uncapped_pairs,
        junk_pairs_avoided=uncapped_pairs - capped_pairs,
        speedup=round(uncapped_sec / capped_sec, 2),
    )))


if __name__ == "__main__":
    main()
