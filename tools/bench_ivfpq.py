"""IVF-PQ vs flat PQ: the cluster-keyed join should scan only
n_probe/n_centroids of the code table per probe.

Usage: python tools/bench_ivfpq.py [sf_dir] [reps] [n_probe] [n_centroids]

Same corpus construction as tools/bench_pq.py (sf embeddings replicated
``reps``x, 1000 probes). Times the 1000-probe top-10 batch on both paths
against the same corpus and reports the speedup alongside the theoretical
scan fraction.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_search_spark.operators import similarity as S  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_cent = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    spark = get_spark("bench-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = (
        emb.select(
            F.explode(F.array(*[F.lit(i) for i in range(reps)])).alias("rep"),
            "vec_id", "embedding",
        )
        .select(
            (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
            "embedding",
        )
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    )
    n_corpus = corpus.count()
    probes = emb.limit(1000).select(
        (F.col("vec_id") * reps).alias("probe_id"),
        F.col("embedding").alias("pvec"),
    )

    # flat PQ path
    books = S.pq_train(emb, m=16, k=32)
    codes = S.pq_encode(corpus, books).persist()
    codes.count()
    S.pq_topk(probes.limit(8), codes, books, k=10).write.format("noop").mode(
        "overwrite").save()  # warm
    t0 = time.perf_counter()
    S.pq_topk(probes, codes, books, k=10, refine_factor=5).write.format(
        "noop").mode("overwrite").save()
    sec_pq = time.perf_counter() - t0

    # IVF-PQ path: residual codes keyed by coarse cluster
    indexed, cent, rbooks = S.ivfpq_build(corpus, n_centroids=n_cent, m=16, kc=32)
    indexed = indexed.persist()
    indexed.count()
    S.ivfpq_topk(
        probes.limit(8), indexed, cent, rbooks, k=10, n_probe=n_probe
    ).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    S.ivfpq_topk(
        probes, indexed, cent, rbooks, k=10, n_probe=n_probe
    ).write.format("noop").mode("overwrite").save()
    sec_ivfpq = time.perf_counter() - t0

    print(json.dumps(dict(
        corpus_rows=n_corpus, n_probes=1000,
        n_centroids=n_cent, n_probe=n_probe,
        scan_fraction=round(n_probe / n_cent, 3),
        pq_sec=round(sec_pq, 3), ivfpq_sec=round(sec_ivfpq, 3),
        speedup=round(sec_pq / sec_ivfpq, 2),
    )))


if __name__ == "__main__":
    main()
