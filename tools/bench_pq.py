"""PQ-ANN throughput: 1000-probe ADC scan as ONE broadcast join.

Round-2 verdict item 3: pq_topk used to build one plan branch (and one
corpus scan) PER PROBE — 1,000 probes meant a 1,000-branch union. The
rewrite broadcasts the probe LUTs onto a single corpus_codes scan; this
tool times the full 1000-probe batch and asserts the plan stays flat.

Corpus = sf embeddings replicated `reps`x (deterministic ids) so the scan
is non-trivial; probes = the first 1000 original vectors.

Usage: python tools/bench_pq.py [sf_dir] [reps]
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
    spark = get_spark("bench-pq")
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
        # the explode inherits the tiny source parquet's 1-2 partitions; a
        # real 100 TB corpus arrives in thousands — spread it so the ADC
        # scan and the map-side WindowGroupLimit parallelize as they would
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    )
    n_corpus = corpus.count()

    books = S.pq_train(emb, m=16, k=32)
    codes = S.pq_encode(corpus, books).persist()
    codes.count()

    probes = emb.limit(1000).select(
        (F.col("vec_id") * reps).alias("probe_id"),
        F.col("embedding").alias("pvec"),
    )
    n_probes = probes.count()

    res = S.pq_topk(probes, codes, books, k=10, refine_factor=5)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "simple"
    )
    assert "Union" not in plan, "plan is not flat"

    # warm
    S.pq_topk(probes.limit(8), codes, books, k=10).write.format("noop").mode(
        "overwrite").save()
    t0 = time.perf_counter()
    res.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    print(json.dumps(dict(
        n_probes=n_probes, corpus_rows=n_corpus, sec=round(sec, 3),
        probes_per_sec=round(n_probes / sec, 1),
        adc_pairs_per_sec=round(n_probes * n_corpus / sec, 1),
        plan_flat=True,
    )))


if __name__ == "__main__":
    main()
