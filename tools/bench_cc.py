"""Connected-components scale bench: planted duplicate clusters + a long
chain, convergence-round count and wall time.

Usage: python tools/bench_cc.py [n_clusters=200000] [cluster_size=5] [cpus=32] [chain_len=4096]

Synthesizes n_clusters duplicate groups of ``cluster_size`` docs (star
edges — the realistic dedup shape) plus one 4096-node path (diameter 4095 —
the adversarial shape that proves pointer jumping converges in O(log d)
rounds, not O(d)). Verifies every cluster resolves to its min id, prints
one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    chain_len = int(sys.argv[4]) if len(sys.argv) > 4 else 4096

    from pyspark.sql import functions as F

    from osm_search_spark.operators.dedup import connected_components
    from osm_search_spark.session import get_spark

    spark = get_spark("bench_cc", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # stars: cluster c = nodes [c*size, (c+1)*size), edges hub -> member
    stars = (
        spark.range(n_clusters * (size - 1))
        .select(
            ((F.col("id") / (size - 1)).cast("long") * size).alias("doc_a"),
            (
                (F.col("id") / (size - 1)).cast("long") * size
                + (F.col("id") % (size - 1))
                + 1
            ).alias("doc_b"),
        )
    )
    # adversarial path appended above the star id range (chain_len=0
    # benches the realistic small-diameter dedup shape alone)
    base = n_clusters * size
    pairs = stars
    if chain_len:
        chain = spark.range(chain_len - 1).select(
            (F.col("id") + base).alias("doc_a"),
            (F.col("id") + base + 1).alias("doc_b"),
        )
        pairs = stars.unionByName(chain)

    t0 = time.monotonic()
    cc = connected_components(pairs)
    agg = cc.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.count_distinct("component_id").alias("components"),
        # every star member must resolve to its hub (min id of its cluster);
        # bit_xor over expected vs got cancels to 0 when all match
        F.bit_xor(
            F.xxhash64(
                "node",
                F.when(
                    F.col("node") < base,
                    (F.col("node") / size).cast("long") * size,
                ).otherwise(F.lit(base)),
            )
        ).alias("want_ck"),
        F.bit_xor(F.xxhash64("node", "component_id")).alias("got_ck"),
    ).collect()[0]
    sec = time.monotonic() - t0
    assert agg["want_ck"] == agg["got_ck"], "component assignment mismatch"
    assert agg["components"] == n_clusters + (1 if chain_len else 0)
    print(
        json.dumps(
            {
                "edges": n_clusters * (size - 1) + max(chain_len - 1, 0),
                "nodes": agg["nodes"],
                "components": agg["components"],
                "path_diameter": max(chain_len - 1, 0),
                "cpus": cpus,
                "sec": round(sec, 3),
                "edges_per_sec": round((n_clusters * (size - 1) + max(chain_len - 1, 0)) / sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
