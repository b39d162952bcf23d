"""As-of join hot-key skew: justify the n_salt two-phase plan.

One key holding most of the corpus concentrates its whole timeline in a
single task under the plain keyed running-last window. This tool builds a
synthetic (key, ts) corpus where ONE key owns `hot_frac` of `n_left`
event rows (plus states on the right side), and measures asof_join
unsalted vs n_salt, asserting identical output checksums.

Usage: python tools/bench_asof_skew.py [n_left] [hot_frac] [n_salt]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_search_spark.operators.asof import asof_join  # noqa: E402
from osm_search_spark.session import get_spark  # noqa: E402


def main():
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    n_salt = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-asof-skew")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic timeline: the hot key gets hot_frac of rows,
    # the rest spread over 1000 cold keys; ts is a pseudo-random long
    left = (
        spark.range(n_left)
        .select(
            F.when(
                F.pmod("id", F.lit(int(1 / (1 - hot_frac)))) == 0,
                F.pmod("id", 1000) + 1,
            ).otherwise(F.lit(0)).alias("k"),
            F.pmod(F.col("id") * 2654435761, 86_400_000).alias("ts"),
            F.col("id").alias("event_id"),
        )
        .repartition(cpus)
        .persist()
    )
    right = (
        spark.range(n_left // 50)
        .select(
            F.when(
                F.pmod("id", F.lit(int(1 / (1 - hot_frac)))) == 0,
                F.pmod("id", 1000) + 1,
            ).otherwise(F.lit(0)).alias("k"),
            F.pmod(F.col("id") * 40503, 86_400_000).alias("ts"),
            (F.col("id").cast("double") / 7.0).alias("sv"),
        )
        .repartition(cpus)
        .persist()
    )
    left.count(), right.count()

    def run(salt):
        t0 = time.perf_counter()
        out = asof_join(left, right, on="k", n_salt=salt)
        row = out.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("k", "event_id", "sv")).alias("chk"),
        ).collect()[0]
        return round(time.perf_counter() - t0, 3), row["n"], row["chk"]

    run(None)  # warm
    plain_sec, n1, c1 = run(None)
    salted_sec, n2, c2 = run(n_salt)
    assert (n1, c1) == (n2, c2), "salted output differs"
    print(json.dumps(dict(
        n_left=n_left, hot_rows=int(n_left * hot_frac), n_salt=n_salt,
        rows_out=n1, checksum=c1,
        plain_sec=plain_sec, salted_sec=salted_sec,
        speedup=round(plain_sec / salted_sec, 2),
    )))


if __name__ == "__main__":
    main()
