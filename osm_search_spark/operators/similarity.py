"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. Dot
  products via `aggregate(zip_with(...))` (JVM-side, no Python).
- lsh_topk: random-hyperplane LSH bucketing as the scale path — candidates
  share a signs-signature bucket; exact re-rank inside buckets. Hyperplanes
  are deterministic (seeded numpy) and shipped as literal arrays, so the
  plan is still pure Catalyst.

At 10^12-row scale brute force is O(P·N); LSH reduces the join to bucket
collisions. Both share the exact re-rank window.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    probe_id: str = "probe_id",
    probe_vec: str = "pvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(probe_id, rank, neighbor_id, cos) exact cosine top-k per probe.
    Probe side broadcasts (small); corpus side never shuffles."""
    j = corpus.crossJoin(F.broadcast(probes))
    if exclude_self:
        j = j.filter(F.col(probe_id) != F.col(corpus_id))
    scored = j.withColumn("cos", cosine(F.col(probe_vec), F.col(corpus_vec)))
    w = Window.partitionBy(probe_id).orderBy(F.desc("cos"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(probe_id, "rank", F.col(corpus_id).alias("neighbor_id"), "cos")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec, planes: list[list[float]]):
    """Sign-bit signature string for a vector column given literal planes."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    probe_id: str = "probe_id",
    probe_vec: str = "pvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket join on hyperplane sign signature, exact
    cosine re-rank within buckets. Recall grows with fewer planes / multiple
    tables; this is the scale path — correctness baseline is brute force."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn("sig", lsh_signature(F.col(corpus_vec), planes))
    p = probes.withColumn("sig", lsh_signature(F.col(probe_vec), planes))
    j = c.join(F.broadcast(p), "sig").filter(F.col(probe_id) != F.col(corpus_id))
    scored = j.withColumn("cos", cosine(F.col(probe_vec), F.col(corpus_vec)))
    w = Window.partitionBy(probe_id).orderBy(F.desc("cos"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(probe_id, "rank", F.col(corpus_id).alias("neighbor_id"), "cos")
    )
