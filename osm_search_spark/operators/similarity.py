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


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    n_planes: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine >= threshold — embedding-based
    near-duplicate detection. With n_planes set, candidates are restricted
    to hyperplane-LSH bucket collisions (the scale path: no full cross
    join); without, exact all-pairs (small corpora / oracle checking)."""
    left = corpus.select(
        F.col(corpus_id).alias("id_a"), F.col(corpus_vec).alias("va")
    )
    right = corpus.select(
        F.col(corpus_id).alias("id_b"), F.col(corpus_vec).alias("vb")
    )
    if n_planes:
        dim = len(corpus.select(corpus_vec).first()[0])
        planes = hyperplanes(dim, n_planes, seed)
        left = left.withColumn("sig", lsh_signature(F.col("va"), planes))
        right = right.withColumn("sig", lsh_signature(F.col("vb"), planes))
        pairs = left.join(right, "sig").drop("sig")
    else:
        pairs = left.crossJoin(right)
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    probe_id: str = "probe_id",
    probe_vec: str = "pvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
    sample: int = 2048,
    kmeans_iters: int = 8,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their nearest
    centroid (inverted lists = a cluster_id column); each probe searches
    only its n_probe nearest centroids' lists with exact cosine re-rank.

    Centroids come from deterministic mini-kmeans over a seeded driver
    sample — training is O(sample); ASSIGNMENT is a distributed argmin over
    broadcast centroid literals (pure Column arithmetic, no UDF).
    """
    import numpy as np

    rows = corpus.select(corpus_vec).limit(sample).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = x[assign == c]
            if len(m):
                v = m.mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) + 1e-12)

    def centroid_sims(vec):
        return [
            (ci, _dot(vec, F.array(*[F.lit(float(v)) for v in c]))
             / (_norm(vec) + F.lit(1e-12)))
            for ci, c in enumerate(cent)
        ]

    def argmax_cluster(vec):
        sims = centroid_sims(vec)
        expr = F.lit(0)
        best = sims[0][1]
        for ci, s in sims[1:]:
            expr = F.when(s > best, ci).otherwise(expr)
            best = F.greatest(best, s)
        return expr

    c_assigned = corpus.withColumn("cluster_id", argmax_cluster(F.col(corpus_vec)))

    # probe side: top n_probe clusters as an array -> explode
    def top_clusters(vec):
        sims = centroid_sims(vec)
        arr = F.array(*[F.struct(s.alias("s"), F.lit(ci).alias("c")) for ci, s in sims])
        return F.slice(F.reverse(F.array_sort(arr)), 1, n_probe).getField("c")

    p_assigned = probes.withColumn(
        "cluster_id", F.explode(top_clusters(F.col(probe_vec)))
    )
    j = c_assigned.join(p_assigned, "cluster_id").filter(
        F.col(probe_id) != F.col(corpus_id)
    )
    scored = j.withColumn("cos", cosine(F.col(probe_vec), F.col(corpus_vec)))
    w = Window.partitionBy(probe_id).orderBy(F.desc("cos"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(probe_id, "rank", F.col(corpus_id).alias("neighbor_id"), "cos")
    )
