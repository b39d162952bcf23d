"""Caption⇄image consistency scoring — the CLIP-score filter position of
LAION/DataComp curation: given PAIRED image and caption embeddings,
score each pair's cosine consistency and its contrastive MARGIN against
a bounded negative-caption sample; keep pairs whose caption beats every
negative AND clears an absolute score threshold.

This is the text-side visual twin of the image curation chain
(jobs/curate_images.py computes caption QUALITY margins; this operator
scores caption↔image AGREEMENT): embedding-based, model-free — the
embeddings arrive as columns (the encoder runs upstream; in this repo
the deterministic fixture derives caption vectors from image vectors,
sources in __spark_entry__.q_caption_consistency).

Scale shape (100 TB posture): negatives are a DETERMINISTIC HASH SAMPLE
of the caption side (bounded by rate — the reprocessing-stable
deterministic_sample recipe), broadcast once; scoring is ONE pass over
pairs × K with a map-side-combinable groupBy-max argmax — no self-join,
no global sort, pair side never shuffles except the final per-pair
max-combine. Cosines stay in Column HOF folds (no Python).

Parity: cosine folds accumulate left-to-right identically in both
engines (the embedding_topk precedent); scores rounded 5dp at the
output boundary, margin/keep derived from the ROUNDED values so both
engines decide identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine

DEFAULT_SCORE_THRESHOLD = 0.6  # fixture-scaled; LAION used 0.28 on CLIP


def caption_consistency(
    pairs: DataFrame,
    negatives: DataFrame,
    score_threshold: float = DEFAULT_SCORE_THRESHOLD,
    pair_id: str = "pair_id",
    img_vec: str = "img_vec",
    cap_vec: str = "cap_vec",
    neg_id: str = "neg_id",
    neg_vec: str = "neg_vec",
) -> DataFrame:
    """(pair_id, clip_score, neg_id, best_neg, margin, keep):
    clip_score = cos(img, own caption); best_neg / neg_id = the hardest
    negative caption (max cosine; ties -> larger neg_id, matching the
    struct-max ordering); margin = clip_score − best_neg over the
    5dp-rounded scores; keep = margin > 0 AND clip_score >= threshold.

    negatives: a bounded (neg_id, neg_vec) caption sample — broadcast by
    contract (the caller bounds it, e.g. a deterministic hash sample).
    A pair whose own caption is sampled as a negative is excluded from
    its own negative set (it would self-defeat the margin)."""
    p = pairs.select(
        F.col(pair_id).alias("pair_id"),
        F.col(img_vec).alias("_iv"),
        F.round(cosine(F.col(img_vec), F.col(cap_vec)), 5).alias("clip_score"),
    )
    n = negatives.select(
        F.col(neg_id).alias("neg_id"), F.col(neg_vec).alias("_nv")
    )
    # constant-key broadcast HASH join (the round-3 rule: a != predicate
    # alone would plan a BroadcastNestedLoopJoin, which is excluded from
    # whole-stage codegen); the key must be NON-FOLDABLE (col*0+1) or
    # Catalyst folds it away and degrades to BNLJ anyway
    scored = (
        p.withColumn("_k", F.col("pair_id") * 0 + 1)
        .join(
            F.broadcast(n.withColumn("_k", F.col("neg_id") * 0 + 1)), "_k"
        )
        .filter(F.col("pair_id") != F.col("neg_id"))
        .select(
            "pair_id", "clip_score", "neg_id",
            F.round(cosine(F.col("_iv"), F.col("_nv")), 5).alias("_nc"),
        )
        .groupBy("pair_id", "clip_score")
        .agg(
            F.max(
                F.struct(F.col("_nc").alias("c"), F.col("neg_id").alias("n"))
            ).alias("b")
        )
    )
    margin = F.col("clip_score") - F.col("b.c")
    return scored.select(
        "pair_id",
        "clip_score",
        F.col("b.n").alias("neg_id"),
        F.col("b.c").alias("best_neg"),
        margin.alias("margin"),
        (
            (margin > 0)
            & (F.col("clip_score") >= F.lit(float(score_threshold)))
        ).alias("keep"),
    )
