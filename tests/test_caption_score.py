"""Caption⇄image consistency (operators/caption_score.py): planted
mismatches rejected, true pairs kept, self-negative exclusion, and the
broadcast plan shape. Parity is hash-gated by oracle
`caption_consistency` (__spark_entry__.py) at both sf levels."""

from pyspark.sql import functions as F

from osm_search_spark.operators.caption_score import caption_consistency


def _pairs(spark):
    # 3 orthogonal-ish image vectors; captions = image + tiny noise,
    # except pair 2 whose caption points at a DIFFERENT direction (a
    # planted mismatch, distinct from every other pair's caption so it
    # can't double as a self-defeating negative for them)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.1], [0.99, 0.01, 0.0, 0.1]),
        (1, [0.0, 1.0, 0.0, 0.1], [0.01, 0.98, 0.0, 0.1]),
        (2, [0.0, 0.0, 1.0, 0.1], [0.7, 0.7, 0.0, 0.1]),
    ]
    return spark.createDataFrame(
        rows, "pair_id long, img_vec array<double>, cap_vec array<double>"
    )


def test_keep_semantics(spark):
    pairs = _pairs(spark)
    negs = pairs.select(
        F.col("pair_id").alias("neg_id"), F.col("cap_vec").alias("neg_vec")
    )
    out = {r["pair_id"]: r for r in caption_consistency(pairs, negs).collect()}
    assert out[0]["keep"] and out[1]["keep"]
    assert not out[2]["keep"]  # mismatched caption
    assert out[2]["clip_score"] < 0.6
    # margins: rounded-score arithmetic, keep = margin > 0 AND clip >= thr
    for r in out.values():
        assert abs(r["margin"] - (r["clip_score"] - r["best_neg"])) < 1e-12
        assert r["keep"] == (r["margin"] > 0 and r["clip_score"] >= 0.6)


def test_self_negative_excluded(spark):
    """A pair whose own caption is in the negative sample must not be
    compared against itself (margin would always be <= 0)."""
    pairs = _pairs(spark).filter(F.col("pair_id") < 2)
    negs = pairs.select(
        F.col("pair_id").alias("neg_id"), F.col("cap_vec").alias("neg_vec")
    )
    out = {r["pair_id"]: r for r in caption_consistency(pairs, negs).collect()}
    # with only each other's caption as negative, both true pairs keep
    assert out[0]["keep"] and out[1]["keep"]
    assert out[0]["neg_id"] == 1 and out[1]["neg_id"] == 0


def test_negatives_broadcast_plan(spark):
    pairs = _pairs(spark)
    negs = pairs.select(
        F.col("pair_id").alias("neg_id"), F.col("cap_vec").alias("neg_vec")
    )
    plan = (
        caption_consistency(pairs, negs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # constant-key HASH join, never a nested-loop (codegen-excluded)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan