"""Trained quality classifier: pinned-model accuracy, trainer
convergence, train/serve feature agreement, and DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators import quality_clf as Q
from osm_search_spark.sources import synth


def test_pinned_model_held_out_accuracy(spark):
    corpus = synth.quality_corpus(spark, 2000)
    held = corpus.filter(F.col("doc_id") % 5 == 0)
    acc = (
        held.select(
            (
                (Q.score_quality(F.col("text")) > 0).cast("int")
                == F.col("label")
            ).cast("int").alias("ok")
        )
        .agg(F.avg("ok").alias("a"))
        .collect()[0]["a"]
    )
    assert acc >= 0.95, acc


def test_trainer_converges_on_small_corpus(spark):
    # training-order robust: asserts accuracy, not weight values
    corpus = synth.quality_corpus(spark, 400)
    train = corpus.filter(F.col("doc_id") % 5 != 0)
    w = Q.train_quality_classifier(train, iters=60, lr=3.0)
    held = corpus.filter(F.col("doc_id") % 5 == 0)
    acc = (
        held.select(
            (
                (Q.score_quality(F.col("text"), tuple(w)) > 0).cast("int")
                == F.col("label")
            ).cast("int").alias("ok")
        )
        .agg(F.avg("ok").alias("a"))
        .collect()[0]["a"]
    )
    assert acc >= 0.90, acc


def test_featurize_matches_serving_dot_product(spark):
    """The sparse training entries dot the same numbers the serving fold
    computes — train/serve skew guard."""
    corpus = synth.quality_corpus(spark, 60)
    wlit = F.array(*[F.lit(float(x)) for x in Q.PINNED_WEIGHTS])
    via_entries = {
        r["doc_id"]: r["m"]
        for r in Q.featurize(corpus)
        .select(
            "doc_id",
            F.aggregate(
                "entries",
                F.lit(0.0),
                lambda acc, e: acc
                + F.element_at(wlit, e["dim"] + 1) * e["val"],
            ).alias("m"),
        )
        .collect()
    }
    via_serving = {
        r["doc_id"]: r["m"]
        for r in corpus.select(
            "doc_id", Q.score_quality(F.col("text")).alias("m")
        ).collect()
    }
    for k in via_serving:
        assert via_entries[k] == pytest.approx(via_serving[k], abs=1e-9)


def test_sql_twin_margin_parity(spark):
    corpus_rows = synth.quality_corpus_py(80)
    spark_m = {
        r["doc_id"]: r["m"]
        for r in synth.quality_corpus(spark, 80)
        .select("doc_id", F.round(Q.score_quality(F.col("text")), 6).alias("m"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "create table c(doc_id bigint, text varchar, label int)"
    )
    con.executemany("insert into c values (?, ?, ?)", corpus_rows)
    duck_m = {
        int(a): b
        for a, b in con.execute(
            f"select doc_id, round({Q.score_quality_sql('text')}, 6) from c"
        ).fetchall()
    }
    assert spark_m == duck_m
