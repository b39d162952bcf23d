"""Trained language-ID: held-out accuracy, profile shape, per-unique
classification, and robustness to mixed/short inputs."""

from pyspark.sql import functions as F

from osm_search_spark.operators import langid
from osm_search_spark.sources import synth


def test_heldout_accuracy(spark):
    corpus = synth.langcorpus_df(spark)
    profiles = langid.train_char_profiles(
        corpus.filter(F.col("split") == "train")
    )
    pred = langid.classify_langid(
        corpus.filter(F.col("split") == "test"), profiles
    )
    truth = corpus.filter(F.col("split") == "test").select("doc_id", "lang")
    joined = pred.join(truth, "doc_id")
    n = joined.count()
    correct = joined.filter(F.col("pred_lang") == F.col("lang")).count()
    assert n == 5 * synth.LANG_N_TEST
    assert correct / n >= 0.9, f"{correct}/{n}"


def test_profile_shape_and_ranks(spark):
    corpus = synth.langcorpus_df(spark)
    prof = langid.train_char_profiles(
        corpus.filter(F.col("split") == "train"), top_k=50
    )
    rows = prof.collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["rank"])
    assert set(per_lang) == set(synth.LANG_WORDS)
    for lang, ranks in per_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang
        assert len(ranks) <= 50


def test_duplicate_texts_classify_identically(spark):
    corpus = synth.langcorpus_df(spark)
    profiles = langid.train_char_profiles(
        corpus.filter(F.col("split") == "train")
    )
    one = corpus.filter(F.col("split") == "test").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(1, one["text"]), (2, one["text"]), (3, one["text"].upper())],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["pred_lang"], r["dist"]) for r in
           langid.classify_langid(dup, profiles).collect()}
    # identical (case-normalized) texts share one classification
    assert got[1] == got[2] == got[3]
    assert got[1][0] == one["lang"]


def test_short_doc_still_classified(spark):
    corpus = synth.langcorpus_df(spark)
    profiles = langid.train_char_profiles(
        corpus.filter(F.col("split") == "train")
    )
    short = spark.createDataFrame(
        [(1, "szybko"), (2, "aloha")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["pred_lang"] for r in
           langid.classify_langid(short, profiles).collect()}
    assert got == {1: "beta", 2: "alpha"}
