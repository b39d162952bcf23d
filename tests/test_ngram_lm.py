"""N-gram LM goldens mirroring pkg/searcher/ngram_lm_test.go:46-140 (token
ids mapped to synthetic words; <s>=id0, </s>=id1 in the reference) and
stupid-backoff behavior."""

import math

from osm_search_spark.operators import ngram_lm

# ngram_lm_test.go docs {3,4,5},{6,5,5,5,5},{11,12,6,6,6} as words w3..w12
DOCS = [
    (1, ["w3", "w4", "w5"]),
    (2, ["w6", "w5", "w5", "w5", "w5"]),
    (3, ["w11", "w12", "w6", "w6", "w6"]),
]


def _counts(spark):
    toks = spark.createDataFrame(DOCS, "doc_id long, tokens array<string>")
    # oov_threshold=None: the reference goldens are computed pre-OOV
    return ngram_lm.ngram_counts(toks, max_n=4, oov_threshold=None)


def test_unigram_golden(spark):
    got = {
        r["gram"]: r["count"]
        for r in _counts(spark).filter("n = 1").collect()
    }
    assert got == {
        "<s>": 3, "</s>": 3, "w3": 1, "w4": 1, "w5": 5, "w6": 4,
        "w11": 1, "w12": 1,
    }
    assert sum(got.values()) == 19  # TotalWordFreq


def test_bigram_golden(spark):
    got = {
        tuple(r["gram"].split(" ")): r["count"]
        for r in _counts(spark).filter("n = 2").collect()
    }
    exp = {
        ("<s>", "<s>"): 3, ("<s>", "w3"): 1, ("<s>", "w6"): 1,
        ("<s>", "w11"): 1, ("w3", "w4"): 1, ("w4", "w5"): 1,
        ("w6", "w5"): 1, ("w5", "w5"): 3, ("w11", "w12"): 1,
        ("w12", "w6"): 1, ("w6", "w6"): 2, ("w5", "</s>"): 2,
        ("w6", "</s>"): 1,
    }
    assert got == exp


def test_oov_replacement(spark):
    toks = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["a", "c"])], "doc_id long, tokens array<string>"
    )
    out = {r["doc_id"]: r["tokens"] for r in ngram_lm.replace_oov(toks, 2).collect()}
    assert out[1] == ["a", "a", "<UNK>"]
    assert out[2] == ["a", "<UNK>"]


def test_query_log_prob_backoff(spark):
    counts = _counts(spark)
    # "w5 w5" appears often; "w3 w12" never -> lower prob
    res = ngram_lm.best_query(spark, [["w5", "w5"], ["w3", "w12"]], counts, top=2)
    assert res[0] == ["w5", "w5"]


def test_query_prob_value_sanity(spark):
    counts = _counts(spark)
    scored = {
        r["query_id"]: r["log_prob"]
        for r in ngram_lm.query_log_prob(spark, [["w5"]], counts).collect()
    }
    # padded: <s>x4 w5 </s>
    # pos w5: quad/tri/bi all zero -> 0.4^3 * count(w5)/total
    # pos </s>: quad 0; trigram level denominator "<s> w5" UNSEEN (returns 0,
    # costs a lambda step, ngram_lm.go:327-336); bigram "w5 </s>"=2 over
    # unigram "w5"=5 -> 0.4^2 * 2/5
    p1 = 0.4**3 * (5 / 19)
    p2 = 0.4**2 * (2 / 5)
    assert math.isclose(scored[0], math.log(p1) + math.log(p2), rel_tol=1e-9)


def test_big_vocab_join_path(spark):
    # >SMALL_VOCAB_MAX distinct above-threshold terms: exercises the
    # distributed join path end-to-end (VERDICT r01 item 2 done-criterion)
    from pyspark.sql import functions as F

    n = ngram_lm.SMALL_VOCAB_MAX + 500
    toks = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array(
            F.concat(F.lit("w"), F.col("id")),
            F.concat(F.lit("w"), F.col("id")),  # freq 2 -> in-vocab
            F.concat(F.lit("rare"), F.col("id")),  # freq 1 -> <UNK>
        ).alias("tokens"),
    )
    out = ngram_lm.replace_oov(toks, 2)
    sample = {r["doc_id"]: r["tokens"] for r in out.filter("doc_id in (0, 7)").collect()}
    assert sample[0] == ["w0", "w0", "<UNK>"]
    assert sample[7] == ["w7", "w7", "<UNK>"]
    # token order/count preserved for every doc
    bad = out.filter(F.size("tokens") != 3).count()
    assert bad == 0


def test_corpus_log_prob_matches_query_log_prob(spark):
    """corpus_log_prob (melted one-join corpus scorer) must agree with
    query_log_prob (the per-query 7-join scorer) on identical token
    streams — same counts, same backoff cascade, same -inf semantics."""
    toks = spark.createDataFrame(DOCS, "doc_id long, tokens array<string>")
    counts = _counts(spark)
    corpus = {
        r["doc_id"]: r["log_prob"]
        for r in ngram_lm.corpus_log_prob(toks, counts).collect()
    }
    per_query = {
        qid: r["log_prob"]
        for qid, r in zip(
            [1, 2, 3],
            sorted(
                ngram_lm.query_log_prob(
                    spark, [d[1] for d in DOCS], counts
                ).collect(),
                key=lambda r: r["query_id"],
            ),
        )
    }
    assert set(corpus) == {1, 2, 3}
    for did in corpus:
        assert math.isclose(
            corpus[did], per_query[did], rel_tol=1e-12
        ), (did, corpus[did], per_query[did])
