"""Incremental index maintenance: batch merges must equal a full rebuild
(postings/stats/counts) and keep term ids stable (the property a rebuild
cannot give you)."""

from pyspark.sql import functions as F

from osm_search_spark.operators import index_maintenance as IM
from osm_search_spark.operators import ngram_lm, search

BATCH1 = [
    (0, "warung makan enak di jalan pemuda"),
    (1, "toko buku murah jalan slamet riyadi"),
    (2, "warung kopi jalan pemuda"),
]
BATCH2 = [
    (3, "bengkel motor jalan veteran"),
    (2, "warung kopi susu jalan veteran"),  # re-ingest: doc 2 CHANGED
]


def _index_of(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = search.doc_tokens(docs)
    return {
        "postings": search.build_postings(toks),
        "doc_stats": search.doc_stats(toks),
        "term_dict": search.term_dict(toks),
        "ngram_counts": ngram_lm.ngram_counts(toks, oov_threshold=None),
    }


def test_incremental_matches_full_rebuild(spark):
    base = _index_of(spark, BATCH1)
    new_docs = spark.createDataFrame(BATCH2, "doc_id long, text string")
    old_docs = spark.createDataFrame([BATCH1[2]], "doc_id long, text string")
    merged = IM.incremental_index(base, new_docs, old_docs=old_docs)

    # the union corpus: batch1 with doc 2 replaced by its re-ingested text
    full_rows = [BATCH1[0], BATCH1[1], BATCH2[1], BATCH2[0]]
    full = _index_of(spark, full_rows)

    for name in ("postings", "doc_stats", "ngram_counts"):
        got = {tuple(r) for r in merged[name].collect()}
        want = {tuple(r) for r in full[name].collect()}
        assert got == want, (name, got ^ want)


def test_incremental_term_ids_stable_and_dense(spark):
    base = _index_of(spark, BATCH1)
    base_ids = {r["term"]: r["term_id"] for r in base["term_dict"].collect()}
    new_docs = spark.createDataFrame(BATCH2, "doc_id long, text string")
    merged = IM.incremental_index(base, new_docs)
    got = {r["term"]: r["term_id"] for r in merged["term_dict"].collect()}

    # existing terms keep their ids (stored postings stay valid)
    for t, i in base_ids.items():
        assert got[t] == i, t
    # new terms: consecutive ids after the old max, first-seen order
    new_terms = {t: i for t, i in got.items() if t not in base_ids}
    assert set(new_terms) == {"bengkel", "motor", "veteran", "susu"}
    assert sorted(new_terms.values()) == list(
        range(len(base_ids), len(base_ids) + 4)
    )
    # first-seen (doc_id, pos) order within batch 2: doc 2 contributes
    # susu(pos 2) then veteran(pos 4); doc 3 contributes bengkel, motor
    b = len(base_ids)
    assert (new_terms["susu"], new_terms["veteran"],
            new_terms["bengkel"], new_terms["motor"]) == (b, b + 1, b + 2, b + 3)
    # deterministic: re-running the merge yields identical ids
    again = IM.incremental_index(base, new_docs)
    got2 = {r["term"]: r["term_id"] for r in again["term_dict"].collect()}
    assert got2 == got


def test_incremental_empty_delta_is_identity(spark):
    base = _index_of(spark, BATCH1)
    empty = spark.createDataFrame([], "doc_id long, text string")
    merged = IM.incremental_index(base, empty)
    assert {tuple(r) for r in merged["postings"].collect()} == {
        tuple(r) for r in base["postings"].collect()
    }
    assert {tuple(r) for r in merged["term_dict"].collect()} == {
        tuple(r) for r in base["term_dict"].collect()
    }


def test_incremental_search_equals_rebuild_search(spark):
    # end-to-end: BM25 scores computed from the merged tables equal scores
    # from a full rebuild (the index is the data — same tables, same ranks)
    base = _index_of(spark, BATCH1)
    new_docs = spark.createDataFrame(BATCH2, "doc_id long, text string")
    merged = IM.incremental_index(base, new_docs)
    full_rows = [BATCH1[0], BATCH1[1], BATCH2[1], BATCH2[0]]
    full = _index_of(spark, full_rows)

    def score(idx):
        qp = idx["postings"].filter(F.col("term").isin(["jalan", "veteran"]))
        stats = idx["doc_stats"]
        n_docs = stats.count()
        avgdl = stats.agg(F.avg("dl")).collect()[0][0]
        df_t = qp.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        scored = (
            qp.join(df_t, "term")
            .join(stats, "doc_id")
            .withColumn(
                "s",
                F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.lit(float(avgdl)))),
            )
            .groupBy("doc_id").agg(F.round(F.sum("s"), 9).alias("s"))
        )
        return {(r["doc_id"], r["s"]) for r in scored.collect()}

    assert score(merged) == score(full)
