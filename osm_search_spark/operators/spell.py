"""Spell correction, BM25F two-field ranking, free-form search and
autocomplete pipelines (pkg/searcher/searcher.go + spell_corrector.go).

- spell candidates (GetWordCandidates, spell_corrector.go:93-120): all vocab
  terms within Levenshtein distance 1 then 2 — the reference's Levenshtein
  automaton ∩ FST is an implementation detail; Spark's built-in
  `levenshtein()` against the broadcast term dictionary is JVM-side and
  exact. d=1 candidates come before d=2, each block sorted (deterministic
  stand-in for FST iteration order).
- candidate query cartesian product (GetCorrectQueryCandidates, :122-137):
  driver-side fold — query token counts are tiny by construction.
- LM argmax / top-3 (GetCorrectSpellingSuggestion :139-155,
  GetMatchedWordsAutocomplete :202-227): operators/ngram_lm.best_query.
- BM25F (scoreBM25Field, searcher.go:249-315): idf =
  log10(N-df+0.5)-log10(df+0.5) with df counted over BOTH fields;
  weight_f = W_f * tf / (1 + B*(len_f/avglen_f - 1)); score += idf *
  weight/(K1+weight). NOTE the reference uses NAME_B in the address branch
  too (searcher.go:301) — replicated faithfully.
  INTENTIONAL DEVIATION: searcher.go:255-288 shadows `ok` with the
  address-postings lookup, so the reference silently skips scoring a term
  that appears ONLY in the name field (no address postings). We score
  name-only terms too — rankings can differ from the reference exactly for
  such terms; the shadowing is a Go bug, not a semantic choice, and
  dropping name matches would contradict the NAME_WEIGHT=20 design.
- FreeFormQuery pipeline (searcher.go:150-246) and Autocomplete
  (searcher.go:402-491): tokenize -> vocab check -> correct -> score ->
  page -> fetch docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import ngram_lm, search

# searcher.go:28-38
K1_BM25F = 10.0
NAME_WEIGHT, NAME_B = 20.0, 0.95
ADDRESS_WEIGHT, ADDRESS_B = 1.0, 0.3


def spell_candidates(
    term_dict: DataFrame, token: str, max_dist: int = 2,
    max_candidates: int = 10000,
) -> list[str]:
    """Vocab terms within edit distance 1, then 2 (each block sorted).

    The collect is BOUNDED (deterministic (d, term) order, max_candidates
    rows) — a pathological token against a web-scale dictionary cannot OOM
    the driver; the cap never binds on realistic vocabularies."""
    cand = (
        term_dict.select(
            "term", F.levenshtein(F.lit(token), F.col("term")).alias("d")
        )
        .filter(F.col("d") <= max_dist)
        .orderBy("d", "term")
        .limit(max_candidates)
        .collect()
    )
    out = []
    for d in range(1, max_dist + 1):
        out.extend(sorted(r["term"] for r in cand if r["d"] == d))
    return out


def candidate_queries(per_token: list[list[str]]) -> list[list[str]]:
    """Cartesian product fold (GetCorrectQueryCandidates)."""
    temp: list[list[str]] = [[]]
    for cands in per_token:
        temp = [p + [t] for p in temp for t in cands]
    return temp


def correct_query(
    spark: SparkSession,
    query: str,
    term_dict: DataFrame,
    counts: DataFrame,
    top: int = 1,
    prefix_last: bool = False,
) -> list[list[str]]:
    """Tokenize + vocab check + spell/prefix expand + LM rank.

    prefix_last=True gives autocomplete semantics: the last token expands by
    prefix match (GetMatchedWordBasedOnPrefix, spell_corrector.go:160-188)
    instead of edit distance, and `top` interpretations return (3 in the
    reference)."""
    tokens = [t for t in query.lower().split() if t]
    if not tokens:
        raise ValueError("query is empty")
    # vocab membership via a tiny-frame semi-join — NOT a full term_dict
    # collect (a 100 TB-corpus dictionary would OOM the driver); only the
    # query's own tokens come back
    tok_frame = spark.createDataFrame([(t,) for t in set(tokens)], "term string")
    vocab = {
        r["term"] for r in tok_frame.join(term_dict, "term", "leftsemi").collect()
    }
    per_token: list[list[str]] = []
    for i, tok in enumerate(tokens):
        if prefix_last and i == len(tokens) - 1:
            matches = sorted(
                r["term"]
                for r in term_dict.filter(F.col("term").startswith(tok)).collect()
            )
            per_token.append(matches or [tok])
        elif tok in vocab:
            per_token.append([tok])
        else:
            cands = spell_candidates(term_dict, tok, 2)
            per_token.append(cands or [tok])
    cands = candidate_queries(per_token)
    if len(cands) == 1:
        return cands
    return ngram_lm.best_query(spark, cands, counts, top=top)


class BM25FIndex:
    """Prebuilt per-field postings + stats — the 'loaded index' of the
    reference (Searcher.LoadMainIndex, searcher.go:84-133). Build once,
    query many; freeform_search/autocomplete accept it to avoid
    re-tokenizing the corpus per query."""

    def __init__(
        self,
        places: DataFrame,
        doc_id: str = "id",
        name_col: str = "name",
        address_col: str = "address",
    ):
        self.n_docs = places.count()
        self.fields: dict[str, tuple[DataFrame, DataFrame, float]] = {}
        for field, col in (("name", name_col), ("address", address_col)):
            toks = search.doc_tokens(places, doc_id, col)
            postings = search.build_postings(toks).persist()
            stats = search.doc_stats(toks).persist()
            avgdl = stats.agg(F.avg("dl")).collect()[0][0] or 1.0
            self.fields[field] = (postings, stats, float(avgdl))

    def field_frame(self, field: str, query_terms: list[str]) -> DataFrame:
        postings, stats, avgdl = self.fields[field]
        return (
            postings.filter(F.col("term").isin(query_terms))
            .join(stats, "doc_id")
            .withColumn("field", F.lit(field))
            .withColumn("avgdl", F.lit(avgdl))
        )


def bm25f_scores(
    places: DataFrame,
    query_terms: list[str],
    doc_id: str = "id",
    name_col: str = "name",
    address_col: str = "address",
    k1: float = K1_BM25F,
    name_w: float = NAME_WEIGHT,
    name_b: float = NAME_B,
    addr_w: float = ADDRESS_WEIGHT,
    addr_b: float = NAME_B,  # faithful: reference uses NAME_B for both
    index: BM25FIndex | None = None,
) -> DataFrame:
    """(doc_id, score) — field-weighted BM25F over name + address."""
    if index is None:
        index = BM25FIndex(places, doc_id, name_col, address_col)
    n_docs = index.n_docs
    tf = index.field_frame("name", query_terms).unionByName(
        index.field_frame("address", query_terms)
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log10(F.lit(float(n_docs)) - F.col("df") + 0.5) - F.log10(F.col("df") + 0.5)
    w = F.when(
        F.col("field") == "name",
        name_w * (F.col("tf") / (1.0 + name_b * (F.col("dl") / F.col("avgdl") - 1.0))),
    ).otherwise(
        addr_w * (F.col("tf") / (1.0 + addr_b * (F.col("dl") / F.col("avgdl") - 1.0)))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .withColumn("wtd", w)
        .withColumn("contrib", (F.col("wtd") / (k1 + F.col("wtd"))) * idf)
    )
    return scored.groupBy("doc_id").agg(F.sum("contrib").alias("score"))


def freeform_search(
    spark: SparkSession,
    places: DataFrame,
    term_dict: DataFrame,
    counts: DataFrame,
    query: str,
    k: int = 10,
    offset: int = 0,
    index: "BM25FIndex | None" = None,
) -> DataFrame:
    """FreeFormQuery (searcher.go:150-246): spell-correct -> BM25F ->
    stable top-k page -> fetch docs (broadcast join against places)."""
    corrected = correct_query(spark, query, term_dict, counts, top=1)[0]
    scores = bm25f_scores(places, corrected, index=index)
    w = Window.orderBy(F.desc("score"), F.col("doc_id"))
    top = (
        scores.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") > offset) & (F.col("rank") <= offset + k))
    )
    return (
        places.join(F.broadcast(top), places["id"] == top["doc_id"])
        .select("rank", "score", "id", "name", "lat", "lon", "address", "type")
        .orderBy("rank")
    )


def autocomplete(
    spark: SparkSession,
    places: DataFrame,
    term_dict: DataFrame,
    counts: DataFrame,
    query: str,
    k: int = 10,
    index: "BM25FIndex | None" = None,
) -> DataFrame:
    """Autocomplete (searcher.go:402-491): prefix-expand last token, top-3
    LM interpretations, AND-intersection semantics per interpretation
    (scoreBM25FAutocomplete :493-532), BM25F rank, merge."""
    if index is None:
        index = BM25FIndex(places)
    interps = correct_query(
        spark, query, term_dict, counts, top=3, prefix_last=True
    )
    results = None
    for qi, terms in enumerate(interps):
        scores = bm25f_scores(places, terms, index=index)
        # AND semantics: doc must contain every query term in name+address
        toks = search.doc_tokens(
            places.select(
                "id", F.concat_ws(" ", "name", "address").alias("text")
            ),
            doc_id="id", text="text",
        )
        have_all = (
            toks.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
            .filter(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("nt"))
            .filter(F.col("nt") == len(set(terms)))
            .select("doc_id")
        )
        part = scores.join(have_all, "doc_id", "leftsemi").withColumn(
            "interp", F.lit(qi)
        )
        results = part if results is None else results.unionByName(part)
    w = Window.orderBy("interp", F.desc("score"), F.col("doc_id"))
    top = (
        results.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return (
        places.join(F.broadcast(top), places["id"] == top["doc_id"])
        .select("rank", "interp", "score", "id", "name", "address")
        .orderBy("rank")
    )
