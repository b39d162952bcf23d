"""Indonesian confix-stripping stemmer (Nazief-Adriani, the algorithm
behind the reference's sastrawi stemming at pkg/util.go:12-14,
indexer.go:804, searcher.go:158)."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions.stemmer import (
    MINIMAL_ROOTS, stem, stem_terms, stemmed_tokens,
)

COLLISIONS = [
    # (surface form, root) — every pair must collapse to the same stem
    ("makanan", "makan"),
    ("memakan", "makan"),
    ("dimakan", "makan"),
    ("makanlah", "makan"),
    ("berjalan", "jalan"),
    ("jalanan", "jalan"),
    ("perjalanan", "jalan"),
    ("belajar", "ajar"),
    ("pelajaran", "ajar"),
    ("menyusun", "susun"),
    ("susunan", "susun"),
    ("mengambil", "ambil"),
    ("menulis", "tulis"),
    ("penulis", "tulis"),
    ("tulisan", "tulis"),
    ("membangun", "bangun"),
    ("bangunan", "bangun"),
    ("pembangunan", "bangun"),
    ("terambil", "ambil"),
    ("kejadian", "jadi"),
    ("rumahnya", "rumah"),
    ("rumahku", "rumah"),
    ("bukunya", "buku"),  # buku not in MINIMAL_ROOTS -> falls through
]


def test_stem_collisions():
    for surface, root in COLLISIONS:
        if root in MINIMAL_ROOTS:
            assert stem(surface) == root, (surface, stem(surface), root)


def test_unstemmable_passthrough():
    assert stem("zzzyx") == "zzzyx"
    assert stem("spark") == "spark"
    # roots return themselves
    assert stem("makan") == "makan"


def test_stem_terms_distributed(spark):
    terms = spark.createDataFrame(
        [("makanan",), ("berjalan",), ("spark",), ("makanan",)], "term string"
    )
    got = {r["term"]: r["stem"] for r in stem_terms(terms).collect()}
    assert got == {"makanan": "makan", "berjalan": "jalan", "spark": "spark"}


def test_stemmed_tokens_preserves_order(spark):
    toks = spark.createDataFrame(
        [(1, ["warung", "makanan", "enak"]), (2, ["berjalan", "jauh"])],
        "doc_id long, tokens array<string>",
    )
    got = {r["doc_id"]: r["tokens"] for r in stemmed_tokens(toks).collect()}
    assert got[1] == ["warung", "makan", "enak"]
    assert got[2] == ["jalan", "jauh"]


def test_stemmed_search_finds_morphological_variants(spark):
    """The stem-collision golden the unstemmed analyzer fails: indexing
    'rumah makanan padang' and querying 'memakan' only matches when both
    sides stem (searcher.go:158 / indexer.go:804 parity)."""
    from osm_search_spark.operators import search
    from osm_search_spark.operators.spell import BM25FIndex, bm25f_scores

    places = spark.createDataFrame(
        [
            (0, "rumah makanan padang", "jalan pemuda", -7.5, 110.8),
            (1, "toko buku", "jalan slamet", -7.6, 110.7),
        ],
        "id long, name string, address string, lat double, lon double",
    )
    # stemmed index + stemmed query token -> doc 0 scores
    idx = BM25FIndex(places, stem_roots=MINIMAL_ROOTS)
    from osm_search_spark.functions.stemmer import stem as _stem

    q = [_stem("memakan", MINIMAL_ROOTS)]
    assert q == ["makan"]
    scored = bm25f_scores(places, q, index=idx).collect()
    assert [r["doc_id"] for r in scored] == [0]

    # unstemmed index: the same query matches nothing
    idx0 = BM25FIndex(places)
    assert bm25f_scores(places, ["memakan"], index=idx0).count() == 0


def test_stemmed_tokens_preserves_empty_docs(spark):
    # a doc with zero tokens must survive stemming with tokens=[] so
    # doc_stats / avgdl / doc counts match the unstemmed analyzer
    df = spark.createDataFrame(
        [(1, ["makanan", "enak"]), (2, [])],
        "doc_id long, tokens array<string>",
    )
    got = {r["doc_id"]: r["tokens"] for r in stemmed_tokens(df, MINIMAL_ROOTS).collect()}
    assert got[1] == ["makan", "enak"]
    assert got[2] == []
