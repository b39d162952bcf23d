"""Embedding-space decontamination: planted leakage caught, clean rows
covered, LSH-restricted default finds the same true positives as exact."""

from pyspark.sql import functions as F

from osm_search_spark.operators.decontaminate import semantic_decontaminate

SF001 = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF001}/embeddings.parquet")


def test_planted_identicals_flag_and_clean_rows_covered(spark):
    emb = _emb(spark)
    bench = emb.filter(F.col("vec_id") % 17 == 0)
    out = semantic_decontaminate(emb, bench, n_planes=None)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == emb.count()  # whole corpus covered
    for vid, r in rows.items():
        if vid % 17 == 0:
            # identical to its own benchmark copy -> contaminated, cos ~ 1
            assert r["contaminated"] and r["bench_match"] == vid
            assert r["max_cos"] >= 0.99999
    assert any(not r["contaminated"] for r in rows.values())


def test_lsh_default_catches_exact_positives(spark):
    """Identical vectors share every hyperplane sign, so the LSH-bucketed
    default must flag every planted identical the exact path flags."""
    emb = _emb(spark)
    bench = emb.filter(F.col("vec_id") % 17 == 0)
    lsh = {
        r["vec_id"]
        for r in semantic_decontaminate(emb, bench, n_planes=8)
        .filter("contaminated")
        .collect()
    }
    planted = {r["vec_id"] for r in bench.collect()}
    assert planted <= lsh
