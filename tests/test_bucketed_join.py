"""Bucketed tables make the places<->cells join exchange-free — the
pre-partitioning strategy the engine relies on at 10^12-row scale."""

import pyspark.sql.functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.sources import tables


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import shutil

    spark.sql("create database if not exists b1")
    for t in ("places_b", "cells_b"):
        spark.sql(f"drop table if exists b1.{t}")
        shutil.rmtree(f"spark-warehouse/b1.db/{t}", ignore_errors=True)
    pts = spark.range(0, 20000).select(
        F.col("id"),
        (-7.9 + (F.col("id") % 1000) / 2500.0).alias("lat"),
        (110.2 + (F.col("id") % 997) / 1500.0).alias("lon"),
    )
    places = pts.select("id", "lat", "lon")
    cells = pts.select("id", C.latlng_to_cell("lat", "lon", 14).alias("cell_id"))

    tables.write_bucketed(places, "b1.places_b", "id", 8)
    tables.write_bucketed(cells, "b1.cells_b", "id", 8)

    a = tables.read_table(spark, "b1.places_b")
    b = tables.read_table(spark, "b1.cells_b")
    joined = a.join(b, "id")
    assert joined.count() == 20000
    assert not tables.plan_has_shuffle(joined), (
        "bucketed join must be exchange-free:\n"
        + joined._jdf.queryExecution().executedPlan().toString()
    )

    # the same join over plain parquet DOES shuffle — proves the assertion
    # mechanism isn't vacuous
    pa, pb = str(tmp_path / "pa"), str(tmp_path / "pb")
    places.write.mode("overwrite").parquet(pa)
    cells.write.mode("overwrite").parquet(pb)
    plain = spark.read.parquet(pa).hint("shuffle_hash").join(
        spark.read.parquet(pb), "id"
    )
    assert tables.plan_has_shuffle(plain)
