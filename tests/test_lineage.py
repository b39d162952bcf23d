"""Checkpoint/resume + lineage verification."""

import pyspark.sql.functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.plans import lineage


def test_stage_resume_skips_rebuild(spark, tmp_path):
    base = str(tmp_path / "pipe")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )

    a = lineage.run_stage(spark, base, "stage1", build)
    assert calls["n"] == 1 and a.count() == 100
    b = lineage.run_stage(spark, base, "stage1", build)
    assert calls["n"] == 1  # resumed, not rebuilt
    assert b.count() == 100
    assert lineage.verify_stage(spark, base, "stage1")
    c = lineage.run_stage(spark, base, "stage1", build, force=True)
    assert calls["n"] == 2 and c.count() == 100


def test_lineage_records_cell_range(spark, tmp_path):
    base = str(tmp_path / "pipe2")

    def build():
        pts = spark.createDataFrame(
            [(1, -7.5, 110.5), (2, -7.6, 110.6)], "id long, lat double, lon double"
        )
        return pts.withColumn("cell_id", C.latlng_to_cell("lat", "lon", 12))

    lineage.run_stage(spark, base, "cells", build, cell_col="cell_id")
    lin = spark.read.parquet(f"{base}/_lineage/cells").collect()
    assert all(r["stage"] == "cells" for r in lin)
    ranges = [(r["cell_min"], r["cell_max"]) for r in lin if r["row_count"] > 0]
    assert ranges and all(mn <= mx for mn, mx in ranges)


def test_verify_detects_tamper(spark, tmp_path):
    base = str(tmp_path / "pipe3")
    lineage.run_stage(spark, base, "s", lambda: spark.range(10))
    # tamper: rewrite output without updating lineage
    spark.range(11).write.mode("overwrite").parquet(f"{base}/s")
    assert not lineage.verify_stage(spark, base, "s")
