"""Tile materialization: salting of dense tiles, range clustering, coarse
partition layout, and read-back pruning."""

import numpy as np
from pyspark.sql import functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.operators import tiling


def _pts(spark, n=6000, hot_frac=0.5, seed=4):
    # half the rows in ONE hot cell (dense urban tile), rest spread out
    rng = np.random.default_rng(seed)
    hot = int(n * hot_frac)
    rows = [(i, -6.2000001 + 1e-9 * i, 106.80000001) for i in range(hot)]
    lat = rng.uniform(-7.9, -7.4, n - hot)
    lon = rng.uniform(110.2, 110.9, n - hot)
    rows += [(hot + i, float(lat[i]), float(lon[i])) for i in range(n - hot)]
    return spark.createDataFrame(rows, "point_id long, lat double, lon double")


def test_salt_dense_tiles_splits_hot_cell(spark):
    pts = tiling.assign_tiles(_pts(spark))
    salted = tiling.salt_dense_tiles(pts, max_rows_per_task=500)
    hot_tile = (
        salted.groupBy("tile_id").count().orderBy(F.desc("count")).first()["tile_id"]
    )
    salts = (
        salted.filter(F.col("tile_id") == hot_tile)
        .select("salt").distinct().count()
    )
    assert salts >= 6  # 3000 rows / 500 cap
    # sparse tiles keep salt 0
    other = salted.filter(F.col("tile_id") != hot_tile)
    assert other.select(F.max("salt")).collect()[0][0] == 0


def test_write_tiles_roundtrip_and_layout(spark, tmp_path):
    out = str(tmp_path / "tiles")
    pts = _pts(spark, n=2000)
    tiling.write_tiles(pts, out, max_rows_per_task=500)
    back = spark.read.parquet(out)
    assert back.count() == 2000
    assert "tile_coarse" in back.columns and "tile_id" in back.columns
    # coarse partition column must equal the parent of the fine tile
    mism = back.withColumn(
        "expect", C.cell_to_parent("tile_id", 8)
    ).filter(F.col("expect") != F.col("tile_coarse"))
    assert mism.count() == 0
    # partition pruning: filtering one coarse cell reads a subset
    one = back.select("tile_coarse").first()["tile_coarse"]
    pruned = spark.read.parquet(out).filter(F.col("tile_coarse") == one)
    assert 0 < pruned.count() < 2000
