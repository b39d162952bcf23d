"""Geohash encode/decode — published test vectors, an independent
bisection reference, round-trip, prefix-coarsening, and edge clamps."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions.geohash import (
    B32,
    geohash,
    geohash_col,
    geohash_decode,
    geohash_sql,
    lat_code_sql,
    lon_code_sql,
)


def _ref_geohash(lat, lon, precision):
    """Independent reference: the spec's iterative bisection."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out, bit, val, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                val = (val << 1) | 1
                lon_lo = mid
            else:
                val <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                val = (val << 1) | 1
                lat_lo = mid
            else:
                val <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(B32[val])
            bit, val = 0, 0
    return "".join(out)


VECTORS = [
    # the canonical published examples
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (42.605, -5.603, 5, "ezs42"),
    (-25.382708, -49.265506, 11, "6gkzwgjzn82"),
]


def _spark_hash(spark, lat, lon, precision):
    df = spark.createDataFrame([(lat, lon)], "lat double, lon double")
    return df.select(geohash("lat", "lon", precision).alias("gh")).first()["gh"]


def test_published_vectors(spark):
    for lat, lon, p, want in VECTORS:
        assert _ref_geohash(lat, lon, p) == want  # the reference is right
        assert _spark_hash(spark, lat, lon, p) == want


def test_matches_bisection_reference_grid(spark):
    pts = [
        (i * 17.77 - 88.0, j * 36.9 - 179.0)
        for i in range(10)
        for j in range(10)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = df.select(
        "lat", "lon", geohash("lat", "lon", 9).alias("gh")
    ).collect()
    for r in got:
        assert r["gh"] == _ref_geohash(r["lat"], r["lon"], 9)


def test_duckdb_twin_text_matches(spark):
    import duckdb

    pts = [(q * 3.3 - 80.0, q * 7.1 - 170.0) for q in range(50)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    s = {
        (r["lat"], r["lon"]): r["gh"]
        for r in df.select("lat", "lon", geohash("lat", "lon", 12).alias("gh")).collect()
    }
    con = duckdb.connect()
    con.execute("create table t (lat double, lon double)")
    con.executemany("insert into t values (?, ?)", pts)
    d = {
        (lat, lon): gh
        for lat, lon, gh in con.sql(
            f"select lat, lon, {geohash_sql('lat', 'lon', 12)} as gh from t"
        ).fetchall()
    }
    assert s == d


def test_prefix_coarsening(spark):
    df = spark.createDataFrame(
        [(i * 7.3 - 80.0, i * 13.1 - 170.0) for i in range(25)],
        "lat double, lon double",
    )
    rows = df.select(
        geohash("lat", "lon", 5).alias("g5"),
        geohash("lat", "lon", 10).alias("g10"),
    ).collect()
    for r in rows:
        assert r["g10"].startswith(r["g5"])


def test_roundtrip_center_reencodes_identically(spark):
    p = 8
    df = spark.createDataFrame(
        [(i * 11.3 - 85.0, i * 23.7 - 175.0) for i in range(20)],
        "lat double, lon double",
    )
    gh = df.select(geohash("lat", "lon", p).alias("gh"))
    lat_c, lon_c = geohash_decode(F.col("gh"), p)
    back = gh.select(
        "gh", lat_c.alias("clat"), lon_c.alias("clon")
    ).select(
        "gh", "clat", "clon", geohash("clat", "clon", p).alias("gh2")
    )
    for r in back.collect():
        assert r["gh2"] == r["gh"]
        # center is inside the cell: within half a cell of the original
        assert -90.0 < r["clat"] < 90.0 and -180.0 < r["clon"] < 180.0


def test_edge_clamp_north_pole_and_dateline(spark):
    # lat=90 / lon=180 are the open top edges: clamped to the last cell,
    # not overflowed into a 33rd alphabet slot
    for lat, lon in [(90.0, 0.0), (0.0, 180.0), (90.0, 180.0), (-90.0, -180.0)]:
        gh = _spark_hash(spark, lat, lon, 6)
        assert len(gh) == 6 and all(ch in B32 for ch in gh)
    assert _spark_hash(spark, 90.0, 180.0, 1) == "z"
    assert _spark_hash(spark, -90.0, -180.0, 1) == "0"


def test_column_args_rejected(spark):
    with pytest.raises(TypeError):
        geohash(F.col("lat"), "lon", 5)
