"""Line-circle intersection goldens — exact cases from
pkg/datastructure/circle_test.go:36-80 (circle at (-7.559940429364888,
110.78890921003895) r=1km; segments that must / must not intersect)."""

from pyspark.sql import functions as F

from osm_search_spark.operators.geofence import _line_circle_intersect

C_LAT, C_LON, R = -7.559940429364888, 110.78890921003895, 1.0

INTERSECT = [
    (-7.5577436088673435, 110.78127272655398, -7.564498664733181, 110.8035880873389),
    (-7.554174552910251, 110.76387434819563, -7.564498664733181, 110.8035880873389),
]
NOT_INTERSECT = [
    (-7.54644310927346, 110.77781694597039, -7.552212073890144, 110.79527493164542),
    (-7.556780022123904, 110.80638234773562, -7.571822225335152, 110.80379309018404),
    (-7.54419186409313, 110.77112430380268, -7.561352173450039, 110.7642426738976),
]


def _eval(spark, segs):
    df = spark.createDataFrame(segs, "alat double, alon double, blat double, blon double")
    pred = _line_circle_intersect(
        F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"),
        F.lit(C_LAT), F.lit(C_LON), F.lit(R),
    )
    return [r["x"] for r in df.select(pred.alias("x")).collect()]


def test_intersecting_segments(spark):
    assert _eval(spark, INTERSECT) == [True, True]


def test_non_intersecting_segments(spark):
    assert _eval(spark, NOT_INTERSECT) == [False, False, False]
