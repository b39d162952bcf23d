"""Trajectory segmentation — planted gap/jump splits, per-trip stats,
and partitioning independence."""

import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.trips import segment_trips, trip_stats


def _pings(spark):
    # entity 1: a slow walk (tiny steps), a 2h time gap, another walk,
    # then a 100 km teleport
    rows = []
    t = 1000
    lat, lon = -7.70, 110.50
    for i in range(5):  # trip 1
        rows.append((1, t, lat + 0.001 * i, lon))
        t += 300
    t += 7200  # time gap -> trip 2
    for i in range(4):
        rows.append((1, t, lat + 0.02 + 0.001 * i, lon))
        t += 300
    rows.append((1, t + 300, lat + 1.0, lon))  # ~111 km jump -> trip 3
    # entity 2: a single continuous track
    for i in range(6):
        rows.append((2, 5000 + 60 * i, -6.0, 108.0 + 0.001 * i))
    return spark.createDataFrame(
        rows, "entity_id long, ts long, lat double, lon double"
    )


def test_gap_and_jump_split_trips(spark):
    out = segment_trips(_pings(spark), max_gap_s=1800, max_jump_km=25.0)
    e1 = [
        (r["ts"], r["trip_seq"], r["trip_start"])
        for r in out.filter("entity_id = 1").orderBy("ts").collect()
    ]
    seqs = [s for _, s, _ in e1]
    assert seqs == [1] * 5 + [2] * 4 + [3]
    starts = [b for _, _, b in e1]
    assert starts == [True, False, False, False, False, True, False, False, False, True]
    assert out.filter("entity_id = 2").select(
        F.max("trip_seq")
    ).first()[0] == 1


def test_trip_stats_totals(spark):
    trips = segment_trips(_pings(spark), max_gap_s=1800, max_jump_km=25.0)
    got = {
        (r["entity_id"], r["trip_seq"]): r
        for r in trip_stats(trips).collect()
    }
    assert got[(1, 1)]["n_pings"] == 5
    assert got[(1, 1)]["duration_s"] == 4 * 300
    # 4 steps of 0.001 deg latitude each ~0.11119 km
    assert got[(1, 1)]["total_km"] == pytest.approx(4 * 0.111195, rel=1e-3)
    assert got[(1, 3)]["n_pings"] == 1
    assert got[(1, 3)]["duration_s"] == 0
    assert got[(1, 3)]["total_km"] == 0.0
    assert got[(2, 1)]["n_pings"] == 6


def test_partitioning_independence(spark):
    a = trip_stats(segment_trips(_pings(spark)))
    b = trip_stats(segment_trips(_pings(spark).repartition(7)))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_stay_points_dwell_detection(spark):
    from osm_search_spark.functions import cells as C
    from osm_search_spark.operators.trips import stay_points

    size = C.cell_size_deg(13)
    # entity 1 dwells 20 min in cell A (tiny moves), transits (1 ping per
    # cell), then dwells 5 min in cell B (below threshold)
    rows = []
    for i in range(5):
        rows.append((1, 1000 + 300 * i, -7.70 + size * 0.001 * i, 110.50))
    rows.append((1, 3000, -7.0, 110.0))  # transit ping, own cell
    for i in range(3):
        rows.append((1, 4000 + 150 * i, -6.50, 109.00 + size * 0.001 * i))
    df = spark.createDataFrame(rows, "entity_id long, ts long, lat double, lon double")
    out = stay_points(df, res=13, min_duration_s=900).collect()
    assert len(out) == 1
    s = out[0]
    assert s["n_pings"] == 5 and s["duration_s"] == 1200
    assert s["enter_ts"] == 1000 and s["exit_ts"] == 2200
    # re-entering the same cell later is a SEPARATE run
    rows.append((1, 9000, -7.70, 110.50))
    rows.append((1, 10500, -7.70, 110.50))
    df2 = spark.createDataFrame(rows, "entity_id long, ts long, lat double, lon double")
    out2 = sorted(
        stay_points(df2, res=13, min_duration_s=900).collect(),
        key=lambda r: r["enter_ts"],
    )
    assert len(out2) == 2
    assert out2[1]["enter_ts"] == 9000 and out2[1]["n_pings"] == 2


def test_od_matrix_counts(spark):
    from osm_search_spark.functions import cells as C
    from osm_search_spark.operators.trips import od_matrix

    # two entities, pre-segmented trips: both make the same O->D move,
    # one makes a reverse move
    o_lat, o_lon = -7.70, 110.50
    d_lat, d_lon = -6.20, 111.80
    rows = [
        (1, 1, 100, o_lat, o_lon), (1, 1, 200, d_lat, d_lon),
        (2, 1, 100, o_lat, o_lon), (2, 1, 300, d_lat, d_lon),
        (2, 2, 400, d_lat, d_lon), (2, 2, 500, o_lat, o_lon),
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, trip_seq long, ts long, lat double, lon double"
    )
    out = {(r["o_cell"], r["d_cell"]): r["n_trips"] for r in od_matrix(df, res=11).collect()}
    import duckdb  # derive expected cells with the shared SQL text

    oc, dc = [
        duckdb.sql(
            f"select {C.latlng_to_cell_sql(str(a), str(b), 11)}"
        ).fetchone()[0]
        for a, b in ((o_lat, o_lon), (d_lat, d_lon))
    ]
    assert out == {(oc, dc): 2, (dc, oc): 1}
