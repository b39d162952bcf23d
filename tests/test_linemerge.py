"""LineMerger semantics (operators/linemerge.py)."""

from osm_search_spark.operators.linemerge import line_merge


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "line_id long, lats array<double>, lons array<double>"
    )
    return {r["merged_id"]: r.asDict() for r in line_merge(df).collect()}


def seg(i, a, b):
    return (i, [a[0], b[0]], [a[1], b[1]])


def test_chain_merges_with_mixed_orientation(spark):
    # A: (0,0)-(0,1); B REVERSED: (0,2)-(0,1); C: (0,2)-(0,3)
    rows = [
        seg(10, (0.0, 0.0), (0.0, 1.0)),
        seg(11, (0.0, 2.0), (0.0, 1.0)),
        seg(12, (0.0, 2.0), (0.0, 3.0)),
    ]
    got = _run(spark, rows)
    assert set(got) == {10}
    m = got[10]
    assert m["n_lines"] == 3
    assert m["lats"] == [0.0, 0.0, 0.0, 0.0]
    assert m["lons"] == [0.0, 1.0, 2.0, 3.0]  # smaller terminal first


def test_t_junction_blocks_merge(spark):
    rows = [
        seg(1, (0.0, 0.0), (0.0, 1.0)),
        seg(2, (0.0, 1.0), (0.0, 2.0)),
        seg(3, (0.0, 1.0), (1.0, 1.0)),  # third end at (0,1)
    ]
    got = _run(spark, rows)
    assert set(got) == {1, 2, 3}
    assert all(v["n_lines"] == 1 for v in got.values())


def test_square_cycle_closes_and_normalizes(spark):
    # square (0,0)-(0,1)-(1,1)-(1,0), segments in scrambled orientations
    rows = [
        seg(5, (0.0, 1.0), (0.0, 0.0)),
        seg(6, (1.0, 1.0), (0.0, 1.0)),
        seg(7, (1.0, 0.0), (1.0, 1.0)),
        seg(8, (0.0, 0.0), (1.0, 0.0)),
    ]
    got = _run(spark, rows)
    assert set(got) == {5}
    m = got[5]
    assert m["n_lines"] == 4
    pts = list(zip(m["lats"], m["lons"]))
    assert pts[0] == pts[-1]  # closed
    assert pts[0] == (0.0, 0.0)  # rotated to the min node
    # direction: from (0,0) toward the smaller neighbor (0,1) vs (1,0)
    assert pts[1] == (0.0, 1.0)
    assert len(pts) == 5


def test_blocked_node_splits_component_walk(spark):
    # L1-L2 merge through n2; n3 carries three ends -> L2 stops there
    rows = [
        seg(1, (0.0, 0.0), (0.0, 1.0)),
        seg(2, (0.0, 1.0), (0.0, 2.0)),
        seg(3, (0.0, 2.0), (1.0, 2.0)),
        seg(4, (0.0, 2.0), (-1.0, 2.0)),
    ]
    got = _run(spark, rows)
    assert set(got) == {1, 3, 4}
    assert got[1]["n_lines"] == 2
    assert got[1]["lons"] == [0.0, 1.0, 2.0]


def test_single_closed_ring_passes_through(spark):
    rows = [
        (9, [0.0, 0.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0]),
    ]
    got = _run(spark, rows)
    assert set(got) == {9}
    assert got[9]["n_lines"] == 1
    assert got[9]["lats"] == [0.0, 0.0, 1.0, 0.0]


def test_two_line_loop(spark):
    # two lines sharing BOTH endpoints: a closed 2-line loop
    rows = [
        (20, [0.0, 1.0, 2.0], [0.0, 1.0, 0.0]),
        (21, [0.0, -1.0, 2.0], [0.0, 1.0, 0.0]),
    ]
    got = _run(spark, rows)
    assert set(got) == {20}
    m = got[20]
    assert m["n_lines"] == 2
    pts = list(zip(m["lats"], m["lons"]))
    # min node of the loop is (-1, 1); direction toward (0,0) < (2,0)
    assert pts == [(-1.0, 1.0), (0.0, 0.0), (1.0, 1.0), (2.0, 0.0), (-1.0, 1.0)]
