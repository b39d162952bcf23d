import math

import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.traj_sim import hausdorff_join

S = 0.991 * 0.991  # LON_SCALE^2


def brute_hd2(a, b):
    """Pure-python symmetric Hausdorff^2 with the pinned operation
    order (dy*dy + (dx*dx)*s2) — independent of the numpy kernel."""

    def h(p, q):
        best = -1.0
        for la, lo in zip(*p):
            m = math.inf
            for lb, ob in zip(*q):
                dy, dx = la - lb, lo - ob
                d2 = dy * dy + (dx * dx) * S
                if d2 < m:
                    m = d2
            if m > best:
                best = m
        return best

    return max(h(a, b), h(b, a))


def mk(tid, pts):
    lats = [float(p[0]) for p in pts]
    lons = [float(p[1]) for p in pts]
    return (tid, lats, lons)


def walk(tid, la, lo, n=10, step=0.001):
    pts = []
    for i in range(n):
        # deterministic pseudo-walk
        la += step * (1 if (tid * 31 + i * 17) % 3 else -1)
        lo += step * (1 if (tid * 13 + i * 7) % 2 else -1)
        pts.append((la, lo))
    return mk(tid, pts)


@pytest.fixture(scope="module")
def trips(spark):
    rows = [walk(t, -7.0 + (t % 5) * 0.01, 110.0 + (t // 5) * 0.01)
            for t in range(12)]
    return rows


def test_brute_force_parity(spark, trips):
    # d large enough that candidate pruning keeps every pair -> compare
    # hd2 EXACTLY against the independent pure-python derivation.
    df = spark.createDataFrame(
        trips, "trip_id long, lats array<double>, lons array<double>"
    )
    got = {
        (r.trip_a, r.trip_b): r.hd2
        for r in hausdorff_join(df, 1.0).collect()
    }
    exp = {}
    for i in range(len(trips)):
        for j in range(i + 1, len(trips)):
            a, b = trips[i], trips[j]
            exp[(a[0], b[0])] = brute_hd2((a[1], a[2]), (b[1], b[2]))
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == v, k  # bit-exact


def test_threshold_and_order(spark, trips):
    df = spark.createDataFrame(
        trips, "trip_id long, lats array<double>, lons array<double>"
    )
    d = 0.02
    out = hausdorff_join(df, d).collect()
    assert out, "threshold should keep some pairs"
    assert all(r.trip_a < r.trip_b for r in out)
    assert all(r.hd2 <= d * d for r in out)
    # and it is a strict subset of all pairs
    n = len(trips)
    assert len(out) < n * (n - 1) // 2


def test_translated_copy_is_close(spark):
    base = [(-7.5 + i * 0.01, 110.5 + i * 0.005) for i in range(8)]
    shifted = [(la + 0.001, lo + 0.001) for la, lo in base]
    far = [(la + 2.0, lo + 2.0) for la, lo in base]
    df = spark.createDataFrame(
        [mk(0, base), mk(1, shifted), mk(2, far)],
        "trip_id long, lats array<double>, lons array<double>",
    )
    out = {(r.trip_a, r.trip_b) for r in hausdorff_join(df, 0.01).collect()}
    assert (0, 1) in out
    assert not any(2 in p for p in out)
    # translation bound: H <= |t| in the metric
    hd2 = hausdorff_join(df, 0.01).filter("trip_a = 0").collect()[0].hd2
    # slack: dx=(lo+0.001)-lo carries the ULP(110) quantization (~7e-15)
    assert hd2 <= 0.001 * 0.001 * (1 + S) * (1 + 1e-9)


def test_unequal_lengths_and_empty(spark):
    a = mk(0, [(-7.0, 110.0), (-7.0, 110.002), (-7.0, 110.004)])
    b = mk(1, [(-7.0, 110.001)])  # 3 vs 1 points
    e = (2, [], [])
    df = spark.createDataFrame(
        [a, b, e], "trip_id long, lats array<double>, lons array<double>"
    )
    out = hausdorff_join(df, 0.01).collect()
    assert [(r.trip_a, r.trip_b) for r in out] == [(0, 1)]
    # h(a,b) = dist from farthest a-endpoint to the single b point
    dy, dx = 0.0, 110.004 - 110.001
    assert out[0].hd2 == dy * dy + (dx * dx) * S


def test_disjoint_regions_no_candidates(spark):
    df = spark.createDataFrame(
        [mk(0, [(-7.0, 110.0)]), mk(1, [(7.0, 120.0)])],
        "trip_id long, lats array<double>, lons array<double>",
    )
    assert hausdorff_join(df, 0.01).count() == 0


# ---------------------------------------------------------------------------
# Discrete Frechet
# ---------------------------------------------------------------------------

def brute_fd2(a, b):
    """Independent recursive-memo discrete Frechet (different shape
    than the kernel's iterative rows): exact selections over the same
    d2 values, so equality must be BIT-exact."""
    import functools

    ala, alo = a
    bla, blo = b

    def d2(i, j):
        dy, dx = ala[i] - bla[j], alo[i] - blo[j]
        return dy * dy + (dx * dx) * S

    @functools.lru_cache(maxsize=None)
    def rec(i, j):
        if i == 0 and j == 0:
            return d2(0, 0)
        if i == 0:
            return max(rec(0, j - 1), d2(0, j))
        if j == 0:
            return max(rec(i - 1, 0), d2(i, 0))
        return max(d2(i, j), min(rec(i - 1, j), rec(i - 1, j - 1),
                                 rec(i, j - 1)))

    return rec(len(ala) - 1, len(bla) - 1)


def test_frechet_brute_force_parity(spark, trips):
    from osm_search_spark.operators.traj_sim import frechet_join

    df = spark.createDataFrame(
        trips, "trip_id long, lats array<double>, lons array<double>"
    )
    got = {
        (r.trip_a, r.trip_b): r.fd2
        for r in frechet_join(df, 1.0).collect()
    }
    for i in range(len(trips)):
        for j in range(i + 1, len(trips)):
            a, b = trips[i], trips[j]
            exp = brute_fd2((a[1], a[2]), (b[1], b[2]))
            assert got[(a[0], b[0])] == exp, (a[0], b[0])


def test_frechet_geq_hausdorff_and_threshold(spark, trips):
    from osm_search_spark.operators.traj_sim import (
        frechet_join,
        hausdorff_join,
    )

    df = spark.createDataFrame(
        trips, "trip_id long, lats array<double>, lons array<double>"
    )
    h = {(r.trip_a, r.trip_b): r.hd2 for r in hausdorff_join(df, 1.0).collect()}
    f = {(r.trip_a, r.trip_b): r.fd2 for r in frechet_join(df, 1.0).collect()}
    assert set(f) == set(h)
    for k in f:
        assert f[k] >= h[k], k
    # thresholded results are a subset of the Hausdorff ones
    fd = {(r.trip_a, r.trip_b) for r in frechet_join(df, 0.02).collect()}
    hd = {(r.trip_a, r.trip_b) for r in hausdorff_join(df, 0.02).collect()}
    assert fd <= hd


def test_frechet_out_and_back_vs_hausdorff(spark):
    # the classic separator: a straight line vs an out-and-back along
    # the same path have ~zero Hausdorff but large Frechet
    line = mk(0, [(-7.0, 110.0 + i * 0.001) for i in range(9)])
    back = mk(
        1,
        [(-7.0, 110.0 + x * 0.001)
         for x in list(range(9)) + list(range(7, -1, -1))],
    )
    df = spark.createDataFrame(
        [line, back], "trip_id long, lats array<double>, lons array<double>"
    )
    from osm_search_spark.operators.traj_sim import (
        frechet_join,
        hausdorff_join,
    )

    hd2 = hausdorff_join(df, 1.0).collect()[0].hd2
    fd2 = frechet_join(df, 1.0).collect()[0].fd2
    assert hd2 == 0.0
    assert fd2 >= (0.006 ** 2) * S  # must walk back while line advances


def test_topk_matches_brute_force(spark, trips):
    from osm_search_spark.operators.traj_sim import hausdorff_topk

    schema = "trip_id long, lats array<double>, lons array<double>"
    probes = spark.createDataFrame(trips[:3], schema)
    corpus = spark.createDataFrame(
        [(t + 100, la, lo) for t, la, lo in trips], schema
    )
    got = [
        (r.probe_id, r.rank, r.corpus_id, r.hd2)
        for r in hausdorff_topk(probes, corpus, 1.0, k=4)
        .orderBy("probe_id", "rank").collect()
    ]
    exp = []
    for pid, pla, plo in trips[:3]:
        ds = sorted(
            (brute_hd2((pla, plo), (la, lo)), t + 100)
            for t, la, lo in trips
        )
        exp.extend(
            (pid, rk + 1, cid, d) for rk, (d, cid) in enumerate(ds[:4])
        )
    assert got == exp  # bit-exact distances, exact ranks/ties


def test_topk_threshold_truncates(spark, trips):
    from osm_search_spark.operators.traj_sim import hausdorff_topk

    schema = "trip_id long, lats array<double>, lons array<double>"
    probes = spark.createDataFrame(trips[:1], schema)
    corpus = spark.createDataFrame(
        [(t + 100, la, lo) for t, la, lo in trips], schema
    )
    tight = hausdorff_topk(probes, corpus, 0.005, k=10).collect()
    assert 0 < len(tight) < 10  # in-range neighbors only
    assert all(r.hd2 <= 0.005 * 0.005 for r in tight)


def test_frechet_dp_batch_matches_recursion():
    """Round-9: the antidiagonal batched numpy DP (frechet_dp_batch) must
    be BIT-exact vs the recursive definition over random variable-length
    pairs, including 1-point and max-length-mismatch shapes (padding must
    never leak into valid cells)."""
    import numpy as np

    from osm_search_spark.operators.traj_sim import frechet_dp_batch

    rng = np.random.default_rng(7)
    al_l, ao_l, bl_l, bo_l = [], [], [], []
    for _ in range(40):
        na, nb = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        al_l.append(rng.uniform(-8, -7, na)); ao_l.append(rng.uniform(110, 111, na))
        bl_l.append(rng.uniform(-8, -7, nb)); bo_l.append(rng.uniform(110, 111, nb))
    got = frechet_dp_batch(al_l, ao_l, bl_l, bo_l, S)
    for p in range(40):
        exp = brute_fd2(
            (al_l[p].tolist(), ao_l[p].tolist()),
            (bl_l[p].tolist(), bo_l[p].tolist()),
        )
        assert got[p] == exp, p
