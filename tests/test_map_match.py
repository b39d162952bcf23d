"""HMM map matching (operators/map_match.py): the wrong-road fix over the
planted two-parallel-roads fixture, Viterbi parity against a brute-force
all-paths enumeration, candidate-set semantics, and the broken-trip
contract. The end-to-end result is also hash-gated against the chained-CTE
DuckDB twin (oracle `hmm_match` in __spark_entry__.py)."""

import itertools

import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.map_match import (
    DEFAULT_EM_W,
    candidate_transitions,
    hmm_match,
    snap_candidates,
)
from osm_search_spark.operators.snap import snap_to_segments
from osm_search_spark.sources import synth

TRUE_WAY = {0: 1, 1: 1, 2: 2, 3: 2}  # fixture: trips 0-1 road 1, 2-3 road 2


@pytest.fixture(scope="module")
def fixture(spark):
    pings = synth.map_match_pings(spark)
    streets = synth.map_match_streets(spark)
    return pings, streets


def test_hmm_fixes_wrong_road_snaps(spark, fixture):
    pings, streets = fixture
    # per-point snap: the planted seq-4 ping goes to the WRONG road
    pp = snap_to_segments(
        pings.select(
            (F.col("trip_id") * 100 + F.col("seq")).alias("point_id"),
            "lat", "lon",
        ),
        streets, radius_km=0.5,
    )
    by_pt = {r["point_id"]: r["way_id"] for r in pp.collect()}
    for trip, true_way in TRUE_WAY.items():
        assert by_pt[trip * 100 + 4] != true_way  # snap is wrong
        for k in (0, 1, 2, 3, 5, 6, 7):
            assert by_pt[trip * 100 + k] == true_way

    # HMM: the full matched sequence sits on the true road
    out = hmm_match(pings, streets).collect()
    assert len(out) == 4 * synth.MM_TRIP_LEN
    for r in out:
        assert r["way_id"] == TRUE_WAY[r["trip_id"]], (
            f"trip {r['trip_id']} seq {r['seq']} matched way {r['way_id']}"
        )
        assert r["dist_km"] <= 0.5 and r["score"] > 0


def test_viterbi_matches_bruteforce_enumeration(spark, fixture):
    """The distributed DP equals an independent all-paths minimum (4 trips
    x 3^8 paths) with the same cost arithmetic."""
    pings, streets = fixture
    cands = snap_candidates(pings, streets).localCheckpoint(eager=True)
    trans = candidate_transitions(cands, 5.0)
    crows, trows = cands.collect(), trans.collect()
    out = {
        (r["trip_id"], r["seq"]): r["way_id"]
        for r in hmm_match(pings, streets).collect()
    }
    scores = {r["trip_id"]: r["score"] for r in hmm_match(pings, streets).collect()}
    for trip in TRUE_WAY:
        by_seq = {}
        for r in crows:
            if r["trip_id"] == trip:
                by_seq.setdefault(r["seq"], []).append(r)
        tr = {
            (r["seq_b"], r["cand_a"], r["cand_b"]): r["tr_cost"]
            for r in trows
            if r["trip_id"] == trip
        }
        seqs = sorted(by_seq)
        best_cost, best_path = None, None
        for combo in itertools.product(
            *[sorted(by_seq[s], key=lambda r: r["cand"]) for s in seqs]
        ):
            cost = (combo[0]["dist_km"] * combo[0]["dist_km"]) * DEFAULT_EM_W
            ok = True
            for s in seqs[1:]:
                key = (s, combo[s - 1]["cand"], combo[s]["cand"])
                if key not in tr:
                    ok = False
                    break
                cost = (cost + tr[key]) + (
                    combo[s]["dist_km"] * combo[s]["dist_km"]
                ) * DEFAULT_EM_W
            if ok and (best_cost is None or cost < best_cost):
                best_cost, best_path = cost, combo
        assert best_path is not None
        for s in seqs:
            assert out[(trip, s)] == best_path[s]["way_id"]
        assert scores[trip] == pytest.approx(best_cost, abs=1e-6)


def test_candidates_are_per_way(spark, fixture):
    """The planted ping (near the connector) must keep all three WAYS as
    candidates — a per-segment top-m would crowd the true road out with
    two segments of the connector."""
    pings, streets = fixture
    cands = snap_candidates(pings, streets)
    c4 = cands.filter((F.col("trip_id") == 0) & (F.col("seq") == 4))
    ways = sorted(r["way_id"] for r in c4.collect())
    assert ways == [1, 2, 3]
    # one candidate per way, rank 0 = nearest
    r0 = c4.filter(F.col("cand") == 0).first()
    assert r0["way_id"] == 2  # the planted ping IS closer to road 2


def test_broken_trip_yields_no_rows(spark, fixture):
    """A mid-trip ping with no candidate within the radius (a GPS gap /
    off-network excursion) voids its whole trip — the candidate seqs are
    no longer contiguous — without touching other trips."""
    pings, streets = fixture
    extra = spark.createDataFrame(
        [
            (9, 0, 0.0001, 0.003),
            (9, 1, 5.0, 5.0),  # off-network: no candidate -> seq gap
            (9, 2, 0.0001, 0.008),
        ],
        "trip_id long, seq int, lat double, lon double",
    )
    out = hmm_match(pings.unionByName(extra), streets).collect()
    trips = {r["trip_id"] for r in out}
    assert trips == {0, 1, 2, 3}


def test_legitimate_turn_pays_one_switch(spark, fixture):
    """The way-switch cost must not suppress REAL turns: a trip driving
    road 1 east then turning north onto the road-3 connector matches
    [1,1,1,1,3,3,3,3] — one switch at the intersection."""
    _, streets = fixture
    rows = [
        (7, 0, 0.0001, 0.0020),
        (7, 1, 0.0001, 0.0045),
        (7, 2, 0.0001, 0.0070),
        (7, 3, 0.0001, 0.0095),
        (7, 4, 0.0008, 0.0101),
        (7, 5, 0.0015, 0.0101),
        (7, 6, 0.0022, 0.0101),
        (7, 7, 0.0028, 0.0101),
    ]
    pings = spark.createDataFrame(
        rows, "trip_id long, seq int, lat double, lon double"
    )
    out = sorted(hmm_match(pings, streets).collect(), key=lambda r: r["seq"])
    ways = [r["way_id"] for r in out]
    assert ways == [1, 1, 1, 1, 3, 3, 3, 3], ways
