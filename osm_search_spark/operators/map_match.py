"""HMM map matching (Newson & Krumm 2009) on top of the snap primitive:
per-ping candidate roads -> per-trip Viterbi over emission + transition
costs -> the matched way/segment SEQUENCE. Fixes the classic wrong-road
error of per-point snapping: a noisy ping that lands closer to a parallel
road is kept on the true road because jumping costs transition penalty.

Cost model (minimization; log-space up to constants):
- emission  em[s][c]   = (d*d) * em_w            d = snap distance (km)
  (Gaussian emission N(0, sigma) with em_w = 0.5/sigma^2)
- transition tr[p][c]  = |step_km - gc_km| * tr_w
                         + (way_p != way_c) * switch_cost
  step_km = great-circle between consecutive candidate SNAP points,
  gc_km   = great-circle between the consecutive PINGS themselves —
  the Newson-Krumm route/great-circle discrepancy with the snap-point
  great-circle standing in for the route distance, PLUS a flat
  way-switch cost: without a router the proxy alone cannot charge a
  parallel-road detour (see DEFAULT_SWITCH_COST).

Oracle-parity discipline: every DP INPUT (dist_km, step_km, gc_km) is a
6dp-rounded number computed from shared expression text on both engines;
the DP itself is pure float64 +/*/compare in a DOCUMENTED order
(score_new = (score_prev + tr) + em, argmin ties -> lowest predecessor
candidate index), so both engines' scores are bit-identical and the
discrete Viterbi decisions match exactly. The DuckDB twin (fixed-length
fixture) re-runs the same DP as chained CTEs.

Scale shape (100 TB posture):
- candidates ride the snap operator's radius-padded cell-cover join
  (broadcast dim, or shuffle hash join via broadcast_segments=False);
  top-m per ping is a rank-filtered window -> map-side WindowGroupLimit;
- transitions are ONE self-join of the candidate frame on
  (trip_id, seq+1): cost ∝ candidates × m, shuffled by trip/seq;
- Viterbi runs per trip in applyInPandas — state is O(trip_len × m),
  work O(trip_len × m²); groups shuffle by trip_id, so a 10^9-trip
  corpus spreads evenly (trips are naturally bounded; no giant key).

Per-trip contract: pings must have contiguous seq 0..L-1 within each
trip and every ping needs >= 1 candidate within radius_km; a trip
violating either (GPS gap / off-network ping) yields NO output rows —
the bounded-search contract, same as snap_to_segments' missing-row
contract (snap.py:20-23). Reference analog: none (the reference serves
point queries only); the operator follows the published Newson-Krumm
formulation over the reference's own street-network data model.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions import cells as C
from ..functions.geodesy import haversine_km
from .snap import T_EXPR, _segment_cover, way_segments

DEFAULT_M = 3
DEFAULT_EM_W = 50.0  # 0.5 / sigma^2 at sigma = 0.1 km GPS noise
DEFAULT_TR_W = 5.0  # 1 / beta at beta = 0.2 km route discrepancy
# Router-free road-switch surrogate: with no router, |step − gc| cannot
# charge a parallel-road detour (the ping's own drift toward the wrong
# road shrinks gc along with it — measured on the fixture, the proxy
# alone PREFERS the switch), so a way change pays a flat cost, the
# standard simplification in routerless HMM matchers. A legitimate
# turn at an intersection pays it once; a wrong-road excursion pays
# twice (out and back), which is what makes single-ping outliers lose.
DEFAULT_SWITCH_COST = 1.0

_MATCH_SCHEMA = StructType(
    [
        StructField("trip_id", LongType()),
        StructField("seq", IntegerType()),
        StructField("way_id", LongType()),
        StructField("seg_idx", IntegerType()),
        StructField("t", DoubleType()),
        StructField("snap_lat", DoubleType()),
        StructField("snap_lon", DoubleType()),
        StructField("dist_km", DoubleType()),
        StructField("score", DoubleType()),
    ]
)


def snap_candidates(
    points: DataFrame,
    ways: DataFrame,
    radius_km: float = 0.5,
    m: int = DEFAULT_M,
    res: int = C.JOIN_RES,
    broadcast_segments: bool = True,
) -> DataFrame:
    """Top-m nearest DISTINCT WAYS per ping (the Newson-Krumm candidate
    set: nearest point per road, else a multi-segment road crowds the
    true road out of the top-m): per-(ping, way) argmin over segments
    (ties by seg_idx), then the m nearest ways (ties by way_id).
    Returns (trip_id, seq, plat, plon, cand, way_id, seg_idx, t,
    snap_lat, snap_lon, dist_km); cand = 0-based way rank; floats
    rounded 6dp (the DP's parity boundary). Same cover join as
    snap_to_segments; the per-way argmin is a map-side-combinable
    groupBy-min-struct, the way rank a rank-filtered window."""
    cover = _segment_cover(way_segments(ways), radius_km, res)
    if broadcast_segments:
        cover = F.broadcast(cover)
    pts = points.select(
        "trip_id", "seq",
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        C.latlng_to_cell("lat", "lon", res).alias("cell_id"),
    )
    cand = pts.join(cover, "cell_id")
    with_t = cand.select(
        "trip_id", "seq", "plat", "plon",
        "way_id", "seg_idx", "alat", "alon", "blat", "blon",
        F.expr(T_EXPR).alias("_t"),
    )
    with_snap = with_t.select(
        "trip_id", "seq", "plat", "plon", "way_id", "seg_idx", "_t",
        (F.col("alat") + F.col("_t") * (F.col("blat") - F.col("alat"))).alias("_slat"),
        (F.col("alon") + F.col("_t") * (F.col("blon") - F.col("alon"))).alias("_slon"),
    )
    refined = with_snap.select(
        "trip_id", "seq", "plat", "plon", "way_id", "seg_idx",
        "_t", "_slat", "_slon",
        haversine_km(
            F.col("plat"), F.col("plon"), F.col("_slat"), F.col("_slon")
        ).alias("_d"),
    ).filter(F.round("_d", 6) <= radius_km)
    per_way = refined.groupBy("trip_id", "seq", "way_id").agg(
        F.min(
            F.struct(
                F.col("_d").alias("d"),
                F.col("seg_idx").alias("seg_idx"),
                F.col("_t").alias("t"),
                F.col("_slat").alias("slat"),
                F.col("_slon").alias("slon"),
                F.col("plat").alias("plat"),
                F.col("plon").alias("plon"),
            )
        ).alias("b")
    )
    w = Window.partitionBy("trip_id", "seq").orderBy(
        F.col("b.d"), "way_id"
    )
    return (
        per_way.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= m)
        .select(
            "trip_id", "seq",
            F.col("b.plat").alias("plat"),
            F.col("b.plon").alias("plon"),
            (F.col("_rk") - 1).alias("cand"),
            "way_id",
            F.col("b.seg_idx").alias("seg_idx"),
            F.round("b.t", 6).alias("t"),
            F.round("b.slat", 6).alias("snap_lat"),
            F.round("b.slon", 6).alias("snap_lon"),
            F.round("b.d", 6).alias("dist_km"),
        )
    )


def candidate_transitions(
    cands: DataFrame, tr_w: float, switch_cost: float = DEFAULT_SWITCH_COST
) -> DataFrame:
    """(trip_id, seq_b, cand_a, cand_b, tr_cost) for consecutive pings:
    tr_cost = |step_km − gc_km| × tr_w + (way_a ≠ way_b) × switch_cost
    over 6dp-rounded distances (the subtraction/abs/literal-multiply/add
    are exact IEEE on both engines)."""
    a = cands.alias("a").select(
        "trip_id",
        F.col("seq").alias("seq_a"),
        F.col("cand").alias("cand_a"),
        F.col("way_id").alias("way_a"),
        F.col("snap_lat").alias("slat_a"),
        F.col("snap_lon").alias("slon_a"),
        F.col("plat").alias("plat_a"),
        F.col("plon").alias("plon_a"),
    )
    b = cands.alias("b").select(
        "trip_id",
        F.col("seq").alias("seq_b"),
        F.col("cand").alias("cand_b"),
        F.col("way_id").alias("way_b"),
        F.col("snap_lat").alias("slat_b"),
        F.col("snap_lon").alias("slon_b"),
        F.col("plat").alias("plat_b"),
        F.col("plon").alias("plon_b"),
    )
    step = F.round(
        haversine_km(
            F.col("slat_a"), F.col("slon_a"), F.col("slat_b"), F.col("slon_b")
        ),
        6,
    )
    gc = F.round(
        haversine_km(
            F.col("plat_a"), F.col("plon_a"), F.col("plat_b"), F.col("plon_b")
        ),
        6,
    )
    return (
        a.join(b, "trip_id")
        .filter(F.col("seq_b") == F.col("seq_a") + 1)
        .select(
            "trip_id", "seq_b", "cand_a", "cand_b",
            (
                F.abs(step - gc) * F.lit(float(tr_w))
                + F.when(
                    F.col("way_a") != F.col("way_b"),
                    F.lit(float(switch_cost)),
                ).otherwise(F.lit(0.0))
            ).alias("tr_cost"),
        )
    )


def _match_one_trip(trip: int, rows: list[tuple], out: list) -> None:
    """Viterbi over ONE trip's candidate rows (sorted by (seq, cand)).
    rows: (seq, cand, way_id, seg_idx, t, slat, slon, d, in_costs, em_w).
    DP order of operations is the parity contract (module doc):
    em = (d*d)*em_w; cost_p = score_prev[p] + tr[p,c] taken in ascending
    p (strict < keeps the LOWEST p on ties); score[c] = best_cost + em.
    Appends (trip, seq, way_id, seg_idx, t, slat, slon, d, total) per
    matched ping, or nothing for a broken/disconnected trip."""
    # group rows by seq (input sorted by (seq, cand))
    by_seq: list[list[tuple]] = []
    cur_seq = None
    for r in rows:
        if r[0] != cur_seq:
            by_seq.append([])
            cur_seq = r[0]
        by_seq[-1].append(r)
    # contiguity contract: seqs must be exactly 0..L-1
    if [g[0][0] for g in by_seq] != list(range(len(by_seq))):
        return
    em_w = rows[0][9]
    scores = {r[1]: (r[7] * r[7]) * em_w for r in by_seq[0]}
    back: list[dict[int, int]] = [{}]
    for grp in by_seq[1:]:
        nxt, bp = {}, {}
        for r in grp:
            c = r[1]
            best_p, best_cost = None, None
            inc = r[8]
            for e in [] if inc is None else inc:
                p = int(e["cand_a"])
                if p not in scores:
                    continue
                cost = scores[p] + float(e["tr_cost"])
                if best_cost is None or cost < best_cost:
                    best_p, best_cost = p, cost
            if best_p is None:
                continue  # unreachable candidate
            nxt[c] = best_cost + (r[7] * r[7]) * em_w
            bp[c] = best_p
        if not nxt:
            return  # trip disconnected
        scores = nxt
        back.append(bp)
    last = min(scores, key=lambda c: (scores[c], c))
    total = scores[last]
    path = [last]
    for s in range(len(by_seq) - 1, 0, -1):
        path.append(back[s][path[-1]])
    path.reverse()
    for s, c in enumerate(path):
        for r in by_seq[s]:
            if r[1] == c:
                # raw total: rounded to 6dp OUTSIDE via F.round (HALF_UP,
                # matching the twin; Python round is half-even)
                out.append(
                    (trip, s, r[2], r[3], r[4], r[5], r[6], r[7], total)
                )
                break


def _viterbi_batched(em_w: float):
    """mapInPandas kernel: Viterbi over MANY trips per Arrow batch. The
    input is repartitioned by trip_id and sorted (trip_id, seq, cand)
    within partitions; a trip may straddle Arrow batch boundaries, so the
    last trip of each batch is buffered and prepended to the next (the
    batches of one partition arrive in order). Batching amortizes the
    per-group pandas overhead that dominated groupBy().applyInPandas at
    ~10-row groups (77s -> ~8s for 100k trips at local[32])."""
    cols = list(_MATCH_SCHEMA.fieldNames())

    def _run(pdf: pd.DataFrame, out: list) -> None:
        it = pdf.itertuples(index=False)
        cur_trip, rows = None, []
        for t in it:
            if t.trip_id != cur_trip:
                if rows:
                    _match_one_trip(cur_trip, rows, out)
                cur_trip, rows = t.trip_id, []
            rows.append(
                (
                    t.seq, t.cand, t.way_id, t.seg_idx, t.t,
                    t.snap_lat, t.snap_lon, t.dist_km, t.in_costs,
                    em_w,
                )
            )
        if rows:
            _match_one_trip(cur_trip, rows, out)

    def gen(batches):
        leftover = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if pdf.empty:
                continue
            last_trip = pdf["trip_id"].iloc[-1]
            done = pdf[pdf["trip_id"] != last_trip]
            leftover = pdf[pdf["trip_id"] == last_trip]
            if not done.empty:
                out: list = []
                _run(done, out)
                yield pd.DataFrame(out, columns=cols)
        if leftover is not None and not leftover.empty:
            out = []
            _run(leftover, out)
            yield pd.DataFrame(out, columns=cols)

    return gen


def hmm_match(
    points: DataFrame,
    ways: DataFrame,
    radius_km: float = 0.5,
    m: int = DEFAULT_M,
    em_w: float = DEFAULT_EM_W,
    tr_w: float = DEFAULT_TR_W,
    switch_cost: float = DEFAULT_SWITCH_COST,
    res: int = C.JOIN_RES,
    broadcast_segments: bool = True,
) -> DataFrame:
    """Matched sequence per trip: (trip_id, seq, way_id, seg_idx, t,
    snap_lat, snap_lon, dist_km, score) — score is the trip's total
    Viterbi cost (rounded 6dp), repeated per row. points:
    (trip_id, seq, lat, lon); ways: assembled (id, lats, lons)."""
    cands = snap_candidates(
        points, ways, radius_km, m, res, broadcast_segments
    )
    # three consumers (transition self-join a/b + the kernel-input join):
    # pin once (round-4 rule — lazy frames re-run per subtree)
    cands = cands.localCheckpoint(eager=True)
    in_tr = (
        candidate_transitions(cands, tr_w, switch_cost)
        .groupBy("trip_id", "seq_b", "cand_b")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cand_a", "tr_cost"))
            ).alias("in_costs")
        )
    )
    keyed = (
        cands.drop("plat", "plon")
        .alias("L")
        .join(
            in_tr.alias("R"),
            (F.col("L.trip_id") == F.col("R.trip_id"))
            & (F.col("L.seq") == F.col("R.seq_b"))
            & (F.col("L.cand") == F.col("R.cand_b")),
            "left",
        )
        .select(
            F.col("L.trip_id").alias("trip_id"), "L.seq", "L.cand",
            "L.way_id", "L.seg_idx", "L.t", "L.snap_lat", "L.snap_lon",
            "L.dist_km", "R.in_costs",
        )
    )
    matched = (
        keyed.repartition("trip_id")
        .sortWithinPartitions("trip_id", "seq", "cand")
        .mapInPandas(_viterbi_batched(float(em_w)), _MATCH_SCHEMA)
    )
    return matched.withColumn("score", F.round("score", 6))
