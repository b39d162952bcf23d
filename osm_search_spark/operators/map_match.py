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

Oracle-parity discipline: every DP INPUT is a 6dp-rounded number —
dist_km/t/snap coords from JVM expression text shared with the twin;
step_km/gc_km from the kernel's numpy haversine (same formula, libm-vs-
libm ULP differences absorbed by the 6dp rounding — the repo's standard
float bridge; the only residual risk is a value landing within ~1 ULP of
a .5e-6 rounding boundary, astronomically rare and impossible on the
planted fixture). Candidate SELECTION (per-way argmin, top-m way rank)
orders by the ROUNDED distance with (way_id, seg_idx) tie-breaks, so
both engines pick identical candidates. The DP itself is exact float64
+/*/compare in a documented order (score_new = (score_prev + tr) + em,
argmin ties -> lowest predecessor candidate index), so the discrete
Viterbi decisions match across engines. The DuckDB twin (fixed-length
fixture) re-runs the same DP as chained CTEs.

Scale shape (100 TB posture): ONE wide shuffle total.
- the candidate projection is MAP-ONLY: the snap cover join (broadcast
  dim, or shuffle hash via broadcast_segments=False) + the t/snap/
  distance expressions + the radius filter;
- candidates then repartition ONCE by trip_id, sort within partitions,
  and a single batched mapInPandas kernel does per-way argmin, top-m way
  selection, transition costs, and the Viterbi — all per-trip-local
  (state O(L x m), work O(L x m^2); trips are naturally bounded, no
  giant key). The earlier shape (JVM argmin window + transition
  self-join + array-agg join) paid three extra shuffles and two
  checkpoints of candidate-sized frames — measured at 10M pings /
  local[8]: 159s of 223s wall; the fused kernel removes all of it.

Per-trip contract: pings must have contiguous seq 0..L-1 within each
trip and every ping needs >= 1 candidate within radius_km; a trip
violating either (GPS gap / off-network ping) yields NO output rows —
the bounded-search contract, same as snap_to_segments' missing-row
contract (snap.py:20-23). Reference analog: none (the reference serves
point queries only); the operator follows the published Newson-Krumm
formulation over the reference's own street-network data model.
"""

from __future__ import annotations

import math

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
from ..functions.geodesy import EARTH_RADIUS_KM, haversine_km
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


def candidate_projection(
    points: DataFrame,
    ways: DataFrame,
    radius_km: float = 0.5,
    res: int = C.JOIN_RES,
    broadcast_segments: bool = True,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """MAP-ONLY candidate rows: every (ping, segment) pair within
    radius_km with 6dp-rounded (t, snap_lat, snap_lon, dist_km) — the
    snap cover join + shared refine expressions, BEFORE any per-way
    argmin/top-m (those run per-trip in the match kernel). Columns:
    (trip_id, seq, plat, plon, way_id, seg_idx, t, snap_lat, snap_lon,
    dist_km) plus any `carry_cols` passed through from the point side
    (the streaming matcher rides its close marker here — re-joining it
    downstream would be a stream-stream join)."""
    cover = _segment_cover(way_segments(ways), radius_km, res)
    if broadcast_segments:
        cover = F.broadcast(cover)
    carry = list(carry_cols)
    pts = points.select(
        "trip_id", "seq",
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        C.latlng_to_cell("lat", "lon", res).alias("cell_id"),
        *carry,
    )
    cand = pts.join(cover, "cell_id")
    with_t = cand.select(
        "trip_id", "seq", "plat", "plon",
        "way_id", "seg_idx", "alat", "alon", "blat", "blon",
        F.expr(T_EXPR).alias("_t"),
        *carry,
    )
    with_snap = with_t.select(
        "trip_id", "seq", "plat", "plon", "way_id", "seg_idx", "_t",
        (F.col("alat") + F.col("_t") * (F.col("blat") - F.col("alat"))).alias("_slat"),
        (F.col("alon") + F.col("_t") * (F.col("blon") - F.col("alon"))).alias("_slon"),
        *carry,
    )
    return with_snap.select(
        "trip_id", "seq", "plat", "plon", "way_id", "seg_idx",
        F.round("_t", 6).alias("t"),
        F.round("_slat", 6).alias("snap_lat"),
        F.round("_slon", 6).alias("snap_lon"),
        F.round(
            haversine_km(
                F.col("plat"), F.col("plon"), F.col("_slat"), F.col("_slon")
            ),
            6,
        ).alias("dist_km"),
        *carry,
    ).filter(F.col("dist_km") <= radius_km)


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
    (ties by seg_idx), then the m nearest ways (ties by way_id) — all
    ordered on the 6dp-ROUNDED distance (the parity boundary).
    Returns (trip_id, seq, plat, plon, cand, way_id, seg_idx, t,
    snap_lat, snap_lon, dist_km); cand = 0-based way rank.

    This is the REFERENCE formulation of the candidate set (used by the
    parity tests and mirrored by the oracle twin); hmm_match itself runs
    the same selection per-trip inside the fused kernel — identical
    output, one shuffle less."""
    proj = candidate_projection(
        points, ways, radius_km, res, broadcast_segments
    )
    per_way = proj.groupBy("trip_id", "seq", "way_id").agg(
        F.min(
            F.struct(
                F.col("dist_km").alias("d"),
                F.col("seg_idx").alias("seg_idx"),
                F.col("t").alias("t"),
                F.col("snap_lat").alias("slat"),
                F.col("snap_lon").alias("slon"),
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
            F.col("b.t").alias("t"),
            F.col("b.slat").alias("snap_lat"),
            F.col("b.slon").alias("snap_lon"),
            F.col("b.d").alias("dist_km"),
        )
    )


def candidate_transitions(
    cands: DataFrame, tr_w: float, switch_cost: float = DEFAULT_SWITCH_COST
) -> DataFrame:
    """(trip_id, seq_b, cand_a, cand_b, tr_cost) for consecutive pings:
    tr_cost = |step_km − gc_km| × tr_w + (way_a ≠ way_b) × switch_cost
    over 6dp-rounded distances (the subtraction/abs/literal-multiply/add
    are exact IEEE). The JVM reference formulation for the parity tests;
    hmm_match computes the identical quantity in-kernel."""
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


def _hav_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Python twin of geodesy.haversine_km (identical formula/order;
    libm-vs-JVM ULP differences are absorbed by the caller's 6dp round)."""
    la1, lo1 = math.radians(lat1), math.radians(lon1)
    la2, lo2 = math.radians(lat2), math.radians(lon2)
    hav_lat = (1.0 - math.cos(la1 - la2)) / 2.0
    hav_lon = (1.0 - math.cos(lo1 - lo2)) / 2.0
    a = hav_lat + math.cos(la1) * math.cos(la2) * hav_lon
    return EARTH_RADIUS_KM * 2.0 * math.asin(math.sqrt(a))


def _round6(x: float) -> float:
    """Fast HALF-UP 6dp round (F.round semantics for the sign range used
    here; the module doc covers the residual boundary-ULP caveat)."""
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -(
        math.floor(-x * 1e6 + 0.5) / 1e6
    )


def _match_one_trip(
    trip: int,
    by_seq: list[list[tuple]],
    gcs: list[float],
    em_w: float,
    tr_w: float,
    switch_cost: float,
    out: list,
) -> None:
    """Viterbi over ONE trip's SELECTED candidates.
    by_seq[s] = cand-ordered rows (cand, way_id, seg_idx, t, slat, slon,
    d) for ping s; gcs[s-1] = rounded ping-to-ping great-circle for the
    (s-1 -> s) hop. DP order of operations is the parity contract
    (module doc): em = (d*d)*em_w; cost_p = score_prev[p] + tr[p,c]
    taken in ascending p (strict < keeps the LOWEST p on ties);
    score[c] = best_cost + em. Appends (trip, seq, way_id, seg_idx, t,
    slat, slon, d, total) per matched ping; nothing for a disconnected
    trip."""
    scores = {r[0]: (r[6] * r[6]) * em_w for r in by_seq[0]}
    prev_rows = by_seq[0]
    back: list[dict[int, int]] = [{}]
    for s in range(1, len(by_seq)):
        gc = gcs[s - 1]
        nxt, bp = {}, {}
        for r in by_seq[s]:
            c = r[0]
            best_p, best_cost = None, None
            for pr in prev_rows:
                p = pr[0]
                if p not in scores:
                    continue
                step = _round6(_hav_km(pr[4], pr[5], r[4], r[5]))
                tr = abs(step - gc) * tr_w + (
                    switch_cost if pr[1] != r[1] else 0.0
                )
                cost = scores[p] + tr
                if best_cost is None or cost < best_cost:
                    best_p, best_cost = p, cost
            if best_p is None:
                continue  # unreachable candidate
            nxt[c] = best_cost + (r[6] * r[6]) * em_w
            bp[c] = best_p
        if not nxt:
            return  # trip disconnected
        scores = nxt
        prev_rows = by_seq[s]
        back.append(bp)
    last = min(scores, key=lambda c: (scores[c], c))
    total = scores[last]
    path = [last]
    for s in range(len(by_seq) - 1, 0, -1):
        path.append(back[s][path[-1]])
    path.reverse()
    for s, c in enumerate(path):
        for r in by_seq[s]:
            if r[0] == c:
                out.append(
                    (trip, s, r[1], r[2], r[3], r[4], r[5], r[6],
                     _round6(total))
                )
                break


def select_trip_candidates(
    rows: list[tuple], m: int
) -> tuple[list[list[tuple]], list[float]] | None:
    """Per-trip candidate selection over projection rows sorted by
    (seq, dist_km, way_id, seg_idx): per-way argmin = first occurrence
    of each way; top-m ways = first m distinct ways (the sort order IS
    the (d, way, seg) / (d, way) ranking). Returns (by_seq, gcs) for
    `_match_one_trip`, or None when the trip breaks the contiguous-seq
    contract. rows: (seq, plat, plon, way_id, seg_idx, t, slat, slon, d).
    """
    by_seq: list[list[tuple]] = []
    pings: list[tuple] = []  # (plat, plon) per seq
    cur_seq = None
    seen: dict = {}
    for r in rows:
        if r[0] != cur_seq:
            by_seq.append([])
            pings.append((r[1], r[2]))
            cur_seq = r[0]
            seen = {}
            if by_seq and r[0] != len(by_seq) - 1:
                return None  # seq gap / not starting at 0
        if len(seen) >= m and r[3] not in seen:
            continue
        if r[3] in seen:
            continue  # later row of an already-selected way: larger (d, seg)
        cand = len(seen)
        seen[r[3]] = cand
        by_seq[-1].append((cand, r[3], r[4], r[5], r[6], r[7], r[8]))
    gcs = [
        _round6(_hav_km(*pings[s - 1], *pings[s]))
        for s in range(1, len(pings))
    ]
    return by_seq, gcs


def _viterbi_batched(m: int, em_w: float, tr_w: float, switch_cost: float):
    """mapInPandas kernel: candidate selection + transitions + Viterbi
    over MANY trips per Arrow batch. The input is repartitioned by
    trip_id and sorted (trip_id, seq, dist_km, way_id, seg_idx) within
    partitions; a trip may straddle Arrow batch boundaries, so the last
    trip of each batch is buffered and prepended to the next (the
    batches of one partition arrive in order). Batching amortizes the
    per-group pandas overhead that dominated groupBy().applyInPandas at
    ~10-row groups."""
    cols = list(_MATCH_SCHEMA.fieldNames())

    def _run(pdf: pd.DataFrame, out: list) -> None:
        cur_trip, rows = None, []
        for t in pdf.itertuples(index=False):
            if t.trip_id != cur_trip:
                if rows:
                    sel = select_trip_candidates(rows, m)
                    if sel is not None:
                        _match_one_trip(
                            cur_trip, sel[0], sel[1], em_w, tr_w,
                            switch_cost, out,
                        )
                cur_trip, rows = t.trip_id, []
            rows.append(
                (t.seq, t.plat, t.plon, t.way_id, t.seg_idx, t.t,
                 t.snap_lat, t.snap_lon, t.dist_km)
            )
        if rows:
            sel = select_trip_candidates(rows, m)
            if sel is not None:
                _match_one_trip(
                    cur_trip, sel[0], sel[1], em_w, tr_w, switch_cost, out
                )

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
    proj = candidate_projection(
        points, ways, radius_km, res, broadcast_segments
    )
    return (
        proj.repartition("trip_id")
        .sortWithinPartitions(
            "trip_id", "seq", "dist_km", "way_id", "seg_idx"
        )
        .mapInPandas(
            _viterbi_batched(m, float(em_w), float(tr_w), float(switch_cost)),
            _MATCH_SCHEMA,
        )
    )
