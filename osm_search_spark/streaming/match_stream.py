"""Streaming HMM map matching — the stateful twin of the batch
`hmm_match` operator: pings arrive on a stream, each trip's candidate
rows buffer in per-trip state, and the Viterbi runs ONCE when the trip
closes, emitting the matched sequence exactly like the batch operator.

Pipeline (all states bounded):
1. the MAP-ONLY candidate projection (stream-static broadcast join
   against the radius-padded segment cover + the shared refine
   expressions) — the same `candidate_projection` the batch path uses,
   so every buffered number is the same 6dp-rounded JVM value;
2. `applyInPandasWithState` keyed by trip_id: state = the trip's
   candidate rows so far (parallel arrays — bounded by trip length x
   nearby segments, the operator's contract) + a closed flag;
3. a ping with `is_last = true` closes its trip: the kernel re-sorts
   the buffered rows (seq, dist_km, way_id, seg_idx), runs the SAME
   per-trip selection + Viterbi code as the batch kernel
   (map_match.select_trip_candidates / _match_one_trip), emits the
   matched rows, and drops the state.

Out-of-order delivery WITHIN a trip is tolerated up to the close marker
(rows buffer; ordering is restored at close); a ping arriving AFTER its
trip closed is dropped — the at-least-once ingest trade the streaming
dedup documents. A trip whose close marker never arrives (trip-end
event lost, or the is_last ping itself was off-network and produced no
candidate row to carry the marker) holds its buffer until the
configured processing-time timeout, then matches what it has (matching
the partial trip beats leaking state).

Parity: cross-micro-batch output == the batch hmm_match of the same
pings (tested with trips split across three micro-batches) — the DP
inputs are identical JVM-rounded numbers and the DP code is shared, so
this holds row-for-row, not just approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ..functions import cells as C
from ..operators.map_match import (
    DEFAULT_EM_W,
    DEFAULT_M,
    DEFAULT_SWITCH_COST,
    DEFAULT_TR_W,
    _match_one_trip,
    candidate_projection,
    select_trip_candidates,
)

_STATE_SCHEMA = (
    "seqs array<int>, plats array<double>, plons array<double>, "
    "ways array<long>, segs array<int>, ts array<double>, "
    "slats array<double>, slons array<double>, ds array<double>, "
    "closed_at int"
)
_OUT_SCHEMA = (
    "trip_id long, seq int, way_id long, seg_idx int, t double, "
    "snap_lat double, snap_lon double, dist_km double, score double"
)


def match_trips_stream(
    ping_stream: DataFrame,
    ways: DataFrame,
    radius_km: float = 0.5,
    m: int = DEFAULT_M,
    em_w: float = DEFAULT_EM_W,
    tr_w: float = DEFAULT_TR_W,
    switch_cost: float = DEFAULT_SWITCH_COST,
    res: int = C.JOIN_RES,
    timeout_ms: int = 0,
) -> DataFrame:
    """ping_stream: streaming (trip_id, seq, lat, lon, is_last boolean);
    ways: STATIC assembled (id, lats, lons). Returns the streaming
    matched frame (same columns as batch hmm_match). timeout_ms > 0
    additionally closes idle trips after that much processing time
    (partial-trip match instead of a state leak)."""
    import pandas as pd

    # the close marker rides THROUGH the projection (carry_cols) — a
    # downstream re-join of is_last would be a stream-stream join
    marked = candidate_projection(
        ping_stream.select("trip_id", "seq", "lat", "lon", "is_last"),
        ways, radius_km, res, carry_cols=("is_last",),
    )

    def kernel(key, pdfs, state):
        trip = key[0]
        if state.exists:
            (seqs, plats, plons, ways_, segs, ts, slats, slons, ds,
             closed) = state.get
            seqs, plats, plons = list(seqs), list(plats), list(plons)
            ways_, segs, ts = list(ways_), list(segs), list(ts)
            slats, slons, ds = list(slats), list(slons), list(ds)
        else:
            seqs, plats, plons, ways_, segs, ts, slats, slons, ds = (
                [], [], [], [], [], [], [], [], []
            )
            closed = 0
        close_now = bool(closed) or (
            state.exists and state.hasTimedOut
        )
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                seqs.append(int(r.seq))
                plats.append(float(r.plat))
                plons.append(float(r.plon))
                ways_.append(int(r.way_id))
                segs.append(int(r.seg_idx))
                ts.append(float(r.t))
                slats.append(float(r.snap_lat))
                slons.append(float(r.snap_lon))
                ds.append(float(r.dist_km))
                if bool(r.is_last):
                    close_now = True
        if not close_now:
            state.update(
                (seqs, plats, plons, ways_, segs, ts, slats, slons, ds, 0)
            )
            if timeout_ms > 0:
                state.setTimeoutDuration(timeout_ms)
            return
        state.remove()
        rows = sorted(
            zip(seqs, plats, plons, ways_, segs, ts, slats, slons, ds),
            key=lambda r: (r[0], r[8], r[3], r[4]),
        )
        sel = select_trip_candidates(rows, m)
        out: list = []
        if sel is not None:
            _match_one_trip(
                int(trip), sel[0], sel[1], float(em_w), float(tr_w),
                float(switch_cost), out,
            )
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "trip_id", "seq", "way_id", "seg_idx", "t",
                    "snap_lat", "snap_lon", "dist_km", "score",
                ],
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return marked.groupBy("trip_id").applyInPandasWithState(
        kernel,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
