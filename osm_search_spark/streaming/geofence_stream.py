"""Streaming geofence: the reference's stateful KV round-trip
(pkg/geofence/fence_index.go:50-73 — previous point persisted in bbolt per
tracked entity) as a Structured Streaming stateful operator.

Batch mode uses lag() (operators/geofence.py). Here the same status matrix
(geofence.go:97-116) runs over an unbounded stream with
applyInPandasWithState: state = last (lat, lon) per entity; each micro-batch
joins the entity's points against the broadcast fence set and emits one
status row per (point, fence).

Scale posture: state is keyed by entity id (hash-partitioned), fences are a
broadcast dict (fences are small — the reference holds them all in one
R-tree in memory too). Late/out-of-order events within a batch are ordered
by seq before applying transitions.

On the "no per-row Python" rule: the only Python loop here iterates over
the BROADCAST FENCE DIM (bounded, not data-sized); within each fence the
status matrix evaluates as shifted numpy arrays across the entity's whole
micro-batch. Per-entity grouping is inherent to applyInPandasWithState —
the per-group pandas frame is the operator's contract, not a loop we chose.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.geometry import haversine_km_np

OUTPUT_SCHEMA = "query_point_id string, seq int, fence_name string, status string"
STATE_SCHEMA = "lat double, lon double"


def _status_rows(
    entity: str,
    pdf: pd.DataFrame,
    fences: list[tuple[str, float, float, float]],
    prev: tuple[float, float] | None,
) -> tuple[list[dict], tuple[float, float] | None]:
    """Transition matrix over one entity's ordered points — VECTORIZED
    across points per fence (the prev point of row i is row i-1, so the
    whole batch evaluates as shifted arrays; no per-row Python)."""
    pdf = pdf.sort_values("seq")
    la = pdf["lat"].to_numpy(np.float64)
    lo = pdf["lon"].to_numpy(np.float64)
    seq = pdf["seq"].to_numpy()
    n = len(la)
    if n == 0:
        return [], prev
    has_prev = np.ones(n, dtype=bool)
    pla = np.concatenate(([prev[0] if prev else 0.0], la[:-1]))
    plo = np.concatenate(([prev[1] if prev else 0.0], lo[:-1]))
    if prev is None:
        has_prev[0] = False

    out: list[dict] = []
    frames = []
    for fname, fla, flo, rad in fences:
        now_in = haversine_km_np(la, lo, fla, flo) <= rad
        prev_in = (haversine_km_np(pla, plo, fla, flo) <= rad) & has_prev
        crosses = _segment_crosses_np(pla, plo, la, lo, fla, flo, rad) & has_prev
        status = np.select(
            [prev_in & now_in, ~prev_in & now_in, prev_in & ~now_in, crosses],
            ["INSIDE", "ENTER", "EXIT", "CROSS"],
            default="OUTSIDE",
        )
        frames.append(pd.DataFrame(dict(
            query_point_id=entity, seq=seq, fence_name=fname, status=status
        )))
    merged = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    out = merged.to_dict("records")
    return out, (float(la[-1]), float(lo[-1]))


def _segment_crosses_np(pla, plo, la, lo, fla, flo, rad) -> np.ndarray:
    """circle.go:54-96 segment-circle test, vectorized over points."""
    coslat = np.cos(np.radians(fla))
    ax = (np.radians(plo) - np.radians(flo)) * coslat * 6371.0
    ay = (np.radians(pla) - np.radians(fla)) * 6371.0
    bx = (np.radians(lo) - np.radians(flo)) * coslat * 6371.0
    by = (np.radians(la) - np.radians(fla)) * 6371.0
    dx, dy = bx - ax, by - ay
    a = dx * dx + dy * dy
    b = 2.0 * (ax * dx + ay * dy)
    c = ax * ax + ay * ay - rad * rad
    disc = b * b - 4 * a * c
    ok = (a > 0) & (disc >= 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        sq = np.sqrt(np.where(disc >= 0, disc, 0.0))
        t1 = np.where(ok, (-b - sq) / (2 * a), np.inf)
        t2 = np.where(ok, (-b + sq) / (2 * a), np.inf)
    return ok & (((t1 >= 0) & (t1 <= 1)) | ((t2 >= 0) & (t2 <= 1)))


def geofence_stream(
    track_stream: DataFrame,
    fences: list[tuple[str, float, float, float]],
) -> DataFrame:
    """track_stream: streaming DF (query_point_id string, seq int,
    lat double, lon double). fences: [(name, lat, lon, radius_km)].
    Returns streaming DF of status rows; state = last position per entity."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        entity = key[0]
        prev = tuple(state.get) if state.exists else None
        rows: list[dict] = []
        for pdf in batches:
            out, prev = _status_rows(entity, pdf, fences, prev)
            rows.extend(out)
        if prev is not None:
            state.update(prev)
        yield pd.DataFrame(
            rows, columns=["query_point_id", "seq", "fence_name", "status"]
        )

    return track_stream.groupBy("query_point_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
