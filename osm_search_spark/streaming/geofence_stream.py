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
    """Apply the transition matrix over one entity's ordered points."""
    out = []
    for _, r in pdf.sort_values("seq").iterrows():
        la, lo = float(r["lat"]), float(r["lon"])
        for fname, fla, flo, rad in fences:
            now_in = float(haversine_km_np(la, lo, fla, flo)) <= rad
            prev_in = (
                float(haversine_km_np(prev[0], prev[1], fla, flo)) <= rad
                if prev is not None
                else False
            )
            if prev_in and now_in:
                status = "INSIDE"
            elif not prev_in and now_in:
                status = "ENTER"
            elif prev_in and not now_in:
                status = "EXIT"
            else:
                status = _cross_or_outside(prev, la, lo, fla, flo, rad)
            out.append(
                dict(query_point_id=entity, seq=int(r["seq"]), fence_name=fname, status=status)
            )
        prev = (la, lo)
    return out, prev


def _cross_or_outside(prev, la, lo, fla, flo, rad) -> str:
    if prev is None:
        return "OUTSIDE"
    # circle.go:54-96 segment-circle test in the fence tangent plane
    coslat = np.cos(np.radians(fla))
    ax = (np.radians(prev[1]) - np.radians(flo)) * coslat * 6371.0
    ay = (np.radians(prev[0]) - np.radians(fla)) * 6371.0
    bx = (np.radians(lo) - np.radians(flo)) * coslat * 6371.0
    by = (np.radians(la) - np.radians(fla)) * 6371.0
    dx, dy = bx - ax, by - ay
    a = dx * dx + dy * dy
    if a <= 0:
        return "OUTSIDE"
    b = 2.0 * (ax * dx + ay * dy)
    c = ax * ax + ay * ay - rad * rad
    disc = b * b - 4 * a * c
    if disc < 0:
        return "OUTSIDE"
    sq = float(np.sqrt(disc))
    t1, t2 = (-b - sq) / (2 * a), (-b + sq) / (2 * a)
    return "CROSS" if (0.0 <= t1 <= 1.0 or 0.0 <= t2 <= 1.0) else "OUTSIDE"


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
