"""Inverse-distance-weighted (IDW) interpolation onto the cell grid —
point samples -> a raster layer (sensor readings, price surfaces,
signal-strength maps). The published Shepard method with a smoothing
epsilon: v(c) = sum(w_i * v_i) / sum(w_i), w_i = 1 / (d_i^2 + eps^2),
d_i = haversine(cell center, sample), over the samples within Chebyshev
ring `k` of the cell.

Plan shape (100 TB posture): each SAMPLE explodes to its (2k+1)^2
k-ring cells (pure sequence/transform Column code, no Python), then ONE
groupBy per target cell accumulates the weighted sums — cost is
O(samples * ring), target cells materialize only where data exists, and
the partial aggregation combines map-side. No per-cell gather join, no
cross join, no driver loop. eps > 0 keeps weights finite when a sample
sits exactly on a cell center (the standard smoothed-Shepard variant),
which also keeps the DuckDB twin free of special cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions.geodesy import haversine_km


def idw_interpolate(
    samples: DataFrame,
    res: int,
    k: int = 2,
    eps_km: float = 0.1,
    lat: str = "lat",
    lon: str = "lon",
    value: str = "value",
) -> DataFrame:
    """(cell_id, value, n_samples): smoothed-Shepard IDW at every cell
    within ring `k` of at least one sample. `value` rounded 6dp."""
    ringed = samples.select(
        F.col(lat).alias("slat"),
        F.col(lon).alias("slon"),
        F.col(value).cast("double").alias("v"),
        F.explode(
            C.k_ring(C.latlng_to_cell(lat, lon, res), k, res)
        ).alias("cell_id"),
    )
    center = C.cell_center(F.col("cell_id"))
    d = haversine_km(center["lat"], center["lon"], F.col("slat"), F.col("slon"))
    w = F.lit(1.0) / (d * d + F.lit(eps_km * eps_km))
    return (
        ringed.select(
            "cell_id", (w * F.col("v")).alias("_wv"), w.alias("_w")
        )
        .groupBy("cell_id")
        .agg(
            F.round(F.sum("_wv") / F.sum("_w"), 6).alias("value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
