"""Property-based tests (hypothesis) — beyond the reference's golden-only
strategy (SURVEY §5): invariants that must hold for ALL inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_search_spark.functions import cells as C
from osm_search_spark.functions import geometry as G

lat_s = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lon_s = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=0, max_value=20))
def test_cell_contains_its_point(lat, lon, res):
    cell = C.np_latlng_to_cell(np.array([lat]), np.array([lon]), res)
    minlat, minlon, maxlat, maxlon = C.np_cell_bounds(cell)
    # points within ~1 ULP of a cell edge may snap to the neighbor — an
    # inherent float-boundary artifact computed IDENTICALLY by Spark and
    # the oracle (shared formula), so tolerance is cell-size relative
    tol = (maxlat[0] - minlat[0]) * 1e-12 + 1e-15
    assert minlat[0] - tol <= lat <= maxlat[0] + tol
    assert minlon[0] - tol <= lon <= maxlon[0] + tol


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=1, max_value=20))
def test_parent_contains_child(lat, lon, res):
    child = C.np_latlng_to_cell(np.array([lat]), np.array([lon]), res)
    parent = C.np_latlng_to_cell(np.array([lat]), np.array([lon]), res - 1)
    pminlat, pminlon, pmaxlat, pmaxlon = C.np_cell_bounds(parent)
    cminlat, cminlon, cmaxlat, cmaxlon = C.np_cell_bounds(child)
    assert pminlat[0] <= cminlat[0] and cmaxlat[0] <= pmaxlat[0] + 1e-12
    assert pminlon[0] <= cminlon[0] and cmaxlon[0] <= pmaxlon[0] + 1e-12


@settings(max_examples=100, deadline=None)
@given(
    lat1=lat_s, lon1=lon_s, lat2=lat_s, lon2=lon_s,
)
def test_haversine_metric_properties(lat1, lon1, lat2, lon2):
    d12 = float(G.haversine_km_np(lat1, lon1, lat2, lon2))
    d21 = float(G.haversine_km_np(lat2, lon2, lat1, lon1))
    assert abs(d12 - d21) < 1e-9  # symmetry
    assert d12 >= 0
    assert float(G.haversine_km_np(lat1, lon1, lat1, lon1)) < 1e-9
    assert d12 <= 6371.0 * np.pi + 1e-6  # half circumference


@settings(max_examples=50, deadline=None)
@given(
    data=st.data(),
    n_vertices=st.integers(min_value=3, max_value=12),
)
def test_pip_agrees_with_reference_port(data, n_vertices):
    ring_lat = [
        data.draw(st.floats(min_value=-8.0, max_value=-7.0, allow_nan=False))
        for _ in range(n_vertices)
    ]
    ring_lon = [
        data.draw(st.floats(min_value=110.0, max_value=111.0, allow_nan=False))
        for _ in range(n_vertices)
    ]
    plat = data.draw(st.floats(min_value=-8.1, max_value=-6.9, allow_nan=False))
    plon = data.draw(st.floats(min_value=109.9, max_value=111.1, allow_nan=False))
    got = G.points_in_polygon(np.array([plat]), np.array([plon]), ring_lat, ring_lon)[0]
    exp = G.reference_pip_scalar(plat, plon, ring_lat, ring_lon)
    assert bool(got) == bool(exp)


@settings(max_examples=100, deadline=None)
@given(lat=lat_s, lon=lon_s)
def test_phash_deterministic(lat, lon):
    # determinism of the image hash under identical pixels
    rng = np.random.default_rng(abs(hash((lat, lon))) % (2**32))
    from osm_search_spark.functions import images as I

    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert I.phash64(px) == I.phash64(px.copy())


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=30))
def test_pbf_signed_varint_roundtrip(vals):
    from osm_search_spark.sources import pbf

    buf = b"".join(pbf._w_zigzag(v) for v in vals)
    assert pbf._packed_varints(buf, signed=True) == vals


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=30))
def test_pbf_unsigned_varint_roundtrip(vals):
    from osm_search_spark.sources import pbf

    buf = b"".join(pbf._w_varint(v) for v in vals)
    assert pbf._packed_varints(buf) == vals


@given(st.text(alphabet=st.characters(whitelist_categories=("Ll",)), max_size=24))
def test_stemmer_total_and_idempotent(word):
    from osm_search_spark.functions.stemmer import MINIMAL_ROOTS, stem

    s1 = stem(word, MINIMAL_ROOTS)
    assert isinstance(s1, str) and len(s1) >= 1 or word == ""
    # stemming a stem is a no-op (roots and passthroughs are fixed points)
    if word:
        assert stem(s1, MINIMAL_ROOTS) == s1
