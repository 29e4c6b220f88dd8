"""Property-based tests (hypothesis) for the arithmetic core — these
hold for EVERY input, not just fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cuda_gis_smoothing_spark import hexgrid as hg
from cuda_gis_smoothing_spark import oracle
from cuda_gis_smoothing_spark.hexgrid import GridSpec, pack

coord = st.integers(min_value=-40000, max_value=40000)


@given(coord, coord)
def test_pack_bijective(q, r):
    qq, rr = hg.unpack(pack(q, r))
    assert (int(qq), int(rr)) == (q, r)


@given(coord, coord)
def test_neighbor_delta_commutes_with_pack(q, r):
    c = int(pack(q, r))
    for dq, dr, _ in hg.kring_offsets(2, include_center=False):
        if abs(q + dq) < 49000 and abs(r + dr) < 49000:
            assert c + hg.neighbor_delta(dq, dr) == int(pack(q + dq, r + dr))


@given(
    st.floats(min_value=0.07, max_value=0.55),
    st.floats(min_value=32.34, max_value=32.82),
)
def test_latlng_encode_is_idempotent_on_centroid(lat, lon):
    g = GridSpec()
    c = g.latlng_to_cell(np.array([lat]), np.array([lon]))
    clat, clon = g.cell_to_latlng(c)
    c2 = g.latlng_to_cell(clat, clon)
    assert int(c[0]) == int(c2[0])


@given(
    st.dictionaries(
        st.tuples(
            st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)
        ),
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from(sorted(oracle.VARIANTS)),
)
@settings(max_examples=40, deadline=None)
def test_smoothed_value_within_neighborhood_bounds(grid, variant):
    """A weighted mean with positive weights can never leave the
    [min, max] of the values it averages."""
    vals = {int(pack(q, r)): {"ndvi": v} for (q, r), v in grid.items()}
    out = oracle.smooth_cells(vals, variant)
    k = 2 if variant.endswith("k2") else 1
    for cell, res in out.items():
        hood = [
            vals[n]["ndvi"]
            for n in hg.kring_cells(np.array([cell]), k=k, include_center=True)[0]
            if int(n) in vals
        ]
        assert min(hood) - 1e-12 <= res["ndvi"] <= max(hood) + 1e-12


@given(
    st.dictionaries(
        st.tuples(
            st.integers(min_value=0, max_value=5), st.integers(min_value=0, max_value=5)
        ),
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=40, deadline=None)
def test_constant_field_is_fixed_point(grid):
    """Smoothing a constant field returns the constant (weights
    normalize): catches any weight-mass bookkeeping bug."""
    vals = {int(pack(q, r)): {"ndvi": 0.37} for (q, r) in grid}
    for variant in oracle.VARIANTS:
        out = oracle.smooth_cells(vals, variant)
        for res in out.values():
            assert abs(res["ndvi"] - 0.37) < 1e-12


@given(st.integers(min_value=0, max_value=2**40), st.integers(min_value=1, max_value=20))
@settings(deadline=None)
def test_splitmix_deterministic_and_spread(x, n):
    from cuda_gis_smoothing_spark.datagen import splitmix64

    a = splitmix64(np.uint64(x))
    b = splitmix64(np.uint64(x))
    assert int(a) == int(b)
    arr = splitmix64(np.arange(x, x + n, dtype=np.uint64))
    assert len(set(arr.tolist())) == n


@given(
    st.floats(min_value=-85.0, max_value=85.0),
    st.floats(min_value=-180.0, max_value=179.999),
    st.integers(min_value=0, max_value=16),
)
def test_tile_in_range(lat, lon, zoom):
    tx, ty = hg.latlng_to_tile(np.array([lat]), np.array([lon]), zoom)
    assert 0 <= int(tx[0]) < 2**zoom
    assert 0 <= int(ty[0]) < 2**zoom
