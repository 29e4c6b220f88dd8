import numpy as np

from cuda_gis_smoothing_spark import datagen, oracle
from cuda_gis_smoothing_spark.hexgrid import (
    RING1_OFFSETS,
    W_EXT_RING1,
    W_EXT_RING2,
    W_GAUSS_RING1,
    neighbor_delta,
    pack,
)


def _values(pdf):
    return {
        int(row.cell): {"ndvi": float(row.ndvi)}
        for row in pdf.itertuples()
    }


def test_isolated_cell_keeps_own_value():
    # reference: 0 valid neighbors -> smoothed == own value
    # (/root/reference/src/cpu/hex_smooth_naive.cpp:48-62; D1 min=0 nbrs)
    vals = {int(pack(500, 500)): {"ndvi": 0.42}}
    for variant in oracle.VARIANTS:
        out = oracle.smooth_cells(vals, variant)
        assert out[int(pack(500, 500))]["ndvi"] == 0.42


def test_simple_average_hand_computed():
    c = int(pack(10, 10))
    n1 = c + neighbor_delta(1, 0)
    n2 = c + neighbor_delta(0, -1)
    vals = {c: {"ndvi": 1.0}, n1: {"ndvi": 4.0}, n2: {"ndvi": 7.0}}
    out = oracle.smooth_cells(vals, "simple_k1")
    assert abs(out[c]["ndvi"] - (1 + 4 + 7) / 3) < 1e-12


def test_gaussian_weights_hand_computed():
    c = int(pack(10, 10))
    n1 = c + neighbor_delta(-1, 1)
    vals = {c: {"ndvi": 2.0}, n1: {"ndvi": 10.0}}
    out = oracle.smooth_cells(vals, "gaussian_k1")
    w = W_GAUSS_RING1
    assert abs(out[c]["ndvi"] - (2.0 + w * 10.0) / (1.0 + w)) < 1e-12


def test_extended_two_ring_weights():
    c = int(pack(10, 10))
    r1 = c + neighbor_delta(1, 0)
    r2 = c + neighbor_delta(2, 0)
    vals = {c: {"ndvi": 1.0}, r1: {"ndvi": 2.0}, r2: {"ndvi": 3.0}}
    out = oracle.smooth_cells(vals, "gaussian_k2")
    expect = (1.0 + W_EXT_RING1 * 2.0 + W_EXT_RING2 * 3.0) / (
        1.0 + W_EXT_RING1 + W_EXT_RING2
    )
    assert abs(out[c]["ndvi"] - expect) < 1e-12
    out_u = oracle.smooth_cells(vals, "uniform_k2")
    assert abs(out_u[c]["ndvi"] - 2.0) < 1e-12


def test_fixture_grid_shape():
    pdf = datagen.gen_cells(side=20, n_isolated=2)
    vals = _values(pdf)
    stats = oracle.neighbor_stats(list(vals))
    assert stats["min_neighbors"] == 0  # the isolated cells
    assert stats["max_neighbors"] == 6
    assert 3.0 < stats["avg_neighbors"] <= 6.0
    # interior ring-2 is exactly 12 (reference cap never bites on hex grid)
    interior = int(pack(10, 10))
    assert len(oracle.second_order_cells(interior, set(vals))) == 12


def test_smoothing_is_single_pass_not_iterative():
    # smoothing twice must differ from smoothing once (double-buffered)
    pdf = datagen.gen_cells(side=10, n_isolated=0)
    vals = _values(pdf)
    once = oracle.smooth_cells(vals, "simple_k1")
    twice = oracle.smooth_cells(
        {c: {"ndvi": v["ndvi"]} for c, v in once.items()}, "simple_k1"
    )
    diffs = [abs(once[c]["ndvi"] - twice[c]["ndvi"]) for c in once]
    assert max(diffs) > 1e-6


def test_pip_oracle_convexish():
    ring = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (1.0, 1.5), (0.0, 2.0)]
    assert oracle.point_in_polygon(0.5, 0.5, ring)
    assert not oracle.point_in_polygon(3.0, 0.5, ring)
    assert not oracle.point_in_polygon(1.0, 1.9, ring)  # inside concavity notch


def test_variance_reduction():
    # smoothing must reduce variance on the patch (sanity physics)
    pdf = datagen.gen_cells(side=30, n_isolated=0)
    vals = _values(pdf)
    out = oracle.smooth_cells(vals, "simple_k1")
    v_in = np.var([v["ndvi"] for v in vals.values()])
    v_out = np.var([v["ndvi"] for v in out.values()])
    assert v_out < v_in


def test_ring1_offsets_unit_distance():
    for dq, dr in RING1_OFFSETS:
        assert max(abs(dq), abs(dr), abs(dq + dr)) == 1
