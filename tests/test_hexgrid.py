import numpy as np

from cuda_gis_smoothing_spark import hexgrid as hg


def test_pack_unpack_roundtrip():
    q = np.array([-100, 0, 7, 4999], dtype=np.int64)
    r = np.array([50, -3, 0, -4999], dtype=np.int64)
    c = hg.pack(q, r)
    q2, r2 = hg.unpack(c)
    assert (q == q2).all() and (r == r2).all()
    assert len(set(c.tolist())) == len(c)


def test_ring_sizes_match_reference_hex_grid():
    # a proper hex grid has 6 ring-1 and exactly 12 ring-2 cells
    # (/root/reference/src/cuda/hex_smooth_cuda_v5.cu:29-31)
    assert len(hg.RING1_OFFSETS) == 6
    assert len(hg.RING2_OFFSETS) == 12
    # ring-2 excludes self and ring-1, and all offsets have hex distance 2
    ring1 = set(hg.RING1_OFFSETS)
    for dq, dr in hg.RING2_OFFSETS:
        assert (dq, dr) != (0, 0) and (dq, dr) not in ring1
        assert max(abs(dq), abs(dr), abs(dq + dr)) == 2
    assert len(set(hg.RING2_OFFSETS)) == 12


def test_kring_cells_arithmetic_identity():
    c = hg.pack(np.array([10]), np.array([20]))
    ring = hg.kring_cells(c, k=2, include_center=True)
    assert ring.shape == (1, 19)  # 1 + 6 + 12
    assert ring[0, 0] == c[0]
    offs = hg.kring_offsets(2, include_center=True)
    expect = {int(c[0]) + hg.neighbor_delta(dq, dr) for dq, dr, _ in offs}
    assert set(ring[0].tolist()) == expect


def test_latlng_cell_roundtrip_centroid():
    g = hg.GridSpec()
    rng = np.random.default_rng(42)
    lat = g.origin_lat + (rng.random(500) - 0.5) * 0.4
    lon = g.origin_lon + (rng.random(500) - 0.5) * 0.4
    cells = g.latlng_to_cell(lat, lon)
    clat, clon = g.cell_to_latlng(cells)
    cells2 = g.latlng_to_cell(clat, clon)
    # centroid of a cell must map back into the same cell
    assert (cells == cells2).all()
    # centroid must be within one hex diameter of the source point
    assert np.abs(clat - lat).max() < 2.5 * g.size_deg
    assert np.abs(clon - lon).max() < 2.5 * g.size_deg


def test_adjacent_points_get_adjacent_cells():
    g = hg.GridSpec()
    # walking due east in tiny steps never skips more than a neighbor cell
    lon = g.origin_lon + np.arange(2000) * (g.size_deg / 20.0)
    lat = np.full_like(lon, g.origin_lat)
    cells = g.latlng_to_cell(lat, lon)
    changed = np.unique(cells[np.r_[True, cells[1:] != cells[:-1]]])
    ring1 = {hg.neighbor_delta(dq, dr) for dq, dr in hg.RING1_OFFSETS}
    for a, b in zip(changed[:-1], changed[1:]):
        assert int(b - a) in ring1 or int(a - b) in ring1


def test_morton_key_locality():
    q, r = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    c = hg.pack(q.ravel(), r.ravel())
    k = hg.morton_key(c)
    assert len(set(k.tolist())) == len(k)  # injective on the patch
    # sorting by morton key keeps axial distance between consecutive
    # elements bounded (locality) — the point of the reference's O1/O2
    order = np.argsort(k, kind="stable")
    qq, rr = q.ravel()[order], r.ravel()[order]
    dist = np.abs(np.diff(qq)) + np.abs(np.diff(rr))
    assert np.mean(dist) < 4.0


def test_tile_assignment_known_values():
    # slippy-map convention checks: (0,0) at zoom 0; Kampala at zoom 12
    tx, ty = hg.latlng_to_tile(np.array([0.0]), np.array([0.0]), 0)
    assert (tx[0], ty[0]) == (0, 0)
    tx, ty = hg.latlng_to_tile(np.array([0.31]), np.array([32.58]), 12)
    assert tx[0] == int((32.58 + 180) / 360 * 4096)
    assert 2040 <= ty[0] <= 2048  # just north of the equator
