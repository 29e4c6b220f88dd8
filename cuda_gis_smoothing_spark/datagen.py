"""Deterministic synthetic fixtures (FIXTURES.md) — seed is structural.

Nothing here uses wall-clock or global RNG state: every value is a pure
function of the row index (via splitmix64), so fixtures are identical
across processes, partitions and rounds. The reference ships no data
(/root/reference/.MISSING_LARGE_BLOBS:1), so these synthetic tables are
the only test inputs, mirroring its dataset shapes (74,811 / 500,104
hexagons, ragged 0..6-neighbor borders —
results/benchmarks/hex_smooth_study_5393663.out:22-23).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cuda_gis_smoothing_spark.functions import codecs
from cuda_gis_smoothing_spark.hexgrid import GridSpec, pack

SEED = 42
BOX_HALF_DEG = 0.25  # images land in a ~0.5 deg x 0.5 deg box around Kampala
HOT_FRACTION = 10    # 1 in 10 images hits the hot cell (skew fixture)

_W_CYCLE = (16, 32, 64)
_H_CYCLE = (16, 24, 32)
_FMT_CYCLE = ("rgb8_raw", "png", "jpeg")


def splitmix64(x):
    """Vectorized splitmix64 — the deterministic hash behind phash/values."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def gen_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Gradient + checker test pattern, phase-shifted by splitmix64(i)."""
    phase = int(splitmix64(np.uint64(i)) & np.uint64(0xFF))
    yy, xx = np.mgrid[0:h, 0:w]
    r = ((xx * 255) // max(w - 1, 1) + phase) % 256
    g = ((yy * 255) // max(h - 1, 1) + phase * 3) % 256
    b = (((xx // 4 + yy // 4) % 2) * 200 + phase) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def phash_to_latlng(phash):
    """Deterministic geolocation: phash bits → (lat, lon) in the Kampala box.

    1-in-HOT_FRACTION images collapse into one hot cell so skew handling
    (salting / broadcast) is actually exercised (SURVEY.md §7 risk list).
    """
    ph = np.asarray(phash, dtype=np.int64).astype(np.uint64)
    u = ((ph >> np.uint64(1)) & np.uint64(0x3FFFFF)).astype(np.float64) / float(1 << 22)
    v = ((ph >> np.uint64(23)) & np.uint64(0x3FFFFF)).astype(np.float64) / float(1 << 22)
    hot = (ph % np.uint64(HOT_FRACTION)) == np.uint64(0)
    # hot images: jitter stays inside ~1/20 of a cell around the hot point
    u = np.where(hot, 0.5 + (u - 0.5) * 1e-4, u)
    v = np.where(hot, 0.5 + (v - 0.5) * 1e-4, v)
    g = GridSpec()
    lat = g.origin_lat - BOX_HALF_DEG + v * 2 * BOX_HALF_DEG
    lon = g.origin_lon - BOX_HALF_DEG + u * 2 * BOX_HALF_DEG
    return lat, lon


def gen_images(n: int, start: int = 0) -> pd.DataFrame:
    """The T1 ``images`` fixture (BASELINE.json input_hint schema)."""
    rows = []
    for i in range(start, start + n):
        w = _W_CYCLE[i % 3]
        h = _H_CYCLE[i % 3]
        fmt = _FMT_CYCLE[i % 3]
        pix = gen_pixels(i, w, h)
        rows.append(
            {
                "image_id": f"img{i:08d}",
                "bytes": codecs.encode(pix, fmt),
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": f"synthetic scene {i} over kampala grid",
                "phash": np.int64(splitmix64(np.uint64(i)).astype(np.int64)),
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def gen_cells(side: int = 40, n_isolated: int = 3, drop_rate: float = 0.15) -> pd.DataFrame:
    """The T2 ``cells`` fixture: contiguous hex patch, ragged border,
    plus isolated cells (reference D1 has min 0 neighbors)."""
    qs, rs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    q = qs.ravel().astype(np.int64)
    r = rs.ravel().astype(np.int64)
    cell = pack(q, r)
    # ragged border: drop a deterministic subset of edge cells
    on_border = (q < 2) | (r < 2) | (q >= side - 2) | (r >= side - 2)
    h = splitmix64(cell.astype(np.uint64))
    drop = on_border & ((h % np.uint64(1000)).astype(np.float64) / 1000.0 < drop_rate * 4)
    q, r, cell = q[~drop], r[~drop], cell[~drop]
    # isolated cells far from the patch
    iso_q = np.arange(n_isolated, dtype=np.int64) * 10 + side * 3
    iso_r = np.full(n_isolated, side * 3, dtype=np.int64)
    q = np.concatenate([q, iso_q])
    r = np.concatenate([r, iso_r])
    cell = np.concatenate([cell, pack(iso_q, iso_r)])
    # ndvi uniform(-0.2, 0.9) keyed by cell id
    u = (splitmix64(cell.astype(np.uint64)) % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30)
    ndvi = -0.2 + u * 1.1
    pdf = pd.DataFrame({"cell": cell, "ndvi": ndvi})
    # derived variables — the reference's literal projections
    # (/root/reference/src/cuda/hex_smooth_cuda_v4.cu:359-363)
    pdf["mndwi"] = pdf.ndvi * 0.9 + 0.05
    pdf["evi"] = pdf.ndvi * 1.1 - 0.05
    pdf["ndwi"] = pdf.ndvi * 0.95
    return pdf


def gen_boundaries() -> pd.DataFrame:
    """T4 vector polygons: 6 districts tiling ~70% of the image box."""
    g = GridSpec()
    lat0, lon0 = g.origin_lat, g.origin_lon
    half = BOX_HALF_DEG
    polys = []
    # 2x3 grid of quadrilateral districts covering the west/center of the box
    for i in range(3):
        for j in range(2):
            rid = f"district_{i * 2 + j:02d}"
            x0 = lon0 - half + i * (2 * half * 0.28)
            y0 = lat0 - half + j * (2 * half * 0.45)
            dx = 2 * half * 0.26
            dy = 2 * half * 0.42
            # slight concavity on one edge so ray casting is non-trivial
            ring = [
                (x0, y0),
                (x0 + dx, y0),
                (x0 + dx, y0 + dy),
                (x0 + dx / 2, y0 + dy * 0.8),
                (x0, y0 + dy),
            ]
            polys.append({"region_id": rid, "ring_xy": ring})
    return pd.DataFrame(polys)
