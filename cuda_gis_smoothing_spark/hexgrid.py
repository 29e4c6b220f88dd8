"""H3-style hexagonal grid math (pure Python / numpy, no native deps).

The reference models its grid as an adjacency list of hexagons with
integer ids whose x/y decode is ``x = hex_id / 10000; y = hex_id % 10000``
(/root/reference/src/cuda/hex_smooth_cuda_v5.cu:42-47,477-486). We keep
the same *shape* of encoding — an axial (q, r) coordinate pair packed
into one int64 — but make neighbor lookup pure arithmetic so the Spark
side never needs a materialized adjacency table:

    cell = (q + OFFSET) * ENC + (r + OFFSET)
    neighbor(cell, dq, dr) = cell + dq * ENC + dr

That identity is what lets k-ring expansion run as an ``explode`` of a
literal offset array + column addition — fully inside whole-stage
codegen, no UDF, no shuffle — and lets the DuckDB oracle reproduce it in
ANSI SQL.

Geodetic encode/decode uses a local equirectangular projection around a
configurable origin (default Kampala, Uganda — the reference's study
region, /root/reference/README.md:17,24) and standard pointy-top axial
hex conversion with cube rounding. All functions are numpy-vectorized so
they run efficiently inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Cell id packing. OFFSET keeps q/r non-negative after packing; ENC
# leaves 5 decimal digits for r (mirrors the reference's base-10000
# packing, scaled up so real-world grids fit).
ENC = 100_000
OFFSET = 50_000

# Axial direction offsets for a pointy-top hex grid: ring 1 (the 6
# immediate neighbors — the reference's "first order",
# /root/reference/src/cpu/hex_smooth_naive.cpp:53-59).
RING1_OFFSETS: tuple[tuple[int, int], ...] = (
    (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1),
)

# Ring 2: exactly 12 cells at hex distance 2 ("second order", excludes
# self and all ring-1 cells, deduped, capped at 12 —
# /root/reference/src/cuda/hex_smooth_cuda_v5.cu:423-463; on a proper
# hex grid the cap never bites because |ring2| == 12).
RING2_OFFSETS: tuple[tuple[int, int], ...] = (
    (2, 0), (-2, 0), (0, 2), (0, -2), (2, -2), (-2, 2),
    (2, -1), (-2, 1), (1, 1), (-1, -1), (1, -2), (-1, 2),
)

# Smoothing weights. The reference has two flavors:
#  * v1-v4 "Gaussian": w_center = 1, w_nbr = exp(-1/(2 sigma^2)), sigma=1
#    (/root/reference/src/cuda/hex_smooth_cuda_v1.cu:204-205).
#  * v5 "extended": literal constants 1.0 / 0.6065 / 0.1353 by hex
#    distance (/root/reference/src/cuda/hex_smooth_cuda_v5.cu:37-39).
# We pin literal decimal constants so the Spark plan, the Python oracle
# and the DuckDB oracle all fold the *same* double.
W_CENTER = 1.0
W_GAUSS_RING1 = 0.6065306597126334  # exp(-0.5) to double precision
W_EXT_RING1 = 0.6065                # v5's literal
W_EXT_RING2 = 0.1353                # v5's literal


def pack(q, r):
    """Pack axial (q, r) into an int64 cell id (vectorized)."""
    return (np.asarray(q, dtype=np.int64) + OFFSET) * ENC + (
        np.asarray(r, dtype=np.int64) + OFFSET
    )


def unpack(cell):
    """Inverse of :func:`pack` → (q, r) int64 arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    q = cell // ENC - OFFSET
    r = cell % ENC - OFFSET
    return q, r


def neighbor_delta(dq: int, dr: int) -> int:
    """The additive cell-id delta of axial offset (dq, dr)."""
    return dq * ENC + dr


def kring_offsets(k: int, include_center: bool = True) -> list[tuple[int, int, int]]:
    """(dq, dr, ring) for all cells within hex distance ``k`` (k ≤ 2)."""
    out: list[tuple[int, int, int]] = []
    if include_center:
        out.append((0, 0, 0))
    if k >= 1:
        out.extend((dq, dr, 1) for dq, dr in RING1_OFFSETS)
    if k >= 2:
        out.extend((dq, dr, 2) for dq, dr in RING2_OFFSETS)
    if k > 2:
        raise NotImplementedError("reference semantics stop at ring 2")
    return out


def kring_cells(cell, k: int = 1, include_center: bool = True):
    """Vectorized k-ring: (n,) cells → (n, m) neighbor cell ids."""
    cell = np.asarray(cell, dtype=np.int64).reshape(-1, 1)
    deltas = np.array(
        [neighbor_delta(dq, dr) for dq, dr, _ in kring_offsets(k, include_center)],
        dtype=np.int64,
    )
    return cell + deltas


@dataclass(frozen=True)
class GridSpec:
    """A fixed hex tessellation of a lat/lon region.

    ``size_deg`` is the hex circumradius in projected degrees; the
    default yields roughly H3-resolution-7-sized cells over the
    reference's ~0.5°x0.5° Kampala extent.
    """

    origin_lat: float = 0.31   # Kampala (README.md:17,24 of the reference)
    origin_lon: float = 32.58
    size_deg: float = 0.005

    # --- geodetic <-> axial -------------------------------------------------
    def latlng_to_axial(self, lat, lon):
        """Vectorized lat/lon → axial (q, r) with cube rounding."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        # local equirectangular projection (degrees → hex-size units)
        x = (lon - self.origin_lon) * np.cos(np.radians(self.origin_lat))
        y = lat - self.origin_lat
        # pointy-top axial conversion
        qf = (np.sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / self.size_deg
        rf = (2.0 / 3.0 * y) / self.size_deg
        return _cube_round(qf, rf)

    def latlng_to_cell(self, lat, lon):
        q, r = self.latlng_to_axial(lat, lon)
        return pack(q, r)

    def cell_to_latlng(self, cell):
        """Vectorized cell id → centroid (lat, lon)."""
        q, r = unpack(cell)
        x = self.size_deg * (np.sqrt(3.0) * (q + r / 2.0))
        y = self.size_deg * (1.5 * r)
        lat = y + self.origin_lat
        lon = x / np.cos(np.radians(self.origin_lat)) + self.origin_lon
        return lat, lon


def _cube_round(qf, rf):
    """Round fractional axial coords to the containing hex (vectorized)."""
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


# --- space-filling-curve key (reference's Morton / bisection analog) --------
def morton_key(cell):
    """Interleave 16-bit q/r into a 32-bit Z-order key (vectorized).

    Same construction as the reference's ``morton2D``
    (/root/reference/src/cuda/hex_smooth_cuda_v4.cu:29-44); used only as
    a *partitioning/sort* column on the Spark side (repartitionByRange +
    sortWithinPartitions), never as an execution structure.
    """
    q, r = unpack(cell)
    x = (q & 0xFFFF).astype(np.uint64)
    y = (r & 0xFFFF).astype(np.uint64)

    def _part1by1(v):
        v = (v | (v << 8)) & np.uint64(0x00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x33333333)
        v = (v | (v << 1)) & np.uint64(0x55555555)
        return v

    return (_part1by1(x) | (_part1by1(y) << np.uint64(1))).astype(np.int64)


# --- Web-Mercator tiling -----------------------------------------------------
def latlng_to_tile(lat, lon, zoom: int):
    """Vectorized Web-Mercator tile assignment (slippy-map convention)."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    lon = np.asarray(lon, dtype=np.float64)
    n = 2 ** zoom
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    ty = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)
