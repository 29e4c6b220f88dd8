"""Pure-Python semantic oracle for the smoothing operators.

Independent (non-Spark) implementation of the reference's logical
operators, used by pytest for differential testing — the same strategy
the reference itself uses (golden CSVs cross-checked between
implementations, /root/reference/scripts/case-study.sh:107-137).

Semantics transcribed (NOT code-copied) from:
  * simple average     /root/reference/src/cpu/hex_smooth_naive.cpp:48-63
  * Gaussian weights   /root/reference/src/cpu/hex_smooth_naive.cpp:65-83
  * extended 2-ring    /root/reference/src/cuda/hex_smooth_cuda_v5.cu:127-180
  * second-order gen   /root/reference/src/cuda/hex_smooth_cuda_v5.cu:423-463

Must-match fine print (SURVEY.md §3.4):
  * self always contributes with weight 1 before neighbors;
  * invalid/missing neighbors contribute neither value nor weight
    (isolated cell → smoothed == own value);
  * single pass over the ORIGINAL values (double-buffered, not
    iterative in-place);
  * ring-2 set excludes self and ring-1, deduped.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from cuda_gis_smoothing_spark.hexgrid import (
    RING1_OFFSETS,
    RING2_OFFSETS,
    W_CENTER,
    W_EXT_RING1,
    W_EXT_RING2,
    W_GAUSS_RING1,
    neighbor_delta,
)

#: variant name -> {ring: weight}; mirrors the reference's CLI configs
#: (/root/reference/scripts/test-v5.sh:29-46).
VARIANTS: dict[str, dict[int, float]] = {
    "simple_k1": {0: 1.0, 1: 1.0},
    "gaussian_k1": {0: W_CENTER, 1: W_GAUSS_RING1},
    "gaussian_k2": {0: W_CENTER, 1: W_EXT_RING1, 2: W_EXT_RING2},
    "uniform_k2": {0: 1.0, 1: 1.0, 2: 1.0},
}

_RING_DELTAS = {
    1: [neighbor_delta(dq, dr) for dq, dr in RING1_OFFSETS],
    2: [neighbor_delta(dq, dr) for dq, dr in RING2_OFFSETS],
}


def smooth_cells(
    values: Mapping[int, Mapping[str, float]],
    variant: str,
    variables: Sequence[str] = ("ndvi",),
    strict_second_order: bool = False,
) -> dict[int, dict[str, float]]:
    """Smooth every variable of every cell under ``variant`` weights.

    ``values`` maps cell id -> {variable: value}. Cells absent from the
    mapping are "invalid neighbors": they contribute neither value nor
    weight, exactly like the reference's bounds check
    (/root/reference/src/cpu/hex_smooth_naive.cpp:55).

    ``strict_second_order`` switches ring 2 from the geometric k-ring
    (all cells at hex distance 2) to the reference's adjacency-based
    neighbors-of-neighbors (reachable only THROUGH a present ring-1
    cell — src/cuda/hex_smooth_cuda_v5.cu:423-463). The two agree on
    hole-free grids; on ragged grids strict mode excludes distance-2
    cells whose connecting mid cell is missing.
    """
    weights = VARIANTS[variant]
    out: dict[int, dict[str, float]] = {}
    for cell, row in values.items():
        wsum = weights[0]
        acc = {v: weights[0] * row[v] for v in variables}
        for ring, w in weights.items():
            if ring == 0:
                continue
            if ring == 2 and strict_second_order:
                members = second_order_strict(cell, values)
            else:
                members = [cell + d for d in _RING_DELTAS[ring]]
            for nbr_cell in members:
                nbr = values.get(nbr_cell)
                if nbr is None:
                    continue
                wsum += w
                for v in variables:
                    acc[v] += w * nbr[v]
        out[cell] = {v: acc[v] / wsum for v in variables}
    return out


def second_order_strict(cell: int, present) -> list[int]:
    """Adjacency-based ring 2: neighbors-of-(present)-neighbors,
    excluding self and all ring-1 offsets, deduped (the reference's
    generateSecondOrderNeighbors semantics)."""
    ring1 = {cell + d for d in _RING_DELTAS[1]}
    found: set[int] = set()
    for d1 in _RING_DELTAS[1]:
        mid = cell + d1
        if mid not in present:
            continue
        for d2 in _RING_DELTAS[1]:
            c2 = mid + d2
            if c2 == cell or c2 in ring1:
                continue
            found.add(c2)
    return sorted(found)


def neighbor_stats(cells: Sequence[int]) -> dict[str, float]:
    """min/max/avg valid ring-1 neighbor count + total edges.

    The reference's ``printStats`` + total-connections report
    (/root/reference/src/cpu/hex_smooth_naive.cpp:118-133,
    /root/reference/src/cpu/hex_smooth_optimized.cpp:62,78-79).
    """
    present = set(cells)
    counts = [
        sum(1 for d in _RING_DELTAS[1] if c + d in present) for c in cells
    ]
    return {
        "min_neighbors": min(counts),
        "max_neighbors": max(counts),
        "avg_neighbors": sum(counts) / len(counts),
        "total_edges": sum(counts),
    }


def second_order_cells(cell: int, present: set[int]) -> list[int]:
    """Valid ring-2 members of ``cell`` (dedup + exclusions by construction)."""
    return [cell + d for d in _RING_DELTAS[2] if cell + d in present]


def point_in_polygon(lon: float, lat: float, ring: Sequence[tuple[float, float]]) -> bool:
    """Even-odd ray casting (the pytest oracle for the PIP operator)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            xin = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < xin:
                inside = not inside
    return inside
